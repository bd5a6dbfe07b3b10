"""Independent numpy/pandas recomputation + plan-shape pins for the
round-6 operators (same rationale as test_round5_ops.py: the DuckDB
oracles mirror the SQL formulas, so an independent derivation guards the
formulas themselves, and the plan pins guard the scale contracts)."""

import math

import numpy as np
import pytest

from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestOlsTrend:
    def test_matches_numpy_polyfit(self, spark):
        rows = all_queries()["ols_trend_by_brand"].fn(spark, SF).collect()
        li = load_table(spark, SF, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice"
        ).toPandas()
        part = load_table(spark, SF, "part").select(
            "p_partkey", "p_brand"
        ).toPandas()
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        j["x"] = np.floor(j["l_quantity"] + 0.5).astype(np.int64)
        j["y"] = np.floor(j["l_extendedprice"] + 0.5).astype(np.int64)
        assert rows
        for r in rows:
            g = j[j["p_brand"] == r["p_brand"]]
            slope, intercept = np.polyfit(g["x"], g["y"], 1)
            assert r["n"] == len(g)
            assert r["slope"] == pytest.approx(slope, abs=1e-4)
            assert r["intercept"] == pytest.approx(intercept, abs=1e-2)
            cc = np.corrcoef(g["x"], g["y"])[0, 1]
            assert r["r2"] == pytest.approx(cc * cc, abs=1e-4)

    def test_plan_one_fact_shuffle_to_brand_grain(self, spark):
        plan = _plan(all_queries()["ols_trend_by_brand"].fn(spark, SF))
        assert "partial" in plan.lower()
        assert "hashpartitioning(p_brand" in plan


class TestMutualInformation:
    def test_matches_numpy_recompute(self, spark):
        row = all_queries()["mutual_information_flags"].fn(spark, SF).collect()[0]
        pdf = load_table(spark, SF, "lineitem").select(
            "l_returnflag", "l_linestatus"
        ).toPandas()
        ct = pdf.groupby(["l_returnflag", "l_linestatus"]).size()
        n = ct.sum()
        px = ct.groupby(level=0).sum() / n
        py = ct.groupby(level=1).sum() / n
        p = ct / n
        mi = sum(
            p[x, y] * math.log(p[x, y] / (px[x] * py[y])) for x, y in p.index
        )
        hx = -sum(v * math.log(v) for v in px)
        hy = -sum(v * math.log(v) for v in py)
        hj = -sum(v * math.log(v) for v in p)
        assert row["n_cells"] == len(ct)
        assert row["n_rows"] == n
        assert row["mi_nats"] == pytest.approx(mi, abs=1e-6)
        assert row["h_x"] == pytest.approx(hx, abs=1e-6)
        assert row["h_y"] == pytest.approx(hy, abs=1e-6)
        assert row["h_joint"] == pytest.approx(hj, abs=1e-6)
        # information-theoretic identity: I(X;Y) = H(X) + H(Y) - H(X,Y)
        assert row["mi_nats"] == pytest.approx(
            row["h_x"] + row["h_y"] - row["h_joint"], abs=1e-5
        )


class TestGiniSegmentMix:
    def test_matches_numpy_recompute(self, spark):
        rows = all_queries()["gini_segment_mix"].fn(spark, SF).collect()
        od = load_table(spark, SF, "orders").select(
            "o_custkey", "o_orderstatus"
        ).toPandas()
        cu = load_table(spark, SF, "customer").select(
            "c_custkey", "c_mktsegment"
        ).toPandas()
        j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
        assert rows
        for r in rows:
            g = j[j["c_mktsegment"] == r["c_mktsegment"]]
            p = g["o_orderstatus"].value_counts(normalize=True).values
            assert r["n_orders"] == len(g)
            assert r["gini"] == pytest.approx(1 - (p * p).sum(), abs=1e-6)
            assert r["entropy"] == pytest.approx(
                -(p * np.log(p)).sum(), abs=1e-6
            )


class TestWeightedReservoir:
    def test_matches_python_recompute(self, spark):
        out = all_queries()["weighted_reservoir_sample"].fn(spark, SF).collect()
        od = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_totalprice"
        ).toPandas()
        M = 2147483648
        u = (((od["o_orderkey"] % M) * 1103515245 + 12345) % M + 1.0) / (M + 1)
        od["key"] = np.log(u) / od["o_totalprice"]
        top = od.sort_values(
            ["key", "o_orderkey"], ascending=[False, True]
        ).head(100)
        assert [r["o_orderkey"] for r in out] == top["o_orderkey"].tolist()
        for r, (_, t) in zip(out, top.iterrows()):
            assert r["sample_key"] == pytest.approx(t["key"], abs=1e-9)

    def test_plan_is_top_k_not_global_sort(self, spark):
        plan = _plan(all_queries()["weighted_reservoir_sample"].fn(spark, SF))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan


class TestParetoFrontier:
    def test_matches_brute_force_dominance(self, spark):
        out = {
            (r["p_brand"], r["p_type"])
            for r in all_queries()["pareto_frontier_parts"].fn(spark, SF).collect()
        }
        part = load_table(spark, SF, "part").toPandas()
        part["cents"] = np.floor(part["p_retailprice"] * 100 + 0.5).astype(
            np.int64
        )
        g = part.groupby(["p_brand", "p_type"]).agg(
            cents=("cents", "sum"), ssize=("p_size", "sum"), n=("p_size", "size")
        )
        g["price"] = g["cents"] / (100.0 * g["n"])
        g["size"] = g["ssize"] / g["n"]
        pts = list(g[["price", "size"]].itertuples())
        expected = set()
        for p in pts:
            dominated = any(
                q.price <= p.price
                and q.size >= p.size
                and (q.price < p.price or q.size > p.size)
                for q in pts
            )
            if not dominated:
                expected.add(p.Index)
        assert out == expected

    def test_frontier_is_strictly_monotone(self, spark):
        rows = sorted(
            all_queries()["pareto_frontier_parts"].fn(spark, SF).collect(),
            key=lambda r: r["avg_price"],
        )
        for a, b in zip(rows, rows[1:]):
            if a["avg_price"] < b["avg_price"]:
                assert a["avg_size"] < b["avg_size"]


class TestCalendarGapFill:
    def test_spine_is_dense_and_zero_filled(self, spark):
        rows = all_queries()["calendar_gap_fill_revenue"].fn(spark, SF).collect()
        by_nation = {}
        for r in rows:
            by_nation.setdefault(r["nation"], []).append(r)
        # every nation carries the identical dense month spine
        spines = {tuple(r["month"] for r in v) for v in by_nation.values()}
        assert len(spines) == 1
        months = sorted(spines.pop())
        # dense: consecutive months, no gaps
        def nxt(m):
            y, mm = int(m[:4]), int(m[5:])
            return f"{y + (mm == 12)}-{(mm % 12) + 1:02d}"

        for a, b in zip(months, months[1:]):
            assert b == nxt(a), (a, b)
        # zero-filled months exist at this tiny SF and carry 0 revenue
        zeros = [r for r in rows if r["n_orders"] == 0]
        assert zeros and all(r["revenue"] == 0.0 for r in zeros)


class TestRollingAnomaly:
    def test_matches_pandas_rolling(self, spark):
        rows = all_queries()["rolling_revenue_anomaly"].fn(spark, SF).collect()
        od = load_table(spark, SF, "orders").select(
            "o_orderdate", "o_totalprice"
        ).toPandas()
        od["day"] = od["o_orderdate"].dt.floor("D")
        od["dollars"] = np.floor(od["o_totalprice"] + 0.5).astype(np.int64)
        d = od.groupby("day")["dollars"].sum().sort_index()
        m = d.rolling(28, min_periods=28).mean().shift(1)
        s = d.rolling(28, min_periods=28).std(ddof=1).shift(1)
        z = (d - m) / s
        got = {r["day"]: r["z"] for r in rows}
        exp = {
            k.strftime("%Y-%m-%d"): v for k, v in z.dropna().items() if s[k] != 0
        }
        # pandas shift(1) drops the last window; align on shared keys
        shared = set(got) & set(exp)
        assert len(shared) >= len(got) - 1
        for k in shared:
            assert got[k] == pytest.approx(exp[k], abs=1e-5), k

    def test_current_day_excluded_from_window(self, spark):
        # the window is [t-28, t-1]: a day's own value must not shift its z
        # (control-chart discipline — an anomaly cannot mask itself);
        # asserted structurally: ROWS BETWEEN ... AND -1 in the plan
        plan = _plan(all_queries()["rolling_revenue_anomaly"].fn(spark, SF))
        assert "-1" in plan and "windowspecdefinition" in plan


class TestStratifiedKfold:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["stratified_kfold_assignment"].fn(spark, SF).collect()
        od = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).toPandas()
        od["fold"] = od["o_orderkey"] % 5
        for r in rows:
            g = od[od["o_orderpriority"] == r["stratum"]]
            counts = g.groupby("fold").size()
            exp = len(g) / 5.0
            chi2 = (((counts - exp) ** 2) / exp).sum()
            assert r["n_orders"] == len(g)
            assert r["min_fold_n"] == counts.min()
            assert r["max_fold_n"] == counts.max()
            assert r["chi2"] == pytest.approx(chi2, abs=1e-5)


class TestZoneMaps:
    def test_bydate_layout_prunes_natural_does_not(self, spark):
        rows = {
            r["layout"]: r
            for r in all_queries()["zone_map_stats"].fn(spark, SF).collect()
        }
        assert set(rows) == {"bydate", "natural"}
        # orderkey is uncorrelated with shipdate in this corpus, so the
        # natural layout's zone maps cannot skip; month-clustering must
        assert rows["bydate"]["skip_fraction"] > rows["natural"]["skip_fraction"]
        assert rows["bydate"]["n_pruned"] > 0
        # conservation: both layouts partition the same fact
        assert rows["bydate"]["total_rows"] == rows["natural"]["total_rows"]

    def test_single_fact_scan(self, spark):
        plan = _plan(all_queries()["zone_map_stats"].fn(spark, SF))
        assert plan.count("Scan parquet") <= 2  # fact + 1-row extent branch


class TestVocabOov:
    def test_matches_python_recompute(self, spark):
        rows = all_queries()["vocab_oov_coverage"].fn(spark, SF).collect()
        pdf = load_table(spark, SF, "documents").select(
            "source", "text"
        ).toPandas()
        from collections import Counter

        toks = []
        for _, r in pdf.iterrows():
            toks.extend((r["source"], t) for t in r["text"].split(" "))
        cnt = Counter(t for _, t in toks)
        vocab = {
            t
            for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        }
        for r in rows:
            sr = [(s, t) for s, t in toks if s == r["source"]]
            oov = sum(1 for _, t in sr if t not in vocab)
            assert r["n_tokens"] == len(sr)
            assert r["n_oov"] == oov
            assert r["oov_rate"] == pytest.approx(oov / len(sr), abs=1e-6)


class TestZipfSlope:
    def test_matches_numpy_polyfit(self, spark):
        row = all_queries()["zipf_slope_tokens"].fn(spark, SF).collect()[0]
        pdf = load_table(spark, SF, "documents").select("text").toPandas()
        from collections import Counter

        cnt = Counter(t for txt in pdf["text"] for t in txt.split(" "))
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
        x = np.log(np.arange(1, len(top) + 1))
        y = np.log([c for _, c in top])
        slope, intercept = np.polyfit(x, y, 1)
        assert row["n_ranks"] == len(top)
        assert row["slope"] == pytest.approx(slope, abs=1e-3)
        assert row["intercept"] == pytest.approx(intercept, abs=1e-3)
        # a natural-ish corpus should be decreasing in rank
        assert row["slope"] < 0


class TestContainment:
    def test_asymmetric_and_matches_python(self, spark):
        rows = all_queries()["shingle_containment_pairs"].fn(spark, SF).collect()
        pdf = load_table(spark, SF, "documents").select(
            "doc_id", "text"
        ).toPandas()
        sh = {}
        for _, r in pdf.iterrows():
            ts = r["text"].split(" ")
            sh[r["doc_id"]] = {
                " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
            }
        from collections import Counter

        df = Counter(s for v in sh.values() for s in v)
        stop = {s for s, c in df.items() if c > 0.5 * len(pdf)}
        sh = {k: v - stop for k, v in sh.items()}
        assert rows
        for r in rows[:50]:
            a, b = sh[r["d1"]], sh[r["d2"]]
            k = len(a & b)
            assert r["n_common"] == k
            assert r["d1_shingles"] == len(a)
            assert r["containment"] == pytest.approx(k / len(a), abs=1e-6)
        # asymmetry: containment is directional — at least one pair where
        # (d1 -> d2) passes the threshold in one direction only, OR sizes
        # differ between directions when both pass
        got = {(r["d1"], r["d2"]): r["containment"] for r in rows}
        asym = [
            (d1, d2)
            for (d1, d2) in got
            if (d2, d1) not in got or got[(d1, d2)] != got[(d2, d1)]
        ]
        # tolerate a perfectly symmetric tiny corpus but record it
        if not asym:
            pytest.skip("corpus contains only symmetric near-dups at sf0.001")


class TestNdcg:
    def test_matches_python_recompute(self, spark):
        rows = all_queries()["ndcg_retrieval_eval"].fn(spark, SF).collect()
        pdf = load_table(spark, SF, "documents").select(
            "doc_id", "text"
        ).toPandas()
        docs = {r["doc_id"]: r["text"].split(" ") for _, r in pdf.iterrows()}
        n = len(docs)
        assert rows
        for r in rows:
            term = r["term"]
            cand = {}
            for d, ts in docs.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                rel = 3 if term in ts[:5] else min(tf, 2)
                cand[d] = (tf, rel)
            dfc = len(cand)
            idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
            scored = sorted(
                (
                    (-idf * (tf / (tf + 1.2)), d, rel)
                    for d, (tf, rel) in cand.items()
                )
            )
            dcg = sum(
                (2**rel - 1) / math.log2(pos + 2)
                for pos, (_, _, rel) in enumerate(scored[:10])
            )
            ideal = sorted(((-rel, d) for d, (_, rel) in cand.items()))
            idcg = sum(
                (2 ** (-negrel) - 1) / math.log2(pos + 2)
                for pos, (negrel, _) in enumerate(ideal[:10])
            )
            assert r["n_candidates"] == dfc
            assert r["dcg"] == pytest.approx(dcg, abs=1e-5)
            assert r["idcg"] == pytest.approx(idcg, abs=1e-5)
            assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-5)
            assert 0 < r["ndcg"] <= 1.0

    def test_ranking_relevance_misalignment_measured(self, spark):
        # at least one term must have ndcg < 1 — otherwise relevance is
        # monotone in the score and the metric is vacuous
        rows = all_queries()["ndcg_retrieval_eval"].fn(spark, SF).collect()
        assert any(r["ndcg"] < 1.0 for r in rows)

    def test_plan_broadcast_term_join_single_explode(self, spark):
        # r6 rewrite pin: candidate generation must be a posexplode of the
        # token stream feeding a broadcast HASH join on the term equi-key
        # (never the original array-replicating term crossJoin), and the
        # candidate table must be cache-shared by its three consumers
        # (df / ranked / ideal) — the plan string repeats the cached
        # subtree per InMemoryTableScan reference, so assert the scan
        # nodes rather than counting Generate occurrences.
        plan = (
            all_queries()["ndcg_retrieval_eval"]
            .fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan
        assert "Generate posexplode" in plan, plan
        assert "InMemoryTableScan" in plan, plan
