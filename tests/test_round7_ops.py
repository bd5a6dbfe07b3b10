"""Independent numpy/pandas recomputation + plan-shape pins for the
round-7 operators, plus the round-7 plan-change guards: the prefix-filter
containment rewrite (candidate-superset + exact equality with the full
self-join), the Adamic-Adar skew-aware driver gate, and the adaptive
salted-aggregation decision."""

import math
from collections import defaultdict

import numpy as np
import pytest

from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestKaplanMeier:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["kaplan_meier_customer_gaps"].fn(spark, SF).collect()
        od = (
            load_table(spark, SF, "orders")
            .select("o_custkey", "o_orderdate", "o_orderkey")
            .toPandas()
        )
        od["day"] = od["o_orderdate"].dt.normalize()
        md = od["day"].max()
        obs = []  # (dur, event)
        for _, g in od.sort_values(["day", "o_orderkey"]).groupby("o_custkey"):
            days = list(g["day"])
            for a, b in zip(days, days[1:]):
                obs.append(((b - a).days, 1))
            obs.append(((md - days[-1]).days, 0))
        per_dur = defaultdict(lambda: [0, 0])
        for dur, e in obs:
            per_dur[dur][0 if e else 1] += 1
        n_risk = len(obs)
        s = 1.0
        expect = {}
        for dur in sorted(per_dur):
            d, c = per_dur[dur]
            s *= (n_risk - d) / n_risk
            expect[dur] = (n_risk, d, c, s)
            n_risk -= d + c
        assert len(rows) == len(expect)
        for r in rows:
            n, d, c, s = expect[r["dur_days"]]
            assert r["n_at_risk"] == n
            assert r["n_events"] == d
            assert r["n_censored"] == c
            assert r["survival"] == pytest.approx(s, abs=1e-5)

    def test_per_customer_lag_runs_keyed(self, spark):
        plan = _plan(all_queries()["kaplan_meier_customer_gaps"].fn(spark, SF))
        # the inter-order lag must partition by customer (scales with the
        # customer dimension); only the day-grain gap table may hit the
        # documented single-partition cumulative windows
        assert "hashpartitioning(ck" in plan

    def test_survival_is_a_proper_curve(self, spark):
        rows = all_queries()["kaplan_meier_customer_gaps"].fn(spark, SF).collect()
        surv = [r["survival"] for r in rows]
        assert all(0.0 <= v <= 1.0 for v in surv)
        assert all(a >= b - 1e-12 for a, b in zip(surv, surv[1:])), (
            "KM survival must be non-increasing"
        )
        # right-censoring matters: censored observations exist
        assert sum(r["n_censored"] for r in rows) > 0


class TestCusumChangepoint:
    def test_matches_numpy_recompute(self, spark):
        rows = all_queries()["cusum_changepoint_daily_revenue"].fn(
            spark, SF
        ).collect()
        od = load_table(spark, SF, "orders").select(
            "o_orderdate", "o_totalprice"
        ).toPandas()
        od["day"] = od["o_orderdate"].dt.normalize()
        od["x"] = np.floor(od["o_totalprice"] + 0.5).astype(np.int64)
        daily = od.groupby("day")["x"].sum().sort_index()
        x = daily.to_numpy(dtype=np.float64)
        n = len(x)
        sig = x.std(ddof=0)
        cusum = np.cumsum(x - x.mean()) / (sig * math.sqrt(n))
        cp_idx = int(np.argmax(np.abs(cusum)))
        assert len(rows) == n
        for i, r in enumerate(rows):
            assert r["dollars"] == int(daily.iloc[i])
            assert r["cusum"] == pytest.approx(cusum[i], abs=1e-4)
            assert r["is_changepoint"] == (1 if i == cp_idx else 0)
        assert sum(r["is_changepoint"] for r in rows) == 1

    def test_plan_windows_run_after_day_collapse(self, spark):
        plan = _plan(
            all_queries()["cusum_changepoint_daily_revenue"].fn(spark, SF)
        )
        # the single fact shuffle is to the day grain (partial agg first)
        assert "partial" in plan.lower()


class TestBasketBrandLift:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["basket_brand_lift"].fn(spark, SF).collect()
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).toPandas()
        part = load_table(spark, SF, "part").select(
            "p_partkey", "p_brand"
        ).toPandas()
        ob = (
            li.merge(part, left_on="l_partkey", right_on="p_partkey")[
                ["l_orderkey", "p_brand"]
            ]
            .drop_duplicates()
        )
        n_orders = ob["l_orderkey"].nunique()
        na = ob.groupby("p_brand").size()
        pair_n = defaultdict(int)
        for _, g in ob.groupby("l_orderkey"):
            brands = sorted(g["p_brand"])
            for i, a in enumerate(brands):
                for b in brands[i + 1 :]:
                    pair_n[(a, b)] += 1
        assert rows and len(rows) == len(pair_n)
        for r in rows:
            key = (r["brand_a"], r["brand_b"])
            assert r["n_ab"] == pair_n[key]
            assert r["n_a"] == na[r["brand_a"]]
            assert r["n_b"] == na[r["brand_b"]]
            assert r["support"] == pytest.approx(
                pair_n[key] / n_orders, abs=1e-6
            )
            assert r["lift"] == pytest.approx(
                pair_n[key] * n_orders / (na[r["brand_a"]] * na[r["brand_b"]]),
                abs=1e-4,
            )

    def test_pairs_generate_map_side_from_order_sets(self, spark):
        plan = _plan(all_queries()["basket_brand_lift"].fn(spark, SF))
        # r7 rewrite: pair generation must be the map-side array explode
        # over the order-grain collect_set — NOT a basket self-join (the
        # first form, measured ~2x slower; SCALING.md round 7)
        assert "collect_set" in plan
        assert "Generate" in plan  # the explode of the pair structs
        assert "SortMergeJoin" not in plan


class TestWeekdaySeasonality:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["weekday_seasonality_revenue"].fn(spark, SF).collect()
        od = load_table(spark, SF, "orders").select(
            "o_orderdate", "o_totalprice"
        ).toPandas()
        od["dow"] = od["o_orderdate"].dt.dayofweek + 1  # pandas: Mon=0
        od["cents"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(np.int64)
        g = od.groupby("dow").agg(n=("cents", "size"), cents=("cents", "sum"))
        tc = int(g["cents"].sum())
        assert len(rows) == len(g)
        for r in rows:
            assert r["n_orders"] == int(g.loc[r["isodow"], "n"])
            assert r["revenue"] == pytest.approx(
                g.loc[r["isodow"], "cents"] / 100.0, abs=0.01
            )
            assert r["seasonality_index"] == pytest.approx(
                g.loc[r["isodow"], "cents"] * 7.0 / tc, abs=1e-5
            )
        assert sum(r["revenue_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
        names = {r["isodow"]: r["weekday"] for r in rows}
        assert names.get(1) == "Mon" and names.get(7) == "Sun"


class TestMinhashEstimateError:
    def test_mae_within_theoretical_bound(self, spark):
        """The k-hash MinHash estimator's per-pair standard error is
        sqrt(J(1-J)/k) <= 0.5/sqrt(k); with k=16 the MAE over any pair
        population must sit well inside 1/sqrt(k) = 0.25. This is the
        committed accuracy number for the LSH tier's banding parameters
        (VERDICT r6 #6)."""
        rows = all_queries()["minhash_jaccard_estimate_error"].fn(
            spark, SF
        ).collect()
        assert rows, "LSH produced no candidate pairs at the fixture"
        n = sum(r["n_pairs"] for r in rows)
        mae = sum(r["n_pairs"] * r["mae"] for r in rows) / n
        k = 16
        assert mae <= 1.0 / math.sqrt(k), f"MAE {mae} exceeds 1/sqrt(k)"
        # sanity: buckets are deciles, estimates live in [0, 1]
        for r in rows:
            assert 0 <= r["jac_bucket"] <= 10
            assert 0.0 <= r["mean_estimate"] <= 1.0
            assert 0.0 <= r["mean_exact_jaccard"] <= 1.0


class TestShingleNoveltyRatio:
    def test_matches_pandas_recompute(self, spark):
        rows = all_queries()["shingle_novelty_ratio"].fn(spark, SF).collect()
        docs = load_table(spark, SF, "documents").select(
            "doc_id", "text"
        ).toPandas()
        shingles = {}
        for _, r in docs.iterrows():
            toks = r["text"].split(" ")
            shingles[r["doc_id"]] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        df = defaultdict(int)
        for s in shingles.values():
            for sh in s:
                df[sh] += 1
        stop = {sh for sh, d in df.items() if d > 0.5 * len(docs)}
        kept = {d: s - stop for d, s in shingles.items() if s - stop}
        owner = {}
        for d in sorted(kept):
            for sh in kept[d]:
                owner.setdefault(sh, d)
        assert len(rows) == len(kept)
        total_novel = 0
        for r in rows:
            s = kept[r["doc_id"]]
            novel = sum(1 for sh in s if owner[sh] == r["doc_id"])
            assert r["n_shingles"] == len(s)
            assert r["n_novel"] == novel
            assert r["novelty"] == pytest.approx(novel / len(s), abs=1e-6)
            total_novel += novel
        # every kept shingle has exactly one first owner
        assert total_novel == len(owner)


class TestSkewAdaptiveAgg:
    def test_equals_plain_groupby_and_chooses_salted_plan(self, spark):
        import pyspark.sql.functions as F

        q = all_queries()["skew_adaptive_agg_stats"]
        df = q.fn(spark, SF)
        # 3-value returnflag -> hot share ~0.4 >> 0.125 -> salted plan
        assert "_salt" in _plan(df), (
            "profile should select the salted two-phase plan on TPC-H's "
            "3-value returnflag"
        )
        got = {r["l_returnflag"]: r for r in df.collect()}
        li = load_table(spark, SF, "lineitem")
        plain = (
            li.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
                ).alias("sum_qty"),
            )
            .collect()
        )
        assert len(got) == len(plain)
        for r in plain:
            assert got[r["l_returnflag"]]["n_rows"] == r["n_rows"]
            assert got[r["l_returnflag"]]["sum_qty"] == r["sum_qty"]

    def test_sampled_and_exact_profiles_choose_the_same_plan(self, spark):
        """VERDICT r7 #5: the registered query decides from a seeded 1%
        sample; the exact count-by-key profile is the test path. On the
        fixture (hot share ~0.4 vs threshold 0.125) both must select the
        salted plan and produce identical rows."""
        from drug_target_discovery_spark.queries.round7b import (
            _skew_adaptive_agg,
        )

        sampled = _skew_adaptive_agg(spark, SF, exact_profile=False)
        exact = _skew_adaptive_agg(spark, SF, exact_profile=True)
        assert ("_salt" in _plan(sampled)) == ("_salt" in _plan(exact)) == True  # noqa: E712
        assert sorted(map(tuple, sampled.collect())) == sorted(
            map(tuple, exact.collect())
        )

    def test_sampled_hot_share_bounds(self, spark):
        from drug_target_discovery_spark.operators.skew import (
            exact_hot_share,
            sampled_hot_share,
        )

        li = load_table(spark, SF, "lineitem").select("l_returnflag")
        exact = exact_hot_share(li, "l_returnflag")
        est = sampled_hot_share(li, "l_returnflag", fraction=0.05)
        # ~6k rows * 5% -> n ~ 300, SE ~ 2.8%; 5 sigma of slack
        assert abs(est - exact) < 0.15
        # empty input -> plain-plan default
        assert sampled_hot_share(li.limit(0), "l_returnflag") == 0.0


class TestContainmentPrefixFilter:
    @staticmethod
    def _rows(df):
        return {
            (r["d1"], r["d2"]): (r["n_common"], r["d1_shingles"])
            for r in df.collect()
        }

    @pytest.mark.parametrize("t", [0.5, 0.9])
    def test_prefix_equals_memo_strategy(self, spark, t):
        """The SSJoin guarantee, pinned at both a weak (0.5) and a strong
        (0.9) threshold: the prefix-filtered strategy returns EXACTLY the
        memo count-join's result (candidate set ⊇ answer; exact
        verification then makes the two strategies equal)."""
        from drug_target_discovery_spark.queries.round6b import (
            _containment_via_memo,
            _containment_via_prefix,
        )

        memo = self._rows(_containment_via_memo(spark, SF, t))
        prefix = self._rows(_containment_via_prefix(spark, SF, t))
        assert prefix == memo
        if t == 0.5:
            assert memo, "fixture should contain containment pairs at t=0.5"

    def test_prefix_candidates_superset_of_answer(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window as W

        from drug_target_discovery_spark.queries.dedup import (
            shingle_sizes_and_intersections,
            shingle_table,
        )
        from drug_target_discovery_spark.queries.round6b import (
            _CONT_T,
            _containment_via_memo,
        )

        sh = shingle_table(spark, SF)
        sizes, _ = shingle_sizes_and_intersections(spark, SF)
        df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        wdoc = W.partitionBy("doc_id").orderBy("df", "shingle")
        prefix = (
            sh.join(df_tbl, "shingle")
            .withColumn("rn", F.row_number().over(wdoc))
            .join(sizes, "doc_id")
            .filter(
                F.col("rn") <= F.floor((1.0 - _CONT_T) * F.col("sz")) + 1
            )
            .select(F.col("doc_id").alias("d1"), "shingle")
        )
        cand = {
            (r["d1"], r["d2"])
            for r in prefix.join(
                sh.select(F.col("doc_id").alias("d2"), "shingle"), "shingle"
            )
            .filter(F.col("d1") != F.col("d2"))
            .select("d1", "d2")
            .distinct()
            .collect()
        }
        answer = set(self._rows(_containment_via_memo(spark, SF, _CONT_T)))
        assert answer <= cand

    def test_registered_query_uses_memo_strategy_below_crossover(self, spark):
        from drug_target_discovery_spark.queries.round6b import (
            _CONT_T,
            _PREFIX_STRATEGY_T,
        )

        assert _CONT_T < _PREFIX_STRATEGY_T
        # memo plan signature: rides the cached exact-pairs self-join —
        # no row_number/prefix machinery in the executed plan
        plan = _plan(all_queries()["shingle_containment_pairs"].fn(spark, SF))
        assert "row_number" not in plan.lower()


class TestAdamicAdarSkewGate:
    def _star(self, spark, n_leaves: int):
        rows = [(0, i) for i in range(1, n_leaves + 1)]
        return spark.createDataFrame(rows, ["a", "b"])

    def test_hub_within_edge_gate_goes_distributed(self, spark):
        """ADVICE r6 (medium): a 5000-leaf star is only 5000 edges — inside
        the 20K edge gate — but its wedge-pair bound is C(5000,2) ~ 1.25e7
        > _AA_DRIVER_WEDGE_CAP, so the skew-aware gate must route it to the
        distributed wedge join (the plan keeps its joins; the driver fast
        path would have returned a materialized local table)."""
        from drug_target_discovery_spark.queries.graphq import adamic_adar_pairs

        out = adamic_adar_pairs(self._star(spark, 5000))
        assert "Join" in _plan(out)

    def test_small_graph_still_takes_driver_fast_path(self, spark):
        from drug_target_discovery_spark.queries.graphq import (
            _AA_DRIVER_WEDGE_CAP,
            adamic_adar_pairs,
        )

        e = self._star(spark, 100)  # wedge bound ~5e3 << cap
        assert _AA_DRIVER_WEDGE_CAP >= 1_000_000
        out = adamic_adar_pairs(e)
        plan = _plan(out)
        assert "Join" not in plan  # materialized driver-side result
        # star: every leaf pair shares exactly the hub, score 1/ln(100)
        rows = out.collect()
        assert len(rows) == 100 * 99 // 2
        q = math.floor(1_000_000.0 / math.log(100) + 0.5)
        assert all(r["n_common"] == 1 and r["s_q"] == q for r in rows)
