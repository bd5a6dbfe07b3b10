"""Independent-reference checks for the round-5 final tier: the DuckDB
oracle gate proves Spark == DuckDB, but both engines could share a wrong
FORMULA — these tests recompute CUPED, DSIR and Benford from the raw
parquet with hand-rolled numpy/hashlib code (no SQL engine involved) and
pin the registered queries to them."""

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestCupedIndependent:
    def test_matches_numpy_recomputation(self, spark):
        from drug_target_discovery_spark.queries.experiments import (
            _N_ARMS,
            _SPLIT_TS,
            cuped_experiment_readout,
        )

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev["ts"] = pd.to_datetime(ev["ts"])
        split = pd.Timestamp(_SPLIT_TS)
        p = ev[ev.event_type == "purchase"].copy()
        p["cents"] = np.floor(p["value"] * 100 + 0.5).astype(np.int64)
        users = np.sort(ev.user_id.unique())
        x = p[p.ts < split].groupby("user_id")["cents"].sum()
        y = p[p.ts >= split].groupby("user_id")["cents"].sum()
        x = x.reindex(users, fill_value=0).astype(np.int64)
        y = y.reindex(users, fill_value=0).astype(np.int64)
        n = float(len(users))
        sx, sy = float(x.sum()), float(y.sum())
        sxx = float((x.values.astype(float) ** 2).sum())
        sxy = float((x.values.astype(float) * y.values.astype(float)).sum())
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        xbar = sx / (100.0 * n)

        got = {
            r["arm"]: r
            for r in cuped_experiment_readout(spark, SF).collect()
        }
        assert set(got) == set(range(_N_ARMS))
        for arm in range(_N_ARMS):
            mask = (users % _N_ARMS) == arm
            na = mask.sum()
            mean_pre = x.values[mask].sum() / (100.0 * na)
            mean_post = y.values[mask].sum() / (100.0 * na)
            adj = mean_post - theta * (mean_pre - xbar)
            r = got[arm]
            assert r["n_users"] == na
            assert r["mean_pre"] == pytest.approx(mean_pre, abs=1e-6)
            assert r["mean_post"] == pytest.approx(mean_post, abs=1e-6)
            assert r["theta"] == pytest.approx(theta, abs=1e-6)
            assert r["mean_adjusted"] == pytest.approx(adj, abs=1e-6)


class TestDsirIndependent:
    def test_matches_hashlib_recomputation(self, spark):
        from drug_target_discovery_spark.queries.selection import (
            _B,
            _TARGET_LANG,
            _TOP_K,
            dsir_importance_selection,
        )

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        feats: dict[int, list[int]] = {}
        r_cnt: Counter = Counter()
        t_cnt: Counter = Counter()
        for row in docs.itertuples():
            toks = row.text.split(" ")
            bgs = [
                f"{toks[i]} {toks[i + 1]}"
                for i in range(len(toks) - 1)
                if toks[i] and toks[i + 1]
            ]
            bkts = [_md5_60bit(b) % _B for b in bgs]
            feats[row.doc_id] = bkts
            r_cnt.update(bkts)
            if row.lang == _TARGET_LANG:
                t_cnt.update(bkts)
        r_tot, t_tot = sum(r_cnt.values()), sum(t_cnt.values())
        w_q = {
            bkt: math.floor(
                (
                    math.log10((t_cnt.get(bkt, 0) + 1.0) / (t_tot + float(_B)))
                    - math.log10((r_cnt[bkt] + 1.0) / (r_tot + float(_B)))
                )
                * 1e6
                + 0.5
            )
            for bkt in r_cnt
        }
        scored = {
            d: (len(b), sum(w_q[k] for k in b)) for d, b in feats.items() if b
        }
        order = sorted(
            scored.items(), key=lambda kv: (-(kv[1][1] / kv[1][0]), kv[0])
        )[:_TOP_K]
        expected = {
            d: (nf, round_half_up(s / (1e6 * nf), 6)) for d, (nf, s) in order
        }

        got = {
            r["doc_id"]: (r["n_feats"], r["dsir_score"])
            for r in dsir_importance_selection(spark, SF).collect()
        }
        assert set(got) == set(expected)
        for d, (nf, sc) in expected.items():
            assert got[d][0] == nf, d
            assert got[d][1] == pytest.approx(sc, abs=2e-6), d


def round_half_up(x: float, s: int) -> float:
    f = float(10**s)
    return math.floor(x * f + 0.5) / f


class TestBenfordIndependent:
    def test_matches_numpy_recomputation(self, spark):
        from drug_target_discovery_spark.queries.relational import (
            benford_first_digit_check,
        )

        o = pd.read_parquet(f"{SF}/orders.parquet")
        v = o.o_totalprice.values
        v = v[v > 0]
        digits = np.floor(v / np.power(10.0, np.floor(np.log10(v)))).astype(int)
        n = len(digits)
        got = {r["digit"]: r for r in benford_first_digit_check(spark, SF).collect()}
        assert set(got) == set(range(1, 10))
        for d in range(1, 10):
            obs = int((digits == d).sum())
            bf = math.log10(1 + 1 / d)
            exp_chi2 = (obs - n * bf) ** 2 / (n * bf)
            r = got[d]
            assert r["n_obs"] == obs
            assert r["obs_freq"] == pytest.approx(obs / n, abs=1e-6)
            assert r["benford_freq"] == pytest.approx(bf, abs=1e-6)
            assert r["chi2_term"] == pytest.approx(exp_chi2, abs=2e-6)


class TestJackknifeIndependent:
    def test_matches_numpy_recomputation(self, spark):
        """Recompute the delete-one-bucket jackknife in plain float numpy
        (no quantization) and check the query's quantized output to the
        tolerance the nano/pico grids admit."""
        from drug_target_discovery_spark.queries.experiments import (
            _JK_BUCKETS,
            _N_ARMS,
        )
        from drug_target_discovery_spark.queries.registry import all_queries
        from drug_target_discovery_spark.sources.tables import load_table

        out = {
            r["arm"]: r
            for r in all_queries()["jackknife_ratio_readout"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "events")
            .filter("event_type = 'purchase'")
            .select("user_id", "value")
            .toPandas()
        )
        pdf["cents"] = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
        pdf["arm"] = (pdf["user_id"] % _N_ARMS).astype(int)
        pdf["bkt"] = (pdf["user_id"] % _JK_BUCKETS).astype(int)
        for arm, g in pdf.groupby("arm"):
            bk = g.groupby("bkt")["cents"].agg(["sum", "size"])
            S, T, B = bk["sum"].sum(), bk["size"].sum(), len(bk)
            loo = (S - bk["sum"]) / (100.0 * (T - bk["size"]))
            se = math.sqrt((B - 1) / B * ((loo - loo.mean()) ** 2).sum())
            r = out[arm]
            assert r["n_buckets"] == B
            assert r["n_purchases"] == T
            assert abs(r["ratio"] - S / (100.0 * T)) < 1e-6
            assert abs(r["loo_mean"] - loo.mean()) < 1e-6
            assert abs(r["se_jack"] - se) < 1e-5
            # jackknife SE of a stable ratio is positive and much smaller
            # than the ratio itself at this occupancy
            assert 0 < r["se_jack"] < r["ratio"]

    def test_plan_single_fact_shuffle(self, spark):
        """The fact exchanges ONCE — to the (arm, bucket) grain; every
        later step runs on the constant-size bucket table."""
        from drug_target_discovery_spark.queries.registry import all_queries

        q = all_queries()["jackknife_ratio_readout"]
        plan = q.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        # partial aggregation precedes the bucket shuffle
        assert "partial" in plan.lower(), plan
        # the fact shuffles once, to the (arm, bkt) grain; everything after
        # is windows over the constant bucket table partitioned by arm — no
        # joins, no broadcast builds, no caches (VERDICT r5 #3 rewrite)
        assert "hashpartitioning(arm" in plan, plan
        assert plan.count("Scan parquet") == 1, plan
        assert "Join" not in plan, plan
        assert "InMemoryTableScan" not in plan, plan
        # the windows carry an explicit partitionBy (no unpartitioned
        # window over anything, let alone the fact)
        assert "Window" in plan and "windowspecdefinition()" not in plan, plan


class TestSrmIndependent:
    def test_matches_scipy_chisquare(self, spark):
        from drug_target_discovery_spark.queries.registry import all_queries
        from drug_target_discovery_spark.sources.tables import load_table

        rows = all_queries()["srm_guardrail"].fn(spark, SF).collect()
        pdf = load_table(spark, SF, "events").select("user_id").toPandas()
        users = pdf["user_id"].unique()
        obs = np.bincount(users % 2, minlength=2).astype(float)
        exp = np.full(2, obs.sum() / 2.0)
        chi2 = float((((obs - exp) ** 2) / exp).sum())
        try:
            from scipy.stats import chisquare

            chi2_sp = float(chisquare(obs).statistic)
            assert abs(chi2 - chi2_sp) < 1e-9
        except ImportError:
            pass  # numpy derivation above is the oracle either way
        assert len(rows) == 2
        for r in rows:
            assert r["n_users"] == obs[r["arm"]]
            assert abs(r["chi2_total"] - chi2) < 1e-6
            assert r["srm_flag"] == (chi2 > 3.841458820694124)
        # chi2_terms sum to the total
        assert abs(sum(r["chi2_term"] for r in rows) - chi2) < 2e-6
