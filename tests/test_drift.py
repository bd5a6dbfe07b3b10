"""Drift-tier correctness against INDEPENDENT numpy references.

The DuckDB oracles mirror the same SQL formulas the Spark plans compute, so
a formula-level mistake would pass the driver's hash gate on both sides;
these tests recompute KS / PSI / chi-squared from first principles (sorted
empirical CDFs, direct probability ratios, contingency margins) on the
collected sf0.001 rows and pin the engine outputs to them."""

import math

import numpy as np
import pytest

from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem_pdf(spark):
    return (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag", "l_extendedprice")
        .toPandas()
    )


class TestKS:
    def test_matches_numpy_ecdf(self, spark, lineitem_pdf):
        from drug_target_discovery_spark.queries.drift import _KS_COHORTS

        got = {
            r["cohort"]: r
            for r in all_queries()["ks_test_price_drift"].fn(spark, SF).collect()
        }
        pdf = lineitem_pdf
        for cohort, r in got.items():
            sel = pdf[pdf["l_suppkey"] % _KS_COHORTS == cohort]
            a = np.sort(sel[sel["l_returnflag"] == "R"]["l_extendedprice"].to_numpy())
            b = np.sort(sel[sel["l_returnflag"] == "A"]["l_extendedprice"].to_numpy())
            assert len(a) == r["n1"] and len(b) == r["n2"]
            # D = sup over observed values of |F_a(v) - F_b(v)| (CDFs right-
            # continuous, evaluated after all ties at v)
            vals = np.unique(np.concatenate([a, b]))
            fa = np.searchsorted(a, vals, side="right") / len(a)
            fb = np.searchsorted(b, vals, side="right") / len(b)
            d_ref = float(np.max(np.abs(fa - fb)))
            assert r["ks_d"] == pytest.approx(d_ref, abs=1.1e-6)
            crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
            assert r["reject_05"] == int(d_ref > crit)


class TestPSI:
    def test_matches_numpy(self, spark, lineitem_pdf):
        from drug_target_discovery_spark.queries.drift import _PSI_BUCKET

        row = all_queries()["psi_price_stability"].fn(spark, SF).collect()[0]
        pdf = lineitem_pdf
        bucket = np.floor(pdf["l_extendedprice"].to_numpy() / _PSI_BUCKET).astype(
            np.int64
        )
        pop = (pdf["l_orderkey"].to_numpy() % 2).astype(np.int64)
        buckets = np.unique(bucket)
        c_old = np.array([(bucket[pop == 0] == b).sum() for b in buckets]) + 1
        c_new = np.array([(bucket[pop == 1] == b).sum() for b in buckets]) + 1
        p_old = c_old / c_old.sum()
        p_new = c_new / c_new.sum()
        psi_ref = float(np.sum((p_new - p_old) * np.log(p_new / p_old)))
        assert row["n_buckets"] == len(buckets)
        assert row["psi"] == pytest.approx(psi_ref, abs=1e-6)
        assert row["drift_alert"] == int(psi_ref > 0.1)


class TestChi2:
    def test_matches_numpy_contingency(self, spark):
        row = all_queries()["chi2_status_priority"].fn(spark, SF).collect()[0]
        pdf = (
            load_table(spark, SF, "orders")
            .select("o_orderstatus", "o_orderpriority")
            .toPandas()
        )
        tab = pdf.groupby(["o_orderstatus", "o_orderpriority"]).size().unstack(
            fill_value=0
        )
        obs = tab.to_numpy(dtype=np.float64)
        row_n = obs.sum(axis=1, keepdims=True)
        col_n = obs.sum(axis=0, keepdims=True)
        e = row_n * col_n / obs.sum()
        # observed-cells-only sum, matching the engine (zero cells never
        # appear in the grouped contingency frame)
        mask = obs > 0
        chi_ref = float((((obs - e) ** 2 / e)[mask]).sum())
        assert row["n_cells"] == int(mask.sum())
        assert row["dof"] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
        assert row["chi2"] == pytest.approx(chi_ref, abs=1e-3)
        v_ref = math.sqrt(
            (chi_ref / obs.sum()) / min(obs.shape[0] - 1, obs.shape[1] - 1)
        )
        assert row["cramers_v"] == pytest.approx(v_ref, abs=1e-5)


class TestExactQuantileNormalization:
    def test_matches_numpy_reference(self, spark):
        """Reference implementation of normalizeQuantiles (Bolstad 2003,
        ties=mean) on the same trimmed equal-length samples: per rank the
        cent-quantized mean of order statistics, per value the mean over
        its tie-span."""
        from drug_target_discovery_spark.queries.stats import (
            _QNX_SAMPLES,
            _QNX_SLICE,
        )

        out = all_queries()["quantile_normalize_exact"].fn(spark, SF).collect()
        pdf = (
            load_table(spark, SF, "lineitem")
            .selectExpr(
                "l_orderkey",
                "l_linenumber",
                f"l_suppkey % {_QNX_SAMPLES} as sample_id",
                "l_extendedprice as v",
            )
            .filter(f"l_partkey % {_QNX_SLICE} = 0")
            .toPandas()
        )
        # deterministic rank + trim to min sample length
        pdf = pdf.sort_values(["sample_id", "v", "l_orderkey", "l_linenumber"])
        pdf["rk"] = pdf.groupby("sample_id").cumcount() + 1
        m = pdf.groupby("sample_id").size().min()
        t = pdf[pdf["rk"] <= m]
        qsum = (
            np.floor(t["v"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        )
        t = t.assign(q=qsum)
        ref_rank = t.groupby("rk").agg(qs=("q", "sum"), n=("q", "size"))
        t = t.merge(ref_rank, on="rk")
        # tie average: mean of rank means over each (sample, v) tie group
        t["rank_mean"] = t["qs"] / (t["n"] * 100.0)
        tie = t.groupby(["sample_id", "v"])["rank_mean"].transform("mean")
        t = t.assign(qn_ref=tie)
        got = {
            (r["sample_id"], r["l_orderkey"], r["l_linenumber"]): r["qn_value"]
            for r in out
        }
        assert len(got) == len(t)
        for _, row in t.iterrows():
            key = (row["sample_id"], row["l_orderkey"], row["l_linenumber"])
            assert got[key] == pytest.approx(row["qn_ref"], abs=1.1e-6), key


class TestAUC:
    def test_matches_bruteforce_pair_counting(self, spark, lineitem_pdf):
        """AUC by its definition — P(score+ > score-) + 0.5 P(=) over all
        (pos, neg) pairs — independent of the rank formulation the query
        and its oracle share."""
        from drug_target_discovery_spark.queries.evalmetrics import _AUC_COHORTS

        got = {
            r["cohort"]: r
            for r in all_queries()["auc_by_cohort"].fn(spark, SF).collect()
        }
        pdf = lineitem_pdf
        for cohort, r in got.items():
            sel = pdf[pdf["l_suppkey"] % _AUC_COHORTS == cohort]
            pos = np.sort(
                sel[sel["l_returnflag"] == "R"]["l_extendedprice"].to_numpy()
            )
            neg = np.sort(
                sel[sel["l_returnflag"] != "R"]["l_extendedprice"].to_numpy()
            )
            assert (len(pos), len(neg)) == (r["n_pos"], r["n_neg"])
            gt = np.searchsorted(neg, pos, side="left").sum()  # neg < pos
            le = np.searchsorted(neg, pos, side="right").sum()  # neg <= pos
            ties = le - gt
            auc_ref = (gt + 0.5 * ties) / (len(pos) * len(neg))
            assert r["auc"] == pytest.approx(auc_ref, abs=1.1e-6), cohort


class TestPRCurve:
    def test_matches_numpy_cumulative(self, spark, lineitem_pdf):
        from drug_target_discovery_spark.queries.evalmetrics import _PR_POINTS

        rows = all_queries()["pr_curve_sampled"].fn(spark, SF).collect()
        assert rows
        pdf = lineitem_pdf
        score = pdf["l_extendedprice"].to_numpy()
        label = (pdf["l_returnflag"] == "R").to_numpy().astype(np.int64)
        uniq = np.unique(score)[::-1]  # thresholds descending
        n_pos = int(label.sum())
        for r in rows:
            t = r["threshold"]
            tp = int(label[score >= t].sum())
            n_at = int((score >= t).sum())
            assert r["tp"] == tp and r["fp"] == n_at - tp, t
            assert r["precision_at"] == pytest.approx(tp / n_at, abs=1.1e-6)
            assert r["recall_at"] == pytest.approx(tp / n_pos, abs=1.1e-6)
        # decimation contract: ~_PR_POINTS rows, last threshold included
        assert len(rows) <= _PR_POINTS + 2
        assert min(r["threshold"] for r in rows) == uniq[-1]
