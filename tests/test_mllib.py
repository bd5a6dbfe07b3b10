"""Cross-checks: the MLlib-backed variants agree with the oracle-checked
DataFrame implementations."""

import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


class TestMLlibParity:
    def test_corr_matrix_matches_fused_selfjoin(self, spark):
        from drug_target_discovery_spark.operators.correlation import pairwise_pearson
        from drug_target_discovery_spark.queries.graphq import _cell_matrix

        reg = all_queries()
        mllib = {
            (r["g1"], r["g2"]): r["r"]
            for r in reg["mllib_corr_matrix_top"].fn(spark, SF).collect()
        }
        cell = _cell_matrix(spark, SF)
        keys = {g for pair in mllib for g in pair}
        sub = cell.filter(F.col("g").isin(list(keys)))
        ours = {
            (r["g1"], r["g2"]): r["r"]
            for r in pairwise_pearson(sub, "g", "s", "v", min_periods=1).collect()
        }
        assert mllib  # non-empty
        # demo bound: the dense pivot + collect form must stay capped at
        # K=10 genes (<= 45 upper-triangle pairs) — growth belongs in the
        # fused distributed plan, not here
        assert len(keys) <= 10 and len(mllib) <= 45
        for pair, r in mllib.items():
            if pair in ours and ours[pair] is not None:
                # MLlib pivots with na.fill(0) so only fully-observed pairs
                # match exactly; those dominate on the nation sample dim
                n_common = cell.filter(F.col("g").isin(list(pair))).groupBy("s").count()
                if n_common.filter("count = 2").count() == 25:
                    assert r == pytest.approx(ours[pair], abs=1e-6), pair

    def test_mllib_lsh_overlaps_jaccard_pairs(self, spark):
        reg = all_queries()
        mllib = {
            (r["d1"], r["d2"]) for r in reg["mllib_minhash_neardups"].fn(spark, SF).collect()
        }
        exact = {
            (r["d1"], r["d2"])
            for r in reg["ngram_jaccard_near_dups"].fn(spark, SF).collect()
            # the MLlib demo is bounded to the deterministic quarter sample
            # (doc_id % 4 == 0, VERDICT r5 #2) — compare on that slice
            if r["d1"] % 4 == 0 and r["d2"] % 4 == 0
        }
        # exact high-Jaccard pairs in the sampled slice should be recalled
        # by the LSH at threshold 0.3 distance (J > 0.7) with 4 tables
        assert exact, "fixture should contain near-dups within the % 4 sample"
        missed = exact - mllib
        assert len(missed) <= max(1, len(exact) // 10), missed
