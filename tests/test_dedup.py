"""Unit tests for the dedup kernels on inline data (the oracle gate covers
them end-to-end; these pin the math for refactors)."""

import pytest

from drug_target_discovery_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    sha_exact_dedup,
    simhash_fingerprints,
    token_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),            # exact dup of 1
        (3, "a b c d f"),            # near dup of 1 (shares 2 of 3+ shingles)
        (4, "x y z w q r s"),        # unrelated
        (5, "short"),                # fewer tokens than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


class TestDedupKernels:
    def test_shingles(self, spark, docs):
        sh = token_shingles(docs, n=3)
        got = {
            (r["doc_id"], r["shingle"]) for r in sh.filter("doc_id = 1").collect()
        }
        assert got == {(1, "a b c"), (1, "b c d"), (1, "c d e")}
        assert sh.filter("doc_id = 5").count() == 0  # too short

    def test_jaccard_exact_value(self, spark, docs):
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_shingle_df=None)
        got = {(r["d1"], r["d2"]): r["jaccard"] for r in pairs.collect()}
        # docs 1 and 2 identical -> J = 1; docs 1 and 3 share {a b c, b c d}
        # of union {a b c, b c d, c d e, c d f} -> J = 0.5
        assert got[(1, 2)] == pytest.approx(1.0)
        assert got[(1, 3)] == pytest.approx(0.5)
        assert (1, 4) not in got  # no common shingles at all

    def test_exact_dedup_groups(self, spark, docs):
        groups = sha_exact_dedup(docs)
        dup = [r for r in groups.collect() if r["n_docs"] > 1]
        assert len(dup) == 1 and dup[0]["canonical_id"] == 1 and dup[0]["n_docs"] == 2

    def test_minhash_identical_docs_identical_sigs(self, spark, docs):
        sig = minhash_signatures(docs, n=3, num_hashes=8)
        s = {
            (r["doc_id"], r["hash_idx"]): r["minhash"] for r in sig.collect()
        }
        for i in range(8):
            assert s[(1, i)] == s[(2, i)]  # identical shingle sets
        assert sig.filter("doc_id = 1").count() == 8

    def test_lsh_finds_exact_dups(self, spark, docs):
        sig = minhash_signatures(docs, n=3, num_hashes=8)
        cand = {(r["d1"], r["d2"]) for r in lsh_candidate_pairs(sig, rows_per_band=2).collect()}
        assert (1, 2) in cand  # identical docs always collide in every band

    def test_simhash_identical_and_disjoint(self, spark, docs):
        fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs, bits=32).collect()}
        assert fp[1] == fp[2]
        # disjoint token sets should differ in many bits
        assert bin(fp[1] ^ fp[4]).count("1") > 4


class TestPrefixFilterEquivalence:
    def test_prefix_filter_matches_full_join(self, spark, docs):
        # the AllPairs prefix filter is lossless: identical pair set and
        # jaccard values vs the full shingle self-join, at any threshold
        for t in (0.0, 0.4, 0.8):
            full = {
                (r["d1"], r["d2"]): (r["jaccard"], r["n_common"])
                for r in ngram_jaccard_pairs(
                    docs, n=3, threshold=t, max_shingle_df=None, prefix_filter=False
                ).collect()
            }
            pref = {
                (r["d1"], r["d2"]): (r["jaccard"], r["n_common"])
                for r in ngram_jaccard_pairs(
                    docs, n=3, threshold=t, max_shingle_df=None, prefix_filter=True
                ).collect()
            }
            assert pref == full, (t, pref, full)


class TestScoredPairsMemo:
    """Optimization r14: verified_pairs is now a filter over the ONE
    unfiltered scored memo shared with minhash_jaccard_estimate_error.
    The filter must commute with the scoring — identical rows/values to
    scoring directly at the family threshold."""

    def test_filter_commutes_with_direct_threshold_scoring(self, spark):
        from drug_target_discovery_spark.caching import release_caches
        from drug_target_discovery_spark.queries.dedup import (
            _JACCARD_T,
            candidate_pairs,
            verified_pairs,
            verify_pairs_from_memo,
        )

        sf_dir = "/root/testdata/sf0.001"
        try:
            direct = sorted(
                map(
                    tuple,
                    verify_pairs_from_memo(
                        spark, sf_dir, candidate_pairs(spark, sf_dir), _JACCARD_T
                    ).collect(),
                )
            )
            via_memo = sorted(map(tuple, verified_pairs(spark, sf_dir).collect()))
            assert via_memo == direct and len(via_memo) > 0
        finally:
            release_caches(fixtures=True)
