"""Unit tests for duplicate_span_detection (position-aware substring dedup)
and semantic_dedup_prune (SemDeDup) on hand-computable fixtures. The oracle
gate proves cross-engine equality on the real tables; these pin the span
arithmetic and the prune rule on inputs small enough to verify by hand."""

import pytest

from drug_target_discovery_spark.queries.dedup import duplicate_span_detection
from drug_target_discovery_spark.queries.similarity import semantic_dedup_prune


@pytest.fixture(scope="module")
def span_dir(spark, tmp_path_factory):
    """documents.parquet: doc 1/2 share one 8-token passage, doc 3 is
    unrelated, doc 4/5 share two separated 6-token passages, doc 6 is
    shorter than the gram width."""
    d = tmp_path_factory.mktemp("span")
    shared8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    spanA, spanB = "a1 a2 a3 a4 a5 a6", "b1 b2 b3 b4 b5 b6"
    rows = [
        (1, f"{shared8} u1 u2 u3 u4", "en", "src0", 0),
        (2, f"w1 w2 {shared8} w3", "en", "src0", 0),
        (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", "en", "src1", 0),
        (4, f"{spanA} m1 m2 m3 {spanB}", "en", "src1", 0),
        (5, f"{spanA} n1 n2 n3 {spanB}", "en", "src2", 0),
        (6, "tiny doc", "en", "src2", 0),
        # doc 7's dup 6-grams sit at pos 1 and pos 3 (pos-2 gram is NOT
        # duplicated): their token coverage overlaps (t3..t6), so they must
        # merge into ONE 8-token span — not two 6-token spans summing to 12
        # on an 8-token doc (fraction 1.5).  doc 8 holds both grams,
        # separated so its own islands stay distinct.
        (7, "t1 t2 t3 t4 t5 t6 t7 t8", "en", "src3", 0),
        (8, "t1 t2 t3 t4 t5 t6 Z t3 t4 t5 t6 t7 t8", "en", "src3", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


class TestDuplicateSpanDetection:
    def test_span_merge_and_fractions(self, spark, span_dir):
        out = {
            r["doc_id"]: r
            for r in duplicate_span_detection(spark, span_dir).collect()
        }
        assert len(out) == 8
        # docs 1 and 2 share one 8-token passage: 3 consecutive dup 6-gram
        # positions merge into ONE span covering 8 tokens
        for doc, n_tok in ((1, 12), (2, 11)):
            r = out[doc]
            assert (r["n_dup_spans"], r["dup_tokens"], r["longest_span_tokens"]) == (
                1, 8, 8,
            ), r
            assert r["n_tokens"] == n_tok
            assert r["dup_token_fraction"] == pytest.approx(8 / n_tok, abs=1e-6)
        # unrelated doc: all zeros
        r3 = out[3]
        assert (r3["n_dup_spans"], r3["dup_tokens"], r3["dup_token_fraction"]) == (
            0, 0, 0.0,
        )
        # docs 4 and 5: two separated exact 6-token spans -> two islands
        for doc in (4, 5):
            r = out[doc]
            assert (r["n_dup_spans"], r["dup_tokens"], r["longest_span_tokens"]) == (
                2, 12, 6,
            ), r
        # shorter than gram width: zero-filled, token count still right
        assert out[6]["n_tokens"] == 2
        assert out[6]["n_dup_spans"] == 0
        # doc 7: dup grams at pos 1 and pos 3 overlap in token coverage ->
        # ONE merged 8-token span on an 8-token doc (fraction exactly 1.0,
        # never 12/8 = 1.5 from double-counting the shared t3..t6)
        r7 = out[7]
        assert (r7["n_dup_spans"], r7["dup_tokens"], r7["longest_span_tokens"]) == (
            1, 8, 8,
        ), r7
        assert r7["dup_token_fraction"] == pytest.approx(1.0, abs=1e-6)
        # doc 8: same two grams but 7 positions apart (> gram width) ->
        # genuinely disjoint coverage, two 6-token islands
        r8 = out[8]
        assert (r8["n_dup_spans"], r8["dup_tokens"], r8["longest_span_tokens"]) == (
            2, 12, 6,
        ), r8


@pytest.fixture(scope="module")
def sem_dir(spark, tmp_path_factory):
    """embeddings.parquet: v1 duplicates v0 (cosine 1) in label 0; v2 is
    orthogonal to both; v3 sits alone in label 1."""
    d = tmp_path_factory.mktemp("sem")
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


class TestSemanticDedupPrune:
    def test_prunes_duplicate_keeps_rest(self, spark, sem_dir):
        out = {r["vec_id"]: r for r in semantic_dedup_prune(spark, sem_dir).collect()}
        assert len(out) == 4
        # v1 is an exact duplicate of the lower-id v0 -> pruned at sim 1.0
        assert out[1]["is_kept"] is False
        assert out[1]["max_sim_to_prior"] == pytest.approx(1.0)
        # v0 has no LOWER-id neighbor; v2 is orthogonal; v3 is alone
        for vid in (0, 2, 3):
            assert out[vid]["is_kept"] is True, out[vid]
            assert out[vid]["max_sim_to_prior"] is None
        # label-seeded clustering: label-0 members share a cluster
        assert out[0]["cluster"] == out[1]["cluster"] == out[2]["cluster"]
        assert out[3]["cluster"] != out[0]["cluster"]


class TestBloomFilterProbe:
    def test_no_false_negatives_and_fp_flag_consistency(self, spark):
        from drug_target_discovery_spark.queries.dedup import bloom_filter_dedup_probe

        rows = bloom_filter_dedup_probe(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            if r["is_member"]:
                # the Bloom guarantee: a member can never probe negative
                assert r["bloom_positive"] is True, r
                assert r["false_positive"] is False, r
            else:
                assert r["false_positive"] == r["bloom_positive"], r
