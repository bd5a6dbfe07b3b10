"""Independent pandas/numpy recomputation for the round-5 curation and
retrieval operators (same rationale as tests/test_drift.py: the DuckDB
oracles mirror the SQL formulas, so an independent derivation guards the
formulas themselves)."""

import hashlib

import numpy as np
import pytest

from drug_target_discovery_spark.queries.registry import all_queries
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestShardAssignment:
    def test_matches_pandas_recompute(self, spark):
        from drug_target_discovery_spark.queries.curation import _SHARD_CHARS

        out = {
            r["doc_id"]: r
            for r in all_queries()["training_shard_assignment"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "documents")
            .select("doc_id", "source", "n_chars")
            .toPandas()
        )
        pdf["h"] = pdf["doc_id"].map(lambda d: _md5_int(str(d)))
        pdf = pdf.sort_values(["source", "h", "doc_id"])
        pdf["cum"] = pdf.groupby("source")["n_chars"].cumsum()
        pdf["local"] = (pdf["cum"] - pdf["n_chars"]) // _SHARD_CHARS
        n_shards = pdf.groupby("source")["local"].max() + 1
        offsets = n_shards.sort_index().cumsum().shift(fill_value=0)
        assert len(out) == len(pdf)
        for _, row in pdf.iterrows():
            r = out[row["doc_id"]]
            assert r["local_shard"] == row["local"], row["doc_id"]
            assert r["shard_id"] == row["local"] + offsets[row["source"]]
        # global ids are disjoint across sources: each source's id range
        # [offset, offset + n_shards) never overlaps another's
        ranges = [
            (offsets[s], offsets[s] + n_shards[s]) for s in n_shards.index
        ]
        for (a1, a2), (b1, b2) in zip(ranges, ranges[1:]):
            assert a2 <= b1


class TestBoilerplate:
    def test_matches_python_recompute(self, spark):
        from drug_target_discovery_spark.queries.quality import _BP_N

        out = {
            r["doc_id"]: r
            for r in all_queries()["boilerplate_ngram_stats"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "documents")
            .select("doc_id", "source", "text")
            .toPandas()
        )
        grams: dict = {}
        for _, row in pdf.iterrows():
            w = row["text"].split(" ")
            gs = {
                " ".join(w[i : i + _BP_N]) for i in range(len(w) - _BP_N + 1)
            }
            if len(w) >= _BP_N:
                grams[row["doc_id"]] = (row["source"], gs)
        df: dict = {}
        for _, (src, gs) in grams.items():
            for g in gs:
                df[(src, g)] = df.get((src, g), 0) + 1
        assert len(out) == len(grams)
        for doc_id, (src, gs) in grams.items():
            n_shared = sum(1 for g in gs if df[(src, g)] >= 2)
            r = out[doc_id]
            assert r["n_grams"] == len(gs)
            assert r["n_shared"] == n_shared
            assert r["is_templated"] == int(4 * n_shared >= len(gs))


class TestHybridRetrieval:
    def test_ranking_invariants_and_cosine(self, spark):
        rows = all_queries()["hybrid_retrieval_rerank"].fn(spark, SF).collect()
        assert rows, "lexical candidates expected at sf0.001"
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        hybrids = [r["hybrid"] for r in rows]
        assert hybrids == sorted(hybrids, reverse=True)
        # cosine recomputed in numpy for the returned docs
        emb = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in load_table(spark, SF, "embeddings").collect()
        }
        q = emb[0]
        for r in rows:
            e = emb[r["doc_id"]]
            ref = float(e @ q / (np.linalg.norm(e) * np.linalg.norm(q)))
            assert r["cosine"] == pytest.approx(ref, abs=1.1e-6)
