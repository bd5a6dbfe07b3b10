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


class TestZorderLayout:
    def test_matches_numpy_recompute(self, spark):
        out = {
            r["file_id"]: r
            for r in all_queries()["zorder_file_layout"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "lineitem")
            .select("l_partkey", "l_suppkey")
            .toPandas()
        )
        p, s = pdf["l_partkey"].to_numpy(), pdf["l_suppkey"].to_numpy()

        def bucket(x):
            lo, hi = int(x.min()), int(x.max())
            return (x.astype("int64") - lo) * 1023 // max(hi - lo, 1)

        bx, by = bucket(p), bucket(s)
        z = np.zeros(len(bx), dtype="int64")
        for i in range(10):
            z |= ((bx >> i) & 1) << (2 * i)
            z |= ((by >> i) & 1) << (2 * i + 1)
        fid = z >> 14
        assert set(out) == set(np.unique(fid))
        for f in np.unique(fid):
            m = fid == f
            r = out[int(f)]
            assert r["n_rows"] == int(m.sum())
            assert (r["part_lo"], r["part_hi"]) == (int(p[m].min()), int(p[m].max()))
            assert (r["supp_lo"], r["supp_hi"]) == (int(s[m].min()), int(s[m].max()))

    def test_interleave_bit_algebra(self):
        # bx=0b1111111111 on even positions, by=0 -> z = 0b0101...01
        from drug_target_discovery_spark.queries.layout import _interleave_duck

        import duckdb

        z = duckdb.sql(
            f"SELECT {_interleave_duck('1023', '0')} AS z, "
            f"{_interleave_duck('0', '1023')} AS z2, "
            f"{_interleave_duck('1023', '1023')} AS z3"
        ).fetchone()
        assert z[0] == int("01" * 10, 2)
        assert z[1] == int("10" * 10, 2)
        assert z[2] == (1 << 20) - 1

    def test_plan_single_rollup_exchange_broadcast_extent(self, spark):
        # the 1-row extent reaches the fact via broadcast (BNLJ cross join);
        # the only hash exchange is the 64-file rollup; the fact never
        # shuffles and never joins by sort-merge
        from tests.test_plans import plan_of

        plan = plan_of(spark, "zorder_file_layout")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan


class TestBigramPmi:
    def test_matches_python_recompute(self, spark):
        import math
        from collections import Counter

        out = {
            (r["tok_a"], r["tok_b"]): r
            for r in all_queries()["bigram_pmi_collocations"].fn(spark, SF).collect()
        }
        texts = [
            r["text"] for r in load_table(spark, SF, "documents").select("text").collect()
        ]
        uni, bi = Counter(), Counter()
        for t in texts:
            toks = [w for w in t.split(" ") if w]
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        n, m = float(sum(uni.values())), float(sum(bi.values()))
        expect = {p: c for p, c in bi.items() if c >= 5}
        assert set(out) == set(expect)
        for (a, b), c in expect.items():
            r = out[(a, b)]
            assert r["c_ab"] == c
            pmi = math.log(((((float(c) * n) * n) / m) / uni[a]) / uni[b])
            assert r["pmi_micro"] == math.floor(pmi * 1e6 + 0.5)

    def test_plan_broadcast_vocab_no_smj(self, spark):
        from tests.test_plans import plan_of

        plan = plan_of(spark, "bigram_pmi_collocations")
        assert "SortMergeJoin" not in plan, plan
        assert plan.count("BroadcastHashJoin") >= 2, plan  # ua and ub


class TestWinsorized:
    def test_matches_numpy_recompute(self, spark):
        out = {
            r["l_returnflag"]: r
            for r in all_queries()["winsorized_price_stats"].fn(spark, SF).collect()
        }
        pdf = (
            load_table(spark, SF, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .toPandas()
        )
        for flag, g in pdf.groupby("l_returnflag"):
            x = g["l_extendedprice"].to_numpy()
            p05, p95 = np.quantile(x, 0.05), np.quantile(x, 0.95)
            r = out[flag]
            assert r["n"] == len(x)
            assert r["n_clipped_lo"] == int((x < p05).sum())
            assert r["n_clipped_hi"] == int((x > p95).sum())
            w = np.clip(x, p05, p95)
            wq = np.floor(w * 1e6 + 0.5).sum()
            assert r["winsorized_mean"] == pytest.approx(wq / 1e6 / len(x), abs=1e-4)
            cents = np.floor(x * 100.0 + 0.5).sum()
            assert r["raw_mean"] == pytest.approx(cents / 100.0 / len(x), abs=1e-4)

    def test_plan_bounds_broadcast_fact_never_shuffles_for_join(self, spark):
        from tests.test_plans import plan_of

        plan = plan_of(spark, "winsorized_price_stats")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 2, plan


class TestEventTransitions:
    def test_matches_python_recompute(self, spark):
        from collections import Counter, defaultdict

        out = {
            (r["from_type"], r["to_type"]): r
            for r in all_queries()["event_transition_matrix"].fn(spark, SF).collect()
        }
        rows = (
            load_table(spark, SF, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        by_user = defaultdict(list)
        for r in rows:
            by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
        trans = Counter()
        for seq in by_user.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                trans[(a, b)] += 1
        assert set(out) == set(trans)
        totals = Counter()
        for (a, _), c in trans.items():
            totals[a] += c
        import math

        for (a, b), c in trans.items():
            r = out[(a, b)]
            assert r["n_transitions"] == c
            assert r["p_micro"] == math.floor(c / float(totals[a]) * 1e6 + 0.5)

    def test_plan_one_fact_shuffle(self, spark):
        # the fact shuffles once (user window); the transition table and
        # the normalizing window are k^2-sized
        from tests.test_plans import plan_of

        plan = plan_of(spark, "event_transition_matrix")
        assert "SortMergeJoin" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 3, plan


class TestDsirBigrams:
    def test_bigram_edge_cases(self, spark):
        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.selection import _BIGRAMS_SPARK

        rows = [
            ("",),                 # empty text -> no bigrams
            ("one",),              # single token -> no bigrams
            ("a b",),              # one bigram
            ("a  b",),             # double space: empty middle token dropped pairwise
            ("x y z",),            # two bigrams
        ]
        df = spark.createDataFrame(rows, "text STRING").select(
            F.split(F.col("text"), " ").alias("_a")
        )
        got = [r[0] for r in df.select(F.expr(_BIGRAMS_SPARK)).collect()]
        assert got == [[], [], ["a b"], [], ["x y", "y z"]]

    def test_bigram_duckdb_parity(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.selection import (
            _BIGRAMS_DUCK,
            _BIGRAMS_SPARK,
        )

        texts = ["", "one", "a b", "a  b", "x y z", "  ", "p q r s"]
        df = spark.createDataFrame([(t,) for t in texts], "text STRING").select(
            F.split(F.col("text"), " ").alias("_a")
        )
        got_spark = [r[0] for r in df.select(F.expr(_BIGRAMS_SPARK)).collect()]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {_BIGRAMS_DUCK} FROM (SELECT string_split(?, ' ') AS a)",
                [t],
            ).fetchone()[0]
            for t in texts
        ]
        assert got_spark == got_duck


class TestFinalBatchPlans:
    def test_rrf_truncates_before_rank_windows(self, spark):
        # each list must TakeOrdered to the constant cutoff BEFORE its
        # row_number window — the window may never see the corpus
        from tests.test_plans import plan_of

        plan = plan_of(spark, "reciprocal_rank_fusion")
        assert plan.count("TakeOrderedAndProject") >= 3, plan  # 2 lists + final

    def test_benford_single_fact_scan(self, spark):
        # the 9-row digit-count table is scope-cached, so both consumers
        # (total + per-digit rows) read the cache, not a second scan.
        # NOTE: InMemoryRelation nodes PRINT their cached child plan, so
        # the FileScan string appears once per consumer — assert on the
        # cache wiring, not the raw substring count.
        from tests.test_plans import plan_of

        plan = plan_of(spark, "benford_first_digit_check")
        assert "InMemoryTableScan" in plan, plan

    def test_cuped_single_user_exchange(self, spark):
        # one user-key shuffle; the scope-cached per-user table feeds both
        # the theta fit and the arm readout without a second fact scan
        # (each InMemoryTableScan consumer re-prints the cached FileScan,
        # so substring-counting scans would double-count)
        from tests.test_plans import plan_of

        plan = plan_of(spark, "cuped_experiment_readout")
        assert plan.count("InMemoryTableScan") >= 2, plan
        assert "hashpartitioning(user_id" in plan, plan

    def test_hard_negative_broadcast_anchors(self, spark):
        # the bounded anchor set broadcasts; candidates never shuffle
        # before the per-anchor window
        from tests.test_plans import plan_of

        plan = plan_of(spark, "hard_negative_mining")
        assert "BroadcastNestedLoopJoin" in plan, plan

    def test_calibration_bounded_shuffle(self, spark):
        # extent is a 1-row broadcast; the only wide exchange feeds the
        # 10-row bin aggregate
        from tests.test_plans import plan_of

        plan = plan_of(spark, "calibration_curve_bins")
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
