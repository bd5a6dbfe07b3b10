"""Cache lifecycle: a sweep over the cache-heavy registry queries must not
leak persistent RDDs once the harness releases both tiers (VERDICT r1 #8).

Asserted as a DELTA against the session's pre-existing persistent RDDs so
the check is independent of other test modules' fixtures."""

from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import release_caches, scoped_cache
from drug_target_discovery_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

# every query family that routes something through cache()/localCheckpoint
CACHE_HEAVY = [
    "ngram_jaccard_near_dups",      # operators/dedup shingle diamond
    "minhash_signatures",           # shared signature fixture
    "lsh_candidate_pairs",
    "near_dup_groups",              # scoped candidate cache
    "connected_components_near_dups",  # union-find / label propagation
    "bh_fdr_adjust",                # bh_fdr input cache
    "corr_edges_top_parts",         # shared graph fixture
    "eigenvector_centrality_corr_graph",
    "mllib_minhash_neardups",       # MLlib staged cache
]


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


class TestCacheLifecycle:
    def test_scoped_cache_releases(self, spark):
        before = _persistent_ids(spark)
        df = scoped_cache(spark.range(100).select(F.col("id") * 2))
        df.count()
        assert len(_persistent_ids(spark)) > len(before)
        released = release_caches()
        assert released >= 1
        assert _persistent_ids(spark) <= before

    def test_registry_sweep_leaves_no_new_persistent_rdds(self, spark):
        before = _persistent_ids(spark)
        reg = all_queries()
        for name in CACHE_HEAVY:
            assert name in reg, name
            reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            release_caches()  # per-query tier, as bench.py does
        release_caches(fixtures=True)  # sweep tier, as bench.py does
        leaked = _persistent_ids(spark) - before
        assert not leaked, f"leaked persistent RDD ids: {leaked}"

    def test_fixture_memo_rebuilds_after_release(self, spark):
        """Releasing fixtures clears the memo dicts — a later call must
        rebuild (not serve a dangling unpersisted frame) and still be
        correct."""
        reg = all_queries()
        a = reg["corr_edges_top_parts"].fn(spark, SF).toPandas()
        release_caches(fixtures=True)
        b = reg["corr_edges_top_parts"].fn(spark, SF).toPandas()
        key = ["g1", "g2"]
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True)
        )
        release_caches(fixtures=True)


class TestLoadTablePlanMemo:
    """The lazy-PLAN memo in sources.tables (optimization r13): repeated
    load_table calls must return the SAME DataFrame object (skipping the
    per-call file listing + footer schema read) without caching any DATA —
    executions still scan parquet, and releasing sweep fixtures clears the
    memo so a fresh build happens."""

    def test_same_object_and_no_persisted_data(self, spark):
        from drug_target_discovery_spark.sources.tables import load_table

        before = _persistent_ids(spark)
        a = load_table(spark, SF, "lineitem")
        b = load_table(spark, SF, "lineitem")
        assert a is b  # plan object reused
        a.limit(5).collect()
        # no persistent RDDs appear: the memo holds a lazy plan, not data
        assert _persistent_ids(spark) <= before

    def test_fixture_release_clears_plan_memo(self, spark):
        from drug_target_discovery_spark.sources import tables

        a = tables.load_table(spark, SF, "orders")
        release_caches(fixtures=True)
        assert not tables._PLAN_MEMO
        b = tables.load_table(spark, SF, "orders")
        assert a is not b  # rebuilt after release
        assert a.schema == b.schema

    def test_distinct_dirs_distinct_plans(self, spark):
        from drug_target_discovery_spark.sources.tables import load_table

        a = load_table(spark, SF, "nation")
        b = load_table(spark, "/root/testdata/sf0.01", "nation")
        assert a is not b
        release_caches(fixtures=True)

    def test_rewrite_invalidates_plan(self, spark, tmp_path):
        """Overwriting a table path mid-session must yield a FRESH plan (the
        memoized one captured the old file listing — executing it would hit
        deleted files). Regression for the test_round11_ops overwrite edge;
        the memo keys on the path's (mtime_ns, size) via one local stat."""
        from drug_target_discovery_spark.sources.tables import load_table

        p = str(tmp_path / "t.parquet")
        spark.range(3).write.parquet(p)
        a = load_table(spark, str(tmp_path), "t")
        assert a.count() == 3
        spark.range(7).write.mode("overwrite").parquet(p)
        b = load_table(spark, str(tmp_path), "t")
        assert b is not a
        assert b.count() == 7
        release_caches(fixtures=True)
