"""Sink tests: CSV round-trip, GEXF emission, and the bucketing scale
property — a join of two tables bucketed on the join key runs with NO
shuffle exchange (the 100 TB co-location tool)."""

from pyspark.sql import functions as F

from drug_target_discovery_spark.sources.sinks import (
    write_csv,
    write_gexf,
    write_parquet,
    write_summary_report,
)
from drug_target_discovery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


class TestSinks:
    def test_csv_roundtrip(self, spark, tmp_path):
        df = load_table(spark, SF, "nation")
        path = str(tmp_path / "nation_csv")
        write_csv(df, path, single_file=True)
        back = spark.read.option("header", True).csv(path)
        assert back.count() == df.count()
        assert set(back.columns) == set(df.columns)

    def test_gexf_structure(self, spark, tmp_path):
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "node INT")
        edges = spark.createDataFrame([(1, 2, 0.9), (2, 3, 0.8)], "src INT, dst INT, weight DOUBLE")
        path = str(tmp_path / "g.gexf")
        write_gexf(nodes, edges, path)
        txt = open(path).read()
        assert txt.count("<node ") == 3 and txt.count("<edge ") == 2
        assert 'weight="0.9"' in txt

    def test_summary_report(self, spark, tmp_path):
        path = str(tmp_path / "summary.txt")
        write_summary_report(
            {"Counts": {"a": 1}, "Top": load_table(spark, SF, "region")}, path
        )
        txt = open(path).read()
        assert "== Counts ==" in txt and "a: 1" in txt and "r_name" in txt

    def test_partitioned_parquet_prunes(self, spark, tmp_path):
        df = load_table(spark, SF, "orders").withColumn(
            "status", F.col("o_orderstatus")
        )
        path = str(tmp_path / "orders_part")
        write_parquet(df, path, partition_by=["status"])
        back = spark.read.parquet(path).filter(F.col("status") == "F")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(status" in plan, plan

    def test_bucketed_join_no_shuffle(self, spark):
        """Both sides bucketed+sorted on the join key -> SortMergeJoin with
        ZERO Exchange operators: the pre-shuffle is amortized at write time."""
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        try:
            li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
            ords = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
            (
                li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
                .saveAsTable("li_b")
            )
            (
                ords.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
                .saveAsTable("ord_b")
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = spark.table("li_b").join(
                spark.table("ord_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange hashpartitioning" not in plan, plan
            assert j.count() == load_table(spark, SF, "lineitem").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS ord_b")


class TestApproxDistinct:
    def test_hll_error_bound(self, spark):
        from drug_target_discovery_spark.queries.registry import all_queries

        q = all_queries()["approx_distinct_parts"]
        rows = q.fn(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["within_5pct"], r["l_suppkey"]


class TestJsonlRoundtrip:
    def test_jsonl_roundtrip_preserves_rows(self, spark, tmp_path):
        from drug_target_discovery_spark.sources.sinks import read_jsonl, write_jsonl

        df = spark.createDataFrame(
            [(1, "hello world", "en"), (2, 'quote " and\ttab', "de"), (3, None, "fr")],
            "doc_id BIGINT, text STRING, lang STRING",
        )
        path = str(tmp_path / "docs_jsonl")
        write_jsonl(df, path)
        back = read_jsonl(spark, path, schema="doc_id BIGINT, text STRING, lang STRING")
        got = sorted((r["doc_id"], r["text"], r["lang"]) for r in back.collect())
        assert got == [(1, "hello world", "en"), (2, 'quote " and\ttab', "de"), (3, None, "fr")]


class TestIdempotentBackfill:
    def test_dynamic_partition_overwrite_replaces_only_touched_day(self, spark, tmp_path):
        """The idempotent-backfill contract: with partitionOverwriteMode=
        dynamic, rewriting ONE date partition replaces exactly that
        partition and leaves every other day's data untouched — the
        property that makes a nightly job safe to re-run blindly.
        (Static mode — the default — would truncate the whole table.)"""
        from pyspark.sql import functions as F

        from drug_target_discovery_spark.sources.tables import load_table

        out = str(tmp_path / "events_by_day")
        ev = load_table(spark, SF, "events").withColumn(
            "day", F.to_date("ts")
        )
        ev.write.partitionBy("day").mode("overwrite").parquet(out)
        before = spark.read.parquet(out)
        n_total = before.count()
        day = before.select("day").orderBy("day").first()["day"]
        n_day = before.filter(F.col("day") == day).count()
        assert 0 < n_day < n_total

        # backfill that day with a marker value, dynamic overwrite
        patch = (
            ev.filter(F.col("day") == day)
            .withColumn("value", F.lit(-1.0))
        )
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            patch.write.partitionBy("day").mode("overwrite").parquet(out)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

        after = spark.read.parquet(out)
        assert after.count() == n_total  # nothing else truncated
        assert after.filter(F.col("day") == day).count() == n_day
        assert (
            after.filter((F.col("day") == day) & (F.col("value") != -1.0)).count()
            == 0
        )
        # untouched days keep their original values
        assert (
            after.filter((F.col("day") != day) & (F.col("value") == -1.0)).count()
            == 0
        )

    def test_merge_schema_reads_evolved_parquet(self, spark, tmp_path):
        """Schema evolution (the 100 TB ingest reality: a column added
        mid-corpus): two parquet generations with different schemas read
        as ONE table under mergeSchema — old rows surface NULL for the
        new column, and plain reads without the option see only the
        footer-sampled schema (the silent-drop failure mode this pins)."""
        base = str(tmp_path / "evolved")
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id BIGINT, text STRING"
        )
        v2 = spark.createDataFrame(
            [(3, "c", "en"), (4, "d", "fr")],
            "doc_id BIGINT, text STRING, lang STRING",
        )
        v1.write.parquet(f"{base}/gen=1")
        v2.write.parquet(f"{base}/gen=2")
        merged = spark.read.option("mergeSchema", "true").parquet(base)
        assert set(merged.columns) == {"doc_id", "text", "lang", "gen"}
        rows = {r["doc_id"]: r for r in merged.collect()}
        assert len(rows) == 4
        assert rows[1]["lang"] is None and rows[3]["lang"] == "en"
        # column pruning still reaches the scan on the merged schema
        plan = (
            merged.select("doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "text" not in plan.split("ReadSchema")[-1], plan
