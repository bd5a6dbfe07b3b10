"""Exact percentile aggregation + time-range join — the last §2.5/§2.4
coverage pieces."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


@register(
    "price_percentiles_by_brand",
    tags=("agg", "percentile"),
    oracle=f"""
    SELECT p_brand,
           {rnd_sql("quantile_cont(p_retailprice, 0.25)", 4)} AS p25,
           {rnd_sql("quantile_cont(p_retailprice, 0.50)", 4)} AS p50,
           {rnd_sql("quantile_cont(p_retailprice, 0.75)", 4)} AS p75,
           {rnd_sql("quantile_cont(p_retailprice, 0.95)", 4)} AS p95,
           count(*) AS n
    FROM part GROUP BY p_brand
    """,
)
def price_percentiles_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (A1's median generalized):
    Spark `percentile` == DuckDB `quantile_cont` definitionally. For
    100 TB-scale hot paths swap in `approx_percentile` (t-digest sketch,
    mergeable) — exact here because the oracle hash demands it."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        rnd(F.percentile("p_retailprice", F.lit(0.25)), 4).alias("p25"),
        rnd(F.percentile("p_retailprice", F.lit(0.50)), 4).alias("p50"),
        rnd(F.percentile("p_retailprice", F.lit(0.75)), 4).alias("p75"),
        rnd(F.percentile("p_retailprice", F.lit(0.95)), 4).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_in_purchase_hour",
    tags=("events", "rangejoin"),
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id,
           count(*) AS n_prior_events,
           count(CASE WHEN e.event_type = 'view' THEN 1 END) AS n_prior_views
    FROM purchases p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.pts - INTERVAL '1 hour'
     AND e.ts < p.pts
    GROUP BY p.purchase_id
    """,
)
def events_in_purchase_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range (interval) join: events in the hour before each purchase,
    per user. The equi key (user_id) carries the join; the range predicate
    filters inside each key group — never a cross join. At 100 TB the
    standard upgrade is bucketizing time into epochs and adding the bucket
    to the equi key, bounding each probe to O(window/bucket) buckets."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    joined = purchases.alias("p").join(
        ev.select("user_id", "ts", "event_type").alias("e"),
        (F.col("e.user_id") == F.col("p.user_id"))
        & (F.col("e.ts") >= F.col("p.pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e.ts") < F.col("p.pts")),
    )
    return joined.groupBy("p.purchase_id").agg(
        F.count(F.lit(1)).alias("n_prior_events"),
        F.count(F.when(F.col("e.event_type") == "view", 1)).alias("n_prior_views"),
    )
