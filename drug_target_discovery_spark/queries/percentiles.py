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
    # one array-probability percentile: a single sorted buffer per group
    # instead of four independent ones (see approx_quantile_sketch_bounded)
    return (
        part.groupBy("p_brand")
        .agg(
            F.percentile(
                "p_retailprice",
                F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75), F.lit(0.95)),
            ).alias("_q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "p_brand",
            rnd(F.col("_q")[0], 4).alias("p25"),
            rnd(F.col("_q")[1], 4).alias("p50"),
            rnd(F.col("_q")[2], 4).alias("p75"),
            rnd(F.col("_q")[3], 4).alias("p95"),
            "n",
        )
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


@register(
    "approx_quantile_sketch_bounded",
    tags=("agg", "approx", "sketch"),
    oracle=f"""
    -- The GK-sketch estimates are engine-specific and cannot hash-match, so
    -- the contract under test is BOUNDED RANK ERROR (the approx_distinct
    -- pattern): the Spark side emits exact quantiles plus flags asserting
    -- its own sketch landed inside the +-2*eps rank bracket; the oracle
    -- asserts the exact columns and that every flag is TRUE.
    SELECT l_returnflag,
           count(*) AS n,
           {rnd_sql("quantile_cont(l_extendedprice, 0.50)", 4)} AS exact_p50,
           {rnd_sql("quantile_cont(l_extendedprice, 0.95)", 4)} AS exact_p95,
           TRUE AS p50_in_bracket,
           TRUE AS p95_in_bracket
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantile_sketch_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch with a bounded-error oracle: per group,
    ``approx_percentile(x, p, accuracy)`` (Greenwald-Khanna; rank error
    eps <= 1/accuracy) next to the exact ``percentile`` — the driver-
    checkable flags assert the sketch value lies inside the interpolated
    [p - 2*eps, p + 2*eps] quantile bracket (2x margin converts GK's
    discrete-rank guarantee into the continuous bracket both engines can
    compute). At 100 TB the sketch is the operative path — a fixed-size
    mergeable aggregate per partition, no per-group sort — and this query
    is the harness that proves its error budget instead of trusting it.
    Exact and approx aggregates run in separate passes joined on the key:
    mixing them in one agg forces Expand planning (approx_distinct_parts
    has the measurement)."""
    eps = 1.0 / 100.0  # accuracy=100
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.50), F.lit(100)).alias("a50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(100)).alias("a95"),
    )
    # ONE percentile aggregate with an array of probabilities: six separate
    # percentile() expressions each keep their own full-group buffer and
    # sort it independently (~6x the work and memory); the array form sorts
    # once and reads all six order statistics out of it.
    ps = [0.50 - 2 * eps, 0.50, 0.50 + 2 * eps, 0.95 - 2 * eps, 0.95,
          min(0.95 + 2 * eps, 1.0)]
    exact = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(p) for p in ps])
            ).alias("_q"),
        )
        .select(
            "l_returnflag",
            "n",
            F.col("_q")[0].alias("lo50"),
            rnd(F.col("_q")[1], 4).alias("exact_p50"),
            F.col("_q")[2].alias("hi50"),
            F.col("_q")[3].alias("lo95"),
            rnd(F.col("_q")[4], 4).alias("exact_p95"),
            F.col("_q")[5].alias("hi95"),
        )
    )
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "n",
        "exact_p50",
        "exact_p95",
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias(
            "p50_in_bracket"
        ),
        ((F.col("a95") >= F.col("lo95")) & (F.col("a95") <= F.col("hi95"))).alias(
            "p95_in_bracket"
        ),
    )
