"""Window-function + advanced-aggregation coverage: moving averages,
cumulative sums, CUBE, approx distinct — the remaining §2.5/§2.8/§2.9
analytics shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


@register(
    "moving_avg_daily_revenue",
    tags=("window",),
    oracle=f"""
    WITH daily AS (
      -- daily revenue is rounded BEFORE the running aggregates: the raw sums
      -- differ between engines at ulp level, and a cumulative sum amplifies
      -- that across thousands of rows; rounded inputs accumulate identically
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 day', l_shipdate))) AS BIGINT) AS day_s,
             {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
      FROM lineitem GROUP BY 1
    )
    SELECT day_s,
           {rnd_sql("revenue", 2)} AS revenue,
           {rnd_sql("avg(revenue) OVER (ORDER BY day_s ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 2)} AS revenue_7d_avg,
           {rnd_sql("sum(revenue) OVER (ORDER BY day_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS revenue_cum
    FROM daily
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average + cumulative revenue over daily buckets:
    aggregate first (the window then runs on ~2.5K rows, not 600K), running
    ROWS frames only (O(n) incremental evaluation)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.unix_timestamp(F.date_trunc("day", "l_shipdate")).alias("day_s"))
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    # unpartitioned windows bounded: input = daily table, fixed TPC-H
    # calendar span (~2,400 rows at every SF)
    w7 = W.orderBy("day_s").rowsBetween(-6, 0)
    wc = W.orderBy("day_s").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day_s",
        rnd("revenue", 2).alias("revenue"),
        rnd(F.avg("revenue").over(w7), 2).alias("revenue_7d_avg"),
        rnd(F.sum("revenue").over(wc), 2).alias("revenue_cum"),
    )


@register(
    "cube_order_stats",
    tags=("agg", "cube"),
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS grp_id,
           count(*) AS n_orders,
           {rnd_sql("avg(o_totalprice)", 4)} AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() markers — all 2^2 aggregation granularities in
    one pass (map-side grouping-set expansion, single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.avg("o_totalprice"), 4).alias("avg_price"),
            (
                F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")
            ).alias("grp_id"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "grp_id",
            "n_orders",
            "avg_price",
        )
    )


@register(
    "grouping_sets_ship_stats",
    tags=("agg", "groupingsets"),
    oracle=f"""
    SELECT coalesce(l_linestatus, 'ALL') AS linestatus,
           coalesce(l_returnflag, 'ALL') AS returnflag,
           grouping(l_linestatus) + 2 * grouping(l_returnflag) AS grp_id,
           count(*) AS n_items,
           {rnd_sql("sum(l_quantity)", 2)} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_linestatus, l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_ship_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A10): the three granularities the report needs
    and none of the 2^n CUBE would add — one shuffle, map-side expansion
    only into the requested sets (at 100 TB, CUBE over k columns multiplies
    shuffle volume 2^k; GROUPING SETS keeps it |sets|)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_linestatus", "l_returnflag"], ["l_linestatus"], []],
            "l_linestatus",
            "l_returnflag",
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            (
                F.grouping("l_linestatus") + 2 * F.grouping("l_returnflag")
            ).alias("grp_id"),
        )
        .select(
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            "grp_id",
            "n_items",
            "sum_qty",
        )
    )


@register(
    "approx_distinct_parts",
    tags=("agg", "approx"),
    oracle="""
    -- The HLL estimate itself is engine-specific and cannot hash-match, so
    -- the contract under test is BOUNDED ERROR: the Spark side emits the
    -- exact count plus a within_5pct flag computed from its own sketch, and
    -- the oracle asserts the exact column and that every group's estimate
    -- honored the bound (rsd=0.02 => 5% is ~2.5 sigma; a sketch drifting
    -- past it flips the flag and fails the hash-match).
    SELECT l_suppkey,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_suppkey
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per supplier (A10 approx family),
    with a bounded-error oracle: emits the exact countDistinct alongside a
    within_5pct flag (|approx - exact| / exact <= 0.05) so the driver can
    verify the sketch's error bound even though the estimate itself is
    engine-specific. Unit tests additionally assert the <=5% relative error
    on the raw estimates. At 100 TB the sketch is the difference between a
    mergeable fixed-size aggregate and a full distinct shuffle.

    The exact and approx aggregates are computed in separate passes and
    joined on the group key: a distinct aggregate mixed with a non-distinct
    one forces Expand planning (every input row duplicated per aggregate
    branch) — 5x slower here, and at scale an Expand doubles shuffle volume."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_suppkey").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )
    exact = li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return approx.join(exact, "l_suppkey").select(
        "l_suppkey",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_5pct"),
    )


@register(
    "ntile_price_bands",
    tags=("window",),
    oracle=f"""
    WITH banded AS (
      SELECT p_partkey, p_retailprice,
             ntile(10) OVER (ORDER BY p_retailprice ASC, p_partkey ASC) AS band
      FROM part
    )
    SELECT band, count(*) AS n,
           {rnd_sql("min(p_retailprice)", 2)} AS lo,
           {rnd_sql("max(p_retailprice)", 2)} AS hi
    FROM banded GROUP BY band
    """,
)
def ntile_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding via ntile + per-band stats (rank-family window
    coverage; deterministic tie-break so both engines tile identically)."""
    part = load_table(spark, sf_dir, "part")
    # unpartitioned ntile bounded: input = part DIMENSION (rank-family
    # demo); at fact scale use the bucket+offset global-rank plan
    # (revenue_pareto_deciles)
    w = W.orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    banded = part.select("p_partkey", "p_retailprice", F.ntile(10).over(w).alias("band"))
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.min("p_retailprice"), 2).alias("lo"),
        rnd(F.max("p_retailprice"), 2).alias("hi"),
    )
