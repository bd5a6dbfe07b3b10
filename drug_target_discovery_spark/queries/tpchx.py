"""Decision-support extras (SURVEY §2 J/A/K families, deeper coverage):
promo revenue share, small-lot correlated-subquery revenue, large-order
top-k — TPC-H Q14/Q17/Q18 shapes over the testdata star schema.

These exercise plan patterns the core registry doesn't yet pin: a
conditional-aggregate ratio over a broadcast dim join (Q14), an explicitly
decorrelated per-key scalar subquery (Q17 — the correlated `l_quantity <
0.2*avg(...)` becomes one extra aggregation + a co-partitioned join on the
SAME key, so Catalyst reuses the shuffle), and a filter-first star join
where every post-aggregation side is broadcast (Q18).

No reference counterpart (relational-engine breadth, SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional aggregate over broadcast join)
# --------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    tags=("relational", "join", "agg"),
    oracle=f"""
    SELECT
      {rnd_sql(
        "100.0 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount))", 4)} AS promo_share,
      count(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of revenue from PROMO parts in one year.
    The date filter is pushed to the parquet scan; part is broadcast (dim);
    the whole query is a single map-side conditional sum — zero shuffles
    beyond the final singleton aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            rnd(100.0 * promo / F.sum(rev), 4).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Q17 shape: small-lot revenue (decorrelated per-key scalar subquery)
# --------------------------------------------------------------------------
@register(
    "small_lot_revenue",
    tags=("relational", "subquery", "agg"),
    oracle=f"""
    WITH th AS (
      SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS thr
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           {rnd_sql("sum(l_extendedprice) / 7.0", 0)} AS avg_yearly,
           count(*) AS n_small_lots
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN th ON t_partkey = l_partkey
    WHERE l_quantity < thr
    GROUP BY p_brand
    """,
)
def small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, decorrelated: revenue from lineitems below 20% of
    their part's average quantity, by brand.

    The correlated scalar subquery is expressed as its decorrelated plan:
    one aggregation of lineitem by l_partkey produces the threshold table,
    which joins back to lineitem ON THE SAME KEY — under AQE both sides
    share the l_partkey hash partitioning, so the join adds no extra
    shuffle of the fact table. part is broadcast. The thresholds are exact
    across engines: integer-valued quantities sum exactly in doubles, so
    avg and the 0.2× product are bit-identical and the `<` predicate cannot
    diverge.

    avg_yearly rounds an absolute double SUM, whose cross-engine
    summation-order error grows with group size (~n·eps·sum: ~4e-5 at
    sf0.01, ~4e-3 at sf1) — so it is rounded to whole units, keeping the
    boundary-mismatch probability ~2·err/1 negligible at every SF the
    harness runs, where 2-decimal rounding would start flipping at sf≳1."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    th = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("thr")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(th, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("thr"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            rnd(F.sum("l_extendedprice") / 7.0, 0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lots"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders top-k (filter-first star join)
# --------------------------------------------------------------------------
@register(
    "large_quantity_orders",
    tags=("relational", "topk", "join"),
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
           {rnd_sql("o_totalprice", 2)} AS o_totalprice,
           {rnd_sql("sum_qty", 1)} AS sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed 250 total units,
    ranked by order value — top-100 with a deterministic orderkey
    tie-break.

    Scale shape: the quantity aggregation (map-side partial sum) shrinks
    lineitem to the qualifying orders BEFORE any join. The qualifying set
    is selective but corpus-proportional (orders above the threshold grow
    linearly with the fact table), so neither join side carries a forced
    broadcast hint — AQE broadcasts the filtered side while it fits and
    degrades to a shuffle join on the order/customer key beyond that,
    which is the correct 100 TB behavior. The final sort is
    TakeOrderedAndProject (top-k per partition + driver merge), never a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    out = joined.join(cust, F.col("c_custkey") == F.col("o_custkey"))
    return (
        out.select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_s"),
            rnd("o_totalprice", 2).alias("o_totalprice"),
            rnd("sum_qty", 1).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
