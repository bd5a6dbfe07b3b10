"""Decision-support extras (SURVEY §2 J/A/K families, deeper coverage):
TPC-H Q14/Q17/Q18/Q13/Q2/Q22/Q21 shapes over the testdata star schema,
plus a Pareto/Lorenz revenue-concentration analysis.

These exercise the decorrelation and outer-join plan patterns the core
registry doesn't otherwise pin — in every case the DuckDB oracle keeps the
TEXTBOOK correlated form (scalar subquery, EXISTS/NOT EXISTS) while the
Spark side is the decorrelated plan a distributed engine actually wants:

- Q14: conditional-aggregate ratio over a broadcast dim join
- Q17: correlated per-key scalar subquery -> same-key aggregate + join
- Q18: filter-first star join, AQE-adaptive join sides
- Q13: left outer join with the filter in the JOIN CONDITION + histogram
- Q2:  correlated min subquery -> window-min over the aggregated cost table
- Q22: global scalar threshold (exact integer cents) + anti join
- Q21: EXISTS and NOT EXISTS both collapsed into ONE per-order aggregate
- Pareto deciles: exact global ranks via monotone-bucket + offset table,
  never an empty-partitionBy window

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


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join + histogram)
# --------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    tags=("relational", "join", "agg"),
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... non-urgent
    orders — the left-outer-join + double-aggregation pattern (the filter
    lives in the JOIN CONDITION, not a WHERE, so order-less customers
    survive into the c_count=0 bucket).

    Scale shape: one shuffle co-partitions customer and the filtered
    orders on the customer key; the per-customer count reuses that
    partitioning (no second fact exchange), and the final histogram
    aggregate is bounded by the maximum order count per customer, not the
    corpus. Neither side carries a broadcast hint — both scale with SF."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part (correlated scalar subquery,
# decorrelated as a window-min)
# --------------------------------------------------------------------------
_Q2_REGION = "EUROPE"
_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10


@register(
    "min_cost_part_supplier",
    tags=("relational", "subquery", "window", "topk"),
    oracle=f"""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = '{_Q2_REGION}'
      GROUP BY 1, 2
    )
    SELECT {rnd_sql("s_acctbal", 2)} AS s_acctbal, s_name, n_name, p_partkey,
           {rnd_sql("unit_cost", 6)} AS unit_cost
    FROM costs
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}
      AND unit_cost = (
        SELECT min(c2.unit_cost) FROM costs c2 WHERE c2.l_partkey = costs.l_partkey
      )
    ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
)
def min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the cheapest regional
    supplier (effective unit cost = min lineitem price/quantity). The
    oracle keeps the textbook CORRELATED scalar subquery; the Spark plan
    is its decorrelated form — a min window over the part key on the
    already-aggregated cost table, so the per-part minimum costs no join
    and no second aggregation.

    Scale shape: the only fact shuffle is the (part, supplier) cost
    aggregation; the window reuses nothing bigger than that aggregate.
    supplier/nation/region prune the fact BEFORE aggregation (region is a
    5-row bounded broadcast; supplier joins stay adaptive). Equality on
    the min is float-safe: both engines take min over the identical set
    of IEEE division results, so the selected double is bit-identical.
    Top-100 is TakeOrderedAndProject with a unique (s_name, p_partkey)
    tie-break."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    regional_supp = (
        supp.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(regional_supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = W.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE))
        .select("p_partkey")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(regional_supp, best.l_suppkey == regional_supp.s_suppkey)
        .select(
            rnd("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            rnd("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 shape: wealthy inactive customers (global scalar aggregate + anti join)
# --------------------------------------------------------------------------
_Q22_SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY")
_Q22_CUTOFF = "2000-01-01"  # "inactive" = no order on/after this date


@register(
    "wealthy_inactive_customers",
    tags=("relational", "subquery", "agg"),
    oracle=f"""
    WITH seg AS (
      SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
      WHERE c_mktsegment IN {str(_Q22_SEGMENTS)}
    ),
    thr AS (
      SELECT sum(cents) * 1.0 / count(*) AS avg_cents
      FROM seg WHERE cents > 0
    )
    SELECT n_name,
           count(*) AS n_custs,
           {rnd_sql("sum(cents) / 100.0", 2)} AS total_acctbal
    FROM seg CROSS JOIN thr
    JOIN nation ON n_nationkey = c_nationkey
    WHERE cents > avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
      )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, the customers in selected market
    segments whose balance beats the segment average (positive balances
    only) and who placed no order since {_Q22_CUTOFF} (in this testdata
    every customer has SOME order, so lifetime inactivity would be the
    empty set — the recency filter keeps the anti join meaningfully
    exercised). The oracle keeps the textbook NOT EXISTS; Spark plans it
    as a left-anti join on the customer key with the date predicate
    pushed to the orders scan.

    Float-safe threshold: balances are quantized to integer cents
    map-side, the average is an exact BIGINT sum over a deterministic
    division, so the `>` comparison cannot diverge between engines. The
    average is a 1-row bounded broadcast; the anti join stays adaptive
    (orders scales with SF); nation is a bounded broadcast dim."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(*_Q22_SEGMENTS))
        .select(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    thr = cust.filter(F.col("cents") > 0).agg(
        (F.sum("cents") * 1.0 / F.count(F.lit(1))).alias("avg_cents")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.crossJoin(F.broadcast(thr)).filter(F.col("cents") > F.col("avg_cents"))
    inactive = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        inactive.join(F.broadcast(nation), inactive.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            rnd(F.sum("cents") / 100.0, 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q21 shape: solely-late supplier in multi-supplier orders
# (EXISTS + NOT EXISTS, decorrelated to one per-order aggregate)
# --------------------------------------------------------------------------
_LATE_DAYS = 90


@register(
    "late_sole_supplier_orders",
    tags=("relational", "subquery", "agg", "topk"),
    oracle=f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    late AS (
      SELECT * FROM l WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
    )
    SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def late_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper
    (ship > order date + {_LATE_DAYS} days) in a multi-supplier order.
    The oracle keeps the textbook EXISTS + NOT EXISTS pair; the Spark
    plan decorrelates BOTH into per-order aggregation —
    n_suppliers > 1 (the EXISTS), exactly one late supplier (the NOT
    EXISTS), and that supplier's id via a conditional max — so the fact
    table is scanned once and never self-joined.

    The aggregation is TWO-LEVEL on purpose: a (order, supplier)
    pre-aggregate (any_late flag) followed by plain counts per order.
    The single-level form needs two DISTINCT aggregates, which Spark
    plans as an Expand tripling every fact row before the shuffle —
    measured 2.1x slower at sf0.1 (2.9s vs 1.4s warm) for identical
    results; the two-level form shuffles each (order, supplier) pair
    once and each order once.

    Scale shape: one orderkey-prefixed shuffle chain (lineitem ⋈ orders
    co-partition, the pair aggregate, the per-order rollup); the
    qualifying-order set collapses to (supplier, count) before the
    bounded supplier-name join. No forced broadcasts — every
    data-proportional side stays adaptive."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_LATE_DAYS} DAYS"
    )
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("any_late"))
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supps"),
            F.sum("any_late").alias("n_late"),
            F.max(
                F.when(F.col("any_late") == 1, F.col("l_suppkey"))
            ).alias("late_supp"),
        )
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Pareto / Lorenz revenue concentration by customer decile
# (exact global ranks WITHOUT a global sort: monotone bucket + offset table)
# --------------------------------------------------------------------------
_PARETO_BUCKET_CENTS = 10_000_000  # $100k revenue buckets for rank parallelism


@register(
    "revenue_pareto_deciles",
    tags=("relational", "window", "agg", "scalable"),
    oracle=f"""
    WITH r AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT o_custkey, cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey ASC) AS rnk
      FROM r
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot FROM r),
    d AS (
      SELECT CAST(floor((rnk - 1) * 10.0 / n) + 1 AS INT) AS decile, cents, tot
      FROM rk CROSS JOIN t
    )
    SELECT decile,
           count(*) AS n_customers,
           {rnd_sql("sum(cents) / 100.0", 2)} AS decile_revenue,
           {rnd_sql("sum(cents) * 1.0 / any_value(tot)", 6)} AS revenue_share
    FROM d GROUP BY decile ORDER BY decile
    """,
)
def revenue_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/Lorenz): customers ranked by lifetime
    revenue, cut into population deciles, each decile's share of total
    revenue — the `top 10% of customers carry X% of revenue` statistic.

    The oracle ranks with one global `row_number() OVER (ORDER BY ...)`;
    a literal Spark translation would be an empty-partitionBy window —
    one executor sorting every customer. Instead the rank decomposes
    through a MONOTONE bucket key (fixed ${_PARETO_BUCKET_CENTS // 100:,}
    revenue bands): local row_numbers per bucket run in parallel, and a
    bucket-count offset table (rows bounded by the price RANGE divided by
    the band width — not by the corpus) converts them to exact global
    ranks, the same prefix-sum-plus-offset pattern as
    `training_shard_assignment`. Revenue is quantized to integer cents
    map-side, so every sum, the total, and the decile boundaries are
    exact in both engines."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    r = orders.groupBy("o_custkey").agg(F.sum("cents").alias("cents"))
    # monotone bucket: higher bucket id <=> strictly higher revenue band
    r = r.withColumn("bkt", F.floor(F.col("cents") / _PARETO_BUCKET_CENTS))
    w_local = W.partitionBy("bkt").orderBy(F.desc("cents"), F.asc("o_custkey"))
    local = r.withColumn("lrnk", F.row_number().over(w_local))
    counts = r.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    # offset(bkt) = number of customers in strictly HIGHER buckets; the
    # window runs over the bounded bucket table, not the corpus
    w_off = W.orderBy(F.desc("bkt")).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    t = r.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    )
    ranked = (
        local.join(offsets, "bkt")
        .withColumn("rnk", F.col("lrnk") + F.col("off"))
        .crossJoin(F.broadcast(t))
    )
    d = ranked.select(
        (F.floor((F.col("rnk") - 1) * 10.0 / F.col("n")) + 1).cast("int").alias("decile"),
        "cents",
        "tot",
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("cents") / 100.0, 2).alias("decile_revenue"),
            rnd(F.sum("cents") * 1.0 / F.first("tot"), 6).alias("revenue_share"),
        )
        .orderBy("decile")
    )
