"""Decision-support extras, third batch: TPC-H Q4/Q6/Q7/Q8/Q9/Q10 shapes.

With tpchx.py (Q2/Q13/Q14/Q17/Q18/Q21/Q22 + Pareto) and tpchx2.py
(Q11/Q12/Q15/Q19), this completes representation of all 22 TPC-H query
shapes over the testdata star schema (Q1 = pricing_summary, Q3 =
top_orders_by_revenue, Q5 = revenue_by_nation, Q16 =
supplier_part_distincts, Q20 = parts_shipped_to_top_nation live in
queries/relational.py). The schema lacks partsupp / commit-receipt dates /
containers, so each query keeps its TPC-H twin's PLAN CONTRACT (the join
topology, the correlated-subquery decorrelation, the pushdown surface)
over the columns the testdata has; adaptations are stated per query.

Same contract as tpchx.py: oracles keep textbook forms; revenue sums
quantize to integer cents map-side wherever a sum feeds a comparison or
crosses engines at full precision.

No reference counterpart (relational-engine breadth, SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return (
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
        ).cast("long")
    )


# --------------------------------------------------------------------------
# Q4 shape: order priority counts gated on an EXISTS (late lineitem)
# --------------------------------------------------------------------------
_Q4_LATE_DAYS = 30


@register(
    "late_order_priority_counts",
    tags=("relational", "subquery", "agg"),
    oracle=f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority counts of one quarter's orders that
    had at least one late-shipping lineitem (no commit/receipt dates in
    the schema, so "late" = shipped > {_Q4_LATE_DAYS} days after the
    order date — the same correlated-EXISTS contract). The oracle keeps
    the textbook EXISTS; Spark plans it as a LEFT-SEMI join on the order
    key, with the correlated date predicate carried in the join
    condition (it references both sides, so it cannot push below the
    join — the quarter filter on orders does).

    Scale shape: one order-key shuffle co-partitioning the filtered
    orders and lineitem; the semi join emits each order at most once
    (no EXISTS-count inflation); the priority aggregate is 5-row
    bounded."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 shape: forecast revenue change (pure scan aggregate, full pushdown)
# --------------------------------------------------------------------------
@register(
    "discount_band_revenue",
    tags=("relational", "agg", "pushdown"),
    oracle=f"""
    SELECT
      {rnd_sql(
        "sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))"
        " / 100.0", 2)} AS revenue,
      count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue increase from eliminating a
    discount band — a zero-join single-scan aggregate whose entire
    predicate (date range, discount band, quantity cap) must reach the
    parquet scan as PushedFilters. The per-row discount amount quantizes
    to integer cents before the sum (exact, order-independent).

    Scale shape: the canonical scan-bound query — map-side partial sum,
    one singleton exchange; at 100 TB the date filter prunes partitions
    and the pushed band predicates skip row groups via min/max stats."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 100 + F.lit(0.5)
    ).cast("long")
    return li.agg(
        rnd(F.sum(cents) / 100.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations, by direction and year
# --------------------------------------------------------------------------
_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"


@register(
    "volume_shipping_pair",
    tags=("relational", "join", "agg"),
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           {rnd_sql(f"sum({_CENTS}) / 100.0", 2)} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_name = '{_Q7_NATION_A}' AND cn.n_name = '{_Q7_NATION_B}')
       OR (sn.n_name = '{_Q7_NATION_B}' AND cn.n_name = '{_Q7_NATION_A}')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def volume_shipping_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two trading nations, kept
    DIRECTIONAL (supplier-nation -> customer-nation) per ship year — the
    two-dimension-table disjunction that prunes BOTH the supplier and
    customer sides to two nations before the fact joins.

    Scale shape: nation is a bounded broadcast; the supplier/customer
    joins stay adaptive; the order-key join co-partitions the two facts
    once; revenue quantizes to cents map-side so the per-group sums are
    exact. The OR-of-directions evaluates on the two joined nation
    names — each side's IN-(two nations) hull pushes to its dim scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", _rev_cents().alias("cents")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    both = [_Q7_NATION_A, _Q7_NATION_B]
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(*both))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(*both))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(rnd(F.sum("cents") / 100.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share within a region, by year
# --------------------------------------------------------------------------
_Q8_NATION = "NATION_6"
_Q8_REGION = "AMERICA"
_Q8_TYPE = "STANDARD"


@register(
    "market_share_by_year",
    tags=("relational", "join", "agg", "subquery"),
    oracle=f"""
    WITH all_orders AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_CENTS} AS cents,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
    )
    SELECT o_year,
           {rnd_sql(
             f"sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN cents "
             "ELSE 0 END) * 1.0 / sum(cents)", 6)} AS mkt_share,
           {rnd_sql("sum(cents) / 100.0", 2)} AS total_revenue
    FROM all_orders GROUP BY o_year ORDER BY o_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, per order year — the conditional-share aggregate over the full
    7-table star join. The oracle keeps the textbook single-pass CASE
    share; the Spark plan is identical in structure (the decorrelation
    here IS the conditional aggregate — no second pass for the
    denominator).

    Scale shape: region/nation broadcast (bounded); part prunes by type
    before its join; customer/supplier joins stay adaptive; one
    order-key fact co-partition. Cents are exact integers, so the share
    division is deterministic; years make ~5 output rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", _rev_cents().alias("cents")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q8_REGION
    )
    region_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("rn_key"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(region_nations), F.col("c_nationkey") == F.col("rn_key")
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    is_target = F.col("supp_nation") == _Q8_NATION
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(is_target, F.col("cents")).otherwise(F.lit(0)))
                * 1.0
                / F.sum("cents"),
                6,
            ).alias("mkt_share"),
            rnd(F.sum("cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year
# --------------------------------------------------------------------------
_Q9_NAME_PART = "red"
_PROFIT_CENTS = (
    "CAST(floor((l_extendedprice * (1 - l_discount) "
    "- p_retailprice * l_quantity) * 100 + 0.5) AS BIGINT)"
)


@register(
    "product_profit_by_nation_year",
    tags=("relational", "join", "agg"),
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           {rnd_sql(f"sum({_PROFIT_CENTS}) / 100.0", 2)} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%{_Q9_NAME_PART}%'
    GROUP BY 1, 2
    ORDER BY nation ASC, o_year DESC
    """,
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line (p_name contains
    '{_Q9_NAME_PART}') by supplier nation and order year. The schema has
    no partsupp, so cost = p_retailprice * l_quantity stands in for
    ps_supplycost * l_quantity — the same profit-expression contract
    (a multi-table arithmetic expression aggregated over the full star).

    Per-row profit quantizes to integer cents (the expression is pure
    IEEE arithmetic, identical in both engines; profits can be negative
    — floor(x+0.5) rounds half-up consistently for either sign). Scale
    shape: the name LIKE prunes part before its join; nation broadcasts;
    supplier/orders joins stay adaptive; one fact co-partition per join
    key; ~nations x years bounded output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_NAME_PART))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit_cents.alias("pc"),
        )
        .groupBy("nation", "o_year")
        .agg(rnd(F.sum("pc") / 100.0, 2).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue report (top-20 customers)
# --------------------------------------------------------------------------
@register(
    "returned_item_report",
    tags=("relational", "join", "agg", "topk"),
    oracle=f"""
    SELECT c_custkey, c_name,
           {rnd_sql(f"sum({_CENTS}) / 100.0", 2)} AS revenue,
           n_name,
           {rnd_sql("any_value(c_acctbal)", 2)} AS c_acctbal
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY sum({_CENTS}) DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the top-20 customers by revenue lost to returned
    items in one quarter — the classic "who should we call" report.

    Scale shape: the return flag prunes lineitem AT THE SCAN and the
    quarter filter prunes orders at the scan (both pushed); the
    order-key fact co-partition happens on the REDUCED sides; the
    customer aggregate shuffles once on the customer key; nation is a
    bounded broadcast. Revenue quantizes to cents, so the ORDER BY key
    is an exact integer — the top-20 set (and its tie-break on
    c_custkey) is identical in both engines. Top-k is
    TakeOrderedAndProject, never a global sort."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_cents().alias("cents"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("cents").alias("cents"),
            rnd(F.first("c_acctbal"), 2).alias("c_acctbal"),
        )
        .select(
            "c_custkey",
            "c_name",
            rnd(F.col("cents") / 100.0, 2).alias("revenue"),
            "n_name",
            "c_acctbal",
            "cents",
        )
        .orderBy(F.desc("cents"), F.asc("c_custkey"))
        .limit(20)
        .drop("cents")
    )
