"""Core relational tier (SURVEY.md §2.2-§2.5, §2.8): projections, filters,
joins, aggregations, top-k — expressed declaratively so Catalyst gets
predicate pushdown, column pruning, broadcast-join selection and
TakeOrderedAndProject for free.

Scale notes (100 TB design stance):
- Schema-bounded dim tables (region: 5 rows, nation: 25) carry explicit
  ``broadcast()`` hints; corpus-proportional tables (customer, supplier,
  part, filtered fact subsets) are left to AQE, which broadcasts them
  while they fit and degrades to a keyed shuffle at scale.
- Aggregations are expressed as single groupBy passes (one shuffle), with
  map-side partial aggregation handled by Catalyst.
- Top-k is always ``orderBy().limit()`` which Spark plans as
  TakeOrderedAndProject (no full sort, no single-node sort of the fact table).
- Every surfaced float goes through ``rnd`` (functions/rounding.py): IEEE-op
  rounding that is bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A: pivoted conditional aggregation over one fact scan (SURVEY A5/A8 analog)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    tags=("agg", "filter"),
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {rnd_sql("sum(l_quantity)", 2)}                                       AS sum_qty,
      {rnd_sql("sum(l_extendedprice)", 2)}                                  AS sum_base_price,
      {rnd_sql("sum(l_extendedprice * (1 - l_discount))", 2)}               AS sum_disc_price,
      {rnd_sql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
      {rnd_sql("avg(l_quantity)", 4)}                                       AS avg_qty,
      {rnd_sql("avg(l_extendedprice)", 4)}                                  AS avg_price,
      {rnd_sql("avg(l_discount)", 6)}                                       AS avg_disc,
      count(*)                                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter -> single-shuffle groupBy with
    arithmetic aggregate expressions (reference analog: pivoted conditional
    aggregation replacing the per-gene loop, pipeline2.py:584-607)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B: star-schema broadcast join chain (SURVEY J1/J8 — broadcast hash joins)
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    tags=("join", "agg"),
    oracle=f"""
    SELECT
      n.n_name AS nation,
      {rnd_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
      count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dims star join. nation (25 rows, bounded by the schema) carries
    an explicit broadcast hint; customer is corpus-proportional, so its join
    strategy is left to AQE — broadcast while it fits the threshold, shuffle
    hash join on the customer key beyond that.
    Reference analog: probe→gene broadcast mapping join (pipeline2.py:511-516)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# C: top-k with deterministic tie-break (SURVEY K1-K3 — TakeOrderedAndProject)
# --------------------------------------------------------------------------
@register(
    "top_orders_by_revenue",
    tags=("topk", "join"),
    oracle=f"""
    SELECT o_orderkey, o_orderdate_s, revenue FROM (
      SELECT
        l.l_orderkey AS o_orderkey,
        CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s,
        {rnd_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by revenue: groupBy + orderBy/limit — planned as a true
    top-k (TakeOrderedAndProject), never a global sort. Deterministic
    tie-break on orderkey (SURVEY K3). Timestamps surface as epoch seconds so
    the oracle hash is timezone-proof."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            F.unix_timestamp("o_orderdate").alias("o_orderdate_s"),
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# D: semi/anti joins (SURVEY P9/J6 — membership predicates as joins)
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders (reference analog: membership
    filters, pipeline2.py:376,689). Catalyst executes as broadcast/shuffled
    hash anti-join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


@register(
    "parts_shipped_to_top_nation",
    tags=("join", "semi"),
    oracle="""
    WITH top_nation AS (
      SELECT c.c_nationkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
      ORDER BY count(*) DESC, c.c_nationkey ASC
      LIMIT 1
    )
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE EXISTS (
      SELECT 1
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN top_nation t ON c.c_nationkey = t.c_nationkey
      WHERE l.l_partkey = p.p_partkey
    )
    """,
)
def parts_shipped_to_top_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join subgraph restriction analog (pipeline2.py:1061-1066): parts
    that ever shipped to the nation with the most orders. Chained semi-joins;
    top-1 computed as orderBy/limit. Only the 1-row top_nation result carries
    a broadcast hint — customer and the per-nation customer subset are
    corpus-proportional, so their join strategies are left to AQE."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    top_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("c_nationkey"))
        .limit(1)
        .select("c_nationkey")
    )
    cust_in_nation = cust.join(F.broadcast(top_nation), "c_nationkey", "left_semi")
    orders_in_nation = orders.join(
        cust_in_nation.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_semi",
    )
    parts_in_nation = li.join(
        orders_in_nation.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).select("l_partkey")
    return part.join(parts_in_nation, part.p_partkey == F.col("l_partkey"), "left_semi")


# --------------------------------------------------------------------------
# E: rollup / grouping sets (SURVEY A10)
# --------------------------------------------------------------------------
@register(
    "order_priority_rollup",
    tags=("agg", "rollup"),
    oracle=f"""
    SELECT
      coalesce(o_orderstatus, 'ALL')   AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS n_orders,
      {rnd_sql("sum(o_totalprice)", 2)} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation — subtotal hierarchy in one pass (Spark expands
    grouping sets map-side; still a single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# F: distinct aggregates (SURVEY A10)
# --------------------------------------------------------------------------
@register(
    "supplier_part_distincts",
    tags=("agg", "distinct"),
    oracle="""
    SELECT
      l_suppkey,
      count(DISTINCT l_partkey)  AS n_parts,
      count(DISTINCT l_orderkey) AS n_orders,
      count(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_part_distincts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation per supplier (Spark plans expand +
    two-phase aggregate; exact distinct counts, oracle-checkable unlike
    approx_count_distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# G: conditional classification cascade (SURVEY P1 — keyword classifier)
# --------------------------------------------------------------------------
@register(
    "part_type_classifier",
    tags=("filter", "case"),
    oracle=f"""
    SELECT
      cls,
      count(*) AS n_parts,
      {rnd_sql("avg(p_retailprice)", 4)} AS avg_price
    FROM (
      SELECT
        CASE
          WHEN lower(p_type) LIKE '%brass%'  OR lower(p_type) LIKE '%copper%' THEN 'metal'
          WHEN lower(p_type) LIKE '%economy%' OR lower(p_type) LIKE '%promo%' THEN 'budget'
          WHEN lower(p_type) LIKE '%polished%' THEN 'finished'
          ELSE 'other'
        END AS cls,
        p_retailprice
      FROM part
    )
    GROUP BY cls
    """,
)
def part_type_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tier keyword classifier as a when/otherwise cascade — the Spark
    form of the reference's case/control keyword labeling
    (pipeline2.py:266-293). Pure column expressions, fully codegen'd."""
    part = load_table(spark, sf_dir, "part")
    t = F.lower(F.col("p_type"))
    cls = (
        F.when(t.contains("brass") | t.contains("copper"), "metal")
        .when(t.contains("economy") | t.contains("promo"), "budget")
        .when(t.contains("polished"), "finished")
        .otherwise("other")
    )
    return (
        part.select(cls.alias("cls"), "p_retailprice")
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            rnd(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# H: positional (ordinal) join (SURVEY J3 — row_number zip)
# --------------------------------------------------------------------------
@register(
    "positional_zip_join",
    tags=("join", "window"),
    oracle="""
    WITH s AS (
      SELECT s_suppkey, s_name,
             row_number() OVER (ORDER BY s_suppkey) AS rn
      FROM supplier
    ),
    n AS (
      SELECT n_nationkey, n_name,
             row_number() OVER (ORDER BY n_nationkey) AS rn
      FROM nation
    )
    SELECT s.rn AS rn, s.s_name AS s_name, n.n_name AS n_name
    FROM s JOIN n ON s.rn = n.rn
    """,
)
def positional_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional fallback join (pipeline2.py:392-401): zip two tables by an
    explicit deterministic ordinal (row_number over a defined order — never
    file order, which is partitioning-dependent at scale)."""
    from pyspark.sql import Window as W

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # unpartitioned windows bounded: inputs = supplier/nation DIMENSIONS
    # (the zip ordinal is a dimension-table construct, never the fact)
    s = sup.withColumn("rn", F.row_number().over(W.orderBy("s_suppkey"))).select("rn", "s_name")
    n = nat.withColumn("rn", F.row_number().over(W.orderBy("n_nationkey"))).select(
        "rn", "n_name"
    )
    return s.join(n, "rn").select("rn", "s_name", "n_name")


# --------------------------------------------------------------------------
# Blocked fuzzy matching (entity-resolution shape)
# --------------------------------------------------------------------------
@register(
    "fuzzy_part_name_matches",
    tags=("linkage", "join", "scalable"),
    oracle="""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts,
             string_split(p_name, ' ')[-1] AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS n1, b.p_name AS n2,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           a.n_parts AS n1_parts, b.n_parts AS n2_parts
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via BLOCKED fuzzy matching: near-identical part
    names (edit distance <= 2) found without ever forming the all-pairs
    cross product. The record-linkage recipe at scale: (1) aggregate to
    DISTINCT names first (dedup before matching — the name table is
    orders of magnitude smaller than the fact rows), (2) equi-join on a
    blocking key (here the trailing noun token, so only 'cold bolt' vs
    'old bolt'-shaped candidates meet), (3) score survivors with the
    codegen'd levenshtein — an exact integer both engines agree on. The
    blocked semantics IS the operator (the oracle blocks identically);
    recall outside the block is the standard linkage trade documented
    here, not a silent approximation."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.element_at(F.split(F.col("p_name"), " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("n1"), F.col("n_parts").alias("n1_parts"), "blk"
    )
    b = names.select(
        F.col("p_name").alias("n2"), F.col("n_parts").alias("n2_parts"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("n1") < F.col("n2"))
        .withColumn("edit_dist", F.levenshtein("n1", "n2"))
        .filter(F.col("edit_dist") <= 2)
        .select("n1", "n2", "edit_dist", "n1_parts", "n2_parts")
    )


# --------------------------------------------------------------------------
# Unpivot / melt (wide -> long) + per-metric profile
# --------------------------------------------------------------------------
@register(
    "lineitem_measures_unpivot",
    tags=("relational", "unpivot"),
    oracle="""
    WITH long AS (
      SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric, count(*) AS n,
           min(value) AS lo, max(value) AS hi,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM long GROUP BY metric
    """,
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshaping via the native ``unpivot`` operator (the melt
    half of §2.9's pivot coverage), then a per-metric profile. Unpivot is
    a zero-shuffle projection (each row expands to 4 metric rows map-side)
    and the profile partial-aggregates to 4 groups before the exchange —
    the cheapest possible reshape at any scale. Sums are cent-quantized
    to integers so the aggregate is addition-order independent."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).alias(
            "sum_cents"
        ),
    )


# --------------------------------------------------------------------------
# Declarative data-quality checks (constraint-validation suite)
# --------------------------------------------------------------------------
@register(
    "data_quality_checks",
    tags=("quality", "etl"),
    oracle="""
    WITH li AS (
      SELECT count(*) AS n_rows,
             count(*) - count(l_shipdate) AS null_shipdate,
             count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
               AS bad_discount,
             count(CASE WHEN l_quantity <= 0 THEN 1 END) AS bad_quantity
      FROM lineitem
    ),
    dupes AS (
      SELECT count(*) AS dupe_rows FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
      )
    ),
    orphans AS (
      SELECT count(*) AS orphan_rows
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL
    )
    SELECT * FROM (
      SELECT 'row_count_positive' AS check_name,
             CAST(n_rows AS BIGINT) AS observed, n_rows > 0 AS passed FROM li
      UNION ALL
      SELECT 'shipdate_not_null', null_shipdate, null_shipdate = 0 FROM li
      UNION ALL
      SELECT 'discount_in_unit_range', bad_discount, bad_discount = 0 FROM li
      UNION ALL
      SELECT 'quantity_positive', bad_quantity, bad_quantity = 0 FROM li
      UNION ALL
      SELECT 'orderline_key_unique', dupe_rows, dupe_rows = 0 FROM dupes
      UNION ALL
      SELECT 'orderkey_references_orders', orphan_rows, orphan_rows = 0
      FROM orphans
    )
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint-validation suite (the Deequ/dbt-test shape a
    production pipeline gates every load on): completeness, range,
    key-uniqueness and referential-integrity checks, one row per check with
    the observed violation count and a pass flag. Plan shape: ALL
    single-pass row-level checks fold into ONE aggregate over the fact scan
    (no per-check scans); uniqueness adds one keyed aggregation;
    referential integrity is one anti-join counted — three jobs total
    regardless of how many row-level constraints are declared. On the
    synthetic data the uniqueness check legitimately FAILS (the generator
    reuses (l_orderkey, l_linenumber)) — the suite reports it rather than
    assuming it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    one = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("null_shipdate"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_discount"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("bad_quantity"),
    )
    dupes = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dupe_rows"))
    )
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )

    def row(name, obs, ok):
        return F.struct(
            F.lit(name).alias("check_name"),
            obs.cast("long").alias("observed"),
            ok.alias("passed"),
        )

    rows1 = one.select(
        F.explode(
            F.array(
                row("row_count_positive", F.col("n_rows"), F.col("n_rows") > 0),
                row("shipdate_not_null", F.col("null_shipdate"), F.col("null_shipdate") == 0),
                row("discount_in_unit_range", F.col("bad_discount"), F.col("bad_discount") == 0),
                row("quantity_positive", F.col("bad_quantity"), F.col("bad_quantity") == 0),
            )
        ).alias("r")
    ).select("r.*")
    rows2 = dupes.select(
        F.lit("orderline_key_unique").alias("check_name"),
        F.col("dupe_rows").cast("long").alias("observed"),
        (F.col("dupe_rows") == 0).alias("passed"),
    )
    rows3 = orphans.select(
        F.lit("orderkey_references_orders").alias("check_name"),
        F.col("orphan_rows").cast("long").alias("observed"),
        (F.col("orphan_rows") == 0).alias("passed"),
    )
    return rows1.unionByName(rows2).unionByName(rows3)


# --------------------------------------------------------------------------
# Market-basket co-occurrence (association rules: support/confidence/lift)
# --------------------------------------------------------------------------
_MIN_PAIR_ORDERS = 3


@register(
    "part_pair_affinity",
    tags=("relational", "basket", "scalable"),
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_ord AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n FROM basket),
    item AS (SELECT l_partkey, count(*)::DOUBLE AS c FROM basket GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*)::DOUBLE AS c12
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_PAIR_ORDERS}
    )
    SELECT p1, p2, CAST(c12 AS BIGINT) AS n_orders,
           {rnd_sql("c12 / n_ord.n", 6)} AS support,
           {rnd_sql("c12 / i1.c", 6)} AS confidence_1to2,
           {rnd_sql("c12 * n_ord.n / (i1.c * i2.c)", 6)} AS lift
    FROM pair
    JOIN item i1 ON p1 = i1.l_partkey
    JOIN item i2 ON p2 = i2.l_partkey
    CROSS JOIN n_ord
    """,
)
def part_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rules mining over order baskets: support, confidence and
    lift for part pairs co-occurring in >= {_MIN_PAIR_ORDERS} orders — the
    recommender / market-basket staple. Scale shape: the pair generation
    is a SELF-JOIN KEYED ON THE ORDER (basket-local, fan-out bounded by
    basket size squared, never all-parts x all-parts), after a distinct
    that collapses repeat lines map-side; item counts and the 1-row order
    total arrive via broadcast. The a<b orientation counts each pair once;
    ratios are single divisions of exact counts, identical IEEE on both
    engines.

    Optimization r13 note: a collect_set + map-side pair-transform rewrite
    (the shape that measured faster for basket_brand_lift) was tried and
    REVERTED — measured slower here (isolated cold 7.9s vs 6.1s, warm
    3.3/2.7 vs 2.9/2.5 at sf0.1; first post-rewrite sweep read 14.6s vs a
    2.5–4.7s band across six prior sweeps). The rewrite's cache
    materialization + two explode passes cost more than whatever the
    self-join form re-reads of the distinct basket at this shape."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    n_ord = basket.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    a = basket.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = basket.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
        .filter(F.col("c12") >= _MIN_PAIR_ORDERS)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    # No broadcast hints on the item-count tables: their cardinality is
    # "distinct parts", which grows with the corpus (data-proportional, the
    # class of set this repo refuses to pin executor-resident — see
    # dedup_against_reference). AQE broadcasts them when they are in fact
    # small; at scale they join shuffle-keyed on p1/p2. The 1-row n_ord
    # aggregate stays broadcast: its size is a constant, not data-derived.
    return (
        pair.join(i1, "p1")
        .join(i2, "p2")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "p1",
            "p2",
            F.col("c12").cast("long").alias("n_orders"),
            rnd(F.col("c12") / F.col("n"), 6).alias("support"),
            rnd(F.col("c12") / F.col("c1"), 6).alias("confidence_1to2"),
            rnd(F.col("c12") * F.col("n") / (F.col("c1") * F.col("c2")), 6).alias(
                "lift"
            ),
        )
    )


# --------------------------------------------------------------------------
# Skew tooling under the oracle gate: salted two-phase aggregation
# --------------------------------------------------------------------------
@register(
    "salted_returnflag_stats",
    tags=("relational", "agg", "skew"),
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           {rnd_sql("sum(l_quantity)", 1)} AS sum_qty,
           {rnd_sql("max(l_extendedprice)", 2)} AS max_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def salted_returnflag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit salted two-phase aggregation (operators/skew.py) under
    the driver's exact-value gate: lineitem grouped by l_returnflag — 3
    output keys over millions of rows, the classic
    low-cardinality-output aggregation where ONE reducer per key would
    drown without the (key, salt) pre-phase.

    The oracle is the plain GROUP BY: salting must be result-invariant.
    That equality is exact by construction — count/max are
    order-insensitive, and quantities are integer-valued so their double
    sum is exact in any accumulation order (the same argument the
    two-phase split itself relies on). Spark's own partial aggregation
    covers this case when inputs are flat; the explicit form is for when
    an upstream join pins partitioning and map-side combine can't engage."""
    from drug_target_discovery_spark.operators.skew import two_phase_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    out = two_phase_agg(
        li,
        "l_returnflag",
        {
            "n_rows": ("l_returnflag", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        rnd("sum_qty", 1).alias("sum_qty"),
        rnd("max_price", 2).alias("max_price"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# CDC MERGE apply (the lakehouse MERGE INTO shape as one keyed outer join)
# --------------------------------------------------------------------------
@register(
    "cdc_merge_apply",
    tags=("relational", "join", "cdc"),
    oracle=f"""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    ),
    changes AS (
      SELECT CASE WHEN o_orderkey % 10 = 9 THEN o_custkey + 1000000
                  ELSE o_custkey END AS key,
             CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
                  WHEN o_orderkey % 10 <= 8 THEN 'D'
                  ELSE 'I' END AS op,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS new_cents
      FROM latest WHERE rn = 1
    ),
    snap AS (
      SELECT c_custkey AS key,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    )
    SELECT coalesce(c.key, s.key) AS key,
           CASE WHEN c.op IN ('U', 'I') THEN c.new_cents ELSE s.cents END AS cents,
           CASE WHEN c.op IS NULL THEN 'carried'
                WHEN s.key IS NULL THEN 'inserted'
                ELSE 'updated' END AS status
    FROM snap s FULL OUTER JOIN changes c ON s.key = c.key
    -- every op='D' join row drops: matched deletes remove the snapshot
    -- row, unmatched deletes are no-ops (NULL-op carried rows survive)
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY key
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert shape) as a pure
    DataFrame program: a change batch — synthesized deterministically
    from each customer's latest 2001 order (update / delete / insert by
    orderkey digit) — applied to the customer snapshot in ONE keyed
    full-outer join: matched updates take the new value, matched deletes
    drop, unmatched inserts append, unmatched snapshot rows carry over,
    unmatched deletes are no-ops.

    Scale shape: the change batch collapses to one row per key (window
    top-1 — upstream CDC compaction), then a single full-outer shuffle
    join on the merge key; no broadcast hints (both sides are
    corpus-proportional). Balances are integer cents so the merged state
    is hash-exact. At 100 TB the same plan runs partition-wise against a
    bucketed/partitioned snapshot (merge-on-read compaction)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    digit = F.col("o_orderkey") % 10
    changes = latest.select(
        F.when(digit == 9, F.col("o_custkey") + 1_000_000)
        .otherwise(F.col("o_custkey"))
        .alias("key"),
        F.when(digit <= 5, F.lit("U"))
        .when(digit <= 8, F.lit("D"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("new_cents"),
    )
    snap = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skey"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    merged = snap.join(changes, snap.skey == changes.key, "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(F.col("key"), F.col("skey")).alias("key"),
            F.when(F.col("op").isin("U", "I"), F.col("new_cents"))
            .otherwise(F.col("cents"))
            .alias("cents"),
            F.when(F.col("op").isNull(), F.lit("carried"))
            .when(F.col("skey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("status"),
        )
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# Benford first-digit conformance check (data-quality family)
# --------------------------------------------------------------------------
@register(
    "benford_first_digit_check",
    tags=("relational", "quality", "stats"),
    oracle=f"""
    WITH d AS (
      SELECT CAST(floor(o_totalprice
                 / power(10, floor(log10(o_totalprice)))) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
    full_d AS (
      SELECT g.digit, coalesce(o.n_obs, 0) AS n_obs, t.n
      FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
      LEFT JOIN obs o ON g.digit = o.digit
      CROSS JOIN tot t
    )
    SELECT digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           {rnd_sql("n_obs * 1.0 / n", 6)} AS obs_freq,
           {rnd_sql("log10(1.0 + 1.0 / digit)", 6)} AS benford_freq,
           {rnd_sql(
             "power(n_obs - n * log10(1.0 + 1.0 / digit), 2) "
             "/ (n * log10(1.0 + 1.0 / digit))", 6)} AS chi2_term
    FROM full_d ORDER BY digit
    """,
)
def benford_first_digit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance on order totals — the
    forensic data-quality screen (fabricated or truncated monetary data
    departs from the log10(1+1/d) digit distribution). Reports each
    digit's observed frequency, the Benford expectation, and its
    chi-squared contribution.

    First digit extraction is pure IEEE arithmetic (x / 10^floor(log10 x),
    identical doubles in both engines — no string formatting, whose
    scientific-notation thresholds differ across engines). Scale shape:
    map-side digit extract, one bounded 9-row aggregate, a 1-row total
    broadcast, and a 9-row literal frame for never-observed digits. The
    chi-squared terms derive from exact integer counts, so rounding at
    6dp is stable."""
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("digit")
        )
    )
    from drug_target_discovery_spark.caching import scoped_cache

    # two consumers (total + per-digit rows): cache the 9-row count table
    # so the orders column scans once
    obs = scoped_cache(d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs")))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        digits.join(obs, "digit", "left_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            rnd(F.coalesce(F.col("n_obs"), F.lit(0)) * 1.0 / F.col("n"), 6).alias(
                "obs_freq"
            ),
            rnd(benford, 6).alias("benford_freq"),
            rnd(
                F.pow(
                    F.coalesce(F.col("n_obs"), F.lit(0)) - F.col("n") * benford,
                    F.lit(2.0),
                )
                / (F.col("n") * benford),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Referential-integrity audit (warehouse FK orphan check)
# --------------------------------------------------------------------------
@register(
    "referential_integrity_audit",
    tags=("relational", "quality", "join"),
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey->orders' AS fk,
             count(*) AS n_rows,
             count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_orphans
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             count(*),
             count(CASE WHEN p_partkey IS NULL THEN 1 END)
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             count(*),
             count(CASE WHEN s_suppkey IS NULL THEN 1 END)
      FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             count(*),
             count(CASE WHEN c_custkey IS NULL THEN 1 END)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             count(*),
             count(CASE WHEN n_nationkey IS NULL THEN 1 END)
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    ) ORDER BY fk
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the
    referential-integrity half of the Deequ-shape constraint suite
    (data_quality_checks covers row-level checks on one table; this
    covers the BETWEEN-table contracts an ingest must hold). Reports,
    per FK edge, total child rows and orphans (child keys with no
    parent).

    Scale shape: every check is a LEFT join on the key projected to the
    two key columns only, collapsed by a count aggregate — the classic
    orphan scan. Dimension parents (nation) broadcast; fact-to-fact
    checks stay adaptive (AQE picks the side). Each check is an
    independent job branch; the 5-row result unions bounded
    aggregates. At 100 TB the same audit runs per ingest batch with the
    child side filtered to the batch."""

    def check(child, ckey, parent, pkey, label):
        joined = child.select(F.col(ckey)).join(
            parent.select(F.col(pkey)), F.col(ckey) == F.col(pkey), "left"
        )
        return joined.agg(
            F.lit(label).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(pkey).isNull(), 1)).alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    checks = [
        check(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey->orders"),
        check(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey->part"),
        check(li, "l_suppkey", supp, "s_suppkey", "lineitem.l_suppkey->supplier"),
        check(orders, "o_custkey", cust, "c_custkey", "orders.o_custkey->customer"),
        check(cust, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("fk")


# --------------------------------------------------------------------------
# Cross-source value reconciliation (orders header vs lineitem detail)
# --------------------------------------------------------------------------
@register(
    "order_lineitem_reconciliation",
    tags=("relational", "quality", "join"),
    oracle=f"""
    WITH line AS (
      SELECT l_orderkey AS okey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 100 + 0.5) AS BIGINT)) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    o AS (
      SELECT o_orderkey AS okey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_cents
      FROM orders
    ),
    r AS (
      SELECT o.o_cents, line.line_cents,
             coalesce(o.o_cents, 0) - coalesce(line.line_cents, 0) AS diff
      FROM o FULL OUTER JOIN line ON o.okey = line.okey
    )
    SELECT CASE WHEN line_cents IS NULL THEN 'order_without_lines'
                WHEN o_cents IS NULL THEN 'lines_without_order'
                WHEN diff = 0 THEN 'match'
                WHEN diff > 0 THEN 'overstated'
                ELSE 'understated' END AS status,
           count(*) AS n_orders,
           CAST(sum(abs(diff)) AS BIGINT) AS abs_diff_cents,
           CAST(max(abs(diff)) AS BIGINT) AS max_abs_diff_cents,
           {rnd_sql("sum(abs(diff)) / 100.0", 2)} AS abs_diff_dollars
    FROM r GROUP BY status ORDER BY status
    """,
)
def order_lineitem_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-target value reconciliation — the nightly finance-style
    check that a header total equals the sum of its detail lines, run here
    between ``orders.o_totalprice`` and the lineitem-derived charge
    sum(extendedprice * (1-discount) * (1+tax)). Classifies every order
    key into match / overstated / understated / order_without_lines /
    lines_without_order with the absolute discrepancy — the between-table
    VALUE contract completing the constraint family next to
    ``data_quality_checks`` (row-level) and ``referential_integrity_audit``
    (key-level).

    Exactness: every money term is quantized to integer cents map-side
    (floor(x*100+0.5), IEEE-identical in both engines) so sums are
    order-independent BIGINTs and the match/mismatch boundary cannot
    drift on float summation order.

    Scale design: the detail side collapses to (orderkey, cents) via one
    partial-aggregating keyed shuffle; the header side shuffles on the
    same key; the FULL OUTER join is co-partitioned sort-merge (neither
    side is broadcastable — both are corpus-proportional, and the
    written refusal of data-proportional broadcasts applies). The final
    status rollup is a bounded 5-row aggregate. At 100 TB the same plan
    reconciles per ingest batch by filtering both sides to the batch's
    key range first (predicate pushdown keeps the scan batch-sized)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    line = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
                + F.lit(0.5)
            ).cast("long")
        ).alias("line_cents")
    )
    o = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("o_cents"),
    )
    r = o.join(line, "okey", "full_outer").select(
        "o_cents",
        "line_cents",
        (
            F.coalesce(F.col("o_cents"), F.lit(0))
            - F.coalesce(F.col("line_cents"), F.lit(0))
        ).alias("diff"),
    )
    status = (
        F.when(F.col("line_cents").isNull(), "order_without_lines")
        .when(F.col("o_cents").isNull(), "lines_without_order")
        .when(F.col("diff") == 0, "match")
        .when(F.col("diff") > 0, "overstated")
        .otherwise("understated")
    )
    return (
        r.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.abs("diff")).alias("abs_diff_cents"),
            F.max(F.abs("diff")).alias("max_abs_diff_cents"),
            rnd(F.sum(F.abs("diff")) / 100.0, 2).alias("abs_diff_dollars"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# Snapshot diff: change-set generation between two table versions
# --------------------------------------------------------------------------
# cdc_merge_apply is the APPLY half of the CDC loop (a change batch folds
# into a snapshot). This is the GENERATE half — the Datafold-style
# "data-diff" that compares two refreshes of a table and emits what
# changed. The second snapshot is synthesized deterministically from the
# first (drop key%97 rows, bump key%89 balances, clone key%83 rows under
# shifted keys) so both engines diff literally the same pair of tables.
_DIFF_DROP = 97
_DIFF_BUMP = 89
_DIFF_CLONE = 83
_DIFF_BUMP_CENTS = 12345
_DIFF_KEY_SHIFT = 10_000_000


@register(
    "snapshot_diff_changeset",
    tags=("relational", "quality", "cdc", "join"),
    oracle=f"""
    WITH oldt AS (
      SELECT c_custkey AS key,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             c_name AS name, c_nationkey AS nk
      FROM customer
    ),
    newt AS (
      SELECT key,
             CASE WHEN key % {_DIFF_BUMP} = 0
                  THEN cents + {_DIFF_BUMP_CENTS} ELSE cents END AS cents,
             name, nk
      FROM oldt WHERE key % {_DIFF_DROP} <> 0
      UNION ALL
      SELECT key + {_DIFF_KEY_SHIFT}, cents, name, nk
      FROM oldt WHERE key % {_DIFF_CLONE} = 0
    ),
    ofp AS (
      SELECT key, cents,
             md5(concat_ws('|', CAST(key AS VARCHAR), CAST(cents AS VARCHAR),
                           name, CAST(nk AS VARCHAR))) AS fp
      FROM oldt
    ),
    nfp AS (
      SELECT key, cents,
             md5(concat_ws('|', CAST(key AS VARCHAR), CAST(cents AS VARCHAR),
                           name, CAST(nk AS VARCHAR))) AS fp
      FROM newt
    ),
    d AS (
      SELECT o.fp AS o_fp, n.fp AS n_fp, o.cents AS o_cents, n.cents AS n_cents
      FROM ofp o FULL OUTER JOIN nfp n ON o.key = n.key
    )
    SELECT CASE WHEN o_fp IS NULL THEN 'added'
                WHEN n_fp IS NULL THEN 'removed'
                WHEN o_fp = n_fp THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_fp IS NOT NULL AND n_fp IS NOT NULL
                          AND o_fp <> n_fp
                         THEN abs(n_cents - o_cents) ELSE 0 END)
                AS BIGINT) AS cents_delta
    FROM d GROUP BY change_type ORDER BY change_type
    """,
)
def snapshot_diff_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-refresh table diff (added / removed / changed / unchanged
    with the changed-value magnitude) — the change-set GENERATOR whose
    output shape is exactly what ``cdc_merge_apply`` consumes, closing
    the CDC loop (diff one refresh, apply to the next snapshot).

    The data-diff trick that makes this viable wide: each side collapses
    its row to one md5 fingerprint MAP-SIDE, so the full-outer comparison
    join shuffles (key, 32-byte digest, cents) — never the wide row —
    and a 500-column table diffs at the same shuffle cost as a 3-column
    one. Equality on the digest decides changed-vs-unchanged in one
    comparison; the carried cents column prices the change.

    Scale design: both snapshot scans are map-only into the digest
    projection; ONE co-partitioned full-outer sort-merge join on the key
    (both sides corpus-proportional — no broadcast); the rollup is a
    bounded 4-row aggregate. At 100 TB the same plan runs partition-wise
    against bucketed snapshots, and the pre-rollup frame (key, op,
    new value) IS the incremental change feed a downstream MERGE applies."""
    cust = load_table(spark, sf_dir, "customer")
    oldt = cust.select(
        F.col("c_custkey").alias("key"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    newt = (
        oldt.filter(F.col("key") % _DIFF_DROP != 0)
        .select(
            "key",
            F.when(
                F.col("key") % _DIFF_BUMP == 0,
                F.col("cents") + _DIFF_BUMP_CENTS,
            )
            .otherwise(F.col("cents"))
            .alias("cents"),
            "name",
            "nk",
        )
        .unionByName(
            oldt.filter(F.col("key") % _DIFF_CLONE == 0).select(
                (F.col("key") + _DIFF_KEY_SHIFT).alias("key"),
                "cents",
                "name",
                "nk",
            )
        )
    )

    def fp(df):
        return df.select(
            "key",
            "cents",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("key").cast("string"),
                    F.col("cents").cast("string"),
                    F.col("name"),
                    F.col("nk").cast("string"),
                )
            ).alias("fp"),
        )

    o = fp(oldt).select(
        "key", F.col("cents").alias("o_cents"), F.col("fp").alias("o_fp")
    )
    n = fp(newt).select(
        "key", F.col("cents").alias("n_cents"), F.col("fp").alias("n_fp")
    )
    d = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("o_fp").isNull(), "added")
        .when(F.col("n_fp").isNull(), "removed")
        .when(F.col("o_fp") == F.col("n_fp"), "unchanged")
        .otherwise("changed")
    )
    return (
        d.groupBy(change.alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    F.col("o_fp").isNotNull()
                    & F.col("n_fp").isNotNull()
                    & (F.col("o_fp") != F.col("n_fp")),
                    F.abs(F.col("n_cents") - F.col("o_cents")),
                ).otherwise(F.lit(0))
            ).alias("cents_delta"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# Join-key skew profile (when-to-salt diagnostics)
# --------------------------------------------------------------------------
@register(
    "join_key_skew_profile",
    tags=("relational", "quality", "skew", "agg"),
    oracle=f"""
    WITH c AS (
      SELECT l_partkey AS key, count(*) AS n_rows_key
      FROM lineitem GROUP BY l_partkey
    ),
    s AS (
      SELECT count(*) AS n_keys,
             CAST(sum(n_rows_key) AS BIGINT) AS n_rows,
             CAST(max(n_rows_key) AS BIGINT) AS max_rows_key
      FROM c
    )
    SELECT c.key, c.n_rows_key, s.n_keys, s.n_rows,
           {rnd_sql("s.n_rows * 1.0 / s.n_keys", 6)} AS avg_rows_per_key,
           {rnd_sql("c.n_rows_key * 1.0 * s.n_keys / s.n_rows", 6)} AS key_skew,
           {rnd_sql("s.max_rows_key * 1.0 * s.n_keys / s.n_rows", 6)} AS max_skew
    FROM c CROSS JOIN s
    ORDER BY c.n_rows_key DESC, c.key ASC
    LIMIT 5
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostics for the fact's join key (l_partkey): the top-5
    heaviest keys with their skew ratio (rows-per-key over the mean) and
    the global max-skew — the numbers that decide whether a keyed join or
    aggregation needs the explicit salting fallbacks in
    ``operators/skew.py`` (a max_skew near 1 means hash partitioning
    balances; max_skew >> tasks-per-executor means the hottest key IS the
    straggler). The production pre-flight a pipeline runs before choosing
    a join strategy, completing the ops-diagnostics family
    (data_quality_checks / referential_integrity_audit /
    order_lineitem_reconciliation / snapshot_diff_changeset).

    Exactness: all inputs are exact BIGINT counts; ratios are single
    IEEE divisions written identically on both engines.

    Scale design: ONE keyed exchange with map-side partial counts (the
    key-count table is the profile's working set — |distinct keys| rows,
    already orders smaller than the fact); the global summary is a 1-row
    broadcast; the top-5 plans as TakeOrderedAndProject with a
    deterministic key tie-break, never a full sort. At 100 TB the same
    two aggregates run per candidate join key as a planning pass."""
    from drug_target_discovery_spark.caching import scoped_cache

    li = load_table(spark, sf_dir, "lineitem")
    c = scoped_cache(
        li.groupBy(F.col("l_partkey").alias("key")).agg(
            F.count(F.lit(1)).alias("n_rows_key")
        )
    )
    s = c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows_key").alias("n_rows"),
        F.max("n_rows_key").alias("max_rows_key"),
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "key",
            "n_rows_key",
            "n_keys",
            "n_rows",
            rnd(F.col("n_rows") * 1.0 / F.col("n_keys"), 6).alias(
                "avg_rows_per_key"
            ),
            rnd(
                F.col("n_rows_key") * 1.0 * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("key_skew"),
            rnd(
                F.col("max_rows_key") * 1.0 * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("max_skew"),
        )
        .orderBy(F.desc("n_rows_key"), F.asc("key"))
        .limit(5)
    )
