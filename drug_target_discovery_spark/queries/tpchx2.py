"""Decision-support extras, second batch (SURVEY §2 J/A/K families):
TPC-H Q11/Q12/Q15/Q19 shapes over the testdata star schema.

Same contract as tpchx.py: the DuckDB oracle keeps the TEXTBOOK form
(scalar subqueries, correlated max) while the Spark side is the
decorrelated plan a distributed engine wants:

- Q11: per-group value share against a GLOBAL scalar threshold — the
  1-row total is computed from the already-aggregated group table (never
  a second fact scan) and broadcast.
- Q12: two-fact co-partitioned join + conditional priority counts.
- Q15: correlated max-of-aggregate subquery -> 1-row max broadcast +
  integer-exact equality (ties kept, like the spec's view form).
- Q19: OR-of-ANDs disjunctive predicate — the branch-union bounds are
  applied to EACH side before the join so the scans prune, with the
  exact disjunction evaluated after the join.

No reference counterpart (relational-engine breadth, SURVEY §2.9); the
schema lacks partsupp/shipmode/container, so each query keeps the plan
contract of its TPC-H twin over the columns the testdata has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import scoped_cache
from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Q11 shape: parts holding an outsized share of regional shipped value
# --------------------------------------------------------------------------
_Q11_REGION = "ASIA"
_Q11_SHARE_DEN = 1500  # keep parts with part_value * DEN > total (share > 1/DEN)


@register(
    "important_part_value_share",
    tags=("relational", "subquery", "agg"),
    oracle=f"""
    WITH regional AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = '{_Q11_REGION}'
    ),
    per_part AS (
      SELECT l_partkey, sum(cents) AS part_cents
      FROM regional GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           {rnd_sql("part_cents / 100.0", 2)} AS part_value,
           {rnd_sql("part_cents * 1.0 / (SELECT sum(part_cents) FROM per_part)", 6)}
             AS value_share
    FROM per_part
    WHERE part_cents * {_Q11_SHARE_DEN} > (SELECT sum(part_cents) FROM per_part)
    ORDER BY part_cents DESC, l_partkey ASC
    """,
)
def important_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from one region's
    suppliers exceeds a fixed fraction (1/{_Q11_SHARE_DEN}) of the
    regional total. The oracle keeps the textbook global scalar subquery
    (twice); Spark decorrelates it once — the total is summed from the
    ALREADY-AGGREGATED per-part table (part-bounded, never a second fact
    scan) and crossed in as a 1-row broadcast.

    Float safety: prices quantize to integer cents map-side, so the
    per-part sums, the total, and the `* {_Q11_SHARE_DEN} >` comparison
    are exact BIGINT arithmetic in both engines (no share-boundary
    divergence). Scale shape: the regional supplier filter prunes the
    fact before its only shuffle (the part aggregate); nation/region are
    bounded broadcast dims; the supplier join stays adaptive. The
    per-part table is scope-cached: total and output both read it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q11_REGION
    )
    regional_supp = supp.join(
        F.broadcast(
            nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        ),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = scoped_cache(
        li.join(regional_supp, li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("part_cents"))
    )
    total = per_part.agg(F.sum("part_cents").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") * _Q11_SHARE_DEN > F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            rnd(F.col("part_cents") / 100.0, 2).alias("part_value"),
            rnd(F.col("part_cents") * 1.0 / F.col("tot"), 6).alias("value_share"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# --------------------------------------------------------------------------
# Q12 shape: priority mix by return flag / line status for one ship-year
# --------------------------------------------------------------------------
@register(
    "returnflag_priority_mix",
    tags=("relational", "join", "agg"),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def returnflag_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for lineitems shipped in one year, how many came
    from high-priority vs low-priority orders, split by return flag and
    line status (the schema has no l_shipmode; the flag/status pair keeps
    the same two-branch conditional-count contract).

    Scale shape: the ship-year filter is pushed to the lineitem parquet
    scan; both join sides are corpus-proportional facts co-partitioned on
    the order key (no broadcast hint — AQE decides); the conditional
    counts partial-aggregate map-side to a 6-row output."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_linestatus")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier(s) by quarterly revenue (correlated max subquery)
# --------------------------------------------------------------------------
_Q15_START = "1997-01-01"
_Q15_END = "1997-04-01"


@register(
    "top_revenue_suppliers",
    tags=("relational", "subquery", "agg"),
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                 AS BIGINT)) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_START} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_END} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {rnd_sql("total_cents / 100.0", 2)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over one
    quarter. The oracle keeps the textbook correlated max-of-aggregate
    subquery (the spec's CREATE VIEW form); Spark decorrelates it to a
    1-row max aggregate broadcast against the revenue table, keeping ties
    like the spec requires.

    Float safety: per-row revenue quantizes to integer cents BEFORE the
    sum (the discount product is IEEE-identical in both engines; floor of
    it is exact), so the per-supplier totals and the max-equality filter
    are BIGINT-exact — the classic Q15 pitfall (double-sum max equality)
    cannot diverge. Scale shape: date filter pushed to the scan, one
    supplier-key aggregate, 1-row broadcast, adaptive name join."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
        )
        .select(
            "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cents"),
        )
    )
    revenue = scoped_cache(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum("cents").alias("total_cents")
        )
    )
    mx = revenue.agg(F.max("total_cents").alias("max_cents"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            rnd(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive (OR-of-ANDs) branch revenue
# --------------------------------------------------------------------------
# (brand, max p_size, min l_quantity, max l_quantity) per branch
_Q19_BRANCHES = (
    ("Brand#12", 15, 1.0, 15.0),
    ("Brand#23", 25, 10.0, 25.0),
    ("Brand#3", 35, 20.0, 35.0),
)


@register(
    "disjunctive_branch_revenue",
    tags=("relational", "join", "pushdown"),
    oracle=f"""
    SELECT
      {rnd_sql(
        "sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT)) / 100.0", 2)} AS revenue,
      count(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE
      {" OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
        f"AND l_quantity BETWEEN {ql} AND {qh})"
        for b, s, ql, qh in _Q19_BRANCHES
      )}
    """,
)
def disjunctive_branch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue matching an OR of three conjunctive
    branches spanning BOTH join sides (part attributes AND lineitem
    quantity), the canonical disjunctive-predicate pushdown test.

    A disjunction across two tables cannot be pushed below the join as-is,
    so each side gets the UNION of its branch bounds as a redundant
    pre-filter (brand IN {{...}} / size <= max; quantity within the outer
    hull) — semantically implied by the disjunction, and it lets the
    parquet scans prune before the join while the exact OR evaluates
    after. Revenue quantizes per-row to integer cents before the sum
    (mirroring tpchx3's _rev_cents), so the aggregate is an
    order-independent BIGINT sum at ANY scale — the ADVICE-r5 fix for
    the raw-double form whose 2dp rounding could flip once the matched
    row count grows. Part side stays adaptive."""
    brands = [b for b, _, _, _ in _Q19_BRANCHES]
    max_size = max(s for _, s, _, _ in _Q19_BRANCHES)
    min_q = min(ql for _, _, ql, _ in _Q19_BRANCHES)
    max_q = max(qh for _, _, _, qh in _Q19_BRANCHES)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(min_q, max_q))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin(*brands) & (F.col("p_size") <= max_size))
        .select("p_partkey", "p_brand", "p_size")
    )
    branch = None
    for b, s, ql, qh in _Q19_BRANCHES:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, s)
            & F.col("l_quantity").between(ql, qh)
        )
        branch = c if branch is None else (branch | c)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            rnd(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                        + F.lit(0.5)
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
