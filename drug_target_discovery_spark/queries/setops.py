"""Set operations + string-function coverage (SURVEY §2.9 scalar families,
A10 distinct forms): INTERSECT/EXCEPT/UNION, regexp extraction, string
assembly — the remaining relational algebra surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


def _buyers(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        )
        .select("o_custkey")
        .distinct()
    )


@register(
    "customer_cohort_set_ops",
    tags=("setops",),
    oracle="""
    WITH b96 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    b97 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT 'retained' AS cohort, count(*) AS n FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)
    UNION ALL
    SELECT 'churned', count(*) FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)
    UNION ALL
    SELECT 'new', count(*) FROM (SELECT * FROM b97 EXCEPT SELECT * FROM b96)
    UNION ALL
    SELECT 'either', count(*) FROM (SELECT * FROM b96 UNION SELECT * FROM b97)
    """,
)
def customer_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention via set algebra: INTERSECT (retained), EXCEPT
    (churned/new), UNION (either) — Catalyst plans these as semi/anti hash
    joins and a distinct union; no materialized sets."""
    b96 = _buyers(spark, sf_dir, 1996)
    b97 = _buyers(spark, sf_dir, 1997)

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(label).alias("cohort"), "n"
        )

    # one lazy plan (union of four aggregates) — no driver-side .count() loop
    return (
        cnt(b96.intersect(b97), "retained")
        .union(cnt(b96.subtract(b97), "churned"))
        .union(cnt(b97.subtract(b96), "new"))
        .union(cnt(b96.union(b97).distinct(), "either"))
    )


@register(
    "part_name_analysis",
    tags=("string",),
    oracle=f"""
    SELECT
      first_word,
      count(*) AS n_parts,
      {rnd_sql("avg(name_len)", 4)} AS avg_name_len,
      max(n_words) AS max_words
    FROM (
      SELECT
        regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        length(p_name) AS name_len,
        len(string_split(p_name, ' ')) AS n_words
      FROM part
    )
    GROUP BY first_word
    """,
)
def part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (§2.9): regexp_extract, length, split,
    grouped string stats — all codegen'd column expressions."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
            F.length("p_name").alias("name_len"),
            F.size(F.split("p_name", " ")).alias("n_words"),
        )
        .groupBy("first_word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            rnd(F.avg("name_len"), 4).alias("avg_name_len"),
            F.max("n_words").alias("max_words"),
        )
    )
