"""Statistical tier queries (SURVEY.md §2.6 T1-T6, §2.5 A1-A7) exercised on
the driver's TPC-H-ish tables. The bioinformatics semantics map as:
gene -> l_partkey, sample -> l_suppkey, expression value -> lineitem measures,
case/control -> l_returnflag groups. Operator correctness is what the oracle
checks; the GEO-format pipeline composes the same transforms (plans/)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PWindow
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.functions.stats import (
    bh_fdr,
    bh_fdr_scalable,
    minmax_scale,
    student_t_two_sided_p,
    welch_t_stats,
    zscore,
)
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

# Deterministic integer-arithmetic pseudo p-value, identical in both engines
# (Knuth multiplicative hash mod a prime, scaled to [0,1)). NOTE `1000003e0`:
# Spark parses a `1000003.0` literal as DECIMAL (decimal division semantics),
# DuckDB as DOUBLE — the exponent form is a double literal in both.
_PSEUDO_P = "((l_partkey * 2654435761) % 1000003) / 1000003e0"


# --------------------------------------------------------------------------
# T1: z-score standardization (stddev_pop, sklearn ddof=0)
# --------------------------------------------------------------------------
@register(
    "zscore_by_part",
    tags=("stats", "window"),
    oracle=f"""
    SELECT
      l_orderkey, l_linenumber,
      {rnd_sql('''
        CASE WHEN stddev_pop(l_extendedprice) OVER (PARTITION BY l_partkey) = 0 THEN 0.0
             ELSE (l_extendedprice - avg(l_extendedprice) OVER (PARTITION BY l_partkey))
                  / stddev_pop(l_extendedprice) OVER (PARTITION BY l_partkey)
        END''', 6)} AS zscore
    FROM lineitem
    """,
)
def zscore_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gene z-score (T1, pipeline2.py:492-494) mapped onto lineitem:
    standardize l_extendedprice within each l_partkey. Single shuffle
    (window partitioned by the key), population stddev."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )
    z = zscore(li, "l_partkey", "l_extendedprice")
    return z.select("l_orderkey", "l_linenumber", rnd("zscore", 6).alias("zscore"))


# --------------------------------------------------------------------------
# A1: exact median collapse per group
# --------------------------------------------------------------------------
@register(
    "median_quantity_by_part",
    tags=("stats", "agg"),
    oracle=f"""
    SELECT l_partkey, {rnd_sql("median(l_quantity)", 4)} AS median_qty, count(*) AS n
    FROM lineitem GROUP BY l_partkey
    """,
)
def median_quantity_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (A1, pipeline2.py:523-528): Spark `median`
    (= percentile 0.5, exact interpolation) — NOT percentile_approx; oracle
    hash-match requires exactness."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        rnd(F.median("l_quantity"), 4).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# A2: median imputation of missing cells (window median + coalesce)
# --------------------------------------------------------------------------
@register(
    "median_impute",
    tags=("stats", "window"),
    oracle=f"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             nullif(l_quantity, 25.0) AS v          -- synthesize missing cells
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           {rnd_sql("coalesce(v, median(v) OVER (PARTITION BY l_partkey))", 4)} AS imputed
    FROM base
    """,
)
def median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gene median imputation of NULL cells (A2, pipeline2.py:487):
    window median over the key, coalesce into the value. NULLs synthesized
    deterministically (quantity==25 -> NULL) since testdata has none."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.nullif(F.col("l_quantity"), F.lit(25.0)).alias("v"),
    )
    med = F.median("v").over(W.partitionBy("l_partkey"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.coalesce("v", med), 4).alias("imputed"),
    )


# --------------------------------------------------------------------------
# A4 + P3: missing census and conditional global transform
# --------------------------------------------------------------------------
@register(
    "missing_census",
    tags=("stats", "agg"),
    oracle=f"""
    SELECT
      count(*) AS n_rows,
      CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
      {rnd_sql("avg(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1.0 ELSE 0.0 END)", 6)} AS missing_rate
    FROM lineitem
    """,
)
def missing_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value census (A4, pipeline2.py:483): count NULL cells in one
    aggregate pass (discount==0 treated as the synthetic missing marker)."""
    li = load_table(spark, sf_dir, "lineitem")
    miss = F.nullif(F.col("l_discount"), F.lit(0.0)).isNull().cast("long")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(miss).alias("n_missing"),
        rnd(F.avg(miss.cast("double")), 6).alias("missing_rate"),
    )


@register(
    "conditional_log2",
    tags=("stats",),
    oracle=f"""
    WITH mx AS (SELECT max(l_extendedprice) AS gmax FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           {rnd_sql("CASE WHEN mx.gmax > 100 THEN log2(l_extendedprice + 1) ELSE l_extendedprice END", 6)} AS v
    FROM lineitem, mx
    """,
)
def conditional_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional log2 transform (P3, pipeline2.py:488-491): global max
    decides whether log2(x+1) applies. The 1-row max aggregate is broadcast
    cross-joined — no driver round-trip, no global window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    mx = li.agg(F.max("l_extendedprice").alias("gmax"))
    return li.crossJoin(F.broadcast(mx)).select(
        "l_orderkey",
        "l_linenumber",
        rnd(
            F.when(F.col("gmax") > 100.0, F.log2(F.col("l_extendedprice") + 1)).otherwise(
                F.col("l_extendedprice")
            ),
            6,
        ).alias("v"),
    )


# --------------------------------------------------------------------------
# P2: NA-threshold group filter (dropna(thresh) semantics)
# --------------------------------------------------------------------------
@register(
    "na_threshold_filter",
    tags=("stats", "filter"),
    oracle="""
    WITH base AS (
      SELECT l_partkey, nullif(l_quantity, 25.0) AS v FROM lineitem
    )
    SELECT l_partkey,
           count(v) AS n_present,
           count(*) AS n_total
    FROM base
    GROUP BY l_partkey
    HAVING count(v) >= 0.2 * count(*)
    """,
)
def na_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NA-threshold row filter (P2, pipeline2.py:484-486): keep keys with
    >=20% present values — the reference's actual dropna(thresh=0.2*n)
    semantics (SURVEY notes the log message claims otherwise; we replicate
    the code). Aggregate + HAVING, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.nullif(F.col("l_quantity"), F.lit(25.0)).alias("v")
    )
    return (
        li.groupBy("l_partkey")
        .agg(F.count("v").alias("n_present"), F.count(F.lit(1)).alias("n_total"))
        .filter(F.col("n_present") >= 0.2 * F.col("n_total"))
    )


# --------------------------------------------------------------------------
# T2: Welch t sufficient statistics (SQL-expressible part)
# --------------------------------------------------------------------------
@register(
    "welch_t_by_part",
    tags=("stats", "agg"),
    oracle=f"""
    WITH g AS (
      SELECT l_partkey,
             count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_case,
             count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_control,
             -- exact int64 sums of cent-lattice prices: the mean is a single
             -- exact-operand division, bit-identical across engines and
             -- summation orders (functions/stats.py welch_t_stats
             -- value_scale). Mean denominators count NON-NULL VALUES
             -- (CASE ... THEN l_extendedprice), mirroring the Spark side's
             -- count over vi — identical to the row count on lineitem (no
             -- NULL prices) but NULL-safe on any input.
             CAST(sum(CASE WHEN l_returnflag = 'R'
                      THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
                  AS DOUBLE)
               / (count(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) * 100.0)
               AS mean_case,
             CAST(sum(CASE WHEN l_returnflag = 'A'
                      THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
                  AS DOUBLE)
               / (count(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) * 100.0)
               AS mean_control,
             var_samp(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS var_case,
             var_samp(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS var_control
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, n_case, n_control,
      {rnd_sql("mean_case - mean_control", 4)} AS log2fc,
      {rnd_sql('''CASE WHEN n_case >= 2 AND n_control >= 2
                  AND (var_case / n_case + var_control / n_control) > 0
            THEN (mean_case - mean_control)
                 / sqrt(var_case / n_case + var_control / n_control) END''', 6)} AS t_stat,
      {rnd_sql('''CASE WHEN n_case >= 2 AND n_control >= 2
                  AND (var_case / n_case + var_control / n_control) > 0
            THEN pow(var_case / n_case + var_control / n_control, 2)
                 / ( pow(var_case / n_case, 2) / (n_case - 1)
                   + pow(var_control / n_control, 2) / (n_control - 1) ) END''', 4)} AS t_df
    FROM g
    """,
)
def welch_t_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t-test per gene from sufficient statistics (T2,
    pipeline2.py:584-607): ONE aggregation pass for every key replaces the
    reference's per-gene Python loop — the single most important
    scale-up rewrite in the engine. case = returnflag 'R', control = 'A'.
    Means via exact cent-lattice integer sums (value_scale=100) so the 4dp
    log2fc is deterministic across summation orders."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_returnflag"
    )
    t = welch_t_stats(
        li, "l_partkey", "l_extendedprice", "l_returnflag", "R", "A", value_scale=100
    )
    return t.select(
        "l_partkey",
        "n_case",
        "n_control",
        rnd("log2fc", 4).alias("log2fc"),
        rnd("t_stat", 6).alias("t_stat"),
        rnd("t_df", 4).alias("t_df"),
    )


# --------------------------------------------------------------------------
# T2b: full differential expression with p-values (pandas_udf t CDF)
# --------------------------------------------------------------------------
from drug_target_discovery_spark.queries._diffexpr_oracle import (  # noqa: E402
    DIFFEXPR_ORACLE,
)


@register(
    "differential_expression",
    tags=("stats", "pandas_udf"),
    oracle=DIFFEXPR_ORACLE,
)
def differential_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full differential-expression table (T2+T3): Welch t -> two-sided p
    via Arrow-batched numpy t-CDF -> BH-FDR -> significance flag (P5).
    DuckDB has no t CDF, so the oracle is a fixture VALUES table
    (tools/gen_diffexpr_oracle.py): Welch sufficient stats computed by
    DuckDB, p/BH by the independent numpy reference, bound to the gate's
    sf0.01 tables. Means via exact cent-lattice integer sums
    (value_scale=100) keep the 4dp log2fc deterministic; numeric parity is
    also unit-tested against reference t-tables (tests/test_stats.py)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_returnflag"
    )
    t = welch_t_stats(
        li, "l_partkey", "l_extendedprice", "l_returnflag", "R", "A", value_scale=100
    )
    withp = t.withColumn("pvalue", student_t_two_sided_p("t_stat", "t_df"))
    adj = bh_fdr(withp, "pvalue", "adjusted_pvalue")
    return adj.select(
        "l_partkey",
        rnd("log2fc", 4).alias("log2fc"),
        rnd("pvalue", 6).alias("pvalue"),
        rnd("adjusted_pvalue", 6).alias("adjusted_pvalue"),
        # coalesce: undefined p (NULL) is NOT significant — the reference's
        # filter drops NaN rows (pipeline2.py:639-643); a NULL boolean would
        # also render differently in the two engines' value-hash
        F.coalesce(
            (F.col("adjusted_pvalue") < 0.05)
            & (F.abs(F.col("log2fc")) > 1)
            & F.col("log2fc").isNotNull(),
            F.lit(False),
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# T3: BH-FDR on deterministic pseudo p-values (oracle-checkable)
# --------------------------------------------------------------------------
@register(
    "bh_fdr_adjust",
    tags=("stats", "window"),
    oracle=f"""
    WITH pv AS (
      SELECT DISTINCT l_partkey, {_PSEUDO_P} AS pvalue FROM lineitem
    ),
    ranked AS (
      SELECT l_partkey, pvalue,
             row_number() OVER (ORDER BY pvalue ASC) AS r,
             count(*) OVER () AS m
      FROM pv
    )
    SELECT l_partkey,
           {rnd_sql("pvalue", 6)} AS pvalue,
           {rnd_sql('''least(min(pvalue * m / r) OVER
                   (ORDER BY pvalue ASC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                 1.0)''', 6)} AS adjusted_pvalue
    FROM ranked
    """,
)
def bh_fdr_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction (T3, pipeline2.py:619-627) as a pure
    window program: rank ascending, raw = p*m/r, reverse running min, cap at
    1. Pseudo p-values are integer-hash-derived so both engines see identical
    doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.select("l_partkey").distinct().withColumn("pvalue", F.expr(_PSEUDO_P))
    adj = bh_fdr(pv, "pvalue", "adjusted_pvalue")
    return adj.select(
        "l_partkey",
        rnd("pvalue", 6).alias("pvalue"),
        rnd("adjusted_pvalue", 6).alias("adjusted_pvalue"),
    )


# Row-level pseudo p-value over the full fact table: the inner mod keeps the
# product within int64 (Spark 4 ANSI mode would error on overflow; DuckDB
# would silently widen to HUGEINT — either way the engines must agree).
# ~1% of rows get NULL to exercise the statsmodels-style NaN passthrough.
_PSEUDO_P_ROW = (
    "CASE WHEN (l_orderkey + l_linenumber) % 97 = 0 THEN NULL "
    "ELSE (((l_orderkey * 131071 + l_linenumber) % 1000003) * 2654435761 % 1000003)"
    " / 1000003e0 END"
)


@register(
    "bh_fdr_scalable_adjust",
    tags=("stats", "window", "scalable"),
    oracle=f"""
    WITH pv AS (
      SELECT l_orderkey, l_linenumber, {_PSEUDO_P_ROW} AS pvalue FROM lineitem
    ),
    ranked AS (
      SELECT l_orderkey, l_linenumber, pvalue,
             row_number() OVER (ORDER BY pvalue ASC) AS r,
             count(*) OVER () AS m
      FROM pv WHERE pvalue IS NOT NULL
    ),
    adj AS (
      SELECT l_orderkey, l_linenumber, pvalue,
             least(min(pvalue * m / r) OVER
                     (ORDER BY pvalue ASC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                   1.0) AS adjusted_pvalue
      FROM ranked
    )
    SELECT l_orderkey, l_linenumber,
           {rnd_sql("pvalue", 6)} AS pvalue,
           {rnd_sql("adjusted_pvalue", 6)} AS adjusted_pvalue
    FROM adj
    UNION ALL
    SELECT l_orderkey, l_linenumber, NULL, NULL
    FROM pv WHERE pvalue IS NULL
    """,
)
def bh_fdr_scalable_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH-FDR via the RANGE-PARTITIONED two-pass variant (T3 at 100x
    cardinality): repartitionByRange on p keeps a global order, ranks are
    per-partition row_numbers plus broadcast offsets, and the reverse
    running-min folds per-partition tails — no single-partition window
    anywhere (bh_fdr's escape hatch, functions/stats.py). Runs over every
    lineitem row (fact-table cardinality), including NULL passthrough and
    hash-collision p-value ties; exact equality with ``bh_fdr`` is pinned in
    tests/test_stats.py."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.select("l_orderkey", "l_linenumber").withColumn(
        "pvalue", F.expr(_PSEUDO_P_ROW)
    )
    # static boundary grid (optimization r14): _PSEUDO_P_ROW is uniform on
    # [0,1) BY CONSTRUCTION (a full-period integer hash divided by its
    # modulus), so the i/32 grid is exactly what approxQuantile would
    # estimate — passing it skips the quantile action (one full pass +
    # 3 jobs at every plan build) while bucket balance stays identical.
    # Correctness is boundary-independent (see bh_fdr_scalable); exact
    # equality with the single-window bh_fdr stays pinned in
    # tests/test_stats.py for BOTH boundary modes.
    adj = bh_fdr_scalable(
        pv,
        "pvalue",
        "adjusted_pvalue",
        partitions=32,
        boundaries=[i / 32 for i in range(1, 32)],
    )
    return adj.select(
        "l_orderkey",
        "l_linenumber",
        rnd("pvalue", 6).alias("pvalue"),
        rnd("adjusted_pvalue", 6).alias("adjusted_pvalue"),
    )


# --------------------------------------------------------------------------
# A6 + K1: top-k by variance
# --------------------------------------------------------------------------
@register(
    "top_variance_parts",
    tags=("stats", "topk"),
    oracle=f"""
    SELECT l_partkey, {rnd_sql("var_samp(l_extendedprice)", 4)} AS variance
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 2
    ORDER BY variance DESC, l_partkey ASC
    LIMIT 100
    """,
)
def top_variance_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-variable genes (A6/K1, pipeline2.py:683-686): var_samp
    (pandas ddof=1) + orderBy/limit -> TakeOrderedAndProject, deterministic
    tie-break on the key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            rnd(F.var_samp("l_extendedprice"), 4).alias("variance"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .drop("_n")
        .orderBy(F.desc("variance"), F.asc("l_partkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# T4+T5: min-max scaling + composite score + ranked top-k
# --------------------------------------------------------------------------
@register(
    "supplier_composite_score",
    tags=("stats", "topk"),
    oracle=f"""
    WITH m AS (
      SELECT l_suppkey,
             sum(l_extendedprice * (1 - l_discount)) AS revenue,
             count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_partkey)  AS n_parts
      FROM lineitem GROUP BY l_suppkey
    ),
    s AS (
      SELECT l_suppkey,
        CASE WHEN max(revenue) OVER () = min(revenue) OVER () THEN 0.0
             ELSE (revenue - min(revenue) OVER ()) / (max(revenue) OVER () - min(revenue) OVER ()) END AS rev_s,
        CASE WHEN max(n_orders) OVER () = min(n_orders) OVER () THEN 0.0
             ELSE (n_orders - min(n_orders) OVER ()) * 1.0 / (max(n_orders) OVER () - min(n_orders) OVER ()) END AS ord_s,
        CASE WHEN max(n_parts) OVER () = min(n_parts) OVER () THEN 0.0
             ELSE (n_parts - min(n_parts) OVER ()) * 1.0 / (max(n_parts) OVER () - min(n_parts) OVER ()) END AS part_s
      FROM m
    )
    SELECT l_suppkey, {rnd_sql("(rev_s + ord_s + part_s) / 3", 6)} AS composite_score
    FROM s
    ORDER BY composite_score DESC, l_suppkey ASC
    LIMIT 20
    """,
)
def supplier_composite_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scale three per-key metrics and rank by their mean (T4+T5,
    pipeline2.py:759-771) — the reference's target-scoring shape. Scaling via
    one 1-row stats aggregate broadcast-joined back (no global window).

    The plain-sum and the two distinct aggregates run as separate passes
    joined on the group key: two distincts over different columns in one
    agg force Expand planning (every row duplicated per distinct branch),
    tripling shuffle volume — the split keeps each distinct a clean
    two-phase aggregate, and the joins co-partition on l_suppkey."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    nord = li.groupBy("l_suppkey").agg(F.countDistinct("l_orderkey").alias("n_orders"))
    npart = li.groupBy("l_suppkey").agg(F.countDistinct("l_partkey").alias("n_parts"))
    m = rev.join(nord, "l_suppkey").join(npart, "l_suppkey")
    m = m.withColumn("n_orders", F.col("n_orders").cast("double")).withColumn(
        "n_parts", F.col("n_parts").cast("double")
    )
    scaled = minmax_scale(m, ["revenue", "n_orders", "n_parts"])
    return (
        scaled.select(
            "l_suppkey",
            rnd(
                (F.col("revenue_scaled") + F.col("n_orders_scaled") + F.col("n_parts_scaled"))
                / 3.0,
                6,
            ).alias("composite_score"),
        )
        .orderBy(F.desc("composite_score"), F.asc("l_suppkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# T1b: robust (median/MAD) standardization
# --------------------------------------------------------------------------
@register(
    "robust_zscore_by_part",
    tags=("stats", "agg"),
    oracle=f"""
    WITH med AS (
      SELECT l_partkey, median(l_extendedprice) AS med
      FROM lineitem GROUP BY l_partkey
    ),
    mad AS (
      SELECT l.l_partkey, median(abs(l.l_extendedprice - m.med)) AS mad
      FROM lineitem l JOIN med m ON l.l_partkey = m.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT l.l_orderkey, l.l_linenumber,
           {rnd_sql('''
             CASE WHEN d.mad = 0 THEN 0.0
                  ELSE (l.l_extendedprice - m.med) / (1.4826 * d.mad)
             END''', 6)} AS robust_z
    FROM lineitem l
    JOIN med m ON l.l_partkey = m.l_partkey
    JOIN mad d ON l.l_partkey = d.l_partkey
    """,
)
def robust_zscore_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-resistant standardization: (x - median) / (1.4826 * MAD),
    the robust alternative to T1's mean/stddev z-score that QC pipelines
    use when heavy tails would poison the moments. Exact medians at both
    levels (never percentile_approx — the oracle hash-match demands it).

    Plan: two stacked window aggregates over the SAME partitioning
    (``median(...) over (partition by l_partkey)`` then
    ``median(abs(x-med))`` over it) — ONE shuffle of the fact table on
    l_partkey, zero joins, zero cached materializations. The previous
    agg+join diamond (groupBy-median -> join -> groupBy-MAD -> join) paid
    two fact-side shuffle joins plus a cache write; this form is ~10x
    faster cold at sf0.1 (1.9s vs 19s) and at cluster scale moves exactly
    one copy of the fact table instead of three. Per-key state is the
    in-partition sort Spark's window median needs anyway; skewed parts
    bound the largest task at max group size, same as the groupBy form."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )
    w = PWindow.partitionBy("l_partkey")
    return (
        li.withColumn("med", F.median("l_extendedprice").over(w))
        .withColumn("mad", F.median(F.abs(F.col("l_extendedprice") - F.col("med"))).over(w))
        .select(
            "l_orderkey",
            "l_linenumber",
            rnd(
                F.when(F.col("mad") == 0.0, F.lit(0.0)).otherwise(
                    (F.col("l_extendedprice") - F.col("med")) / (1.4826 * F.col("mad"))
                ),
                6,
            ).alias("robust_z"),
        )
    )


# --------------------------------------------------------------------------
# T2 [EXT]: Mann-Whitney U rank-sum test (nonparametric twin of Welch t)
# --------------------------------------------------------------------------
@register(
    "mann_whitney_u_by_part",
    tags=("stats", "window", "ranktest"),
    oracle=f"""
    WITH two AS (
      SELECT l_partkey, l_returnflag, l_extendedprice AS v
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ),
    ranked AS (
      SELECT l_partkey, l_returnflag, v,
             row_number() OVER (PARTITION BY l_partkey ORDER BY v) AS rn
      FROM two
    ),
    tied AS (
      SELECT l_partkey, l_returnflag,
             avg(rn) OVER (PARTITION BY l_partkey, v) AS arank,
             count(*) OVER (PARTITION BY l_partkey, v) AS t
      FROM ranked
    ),
    g AS (
      SELECT l_partkey,
             count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n1,
             count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n2,
             sum(CASE WHEN l_returnflag = 'R' THEN arank END) AS r1,
             sum(t * t - 1.0) AS tiesum
      FROM tied GROUP BY l_partkey
    )
    SELECT l_partkey, n1, n2,
           {rnd_sql("r1 - n1 * (n1 + 1.0) / 2.0", 2)} AS u_stat,
           {rnd_sql('''CASE WHEN n1 >= 2 AND n2 >= 2 AND
                 (n1 * n2 / 12.0) * ((n1 + n2 + 1.0)
                   - tiesum / ((n1 + n2) * (n1 + n2 - 1.0))) > 0
            THEN ((r1 - n1 * (n1 + 1.0) / 2.0) - n1 * n2 / 2.0)
                 / sqrt((n1 * n2 / 12.0) * ((n1 + n2 + 1.0)
                        - tiesum / ((n1 + n2) * (n1 + n2 - 1.0)))) END''', 6)}
             AS z_score
    FROM g WHERE n1 >= 1 AND n2 >= 1
    """,
)
def mann_whitney_u_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per gene (case 'R' vs control 'A') —
    the nonparametric differential test pipelines reach for when the
    t-test's normality assumption fails, with exact midrank tie handling
    and the tie-corrected normal approximation.

    Exactness without floats-order risk: midranks are averages of integer
    row_numbers (exact halves in binary doubles), the tie correction
    Σ(t³-t) folds to a per-row sum of (t²-1) so no second grouping is
    needed, and z is one identical arithmetic expression on both engines
    (sqrt is correctly-rounded IEEE in both). Plan: ONE shuffle on
    l_partkey — the (part, value) tie window's required clustering is
    satisfied by the part partitioning (subset rule), so Spark inserts
    only a sort, then the final aggregation is partial-aggregated on the
    same key. The reference computes rank tests per-gene in a Python
    loop; this is the whole-table windowed form."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    ).select("l_partkey", "l_returnflag", F.col("l_extendedprice").alias("v"))
    w_rank = PWindow.partitionBy("l_partkey").orderBy("v")
    w_tie = PWindow.partitionBy("l_partkey", "v")
    tied = (
        li.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("arank", F.avg("rn").over(w_tie))
        .withColumn("t", F.count(F.lit(1)).over(w_tie))
    )
    g = tied.groupBy("l_partkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n1"),
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("n2"),
        F.sum(F.when(F.col("l_returnflag") == "R", F.col("arank"))).alias("r1"),
        F.sum(F.col("t") * F.col("t") - 1.0).alias("tiesum"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1.0) / 2.0
    nn = F.col("n1") + F.col("n2")
    sigma2 = (F.col("n1") * F.col("n2") / 12.0) * (
        (nn + 1.0) - F.col("tiesum") / (nn * (nn - 1.0))
    )
    z = F.when(
        (F.col("n1") >= 2) & (F.col("n2") >= 2) & (sigma2 > 0),
        (u - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(sigma2),
    )
    return (
        g.filter((F.col("n1") >= 1) & (F.col("n2") >= 1))
        .select(
            "l_partkey",
            "n1",
            "n2",
            rnd(u, 2).alias("u_stat"),
            rnd(z, 6).alias("z_score"),
        )
    )


# --------------------------------------------------------------------------
# T1 [EXT]: binned quantile normalization (microarray preprocessing staple)
# --------------------------------------------------------------------------
_QN_BINS = 100


@register(
    "quantile_normalize_by_supplier",
    tags=("stats", "window", "normalization"),
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
             percent_rank() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice)
               AS pr,
             count(*) OVER (PARTITION BY l_suppkey) AS n_s
      FROM lineitem
    ),
    binned AS (
      SELECT *, CAST(least(floor(pr * {_QN_BINS}), {_QN_BINS} - 1) AS BIGINT) AS bin
      FROM ranked
    ),
    ref AS (
      SELECT bin,
             CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / (count(*) * 100.0) AS bin_mean
      FROM binned GROUP BY bin
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_suppkey, b.bin,
           {rnd_sql("r.bin_mean", 6)} AS qn_value
    FROM binned b JOIN ref r ON b.bin = r.bin
    WHERE b.n_s >= 2
    """,
)
def quantile_normalize_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (binned form) — the microarray preprocessing
    staple (limma/affy 'normalizeQuantiles') the reference's expression
    pipeline presumes upstream: each sample's (supplier's) values are
    replaced by the cross-sample mean of their quantile bin, forcing every
    sample onto a common distribution.

    Exact-by-construction cross-engine: the bin comes from percent_rank
    (min-rank — TIES SHARE A RANK, so no arbitrary tie placement like
    ntile's), the bin means are cent-quantized integer sums divided once,
    and both engines evaluate the identical expressions. Plan: one window
    shuffle on the sample key (2000 suppliers — real parallelism, unlike a
    3-group flag partitioning), one B-row reference aggregate joined back
    by broadcast. Classic full QN interpolates exact per-rank means across
    equal-length samples; the binned form is the standard large-scale
    relaxation and is stated as such, not passed off as the exact one."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    w = PWindow.partitionBy("l_suppkey").orderBy("l_extendedprice")
    wp = PWindow.partitionBy("l_suppkey")
    binned = (
        li.withColumn("pr", F.percent_rank().over(w))
        .withColumn("n_s", F.count(F.lit(1)).over(wp))
        .withColumn(
            "bin",
            F.least(
                F.floor(F.col("pr") * _QN_BINS), F.lit(_QN_BINS - 1)
            ).cast("long"),
        )
    )
    ref = binned.groupBy("bin").agg(
        (
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)) * 100.0)
        ).alias("bin_mean")
    )
    return (
        binned.filter(F.col("n_s") >= 2)
        .join(F.broadcast(ref), "bin")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "bin",
            rnd(F.col("bin_mean"), 6).alias("qn_value"),
        )
    )


# --------------------------------------------------------------------------
# Exact full quantile normalization (normalizeQuantiles semantics)
# --------------------------------------------------------------------------
_QNX_SAMPLES = 8  # number of pseudo-samples (l_suppkey mod)
_QNX_SLICE = 97  # keep l_partkey % _QNX_SLICE == 0 — bounded fixture slice


@register(
    "quantile_normalize_exact",
    tags=("stats", "window"),
    oracle=f"""
    WITH x AS (
      SELECT l_orderkey, l_linenumber,
             l_suppkey % {_QNX_SAMPLES} AS sample_id,
             l_extendedprice AS v
      FROM lineitem WHERE l_partkey % {_QNX_SLICE} = 0
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY sample_id
                                ORDER BY v, l_orderkey, l_linenumber) AS rk
      FROM x
    ),
    m AS (
      SELECT min(n) AS m FROM (
        SELECT count(*) AS n FROM x GROUP BY sample_id)
    ),
    trimmed AS (SELECT r.* FROM r CROSS JOIN m WHERE r.rk <= m.m),
    refdist AS (
      SELECT rk,
             sum(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS qsum,
             count(*) AS n_at_rank
      FROM trimmed GROUP BY rk
    ),
    joined AS (
      SELECT t.sample_id, t.l_orderkey, t.l_linenumber, t.rk, t.v,
             f.qsum, f.n_at_rank
      FROM trimmed t JOIN refdist f ON t.rk = f.rk
    )
    SELECT sample_id, l_orderkey, l_linenumber, rk,
           {rnd_sql('''CAST(sum(qsum) OVER (PARTITION BY sample_id, v) AS DOUBLE)
             / (count(*) OVER (PARTITION BY sample_id, v) * n_at_rank * 100.0)''', 6)}
             AS qn_value
    FROM joined
    """,
)
def quantile_normalize_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT full quantile normalization — the reference-faithful per-rank
    form (limma ``normalizeQuantiles`` / Bolstad 2003): equal-length
    samples, each value replaced by the MEAN OF THE k-th ORDER STATISTICS
    across samples at its rank, ties sharing the mean of their tied ranks'
    reference values (limma ``ties=TRUE``). The binned relaxation next door
    (``quantile_normalize_by_supplier``) is the large-scale form; this is
    the exact twin on a bounded fixture slice, so the stats tier carries
    both the production relaxation and the textbook-exact semantics.

    Equal-length samples by construction: {_QNX_SAMPLES} pseudo-samples
    (``l_suppkey % {_QNX_SAMPLES}``) over a 1/{_QNX_SLICE} part slice, each
    trimmed to the minimum sample length m by a deterministic rank
    (value, then orderkey/linenumber tiebreak) — the standard equal-length
    precondition made explicit rather than assumed. Cross-engine exactness:
    the per-rank reference value is a cent-quantized INTEGER sum, and the
    tie average is computed as sum-of-integer-rank-sums over the tie group
    divided ONCE — pure integer arithmetic until a single IEEE division,
    identical both engines regardless of row order.

    Scale shape: one window shuffle on the sample key (rank + trim), one
    rank-keyed aggregate (m rows — data-proportional, so NOT force-
    broadcast; AQE decides the join side), one tie-group window that reuses
    the sample-key partitioning. No per-row Python; every expression is
    whole-stage codegen. At 100 TB the sample count is the parallelism
    bound — real microarray QN has thousands of samples, and each sample's
    sort is partition-local after the one exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = li.filter(F.col("l_partkey") % _QNX_SLICE == 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_suppkey") % _QNX_SAMPLES).alias("sample_id"),
        F.col("l_extendedprice").alias("v"),
    )
    w_rank = PWindow.partitionBy("sample_id").orderBy(
        "v", "l_orderkey", "l_linenumber"
    )
    r = x.withColumn("rk", F.row_number().over(w_rank))
    # minimum sample length: a 1-row aggregate — constant-size, broadcast
    m = (
        x.groupBy("sample_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("m"))
    )
    trimmed = r.crossJoin(F.broadcast(m)).filter(F.col("rk") <= F.col("m"))
    refdist = trimmed.groupBy("rk").agg(
        F.sum(F.floor(F.col("v") * 100.0 + F.lit(0.5)).cast("long")).alias("qsum"),
        F.count(F.lit(1)).alias("n_at_rank"),
    )
    joined = trimmed.join(refdist, "rk")
    w_tie = PWindow.partitionBy("sample_id", "v")
    return joined.select(
        "sample_id",
        "l_orderkey",
        "l_linenumber",
        "rk",
        rnd(
            F.sum("qsum").over(w_tie).cast("double")
            / (F.count(F.lit(1)).over(w_tie) * F.col("n_at_rank") * F.lit(100.0)),
            6,
        ).alias("qn_value"),
    )


# --------------------------------------------------------------------------
# Winsorized robust group statistics (outlier-clipped preprocessing)
# --------------------------------------------------------------------------
@register(
    "winsorized_price_stats",
    tags=("stats", "robust"),
    oracle=f"""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    ),
    clipped AS (
      SELECT l.l_returnflag,
             CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END AS clip_lo,
             CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END AS clip_hi,
             CAST(floor(
               CASE WHEN l_extendedprice < p05 THEN p05
                    WHEN l_extendedprice > p95 THEN p95
                    ELSE l_extendedprice END * 1000000.0 + 0.5
             ) AS BIGINT) AS wq,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    )
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(clip_lo) AS BIGINT) AS n_clipped_lo,
           CAST(sum(clip_hi) AS BIGINT) AS n_clipped_hi,
           {rnd_sql("sum(cents) / (100.0 * count(*))", 4)} AS raw_mean,
           {rnd_sql("sum(wq) / (1000000.0 * count(*))", 4)} AS winsorized_mean
    FROM clipped GROUP BY l_returnflag
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at [p05, p95] — the standard outlier-robust
    preprocessing step (clip, don't drop) before scale-sensitive models —
    reported as clip counts plus raw vs winsorized means so the effect of
    the clipping is the visible deliverable.

    Scale shape: one exact-percentile aggregation collapses each group to
    a 2-quantile bounds row (group-count-sized table: AQE broadcasts it
    back onto the fact join), then one map-side-combined aggregate over
    the clipped stream — two shuffles total, both keyed on the same group
    column, no window over the fact. At 100 TB the bounds pass swaps to
    ``approx_percentile`` (mergeable t-digest/GK sketch, no per-group
    sort) with the same downstream plan; exact here because the oracle
    hash demands it. Clipped values are quantized to integer micro-units
    (and raw prices to exact cents) before summing so both means are
    order-independent and engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.05), F.lit(0.95))).alias("_q")
    ).select(
        "l_returnflag", F.col("_q")[0].alias("p05"), F.col("_q")[1].alias("p95")
    )
    x = F.col("l_extendedprice")
    clipped = li.join(bounds, "l_returnflag").select(
        "l_returnflag",
        F.when(x < F.col("p05"), 1).otherwise(0).alias("clip_lo"),
        F.when(x > F.col("p95"), 1).otherwise(0).alias("clip_hi"),
        F.floor(
            F.when(x < F.col("p05"), F.col("p05"))
            .when(x > F.col("p95"), F.col("p95"))
            .otherwise(x)
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("wq"),
        F.floor(x * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("clip_lo").cast("long").alias("n_clipped_lo"),
        F.sum("clip_hi").cast("long").alias("n_clipped_hi"),
        rnd(F.sum("cents") / (F.lit(100.0) * F.count(F.lit(1))), 4).alias("raw_mean"),
        rnd(
            F.sum("wq") / (F.lit(1000000.0) * F.count(F.lit(1))), 4
        ).alias("winsorized_mean"),
    )
