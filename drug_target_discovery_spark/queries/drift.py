"""Distribution-drift tier (SURVEY §2.12 [EXT]): the monitors an ML-ops
pipeline runs between corpus snapshots / data refreshes — two-sample
Kolmogorov-Smirnov, Population Stability Index, and a chi-squared
independence test — as exact window/aggregate programs.

No reference counterpart (pipeline2.py has no monitoring surface); these
are the standard drift detectors (PSI from credit-scoring practice, KS/χ²
from any stats text) re-expressed as single-exchange Spark plans with
cross-engine-exact arithmetic: every statistic folds integer counts and
quantizes transcendental terms to integer micro-units BEFORE summation,
so both engines produce bit-identical sums regardless of row order.

Scale stance shared by all three: raw values NEVER shuffle row-at-a-time —
each plan first collapses to (group, value/bucket) counts with map-side
partial aggregation, and the window/final stages run over the collapsed
table (distinct values x groups, orders smaller than the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PWindow
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

# KS cohorts: compare price distributions between return flags within each
# supplier cohort — the "did this slice drift between the two populations"
# question, many groups so the window exchange parallelizes.
_KS_COHORTS = 25
_KS_F1, _KS_F2 = "R", "A"
_KS_CALPHA = 1.358  # asymptotic critical coefficient for alpha = 0.05


@register(
    "ks_test_price_drift",
    tags=("drift", "stats", "window", "scalable"),
    oracle=f"""
    WITH src AS (
      SELECT l_suppkey % {_KS_COHORTS} AS cohort, l_returnflag AS f,
             l_extendedprice AS v
      FROM lineitem WHERE l_returnflag IN ('{_KS_F1}', '{_KS_F2}')
    ),
    vc AS (
      SELECT cohort, v,
             sum(CASE WHEN f = '{_KS_F1}' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN f = '{_KS_F2}' THEN 1 ELSE 0 END) AS c2
      FROM src GROUP BY cohort, v
    ),
    tot AS (
      SELECT cohort, sum(c1) AS n1, sum(c2) AS n2 FROM vc GROUP BY cohort
    ),
    cum AS (
      SELECT vc.cohort,
             sum(c1) OVER (PARTITION BY vc.cohort ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / t.n1
             - sum(c2) OVER (PARTITION BY vc.cohort ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / t.n2 AS diff,
             t.n1, t.n2
      FROM vc JOIN tot t ON vc.cohort = t.cohort
      WHERE t.n1 > 0 AND t.n2 > 0
    )
    SELECT cohort, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           {rnd_sql("max(abs(diff))", 6)} AS ks_d,
           CAST(max(abs(diff)) >
                {_KS_CALPHA} * sqrt((n1 + n2) * 1.0 / (n1 * n2))
                AS INT) AS reject_05
    FROM cum GROUP BY cohort, n1, n2
    """,
)
def ks_test_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov per cohort: D = sup over values of
    |F_R(v) - F_A(v)| between the '{_KS_F1}' and '{_KS_F2}' return-flag
    populations of l_extendedprice, with the asymptotic alpha=0.05
    rejection flag (c(α)={_KS_CALPHA}) — the distribution-shift detector a
    pipeline runs between data refreshes. Tie-safe by construction: values
    collapse to per-(cohort, value) COUNTS first, so the empirical CDFs
    are evaluated once per distinct value and no within-value row order
    exists to diverge on.

    Cross-engine exactness: cum1/n1 - cum2/n2 is a difference of exact
    integer ratios (< 2^53), identical IEEE in both engines; max over
    identical doubles is identical; the rejection compare reads the same
    two identically-computed doubles on both sides.

    Scale shape: one map-side partial-agg collapse to (cohort, value)
    counts — raw rows never shuffle; the CDF window and the final max ride
    ONE cohort-keyed exchange (the {_KS_COHORTS} cohorts parallelize it);
    per-cohort totals join back on the same key.

    Optimization r13 note: replacing the tot-aggregate + join with
    full-partition window sums (fewer exchanges on paper, 10 -> 4) was
    tried and REVERTED — measured ~50% slower (isolated A/B at sf0.1:
    3.7/2.2/2.0s vs this form's 2.9/1.5/1.3s). The unbounded window
    forces a per-cohort sort pass before the CDF window's own sort; the
    tiny cohort-keyed aggregate + broadcast-joined totals are cheaper."""
    src = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin(_KS_F1, _KS_F2))
        .select(
            (F.col("l_suppkey") % _KS_COHORTS).alias("cohort"),
            F.col("l_returnflag").alias("f"),
            F.col("l_extendedprice").alias("v"),
        )
    )
    vc = src.groupBy("cohort", "v").agg(
        F.sum(F.when(F.col("f") == _KS_F1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("f") == _KS_F2, 1).otherwise(0)).alias("c2"),
    )
    tot = vc.groupBy("cohort").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    w = (
        PWindow.partitionBy("cohort")
        .orderBy("v")
        .rowsBetween(PWindow.unboundedPreceding, PWindow.currentRow)
    )
    cum = (
        vc.join(tot, "cohort")
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "cohort",
            "n1",
            "n2",
            (
                F.sum("c1").over(w) * F.lit(1.0) / F.col("n1")
                - F.sum("c2").over(w) * F.lit(1.0) / F.col("n2")
            ).alias("diff"),
        )
    )
    crit = _KS_CALPHA * F.sqrt(
        (F.col("n1") + F.col("n2")) * F.lit(1.0) / (F.col("n1") * F.col("n2"))
    )
    return cum.groupBy("cohort", "n1", "n2").agg(
        rnd(F.max(F.abs(F.col("diff"))), 6).alias("ks_d"),
        (F.max(F.abs(F.col("diff"))) > crit).cast("int").alias("reject_05"),
    )


# PSI: price distribution between the two order halves (old vs new), fixed
# price buckets, Laplace +1 smoothing so empty buckets stay defined.
_PSI_BUCKET = 10_000  # price bucket width
_PSI_SPLIT = "o_orderkey % 2"  # deterministic old/new population split


@register(
    "psi_price_stability",
    tags=("drift", "stats", "scalable"),
    oracle=f"""
    WITH src AS (
      SELECT CAST(floor(l_extendedprice / {_PSI_BUCKET}) AS BIGINT) AS bucket,
             l_orderkey % 2 AS pop
      FROM lineitem
    ),
    bc AS (
      SELECT bucket,
             sum(CASE WHEN pop = 0 THEN 1 ELSE 0 END) + 1 AS c_old,
             sum(CASE WHEN pop = 1 THEN 1 ELSE 0 END) + 1 AS c_new
      FROM src GROUP BY bucket
    ),
    tot AS (SELECT sum(c_old) AS n_old, sum(c_new) AS n_new FROM bc),
    terms AS (
      SELECT bucket,
             CAST(floor(
               (c_new * 1.0 / t.n_new - c_old * 1.0 / t.n_old)
               * ln((c_new * 1.0 / t.n_new) / (c_old * 1.0 / t.n_old))
               * 100000000.0 + 0.5) AS BIGINT) AS psi_q
      FROM bc CROSS JOIN tot t
    )
    SELECT count(*) AS n_buckets,
           {rnd_sql("sum(psi_q) / 100000000.0", 6)} AS psi,
           CAST(sum(psi_q) > 10000000 AS INT) AS drift_alert
    FROM terms
    """,
)
def psi_price_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the two deterministic order
    halves over fixed {_PSI_BUCKET}-unit price buckets, Laplace +1
    smoothed (every observed bucket defined for both populations):
    PSI = Σ (p_new - p_old) · ln(p_new/p_old); alert at the conventional
    0.1 threshold. PSI is THE drift score model-monitoring pipelines
    compute per feature per refresh.

    Cross-engine exactness: each bucket term is quantized to integer
    1e-8 units before the sum (order-independent — the same discipline as
    the BM25/unigram scorers), and the alert threshold compares the
    integer sum against 0.1 in the same units, so the flag cannot sit on
    a float boundary.

    Scale shape: one map-side collapse to bucket counts (buckets =
    price-range/{_PSI_BUCKET}, a constant-ish set, NOT row-proportional),
    a 1-row total broadcast, and a bucket-count-sized final aggregate.
    Raw rows never shuffle."""
    src = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") / _PSI_BUCKET)
        .cast("bigint")
        .alias("bucket"),
        (F.col("l_orderkey") % 2).alias("pop"),
    )
    bc = src.groupBy("bucket").agg(
        (F.sum(F.when(F.col("pop") == 0, 1).otherwise(0)) + 1).alias("c_old"),
        (F.sum(F.when(F.col("pop") == 1, 1).otherwise(0)) + 1).alias("c_new"),
    )
    tot = bc.agg(F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new"))
    p_old = F.col("c_old") * F.lit(1.0) / F.col("n_old")
    p_new = F.col("c_new") * F.lit(1.0) / F.col("n_new")
    psi_q = F.floor(
        (p_new - p_old) * F.log(p_new / p_old) * 100000000.0 + F.lit(0.5)
    ).cast("long")
    terms = bc.crossJoin(F.broadcast(tot)).select(psi_q.alias("psi_q"))
    return terms.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        rnd(F.sum("psi_q") / F.lit(100000000.0), 6).alias("psi"),
        (F.sum("psi_q") > 10_000_000).cast("int").alias("drift_alert"),
    )


# Chi-squared independence: order status x order priority contingency.
@register(
    "chi2_status_priority",
    tags=("drift", "stats"),
    oracle=f"""
    WITH obs AS (
      SELECT o_orderstatus AS rf, o_orderpriority AS sm, count(*) AS o
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    margins AS (
      SELECT rf, sm, o,
             sum(o) OVER (PARTITION BY rf) AS row_n,
             sum(o) OVER (PARTITION BY sm) AS col_n,
             sum(o) OVER () AS n
      FROM obs
    ),
    terms AS (
      SELECT rf, sm,
             CAST(floor(
               (o - row_n * 1.0 * col_n / n) * (o - row_n * 1.0 * col_n / n)
               / (row_n * 1.0 * col_n / n) * 1000000.0 + 0.5) AS BIGINT)
               AS chi_q,
             row_n, col_n, n
      FROM margins
    )
    SELECT count(*) AS n_cells,
           CAST(count(DISTINCT rf) - 1 AS BIGINT)
             * (count(DISTINCT sm) - 1) AS dof,
           {rnd_sql("sum(chi_q) / 1000000.0", 4)} AS chi2,
           {rnd_sql('''sqrt((sum(chi_q) / 1000000.0)
             / (max(n) * least(count(DISTINCT rf) - 1,
                               count(DISTINCT sm) - 1)))''', 6)} AS cramers_v
    FROM terms
    """,
)
def chi2_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test on the order-status × order-priority
    contingency table: Σ (O - E)²/E with E = row·col/N — the categorical
    drift/association check (is fulfilment status independent of the
    priority channel?). Each cell term is quantized to integer micro-units
    before the sum, so the statistic is order-independent and identical
    on both engines; degrees of freedom come with it for the consumer's
    p-value lookup, and Cramér's V = sqrt((χ²/N)/min(r-1, c-1)) gives the
    sample-size-free effect size practitioners actually threshold on.

    Scale shape: ONE aggregation collapses the fact table to the
    contingency cells (|flags| × |modes| rows — constant-sized); margins
    are windows over that constant table; everything after the first
    partial-aggregated exchange is effectively free."""
    obs = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("rf"),
            F.col("o_orderpriority").alias("sm"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # windows (incl. the unpartitioned total) are bounded: input = the
    # contingency table, |domain(rf)| x |domain(sm)| cells BY CONSTRUCTION
    w_rf = PWindow.partitionBy("rf")
    w_sm = PWindow.partitionBy("sm")
    w_all = PWindow.partitionBy()
    m = obs.select(
        "rf",
        "sm",
        "o",
        F.sum("o").over(w_rf).alias("row_n"),
        F.sum("o").over(w_sm).alias("col_n"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("row_n") * F.lit(1.0) * F.col("col_n") / F.col("n")
    chi_q = F.floor(
        (F.col("o") - e) * (F.col("o") - e) / e * 1000000.0 + F.lit(0.5)
    ).cast("long")
    return m.select("rf", "sm", "n", chi_q.alias("chi_q")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("rf") - 1) * (F.countDistinct("sm") - 1)
        ).cast("long").alias("dof"),
        rnd(F.sum("chi_q") / F.lit(1000000.0), 4).alias("chi2"),
        rnd(
            F.sqrt(
                (F.sum("chi_q") / F.lit(1000000.0))
                / (
                    F.max("n")
                    * F.least(
                        F.countDistinct("rf") - 1, F.countDistinct("sm") - 1
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )
