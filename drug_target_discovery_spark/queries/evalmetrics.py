"""Model-evaluation tier (SURVEY §2.12 [EXT]): ranking-quality metrics a
training pipeline computes on held-out scores at corpus scale — ROC-AUC via
the tie-corrected rank formulation and a sampled precision/recall curve.

No reference counterpart; standard evaluation statistics (Mann-Whitney U
equivalence for AUC; threshold-sweep cumulative counts for PR) expressed as
the same collapse-to-counts window programs as the drift tier: raw rows
never shuffle — each plan first collapses to per-(group, score) counts, so
the windows run over distinct-score tables, and every statistic is exact
integer arithmetic until one final division.

The deterministic "model" under evaluation: label = (l_returnflag = 'R'),
score = l_extendedprice — fixture semantics (does price rank returned
lineitems?); the operator mechanics are what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PWindow
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_AUC_COHORTS = 25  # evaluation slices (parallelism for the rank window)


@register(
    "auc_by_cohort",
    tags=("eval", "stats", "window", "scalable"),
    oracle=f"""
    WITH src AS (
      SELECT l_suppkey % {_AUC_COHORTS} AS cohort,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
             l_extendedprice AS score
      FROM lineitem
    ),
    vc AS (
      SELECT cohort, score,
             count(*) AS cnt, sum(label) AS pos
      FROM src GROUP BY cohort, score
    ),
    ranked AS (
      SELECT cohort, score, cnt, pos,
             coalesce(sum(cnt) OVER (PARTITION BY cohort ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM vc
    ),
    agg AS (
      SELECT cohort,
             sum(pos) AS n_pos,
             sum(cnt) - sum(pos) AS n_neg,
             -- midrank sum of positives, doubled to stay integer:
             -- 2*R+ = sum over ties of pos * (2*cum_before + cnt + 1)
             sum(pos * (2 * cum_before + cnt + 1)) AS two_rpos
      FROM ranked GROUP BY cohort
    )
    SELECT cohort, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           {rnd_sql('''(two_rpos - n_pos * (n_pos + 1.0))
             / (2.0 * n_pos * n_neg)''', 6)} AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0
    """,
)
def auc_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC per evaluation cohort via the rank (Mann-Whitney U)
    formulation with midrank tie correction:
    AUC = (R+ - n+(n+ + 1)/2) / (n+ · n-), where R+ is the sum of the
    positives' midranks under the ascending score order. The midrank sum
    is computed DOUBLED (2·R+ = Σ pos·(2·cum_before + cnt + 1)) so every
    term is an exact integer — both engines divide once at the end,
    making the driver's value hash stable.

    Scale shape (same discipline as the KS/drift tier): one map-side
    collapse to per-(cohort, score) counts — raw rows never shuffle; one
    cohort-keyed window for the cumulative rank offsets; one final
    aggregate. Degenerate cohorts (all-positive / all-negative) drop out
    on both sides — AUC is undefined there."""
    src = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % _AUC_COHORTS).alias("cohort"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        F.col("l_extendedprice").alias("score"),
    )
    vc = src.groupBy("cohort", "score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("label").alias("pos")
    )
    w = (
        PWindow.partitionBy("cohort")
        .orderBy("score")
        .rowsBetween(PWindow.unboundedPreceding, -1)
    )
    ranked = vc.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    agg = ranked.groupBy("cohort").agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("two_rpos"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "cohort",
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            rnd(
                (F.col("two_rpos") - F.col("n_pos") * (F.col("n_pos") + 1.0))
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
    )


_PR_POINTS = 20  # sampled operating points on the curve


@register(
    "pr_curve_sampled",
    tags=("eval", "stats", "window"),
    oracle=f"""
    WITH src AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
             l_extendedprice AS score
      FROM lineitem
    ),
    vc AS (
      SELECT score, count(*) AS cnt, sum(label) AS pos
      FROM src GROUP BY score
    ),
    cum AS (
      SELECT score,
             row_number() OVER (ORDER BY score DESC) AS rn,
             sum(cnt) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at,
             sum(pos) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
      FROM vc
    ),
    tot AS (
      SELECT count(*) AS n_thresh, sum(pos) AS n_pos FROM vc
    ),
    keep AS (
      SELECT c.*, t.n_pos
      FROM cum c CROSS JOIN tot t
      WHERE c.rn % greatest(t.n_thresh // {_PR_POINTS}, 1) = 0
         OR c.rn = t.n_thresh
    )
    SELECT CAST(rn AS BIGINT) AS rn, score AS threshold,
           CAST(tp AS BIGINT) AS tp,
           CAST(n_at - tp AS BIGINT) AS fp,
           {rnd_sql("tp * 1.0 / n_at", 6)} AS precision_at,
           {rnd_sql("tp * 1.0 / n_pos", 6)} AS recall_at
    FROM keep
    """,
)
def pr_curve_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall curve at ~{_PR_POINTS} sampled operating points:
    thresholds are the distinct scores descending, cumulative TP/FP come
    from one running window over the collapsed per-score count table, and
    every {_PR_POINTS}-th threshold (plus the last) is kept — the
    deterministic decimation both engines compute identically, instead of
    emitting one row per distinct score. Precision and recall are single
    divisions of exact integers.

    Scale shape: collapse-to-counts first (distinct scores, not rows),
    then ONE ordered window over that table. The threshold order is a
    single-partition window by construction — bounded by DISTINCT SCORES;
    for a continuous-score model at 100 TB the standard move is quantizing
    scores to fixed precision first (the same bucketing the PSI monitor
    uses), which this plan absorbs as-is."""
    src = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        F.col("l_extendedprice").alias("score"),
    )
    vc = src.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("label").alias("pos")
    )
    # unpartitioned window is bounded: input = per-score count table
    # (distinct scores; quantize scores first for continuous models —
    # see docstring scale note)
    w = PWindow.orderBy(F.col("score").desc())
    w_run = w.rowsBetween(PWindow.unboundedPreceding, PWindow.currentRow)
    cum = vc.select(
        "score",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt").over(w_run).alias("n_at"),
        F.sum("pos").over(w_run).alias("tp"),
    )
    tot = vc.agg(
        F.count(F.lit(1)).alias("n_thresh"), F.sum("pos").alias("n_pos")
    )
    step = F.greatest(F.floor(F.col("n_thresh") / _PR_POINTS), F.lit(1))
    keep = (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("rn") % step == 0) | (F.col("rn") == F.col("n_thresh")))
    )
    return keep.select(
        F.col("rn").cast("long").alias("rn"),
        F.col("score").alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        (F.col("n_at") - F.col("tp")).cast("long").alias("fp"),
        rnd(F.col("tp") * F.lit(1.0) / F.col("n_at"), 6).alias("precision_at"),
        rnd(F.col("tp") * F.lit(1.0) / F.col("n_pos"), 6).alias("recall_at"),
    )


# --------------------------------------------------------------------------
# ANN recall@k: measure the IVF approximation against exact ground truth
# --------------------------------------------------------------------------
from drug_target_discovery_spark.queries.similarity import (  # noqa: E402
    _BUCKET_DUCK,
    _DOT_DUCK,
    _NORM_DUCK,
    _N_QUERIES,
    _TOP_K,
)


@register(
    "ann_recall_eval",
    tags=("eval", "similarity"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, emb AS qemb FROM v WHERE vec_id < {_N_QUERIES}),
    ex_scored AS (
      SELECT q.qid, v.vec_id AS nbr_id,
             {_DOT_DUCK.format(a="q.qemb", b="v.emb")}
               / ({_NORM_DUCK.format(a="q.qemb")} * {_NORM_DUCK.format(a="v.emb")})
             AS cosine
      FROM q CROSS JOIN v WHERE q.qid <> v.vec_id
    ),
    exact AS (
      SELECT qid, nbr_id FROM (
        SELECT qid, nbr_id,
               row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nbr_id ASC) AS rnk
        FROM ex_scored
      ) WHERE rnk <= {_TOP_K}
    ),
    b AS (SELECT vec_id, emb, {_BUCKET_DUCK} AS bucket FROM v),
    qb AS (SELECT vec_id AS qid, emb AS qemb, bucket FROM b WHERE vec_id < {_N_QUERIES}),
    iv_scored AS (
      SELECT qb.qid, b.vec_id AS nbr_id,
             {_DOT_DUCK.format(a="qb.qemb", b="b.emb")}
               / ({_NORM_DUCK.format(a="qb.qemb")} * {_NORM_DUCK.format(a="b.emb")})
             AS cosine
      FROM qb JOIN b USING (bucket) WHERE qb.qid <> b.vec_id
    ),
    approx AS (
      SELECT qid, nbr_id FROM (
        SELECT qid, nbr_id,
               row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nbr_id ASC) AS rnk
        FROM iv_scored
      ) WHERE rnk <= {_TOP_K}
    ),
    ex_counts AS (SELECT qid, count(*) AS n_exact FROM exact GROUP BY qid),
    hits AS (
      SELECT e.qid, count(*) AS n_hits
      FROM exact e JOIN approx a ON e.qid = a.qid AND e.nbr_id = a.nbr_id
      GROUP BY e.qid
    )
    SELECT c.qid, c.n_exact, coalesce(h.n_hits, 0) AS n_hits,
           {rnd_sql(f"coalesce(h.n_hits, 0) * 1.0 / {_TOP_K}", 6)} AS recall_at_k
    FROM ex_counts c LEFT JOIN hits h ON c.qid = h.qid
    ORDER BY c.qid
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-bucketed ANN path against the exact brute-force
    top-k — the honest-measurement companion to `ann_ivf_bucketed_topk`
    (an approximate index without a measured recall is an unquantified
    approximation). Both ranked sets come from the similarity tier's
    shared builders; recall = |ivf ∩ exact| / k per query vector.

    Deterministic end to end: both engines rank identical IEEE doubles
    with the same (cosine DESC, nbr_id ASC) tie-break, so the top-k sets
    and therefore the hit counts match exactly. Scale shape: the exact
    side is the O(Q·N) ground-truth pass an offline eval runs on a
    sample of queries (Q bounded, the broadcast is the Q-row query set);
    the hit join keys on (qid, nbr_id) — two k·Q-row tables."""
    from drug_target_discovery_spark.queries.similarity import _ranked_cached

    # both ranked sets come from the sweep-scoped memos shared with
    # cosine_topk_bruteforce / ann_ivf_bucketed_topk, so the O(Q·N)
    # brute-force pass and the IVF join each run once per sweep
    # (optimization r13; previously this query re-ran both, and the
    # exact side twice — once per consumer below)
    exact = _ranked_cached(spark, sf_dir, "exact").select("qid", "nbr_id")
    approx = _ranked_cached(spark, sf_dir, "ivf").select(
        F.col("qid").alias("a_qid"), F.col("nbr_id").alias("a_nbr")
    )
    # one left join + one aggregate: n_exact = rows per qid, n_hits =
    # matched rows (approx top-k is unique per (qid, nbr) so the join
    # never fans out) — replaces semi-join + two groupBys + outer join
    per_q = (
        exact.join(
            approx,
            (exact.qid == approx.a_qid) & (exact.nbr_id == approx.a_nbr),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("a_nbr").alias("n_hits"),
        )
    )
    return per_q.select(
        "qid",
        "n_exact",
        "n_hits",
        rnd(F.col("n_hits") / F.lit(float(_TOP_K)), 6).alias("recall_at_k"),
    ).orderBy("qid")


# --------------------------------------------------------------------------
# Calibration curve (reliability diagram) over fixed probability bins
# --------------------------------------------------------------------------
_CAL_BINS = 10


@register(
    "calibration_curve_bins",
    tags=("eval", "stats", "scalable"),
    oracle=f"""
    WITH src AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
             l_extendedprice AS score
      FROM lineitem
    ),
    ext AS (SELECT min(score) AS lo, max(score) AS hi FROM src),
    binned AS (
      SELECT label,
             CAST(least(floor((score - lo) / (hi - lo) * {_CAL_BINS}),
                        {_CAL_BINS - 1}) AS INT) AS bin,
             CAST(floor((score - lo) / (hi - lo) * 1000000.0 + 0.5) AS BIGINT)
               AS p_q
      FROM src CROSS JOIN ext
    )
    SELECT bin,
           count(*) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           {rnd_sql("sum(p_q) / (1000000.0 * count(*))", 6)} AS mean_pred,
           {rnd_sql("sum(label) * 1.0 / count(*)", 6)} AS frac_pos
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def calibration_curve_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: min-max-normalize the score to a [0,1]
    pseudo-probability, cut into {_CAL_BINS} fixed-width bins, and report
    each bin's mean predicted value against its empirical positive rate —
    the calibration check (is a "0.8" right 80% of the time?) every
    scored-model refresh runs next to AUC/PR.

    Scale shape: the score extent is ONE 1-row broadcast aggregate; bin
    assignment and the normalized value are map-side arithmetic; the only
    shuffle is the bounded {_CAL_BINS}-row aggregate. The normalized
    pseudo-probability is quantized to integer micro-units BEFORE the
    per-bin sum (order-independent, driver-hash exact); label sums are
    integer counts. Fixed-width bins (not ntile) keep the plan free of
    any global sort — the equal-count variant would ride the same
    monotone-bucket + offset rank machinery as revenue_pareto_deciles."""
    src = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        F.col("l_extendedprice").alias("score"),
    )
    ext = src.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    norm = (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    binned = src.crossJoin(F.broadcast(ext)).select(
        "label",
        F.least(F.floor(norm * _CAL_BINS), F.lit(_CAL_BINS - 1))
        .cast("int")
        .alias("bin"),
        F.floor(norm * 1000000.0 + F.lit(0.5)).cast("long").alias("p_q"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
            rnd(F.sum("p_q") / (1000000.0 * F.count(F.lit(1))), 6).alias(
                "mean_pred"
            ),
            rnd(F.sum("label") * 1.0 / F.count(F.lit(1)), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )
