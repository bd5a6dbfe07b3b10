"""Round-7 corpus/sketch additions: the MinHash estimate-error audit
(the LSH tier's committed accuracy number), the first-owner shingle
novelty ratio, and the skew-profile -> salted-plan adaptive aggregation
demo (the join_key_skew_profile diagnostic becoming a decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql

from drug_target_discovery_spark.queries.dedup import (
    _BANDED_CAND_SQL,
    _N,
    _NUM_HASHES,
    _SHINGLES_SQL,
    _SIG_SQL,
    candidate_pairs,
    shingle_sizes_and_intersections,
    shingle_table,
)
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# MinHash Jaccard estimate-error audit
# --------------------------------------------------------------------------
@register(
    "minhash_jaccard_estimate_error",
    tags=("dedup", "minhash", "eval"),
    oracle=f"""
    WITH {_SIG_SQL},
    {_BANDED_CAND_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.d1, c.d2, CAST(count(*) AS BIGINT) AS k
      FROM cand c
      JOIN shingles a ON a.doc_id = c.d1
      JOIN shingles b ON b.doc_id = c.d2 AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    est AS (
      SELECT c.d1, c.d2,
             CAST(sum(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END)
               AS BIGINT) AS matches
      FROM cand c
      JOIN sig s1 ON s1.doc_id = c.d1
      JOIN sig s2 ON s2.doc_id = c.d2 AND s2.hash_idx = s1.hash_idx
      GROUP BY 1, 2
    ),
    pp AS (
      SELECT c.d1, c.d2,
             coalesce(i.k, 0) * 1.0
               / (z1.sz + z2.sz - coalesce(i.k, 0)) AS jac,
             e.matches * 1.0 / {_NUM_HASHES} AS est_j
      FROM cand c
      JOIN sizes z1 ON z1.doc_id = c.d1
      JOIN sizes z2 ON z2.doc_id = c.d2
      JOIN est e ON e.d1 = c.d1 AND e.d2 = c.d2
      LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
    ),
    q AS (
      SELECT CAST(floor(jac * 10) AS BIGINT) AS jac_bucket,
             CAST(floor(jac * 1e9 + 0.5) AS BIGINT) AS jac_q,
             CAST(floor(est_j * 1e9 + 0.5) AS BIGINT) AS est_q,
             CAST(floor(abs(est_j - jac) * 1e9 + 0.5) AS BIGINT) AS err_q
      FROM pp
    )
    SELECT jac_bucket, CAST(count(*) AS BIGINT) AS n_pairs,
           {rnd_sql("sum(jac_q) * 1.0 / count(*) / 1e9", 6)}
             AS mean_exact_jaccard,
           {rnd_sql("sum(est_q) * 1.0 / count(*) / 1e9", 6)}
             AS mean_estimate,
           {rnd_sql("sum(err_q) * 1.0 / count(*) / 1e9", 6)} AS mae
    FROM q GROUP BY jac_bucket ORDER BY jac_bucket
    """,
)
def minhash_jaccard_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash tier: over the LSH candidate
    pairs, compare the {_NUM_HASHES}-hash signature-agreement estimate
    matches/k against the EXACT shingle Jaccard, bucketed by exact-
    Jaccard decile — the measurement that ties the banding parameters to
    a committed accuracy number (the estimator's per-pair standard error
    is sqrt(J(1-J)/k) <= 0.5/sqrt(k); tests/test_round7_ops.py asserts the
    measured MAE against that bound, the same way ANN ships recall@k).

    Exactness: the estimate matches/{_NUM_HASHES} is an exact binary
    fraction; exact Jaccard is a ratio of exact BIGINTs; both engines
    evaluate identical IEEE expressions and every per-pair statistic
    quantizes to nano-unit BIGINTs before the per-bucket mean.

    Scale design: candidates come from the sweep-scoped LSH band-join
    memo (bucketed, never all-pairs); exact verification rides
    jaccard_verify_pairs (one array_intersect per candidate pair);
    the signature-agreement join is |candidates| x {_NUM_HASHES} rows.
    Output is bounded at 11 decile rows."""
    cand = candidate_pairs(spark, sf_dir)
    # The unfiltered scored memo keeps ALL candidate pairs, including
    # true-Jaccard-0 banding collisions — precisely the error cases the
    # audit must see. Shared with the verified_pairs consumers
    # (optimization r14): before, this query re-ran the scoring pass
    # (collect_list groupBy + two joins) per invocation because its
    # threshold differs from the dedup family's; the memo is the same
    # scoring kernel at threshold=-1, so the family's 0.8-filter is a
    # view of it and the pass runs once per sweep (guide §1.2).
    from drug_target_discovery_spark.queries.dedup import scored_all_pairs

    exact = scored_all_pairs(spark, sf_dir).select("d1", "d2", "jaccard")
    from drug_target_discovery_spark.queries.dedup import _signatures

    sig = _signatures(spark, sf_dir)
    s1 = sig.select(
        F.col("doc_id").alias("d1"),
        F.col("hash_idx").alias("hi"),
        F.col("minhash").alias("m1"),
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"),
        F.col("hash_idx").alias("hi"),
        F.col("minhash").alias("m2"),
    )
    est = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "hi"])
        .groupBy("d1", "d2")
        .agg(
            F.sum(
                F.when(F.col("m1") == F.col("m2"), 1).otherwise(0)
            ).alias("matches")
        )
        .select(
            "d1", "d2", (F.col("matches") * 1.0 / _NUM_HASHES).alias("est_j")
        )
    )
    pp = exact.join(est, ["d1", "d2"]).select(
        F.floor(F.col("jaccard") * 10).cast("long").alias("jac_bucket"),
        F.floor(F.col("jaccard") * 1e9 + F.lit(0.5)).cast("long").alias("jac_q"),
        F.floor(F.col("est_j") * 1e9 + F.lit(0.5)).cast("long").alias("est_q"),
        F.floor(F.abs(F.col("est_j") - F.col("jaccard")) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("err_q"),
    )
    n = F.count(F.lit(1))
    return (
        pp.groupBy("jac_bucket")
        .agg(
            n.alias("n_pairs"),
            rnd(F.sum("jac_q") * 1.0 / n / 1e9, 6).alias("mean_exact_jaccard"),
            rnd(F.sum("est_q") * 1.0 / n / 1e9, 6).alias("mean_estimate"),
            rnd(F.sum("err_q") * 1.0 / n / 1e9, 6).alias("mae"),
        )
        .orderBy("jac_bucket")
    )


# --------------------------------------------------------------------------
# First-owner shingle novelty ratio
# --------------------------------------------------------------------------
@register(
    "shingle_novelty_ratio",
    tags=("dedup", "corpus", "scalable"),
    oracle=f"""
    WITH {_SHINGLES_SQL},
    ndocs AS (SELECT count(*) AS n FROM documents),
    stop AS (
      SELECT shingle FROM shingles CROSS JOIN ndocs
      GROUP BY shingle, n HAVING count(*) > 0.5 * n
    ),
    sh AS (SELECT * FROM shingles
           WHERE shingle NOT IN (SELECT shingle FROM stop)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    own AS (SELECT shingle, min(doc_id) AS doc_id FROM sh GROUP BY shingle),
    nov AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
      FROM own GROUP BY doc_id
    )
    SELECT s.doc_id, CAST(s.sz AS BIGINT) AS n_shingles,
           CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
           {rnd_sql("coalesce(n.n_novel, 0) * 1.0 / s.sz", 6)} AS novelty
    FROM sizes s LEFT JOIN nov n USING (doc_id)
    ORDER BY s.doc_id
    """,
)
def shingle_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's (stop-filtered,
    distinct) shingles whose FIRST owner — minimum doc_id across the
    corpus — is the doc itself. Low novelty flags documents assembled
    from content that already exists elsewhere (quote-stitched or
    boilerplate-heavy docs) even when no single pair crosses a dedup
    threshold; the per-doc score is what corpus-mixture reweighting
    consumes.

    Rides the sweep-scoped exact-pairs memo's shingle table (same
    {_N}-token distinct shingles, df > 50% stop cap as the whole dedup
    family — consistent metric). The registry's design note sketched a
    shingle-partition window; the shipped plan is the equivalent
    groupBy-min — same grain, but map-side combinable (a window carries
    the full posting list per shingle through the shuffle, min does
    not).

    Scale design: two keyed shuffles (shingle grain -> owner, doc grain
    -> counts) plus the memoized size table; never a pairwise join.
    Exactness: novelty is a ratio of exact BIGINTs."""
    sh = shingle_table(spark, sf_dir)
    sizes, _ = shingle_sizes_and_intersections(spark, sf_dir)
    own = sh.groupBy("shingle").agg(F.min("doc_id").alias("doc_id"))
    nov = own.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_novel"))
    return (
        sizes.join(nov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("sz").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            rnd(
                F.coalesce(F.col("n_novel"), F.lit(0)) * 1.0 / F.col("sz"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Adaptive skew aggregation (profile -> plan choice)
# --------------------------------------------------------------------------
_HOT_FRACTION = 0.125  # salt when one key holds > 4/32 of the rows
_PROFILE_FRACTION = 0.01  # seeded Bernoulli sample driving the plan choice


@register(
    "skew_adaptive_agg_stats",
    tags=("relational", "skew", "agg", "scalable"),
    oracle=f"""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           {rnd_sql(
             "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))"
             " / 100.0", 2)} AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def skew_adaptive_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag lineitem stats with the physical plan CHOSEN from a
    measured key profile — the join_key_skew_profile diagnostic wired
    into a decision (VERDICT r6 stretch #8): a profile runs first; if
    the hottest key holds more than {_HOT_FRACTION:.0%} of the rows (4x
    a fair 32-partition share), the aggregation runs as the salted
    two-phase plan (operators/skew.py) — spreading each hot key across
    16 reducers — else as the plain groupBy. Results are identical
    either way (the oracle is the plain GROUP BY); on TPC-H's 3-value
    returnflag the profile always selects the salted path, pinned by
    tests/test_round7_ops.py's plan-shape test.

    Scale design: the registered profile is a seeded {_PROFILE_FRACTION:.0%}
    Bernoulli SAMPLE (operators/skew.sampled_hot_share — VERDICT r7 #5:
    the earlier exact count-by-key profile cost a full extra fact scan
    at 100 TB), with the decision error bound in its docstring: a hot
    key far enough from the {_HOT_FRACTION:.0%} threshold to matter
    survives any reasonable sample, and near-threshold flips land on
    result-equal, cost-comparable plans. The exact profile remains the
    test path (tests/test_round7_ops.py pins both profiles to the same
    choice on the fixture). The salted plan's phase 1 collapses to
    (key, salt) map-side, so the hot key never lands on one reducer."""
    return _skew_adaptive_agg(spark, sf_dir, exact_profile=False)


def _skew_adaptive_agg(
    spark: SparkSession, sf_dir: str, exact_profile: bool
) -> DataFrame:
    from drug_target_discovery_spark.operators.skew import (
        exact_hot_share,
        sampled_hot_share,
        two_phase_agg,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("xq"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("xc"),
    )
    if exact_profile:
        hot_share = exact_hot_share(li, "l_returnflag")
    else:
        hot_share = sampled_hot_share(
            li, "l_returnflag", fraction=_PROFILE_FRACTION
        )
    aggs = {
        "n_rows": ("xq", "count"),
        "sum_qty": ("xq", "sum"),
        "cents": ("xc", "sum"),
    }
    if hot_share > _HOT_FRACTION:
        agged = two_phase_agg(li, "l_returnflag", aggs, salt_buckets=16)
    else:
        agged = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("xq").alias("sum_qty"),
            F.sum("xc").alias("cents"),
        )
    return agged.select(
        "l_returnflag",
        "n_rows",
        "sum_qty",
        rnd(F.col("cents") / 100.0, 2).alias("revenue"),
    ).orderBy("l_returnflag")
