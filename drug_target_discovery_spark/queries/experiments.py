"""Experimentation tier: variance-reduced A/B readout (CUPED) and the
delete-one-bucket jackknife SE for ratio metrics.

Deng et al. 2013 ("Improving the Sensitivity of Online Controlled
Experiments by Utilizing Pre-Experiment Data", WSDM): adjust each unit's
post-period metric by its pre-period covariate,
``Y_adj = Y - theta * (X - mean(X))`` with ``theta = cov(X, Y)/var(X)``,
which shrinks metric variance by the squared X-Y correlation without
biasing the treatment contrast. The industry-standard readout next to the
plain difference-in-means.

No reference counterpart (product-analytics extension surface, like the
funnel/retention tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_SPLIT_TS = "2024-01-16"  # pre-period before, post-period on/after
_N_ARMS = 2


@register(
    "cuped_experiment_readout",
    tags=("events", "experiment", "stats", "scalable"),
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % {_N_ARMS} AS INT) AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                    AND ts < TIMESTAMP '{_SPLIT_TS} 00:00:00'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
                  AS BIGINT) AS x_q,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                    AND ts >= TIMESTAMP '{_SPLIT_TS} 00:00:00'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
                  AS BIGINT) AS y_q
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x_q) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(x_q * x_q) AS BIGINT) AS sxx,
             CAST(sum(x_q * y_q) AS BIGINT) AS sxy
      FROM per_user
    ),
    th AS (
      -- products in DOUBLE space on BOTH engines: the integer products
      -- overflow 64-bit at probe scale (n*sxx ~ 5e19 at x10), and DuckDB
      -- would otherwise compute them exactly in HUGEINT while Spark
      -- cannot. Each SUM is an exact BIGINT; its double conversion is
      -- IEEE-nearest of the same value in both engines, so the double
      -- products and the division are bit-identical.
      SELECT n, sx,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
      FROM g
    )
    SELECT arm,
           count(*) AS n_users,
           {rnd_sql("sum(x_q) / (100.0 * count(*))", 6)} AS mean_pre,
           {rnd_sql("sum(y_q) / (100.0 * count(*))", 6)} AS mean_post,
           {rnd_sql("any_value(theta)", 6)} AS theta,
           {rnd_sql(
             "sum(y_q) / (100.0 * count(*)) - any_value(theta) * "
             "(sum(x_q) / (100.0 * count(*)) - any_value(sx) * 1.0 "
             "/ (100.0 * any_value(n)))", 6)} AS mean_adjusted
    FROM per_user CROSS JOIN th
    GROUP BY arm ORDER BY arm
    """,
)
def cuped_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout on the event stream: units are users,
    assignment is the deterministic hash arm (user_id % {_N_ARMS}), the
    covariate X is pre-{_SPLIT_TS} purchase value, the metric Y is
    post-period purchase value; theta fits globally (pooled, as Deng et
    al. prescribe) and each arm reports its plain and adjusted means.

    The per-arm adjusted mean needs only sufficient statistics —
    mean_adj(arm) = ybar_arm - theta·(xbar_arm - xbar) — so the plan
    never materializes per-user adjusted rows: ONE user-key aggregate
    collapses the event stream (purchase values quantized to integer
    cents map-side; users without purchases enter with exact zeros), a
    1-row global sufficient-statistics broadcast fits theta, and a
    {_N_ARMS}-row arm aggregate finishes. Every sum the divisions read
    is exact BIGINT, so theta and both means are IEEE-identical across
    engines. At 100 TB the only shuffle is the per-user partial-agg —
    the same single exchange the funnel/retention tier rides."""
    from drug_target_discovery_spark.caching import scoped_cache

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(is_p & (F.col("ts") < split), cents)), F.lit(0)
        ).alias("x_q"),
        F.coalesce(
            F.sum(F.when(is_p & (F.col("ts") >= split), cents)), F.lit(0)
        ).alias("y_q"),
    ).withColumn("arm", (F.col("user_id") % _N_ARMS).cast("int"))
    # two consumers (theta fit + arm readout): scope-cache the user-level
    # table so the event fact scans/aggregates once. It is per-user-sized
    # (orders smaller than the fact), the standard cacheable reduction —
    # unlike the exploded token streams the corpus tiers refuse to pin.
    per_user = scoped_cache(per_user)
    g = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_q").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.col("x_q") * F.col("x_q")).alias("sxx"),
        F.sum(F.col("x_q") * F.col("y_q")).alias("sxy"),
    )
    # double-space products (see the oracle's th CTE comment): integer
    # products overflow 64-bit at probe scale; double conversion of each
    # exact BIGINT sum is IEEE-identical across engines.
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    th = g.select(
        "n",
        "sx",
        (
            (nd * F.col("sxy").cast("double") - sxd * F.col("sy").cast("double"))
            / (nd * F.col("sxx").cast("double") - sxd * sxd)
        ).alias("theta"),
    )
    xbar_global = F.first("sx") * 1.0 / (100.0 * F.first("n"))
    return (
        per_user.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            rnd(F.sum("x_q") / (100.0 * F.count(F.lit(1))), 6).alias("mean_pre"),
            rnd(F.sum("y_q") / (100.0 * F.count(F.lit(1))), 6).alias("mean_post"),
            rnd(F.first("theta"), 6).alias("theta"),
            rnd(
                F.sum("y_q") / (100.0 * F.count(F.lit(1)))
                - F.first("theta")
                * (F.sum("x_q") / (100.0 * F.count(F.lit(1))) - xbar_global),
                6,
            ).alias("mean_adjusted"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Delete-one-bucket jackknife SE for a ratio metric
# --------------------------------------------------------------------------
# Ratio metrics (revenue per purchase, CTR, items per session) violate the
# i.i.d.-unit assumption behind the textbook SE formula, so experiment
# platforms estimate their variance by resampling. The production form is
# the delete-one-BUCKET jackknife (Deng et al. 2011 "streaming jackknife"):
# units hash into B deterministic buckets, per-bucket numerator/denominator
# sums are the ONLY state, and the B leave-one-out ratios
# R_(b) = (S - s_b) / (T - t_b) give SE^2 = (B-1)/B * sum_b (R_(b) - Rbar)^2.
_JK_BUCKETS = 100  # user_id % 100; nests the % 2 arm (bucket parity = arm)


@register(
    "jackknife_ratio_readout",
    tags=("events", "experiment", "stats", "scalable"),
    oracle=f"""
    WITH pu AS (
      SELECT CAST(user_id % {_N_ARMS} AS INT) AS arm,
             CAST(user_id % {_JK_BUCKETS} AS INT) AS bkt,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT arm, bkt, CAST(sum(cents) AS BIGINT) AS s_q, count(*) AS t
      FROM pu GROUP BY arm, bkt
    ),
    a AS (
      SELECT arm, CAST(sum(s_q) AS BIGINT) AS big_s,
             CAST(sum(t) AS BIGINT) AS big_t, count(*) AS nb
      FROM b GROUP BY arm
    ),
    loo AS (
      -- leave-one-out ratio in dollars, quantized to nano-units so the
      -- per-arm mean comes from an exact BIGINT sum (order-independent)
      SELECT b.arm,
             CASE WHEN a.big_t - b.t = 0 THEN NULL
                  ELSE CAST(floor(CAST(a.big_s - b.s_q AS DOUBLE)
                                  / (100.0 * CAST(a.big_t - b.t AS DOUBLE))
                                  * 1e9 + 0.5) AS BIGINT)
             END AS r_q
      FROM b JOIN a USING (arm)
    ),
    m AS (
      SELECT arm, CAST(sum(r_q) AS BIGINT) AS sr FROM loo GROUP BY arm
    ),
    term AS (
      -- squared deviation per bucket, quantized to pico-units: each term
      -- is IEEE-identical across engines (exact BIGINT inputs), and the
      -- BIGINT sum is order-independent
      SELECT loo.arm,
             CAST(floor(
               (loo.r_q / 1e9 - m.sr / (1e9 * a.nb))
               * (loo.r_q / 1e9 - m.sr / (1e9 * a.nb))
               * 1e12 + 0.5) AS BIGINT) AS tq
      FROM loo JOIN m USING (arm) JOIN a USING (arm)
    )
    SELECT a.arm,
           a.nb AS n_buckets,
           a.big_t AS n_purchases,
           {rnd_sql("a.big_s / (100.0 * a.big_t)", 6)} AS ratio,
           {rnd_sql("m.sr / (1e9 * a.nb)", 6)} AS loo_mean,
           {rnd_sql(
             "sqrt((a.nb - 1) * 1.0 / a.nb * (z.stq / 1e12))", 6)} AS se_jack
    FROM a
    JOIN m USING (arm)
    JOIN (SELECT arm, CAST(sum(tq) AS BIGINT) AS stq FROM term GROUP BY arm) z
      USING (arm)
    ORDER BY a.arm
    """,
)
def jackknife_ratio_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm ratio metric (purchase dollars per purchase) with its
    delete-one-bucket jackknife standard error. Resampling without RNG:
    the "resamples" are the {_JK_BUCKETS} deterministic hash buckets
    (user_id % {_JK_BUCKETS}, which nests the % {_N_ARMS} arm), so the
    readout is reproducible across backfills — the property bootstrap
    sampling cannot give — and the whole estimator is a function of the
    bounded (arm, bucket) sufficient-statistics table.

    Exactness: numerators quantize to integer cents map-side; each
    leave-one-out ratio quantizes to nano-dollar BIGINTs before the mean,
    and each squared deviation to pico-unit BIGINTs before the sum, so
    every cross-row float reduction is an exact integer sum
    (order-independent — the micro-unit contract the drift/PMI tiers use)
    and Spark matches DuckDB bit-for-bit.

    Scale design: ONE fact shuffle, to the (arm, bucket) grain — the
    bucket table IS the sketch, {_N_ARMS}x{_JK_BUCKETS} rows regardless
    of corpus size, and every jackknife step after it (leave-one-out
    ratio, mean, deviation sum) is a WINDOW over that constant-size
    table partitioned by arm — zero joins, zero broadcast builds, zero
    caches (VERDICT r5 #3: the join+cache form cost 4 broadcast-build
    jobs that amplified scheduler jitter under driver co-tenancy). Empty
    buckets simply don't appear (jackknife over occupied buckets);
    degenerate arms with one bucket hit a zero leave-one-out denominator —
    guarded to NULL by an explicit CASE on BOTH engines (IEEE x/0.0 is
    engine-divergent: Spark NULLs the long cast of inf, DuckDB errors), so
    the readout surfaces NULL, not masked, identically everywhere."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pu = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % _N_ARMS).cast("int").alias("arm"),
        (F.col("user_id") % _JK_BUCKETS).cast("int").alias("bkt"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    b = pu.groupBy("arm", "bkt").agg(
        F.sum("cents").alias("s_q"), F.count(F.lit(1)).alias("t")
    )
    # Everything after the fact shuffle is windows partitioned by arm over
    # the (arm, bucket) table — bounded BY CONSTRUCTION at _N_ARMS *
    # _JK_BUCKETS rows. The previous join+cache form launched 4
    # broadcast-build jobs + 2 cache materializations; this is one tiny
    # exchange and a single stage (VERDICT r5 #3).
    w = Window.partitionBy("arm")
    b = b.select(
        "arm",
        "s_q",
        "t",
        F.sum("s_q").over(w).alias("big_s"),
        F.sum("t").over(w).alias("big_t"),
        F.count(F.lit(1)).over(w).alias("nb"),
    )
    # Degenerate one-bucket arm: big_t - t = 0. Guard the division to NULL
    # EXPLICITLY on both sides — IEEE x/0.0 diverges across engines (Spark
    # NULLs the long cast of inf; DuckDB errors on it), so the CASE is the
    # only form where both engines agree (ADVICE r5). All-NULL r_q for such
    # an arm propagates NULL through sum/mean/SE identically in both.
    b = b.withColumn(
        "r_q",
        F.when((F.col("big_t") - F.col("t")) == 0, F.lit(None).cast("long"))
        .otherwise(
            F.floor(
                (F.col("big_s") - F.col("s_q")).cast("double")
                / (100.0 * (F.col("big_t") - F.col("t")).cast("double"))
                * 1e9
                + F.lit(0.5)
            ).cast("long")
        ),
    )
    b = b.withColumn("sr", F.sum("r_q").over(w))
    dev = F.col("r_q") / 1e9 - F.col("sr") / (1e9 * F.col("nb"))
    b = b.withColumn("tq", F.floor(dev * dev * 1e12 + F.lit(0.5)).cast("long"))
    # Per-arm collapse: input is already hash-partitioned by arm from the
    # window exchange, so this groupBy adds no shuffle; big_s/big_t/nb/sr
    # are arm-constant, F.first picks the shared value.
    return (
        b.groupBy("arm")
        .agg(
            F.first("nb").alias("n_buckets"),
            F.first("big_t").alias("n_purchases"),
            rnd(F.first("big_s") / (100.0 * F.first("big_t")), 6).alias("ratio"),
            rnd(F.first("sr") / (1e9 * F.first("nb")), 6).alias("loo_mean"),
            rnd(
                F.sqrt(
                    (F.first("nb") - 1) * 1.0 / F.first("nb") * (F.sum("tq") / 1e12)
                ),
                6,
            ).alias("se_jack"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) guardrail
# --------------------------------------------------------------------------
# The first check every experiment platform runs before reading any metric:
# if the unit counts deviate from the designed allocation more than chance
# allows (chi-squared goodness-of-fit), the assignment or logging pipeline
# is broken and every downstream readout is invalid (Fabijan et al. 2019,
# "Diagnosing Sample Ratio Mismatch"). Completes the experimentation
# family: SRM gate -> CUPED means -> jackknife SEs.
_SRM_CRIT_95 = 3.841458820694124  # chi2 inverse CDF at 0.95, 1 dof (2 arms)


@register(
    "srm_guardrail",
    tags=("events", "experiment", "stats", "quality"),
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    c AS (
      SELECT CAST(user_id % {_N_ARMS} AS INT) AS arm, count(*) AS n_users
      FROM u GROUP BY arm
    ),
    t AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM c),
    term AS (
      SELECT c.arm, c.n_users,
             (c.n_users - t.n / {_N_ARMS}.0)
             * (c.n_users - t.n / {_N_ARMS}.0)
             / (t.n / {_N_ARMS}.0) AS chi2_term,
             t.n AS n
      FROM c CROSS JOIN t
    ),
    tot AS (SELECT sum(chi2_term) AS chi2 FROM term)
    SELECT term.arm,
           term.n_users,
           {rnd_sql("term.n / " + str(_N_ARMS) + ".0", 6)} AS expected_users,
           {rnd_sql("term.chi2_term", 6)} AS chi2_term,
           {rnd_sql("tot.chi2", 6)} AS chi2_total,
           tot.chi2 > {_SRM_CRIT_95} AS srm_flag
    FROM term CROSS JOIN tot
    ORDER BY term.arm
    """,
)
def srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared goodness-of-fit of observed per-arm unit counts against
    the designed equal allocation, with the 95% SRM flag — the validity
    gate run BEFORE ``cuped_experiment_readout``/``jackknife_ratio_readout``
    are trusted. Units are distinct users (assignment is per-user, so
    event-count imbalance is expected and irrelevant; USER-count imbalance
    is the alarm).

    Exactness: the only inputs are exact BIGINT counts; every division
    and squared deviation is the same IEEE expression on both engines,
    and the 2-term chi2 total is a commutative two-double add — no
    quantization needed anywhere.

    Scale design: one user-key exchange collapses the event stream to
    distinct units (partial aggregation map-side), then everything runs
    on the {_N_ARMS}-row arm table with 1-row cross-join broadcasts —
    the same bounded-readout shape as the rest of the experimentation
    tier. The critical value is a compile-time constant: no stats
    library at runtime."""
    from drug_target_discovery_spark.caching import scoped_cache

    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    # the bounded arm table has two consumers (total + readout): cache it
    # so the event fact collapses once
    c = scoped_cache(
        u.groupBy((F.col("user_id") % _N_ARMS).cast("int").alias("arm")).agg(
            F.count(F.lit(1)).alias("n_users")
        )
    )
    t = c.agg(F.sum("n_users").alias("n"))
    exp_u = F.col("n") / float(_N_ARMS)
    term = c.crossJoin(F.broadcast(t)).select(
        "arm",
        "n_users",
        "n",
        ((F.col("n_users") - exp_u) * (F.col("n_users") - exp_u) / exp_u).alias(
            "chi2_term"
        ),
    )
    tot = term.agg(F.sum("chi2_term").alias("chi2"))
    return (
        term.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "n_users",
            rnd(exp_u, 6).alias("expected_users"),
            rnd(F.col("chi2_term"), 6).alias("chi2_term"),
            rnd(F.col("chi2"), 6).alias("chi2_total"),
            (F.col("chi2") > _SRM_CRIT_95).alias("srm_flag"),
        )
        .orderBy("arm")
    )
