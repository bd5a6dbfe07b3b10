"""Experimentation tier: variance-reduced A/B readout (CUPED).

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
