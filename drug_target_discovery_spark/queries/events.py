"""Event-time tier (SURVEY §2.10 [EXT]): tumbling/sliding/session windows,
stateful dedup, JSON prop extraction, pivot — on the `events` table.

Window aggregations delegate to streaming/events.py transforms, which run
unchanged under Structured Streaming (tests/test_streaming.py proves
batch==stream on the same data). Timestamps surface as epoch seconds so
oracle hashing is timezone-proof (session timezone is UTC; DuckDB
time_bucket buckets align with Spark window starts at whole-unit windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table
from drug_target_discovery_spark.streaming.events import (
    interval_join,
    sessionize_builtin,
    windowed_event_counts,
)

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# Tumbling window
# --------------------------------------------------------------------------
@register(
    "tumbling_event_counts",
    tags=("events", "window"),
    oracle=f"""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           {rnd_sql("sum(value)", 4)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type — the same
    transform runs under readStream with a watermark (§2.10)."""
    ev = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, window="1 hour")
    return out.select(
        "window_start", "event_type", "n_events", rnd("sum_value", 4).alias("sum_value")
    )


# --------------------------------------------------------------------------
# Sliding window
# --------------------------------------------------------------------------
@register(
    "sliding_window_stats",
    tags=("events", "window"),
    oracle=f"""
    WITH expanded AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT) - k * 1800
               AS window_start,
             value
      FROM events, unnest(range(0, 2)) AS t(k)
    )
    SELECT window_start,
           count(*) AS n_events,
           {rnd_sql("avg(value)", 6)} AS avg_value
    FROM expanded
    GROUP BY window_start
    """,
)
def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2
    windows). Spark's window(slide) does the expansion natively; the oracle
    reproduces it with an explicit unnest."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events",
            rnd("avg_value", 6).alias("avg_value"),
        )
    )
    return out


# --------------------------------------------------------------------------
# Session windows (gap-based), window-function formulation
# --------------------------------------------------------------------------
@register(
    "session_windows_gap",
    tags=("events", "window", "session"),
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_s,
           count(*) AS n_events,
           {rnd_sql("sum(value)", 4)} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_windows_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity) as lag + running sum
    — the classic batch formulation. The streaming-native builtin
    (session_window) produces the same sessions; tests assert equivalence."""
    ev = load_table(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lag_ts = F.lag("ts").over(w_ord)
    sess = (
        ev.withColumn(
            "is_new",
            F.when(
                lag_ts.isNull()
                | (F.col("ts").cast("long") - lag_ts.cast("long") > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(w_run))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_s"),
        F.unix_timestamp(F.max("ts")).alias("session_end_s"),
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "session_windows_builtin",
    tags=("events", "window", "session"),
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events,
           {rnd_sql("sum(value)", 4)} AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_windows_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window builtin (merging-state form used under streaming).

    Exact oracle via the gaps-and-islands reformulation with the builtin's
    STRICT overlap rule: an event extends a session only while its gap to
    the previous event is < the 30-minute window (diff >= gap starts a new
    session) — one comparator different from session_windows_gap's lag
    formulation, which merges on equality."""
    ev = load_table(spark, sf_dir, "events")
    out = sessionize_builtin(ev, gap="30 minutes")
    return out.select(
        "user_id", "session_start", "n_events", rnd("sum_value", 4).alias("sum_value")
    )


# --------------------------------------------------------------------------
# Latest event per key (stateful-dedup shape)
# --------------------------------------------------------------------------
@register(
    "latest_event_per_user",
    tags=("events", "window"),
    oracle="""
    SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key (the compaction/upsert primitive): row_number
    over (key, ts desc) — at scale this is the one-shuffle dedup that
    replaces full re-sorts."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_timestamp("ts").alias("ts_s"), "event_type")
    )


# --------------------------------------------------------------------------
# JSON property extraction (§2.9 JSON family)
# --------------------------------------------------------------------------
@register(
    "json_props_extract",
    tags=("events", "json"),
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           {rnd_sql("avg(CAST(json_extract_string(props, '$.k') AS BIGINT))", 6)} AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column (get_json_object) and aggregate the
    extracted field — JVM-side JSON path evaluation, no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        rnd(F.avg(k), 6).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation)
# --------------------------------------------------------------------------
@register(
    "event_type_pivot",
    tags=("events", "pivot"),
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
    FROM events
    GROUP BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts as a pivot with EXPLICIT value list —
    never inferred (inference is a separate distinct scan and is
    nondeterministic under new categories at scale)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    renames = {t: f"n_{t}" for t in _EVENT_TYPES}
    out = out.withColumnsRenamed(renames)
    return out.select(
        "user_id", *[F.coalesce(f"n_{t}", F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# Time-interval join: views attributed to purchases within a 1-hour window
# --------------------------------------------------------------------------
@register(
    "view_purchase_attribution",
    tags=("events", "interval-join", "streaming"),
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
    SELECT p.user_id, p.purchase_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
           count(v.ts) AS n_views_1h,
           {rnd_sql("coalesce(sum(CAST(floor(v.value * 1000000.0 + 0.5) AS BIGINT)), 0) / 1000000.0", 6)}
             AS sum_view_value
    FROM p LEFT JOIN v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
    GROUP BY p.user_id, p.purchase_id, p.ts
    """,
)
def view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window interval join: for every purchase, the count and
    value-sum of the same user's views in the preceding hour — the classic
    marketing-attribution shape, and the stream-stream join the as-of
    operator can't express (ALL rows in the window, not just the latest).
    The operator (streaming/events.py interval_join) is batch/stream
    polymorphic; stream parity is pinned in tests/test_streaming.py.
    View values are integer-quantized before the sum so the aggregate is
    addition-order independent (cross-engine exact)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long").alias("v_q"),
    )
    joined = interval_join(p, v, lookback="1 hour", how="left_outer")
    return (
        joined.groupBy("user_id", "purchase_id", "ts")
        .agg(
            F.count("r_ts").alias("n_views_1h"),
            rnd(
                F.coalesce(F.sum("v_q"), F.lit(0).cast("long")) / F.lit(1000000.0), 6
            ).alias("sum_view_value"),
        )
        .select(
            "user_id",
            "purchase_id",
            F.unix_timestamp("ts").alias("purchase_ts_s"),
            "n_views_1h",
            "sum_view_value",
        )
    )


# --------------------------------------------------------------------------
# SCD2-style history: validity intervals from an event stream
# --------------------------------------------------------------------------
@register(
    "scd2_user_value_history",
    tags=("events", "cdc", "window"),
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to_s,
           CASE WHEN lead(ts) OVER w IS NULL THEN TRUE ELSE FALSE END AS is_current,
           value
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history built from a change
    stream: each 'signup' event opens a validity interval that closes at
    the user's next one — valid_from/valid_to plus an is_current flag, the
    standard CDC-to-warehouse materialization. ONE shuffle on the entity
    key, one window sort; at scale this is the canonical merge-free way to
    keep point-in-time-queryable dimensions from an event log. Deterministic
    tie-break (ts, event_id) so both engines close intervals identically."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.unix_timestamp(nxt).alias("valid_to_s"),
        nxt.isNull().alias("is_current"),
        "value",
    )


# --------------------------------------------------------------------------
# Conversion funnel: strictly-ordered view -> click -> purchase per user
# --------------------------------------------------------------------------
@register(
    "conversion_funnel",
    tags=("events", "funnel"),
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS cts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.cts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(floor(epoch(v.vts)) AS BIGINT) AS first_view_s,
           CAST(floor(epoch(c.cts)) AS BIGINT) AS first_click_s,
           CAST(floor(epoch(p.pts)) AS BIGINT) AS first_purchase_s,
           (c.user_id IS NOT NULL) AS reached_click,
           (p.user_id IS NOT NULL) AS converted
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-stage funnel (first view -> first LATER click ->
    first later-still purchase) per user — the product-analytics staple
    that a naive per-type min gets wrong (a click before any view must
    not count). Three conditional-min aggregations, each shuffling only
    (user_id, candidate-min) partials on the same key, with the stage
    anchor arriving via an equi-join that AQE can broadcast (stage tables
    are user-count-sized, << events). The per-stage ts is exact epoch
    seconds; stage flags derive from join hits."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v.select("user_id", "vts"), "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "cts"), "user_id")
        .filter(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_timestamp("vts").alias("first_view_s"),
            F.unix_timestamp("cts").alias("first_click_s"),
            F.unix_timestamp("pts").alias("first_purchase_s"),
            F.col("cts").isNotNull().alias("reached_click"),
            F.col("pts").isNotNull().alias("converted"),
        )
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    tags=("events", "sequence", "scalable"),
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           CAST(floor(
             n_transitions
             / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
             * 1000000.0 + 0.5
           ) AS BIGINT) AS p_micro
    FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each user's time-ordered sequence, count (event_type -> next
    event_type) transitions and the row-normalized transition probability
    — the behavioral-model / funnel-discovery statistic (which step
    follows which, and with what probability), and the sequential shape
    (lead over a keyed order) the session/funnel tier doesn't yet pin.

    Scale shape: ONE shuffle of the fact (the user_id window; ordering is
    (ts, event_id) so ties are deterministic), collapsing immediately to
    the k x k transition-count table — k = distinct event types, so
    everything after the first aggregate is constant-sized, and the
    row-normalizing second window runs over k^2 rows. Probabilities are
    quantized to integer micro-units via an identically-parenthesized
    ratio so the driver hash is engine-stable."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    nxt = F.lead("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    trans = (
        ev.select(F.col("event_type").alias("from_type"), nxt.alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = F.sum("n_transitions").over(W.partitionBy("from_type")).cast("double")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.floor(F.col("n_transitions") / tot * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("p_micro"),
    )


# --------------------------------------------------------------------------
# Cohort retention matrix (the classic "retention triangle")
# --------------------------------------------------------------------------
@register(
    "cohort_retention_matrix",
    tags=("events", "agg", "join"),
    oracle=f"""
    WITH firstd AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, count(*) AS cohort_size FROM firstd GROUP BY cohort_day
    ),
    activity AS (
      SELECT f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age_days,
             count(DISTINCT e.user_id) AS n_active
      FROM events e JOIN firstd f ON e.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(a.age_days AS BIGINT) AS age_days,
           a.n_active, s.cohort_size,
           {rnd_sql("a.n_active * 1.0 / s.cohort_size", 6)} AS retention
    FROM activity a JOIN sizes s ON a.cohort_day = s.cohort_day
    ORDER BY cohort_day, age_days
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by the day of their first
    event; for every (cohort, days-since-first) cell, how many of that
    cohort were active — the standard product-analytics retention matrix.

    Scale shape: ONE user-key shuffle does all the heavy lifting — the
    first-event aggregate and the events⋈firstd join share the user_id
    hash partitioning (AQE reuses the exchange), and the
    (cohort, age) aggregate collapses to a calendar-bounded cell table
    (days × ages), as does the cohort-size table — both tiny regardless
    of corpus size, joined without hints. Retention is an exact integer
    ratio rounded identically in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firstd = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = firstd.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        ev.join(firstd, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("age_days"),
            "user_id",
        )
        .groupBy("cohort_day", "age_days")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        activity.join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("age_days").cast("long").alias("age_days"),
            "n_active",
            "cohort_size",
            rnd(F.col("n_active") * 1.0 / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "age_days")
    )
