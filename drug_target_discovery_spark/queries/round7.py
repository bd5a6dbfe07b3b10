"""Round-7 additions: the six designed-and-deferred operators from the
round-6 registry plan (queries/registry.py r6 note) plus the skew-profile
-> salted-aggregation decision demo (VERDICT r6 stretch #8).

- Kaplan-Meier survival over customer inter-order gaps (right-censored at
  the corpus max date) — the churn/repurchase-time curve.
- Standardized CUSUM changepoint scan over the daily revenue series.
- Brand basket association rules (support / confidence / lift).
- MinHash Jaccard estimate-error audit — the sketch-accuracy measurement
  that ties the LSH tier's banding parameters to a committed number.
- First-owner shingle novelty ratio per document.
- ISO-weekday revenue seasonality profile.
- Adaptive skew aggregation: a bounded key-profile drives the plain-vs-
  salted two-phase plan choice at runtime (identical results either way;
  the choice is pinned by a plan-shape test).

Exactness contract (repo-wide): money quantizes to integer cents/dollars
map-side; cross-row float reductions quantize per-term to BIGINT units;
ln/exp inputs are ratios of exact integers so per-row IEEE results agree
across engines; sums that can exceed 2^63 at large SF run in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both correctly rounded on the
final cast to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Kaplan-Meier survival over customer inter-order gaps
# --------------------------------------------------------------------------
@register(
    "kaplan_meier_customer_gaps",
    tags=("stats", "survival", "timeseries"),
    oracle=f"""
    WITH o AS (
      SELECT o_custkey AS ck, date_trunc('day', o_orderdate) AS day,
             o_orderkey AS ok
      FROM orders
    ),
    mx AS (SELECT max(day) AS md FROM o),
    lagd AS (
      SELECT ck, day,
             lag(day) OVER (PARTITION BY ck ORDER BY day, ok) AS prev
      FROM o
    ),
    ev AS (
      SELECT date_diff('day', prev, day) AS dur, 1 AS e
      FROM lagd WHERE prev IS NOT NULL
    ),
    cens AS (
      SELECT date_diff('day', max(day), (SELECT md FROM mx)) AS dur, 0 AS e
      FROM o GROUP BY ck
    ),
    obs AS (SELECT * FROM ev UNION ALL SELECT * FROM cens),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
    g AS (
      SELECT dur, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(1 - e) AS BIGINT) AS c
      FROM obs GROUP BY dur
    ),
    r AS (
      SELECT dur, d, c,
             CAST(n - coalesce(sum(d + c) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM g CROSS JOIN tot
    ),
    t AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN d = n_risk THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(ln((n_risk - d) * 1.0 / n_risk) * 1e12
                       + 0.5) AS BIGINT) END AS term_q,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur) AS zf,
             sum(CASE WHEN d = n_risk THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(ln((n_risk - d) * 1.0 / n_risk) * 1e12
                       + 0.5) AS BIGINT) END) OVER (ORDER BY dur) AS cum_q
      FROM r
    )
    SELECT CAST(dur AS BIGINT) AS dur_days, n_risk AS n_at_risk,
           d AS n_events, c AS n_censored,
           CASE WHEN zf = 1 THEN 0.0
                ELSE {rnd_sql("exp(cum_q / 1e12)", 6)} END AS survival
    FROM t ORDER BY dur_days
    """,
)
def kaplan_meier_customer_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) over customer
    inter-order gaps: each consecutive order pair contributes an observed
    gap (event), and each customer's time from last order to the corpus
    max date contributes a RIGHT-CENSORED observation — the standard
    repurchase-time / churn-risk estimator, done properly (dropping the
    censored tail biases the curve optimistic).

    Exactness: durations are exact day integers; each KM factor
    ln((n_i - d_i)/n_i) is an IEEE ln of a ratio of exact BIGINTs,
    quantized per-term to pico-units before the cumulative sum, so the
    product-limit accumulates addition-order-free; survival hits exact
    0.0 when the last at-risk subject dies (d = n at the final row —
    the only row where the ln guard can trigger).

    Scale design: the per-customer lag runs keyed (partitioned by
    custkey — scales with the customer dimension); observations collapse
    with ONE shuffle to the day grain. The cumulative at-risk /
    product-limit windows then run over the DAY-GRAIN gap table, bounded
    BY CONSTRUCTION at the TPC-H calendar span (~2,400 distinct gap
    durations at any SF)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.date_trunc("day", "o_orderdate").alias("day"),
        F.col("o_orderkey").alias("ok"),
    )
    mx = o.agg(F.max("day").alias("md"))
    wlag = Window.partitionBy("ck").orderBy("day", "ok")
    ev = (
        o.select("ck", "day", F.lag("day").over(wlag).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(F.datediff("day", "prev").alias("dur"), F.lit(1).alias("e"))
    )
    cens = (
        o.groupBy("ck")
        .agg(F.max("day").alias("last"))
        .crossJoin(F.broadcast(mx))
        .select(F.datediff("md", "last").alias("dur"), F.lit(0).alias("e"))
    )
    obs = ev.unionAll(cens)
    g = obs.groupBy("dur").agg(
        F.sum("e").alias("d"), F.sum(1 - F.col("e")).alias("c")
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    # bounded: day-grain gap table — distinct gap durations are capped by
    # the fixed TPC-H calendar span (~2,400 rows at any SF), so the
    # unpartitioned cumulative windows never see the fact
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n_risk"),
    )
    term_q = F.when(F.col("d") == F.col("n_risk"), F.lit(0).cast("long")).otherwise(
        F.floor(
            F.log((F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk")) * 1e12
            + F.lit(0.5)
        ).cast("long")
    )
    t = r.select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.max(
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
        ).over(w_cum).alias("zf"),
        F.sum(term_q).over(w_cum).alias("cum_q"),
    )
    return t.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("zf") == 1, F.lit(0.0))
        .otherwise(rnd(F.exp(F.col("cum_q") / 1e12), 6))
        .alias("survival"),
    ).orderBy("dur_days")


# --------------------------------------------------------------------------
# CUSUM changepoint scan over daily revenue
# --------------------------------------------------------------------------
@register(
    "cusum_changepoint_daily_revenue",
    tags=("stats", "timeseries", "drift"),
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM d
    ),
    r AS (
      SELECT day, x,
             CAST(sum(x) OVER (ORDER BY day) AS HUGEINT) AS cum,
             CAST(row_number() OVER (ORDER BY day) AS HUGEINT) AS ti
      FROM d
    ),
    s AS (
      SELECT day, x, n, n * cum - ti * sx AS ns,
             n * sxx - sx * sx AS varnum
      FROM r CROSS JOIN t
    ),
    m1 AS (
      SELECT day, x, n, ns, varnum, max(abs(ns)) OVER () AS mx
      FROM s
    ),
    m AS (
      SELECT day, x, n, ns, varnum,
             min(CASE WHEN abs(ns) = mx THEN day END) OVER () AS cp_day
      FROM m1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x AS dollars,
           CASE WHEN varnum = 0 THEN NULL ELSE
             {rnd_sql(
               "CAST(ns AS DOUBLE) / (sqrt(CAST(n AS DOUBLE))"
               " * sqrt(CAST(varnum AS DOUBLE)))", 6)} END AS cusum,
           CAST(CASE WHEN day = cp_day THEN 1 ELSE 0 END AS BIGINT)
             AS is_changepoint
    FROM m ORDER BY day
    """,
)
def cusum_changepoint_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Standardized CUSUM changepoint scan (Page 1954) over the daily
    order-revenue series: C_t = S_t / (sigma_pop * sqrt(n)) with
    S_t = sum_{{i<=t}}(x_i - mean), and the changepoint estimate is the
    argmax of |S_t| — the classic level-shift detector a pipeline runs
    on every ingestion metric before trusting a drift alarm.

    Exactness: daily revenue quantizes to whole dollars (BIGINT);
    n*S_t = n*cumsum_t - t*total is computed EXACTLY in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) — BIGINT would overflow n*sxx at ~sf1 —
    so the argmax compare and the tie-break (earliest day) are exact
    integer comparisons; the standardized value is one IEEE expression
    over the exact sums, identical on both engines after the correctly-
    rounded wide-int -> double casts.

    Scale design: ONE fact shuffle to the day grain; every window after
    that runs over the daily table, bounded BY CONSTRUCTION at the
    TPC-H calendar span (~2,400 rows at any SF). Zero variance (a
    constant series) surfaces NULL via explicit CASE."""
    od = load_table(spark, sf_dir, "orders")
    d = od.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long")).alias(
            "x"
        )
    )
    dec = "decimal(38,0)"
    t = d.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
    )
    # bounded: daily series — the date domain is the fixed TPC-H calendar
    # (~2,400 rows at any SF), so the ordered/global windows below never
    # see the fact
    w_ord = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    r = d.select(
        "day",
        "x",
        F.sum("x").over(w_ord).cast(dec).alias("cum"),
        # bounded: same fixed-calendar daily series as w_ord above
        F.row_number().over(Window.orderBy("day")).cast(dec).alias("ti"),
    )
    s = r.crossJoin(F.broadcast(t)).select(
        "day",
        "x",
        "n",
        (F.col("n") * F.col("cum") - F.col("ti") * F.col("sx")).alias("ns"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "varnum"
        ),
    )
    m1 = s.select(
        "day",
        "x",
        "n",
        "ns",
        "varnum",
        F.max(F.abs(F.col("ns"))).over(w_all).alias("mx"),
    )
    m = m1.select(
        "day",
        "x",
        "n",
        "ns",
        "varnum",
        F.min(F.when(F.abs(F.col("ns")) == F.col("mx"), F.col("day")))
        .over(w_all)
        .alias("cp_day"),
    )
    # C_t = S_t/(sigma*sqrt(n)) with ns = n*S_t and varnum = n^2*sigma^2:
    # ns / (sqrt(n) * sqrt(varnum))
    nd = F.col("n").cast("double")
    cusum = F.col("ns").cast("double") / (
        F.sqrt(nd) * F.sqrt(F.col("varnum").cast("double"))
    )
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("dollars"),
        F.when(F.col("varnum") == 0, F.lit(None).cast("double"))
        .otherwise(rnd(cusum, 6))
        .alias("cusum"),
        F.when(F.col("day") == F.col("cp_day"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_changepoint"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Brand basket association rules (support / confidence / lift)
# --------------------------------------------------------------------------
@register(
    "basket_brand_lift",
    tags=("relational", "association", "join", "scalable"),
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS brand
      FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
    na AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY brand),
    pr AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, x.n AS n_a, y.n AS n_b, n_ab,
           {rnd_sql("n_ab * 1.0 / n_orders", 6)} AS support,
           {rnd_sql("n_ab * 1.0 / x.n", 6)} AS conf_a_b,
           {rnd_sql("n_ab * 1.0 / y.n", 6)} AS conf_b_a,
           {rnd_sql("n_ab * 1.0 * n_orders / (x.n * y.n)", 6)} AS lift
    FROM pr
    JOIN na x ON brand_a = x.brand
    JOIN na y ON brand_b = y.brand
    CROSS JOIN nb
    ORDER BY brand_a, brand_b
    """,
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise brand association rules over order baskets (Agrawal &
    Srikant 1994's support/confidence plus lift): for brands A < B,
    support = P(A,B), both directed confidences, and
    lift = P(A,B)/(P(A)P(B)) — the market-basket co-occurrence operator.

    Exactness: every statistic is a ratio of exact BIGINT basket counts.

    Scale design: ONE wide exchange on the fact — the order-grain
    collect_set (set semantics dedup in-aggregate, so no separate
    distinct shuffle) — then pair generation is a MAP-SIDE array
    transform (sorted set -> C(brands_in_order, 2) <= 21 structs per
    order, never a self-join shuffle; the round-7 head-to-head measured
    the self-join form ~25-45% slower at sf0.1) feeding a
    domain-bounded (<= C(25,2) = 300 key) pair aggregate with map-side
    partials. Brand totals and the order count come off the same cached
    order-grain table as broadcast dims; the part join is
    dimension-sided and adaptive. The per-order set is bounded by the
    lineitems-per-order cap, so collect_set never skews."""
    from drug_target_discovery_spark.caching import scoped_cache

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob_sets = scoped_cache(
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    nb = ob_sets.agg(F.count(F.lit(1)).alias("n_orders"))
    na = (
        ob_sets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pr = (
        ob_sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) -> transform("
                    "slice(bs, i + 2, size(bs)), "
                    "y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("p")
        )
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pr.join(
            F.broadcast(
                na.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                na.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "n_a",
            "n_b",
            "n_ab",
            rnd(F.col("n_ab") * 1.0 / F.col("n_orders"), 6).alias("support"),
            rnd(F.col("n_ab") * 1.0 / F.col("n_a"), 6).alias("conf_a_b"),
            rnd(F.col("n_ab") * 1.0 / F.col("n_b"), 6).alias("conf_b_a"),
            rnd(
                F.col("n_ab") * 1.0 * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("brand_a", "brand_b")
    )


# --------------------------------------------------------------------------
# ISO-weekday revenue seasonality
# --------------------------------------------------------------------------
_WDAY = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")


@register(
    "weekday_seasonality_revenue",
    tags=("relational", "timeseries", "agg", "scalable"),
    oracle=f"""
    WITH d AS (
      SELECT isodow(o_orderdate) AS dow, count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
             CAST(sum(cents) AS BIGINT) AS tc
      FROM d
    )
    SELECT CAST(dow AS BIGINT) AS isodow,
           CASE dow {" ".join(f"WHEN {i + 1} THEN '{w}'" for i, w in enumerate(_WDAY))}
           END AS weekday,
           CAST(n_orders AS BIGINT) AS n_orders,
           {rnd_sql("cents / 100.0", 2)} AS revenue,
           {rnd_sql("n_orders * 1.0 / tn", 6)} AS order_share,
           {rnd_sql("cents * 1.0 / tc", 6)} AS revenue_share,
           {rnd_sql("cents * 7.0 / tc", 6)} AS seasonality_index
    FROM d CROSS JOIN t
    ORDER BY isodow
    """,
)
def weekday_seasonality_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and order-volume profile by ISO weekday (Mon=1..Sun=7)
    with each day's share of the total and a seasonality index
    (share x 7 — 1.0 means a perfectly flat week): the day-of-week
    profile behind batch-window sizing and seasonality-adjusted drift
    monitors.

    Exactness: revenue quantizes to integer cents map-side; shares are
    ratios of exact BIGINTs. Spark's dayofweek (Sun=1) converts to ISO
    numbering with pure integer arithmetic.

    Scale design: ONE fact shuffle to the 7-row weekday grain with
    map-side partials; the total folds in as a 1-row broadcast."""
    od = load_table(spark, sf_dir, "orders")
    isodow = ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("long")
    d = od.groupBy(isodow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
    )
    t = d.agg(
        F.sum("n_orders").alias("tn"), F.sum("cents").alias("tc")
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            F.col("dow").alias("isodow"),
            F.element_at(
                F.array(*[F.lit(w) for w in _WDAY]), F.col("dow").cast("int")
            ).alias("weekday"),
            F.col("n_orders").cast("long").alias("n_orders"),
            rnd(F.col("cents") / 100.0, 2).alias("revenue"),
            rnd(F.col("n_orders") * 1.0 / F.col("tn"), 6).alias("order_share"),
            rnd(F.col("cents") * 1.0 / F.col("tc"), 6).alias("revenue_share"),
            rnd(F.col("cents") * 7.0 / F.col("tc"), 6).alias(
                "seasonality_index"
            ),
        )
        .orderBy("isodow")
    )
