"""Round-6 relational/statistics additions.

Ten operators a production analytics + training-data platform runs that the
registry lacked: per-group OLS fits, mutual-information / Gini-entropy
feature diagnostics, deterministic weighted reservoir sampling
(Efraimidis-Spirakis 2006), fixed-band RFM segmentation, a 2-D Pareto
frontier (skyline) on a bounded aggregate, calendar gap-filling, a rolling
z-score anomaly detector, stratified k-fold assignment audits, and zone-map
(data-skipping) statistics across two file layouts.

Reference parity: the reference engine (pipeline2.py) has no counterpart —
these extend the engine's own analytics surface; each cites its public
source in the docstring. Exactness contract: every cross-row float
reduction is quantized to BIGINT micro/nano units first (the repo's
integer-sufficient-statistics convention), so Spark and DuckDB agree
bit-for-bit regardless of accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Per-group OLS trend (sufficient-statistics linear fit)
# --------------------------------------------------------------------------
@register(
    "ols_trend_by_brand",
    tags=("stats", "regression", "agg", "scalable"),
    oracle=f"""
    WITH f AS (
      SELECT p_brand,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
      FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    s AS (
      SELECT p_brand, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM f GROUP BY p_brand
    ),
    d AS (
      SELECT p_brand, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
      FROM s
    )
    SELECT p_brand, n,
           {rnd_sql(
             "CASE WHEN nd * sxxd - sxd * sxd = 0 THEN NULL ELSE"
             " (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END", 6)}
             AS slope,
           {rnd_sql(
             "CASE WHEN nd * sxxd - sxd * sxd = 0 THEN NULL ELSE"
             " (syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)"
             " / nd END", 6)} AS intercept,
           {rnd_sql(
             "CASE WHEN nd * sxxd - sxd * sxd = 0"
             " OR nd * syyd - syd * syd = 0 THEN NULL ELSE"
             " ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))"
             " / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) END", 6)}
             AS r2
    FROM d ORDER BY p_brand
    """,
)
def ols_trend_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand ordinary-least-squares fit of extended price (whole
    dollars) on quantity — the grouped-regression operator (price-curve /
    trend estimation per segment) expressed as the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²), the classic single-pass
    map-side-combinable form.

    Exactness: x (quantity) and y (price) are integer-valued by
    construction and quantized to BIGINT per row, so all six sums are
    exact integers; the determinants are then computed in DOUBLE from
    those exact sums — identical IEEE expressions on both engines, and
    overflow-safe at any group size (the all-BIGINT form overflowed at
    n*syy in the x10 probe: 2.4e5 rows/brand * 1.4e9 mean-square already
    exceeds 2^63 at x10 — ANSI mode turned that silent-at-best wrap into
    a caught error). Degenerate zero variance in EITHER coordinate
    surfaces NULL via explicit CASE on both engines (x-variance kills
    slope/intercept/r², y-variance kills r² — never double/0, whose
    result is engine-divergent).

    Scale design: ONE fact shuffle to the brand grain (25 groups) with
    map-side partial aggregation; the part join is dimension-sided and
    adaptive. This is the canonical 100 TB regression plan — no gradient
    loop, no driver math beyond the final 25-row expression."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    # determinants in DOUBLE over the exact integer sums (overflow-safe;
    # written identically in the oracle so both engines round identically)
    d = s.select(
        "p_brand",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    nd, sxd, syd = F.col("nd"), F.col("sxd"), F.col("syd")
    sxyd, sxxd, syyd = F.col("sxyd"), F.col("sxxd"), F.col("syyd")
    # explicit CASE-to-NULL on BOTH degenerate variances (ADVICE r6: the
    # x-variance determinant was unguarded — double/0 is engine-divergent)
    vx = nd * sxxd - sxd * sxd
    vy = nd * syyd - syd * syd
    slope = (nd * sxyd - sxd * syd) / vx
    return d.select(
        "p_brand",
        "n",
        rnd(
            F.when(vx == 0, F.lit(None).cast("double")).otherwise(slope), 6
        ).alias("slope"),
        rnd(
            F.when(vx == 0, F.lit(None).cast("double")).otherwise(
                (syd - slope * sxd) / nd
            ),
            6,
        ).alias("intercept"),
        rnd(
            F.when(
                (vx == 0) | (vy == 0), F.lit(None).cast("double")
            ).otherwise(
                ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) / (vx * vy)
            ),
            6,
        ).alias("r2"),
    ).orderBy("p_brand")


# --------------------------------------------------------------------------
# Mutual information / entropy between two categorical columns
# --------------------------------------------------------------------------
@register(
    "mutual_information_flags",
    tags=("stats", "feature-selection", "agg", "scalable"),
    oracle=f"""
    WITH j AS (
      SELECT l_returnflag AS xv, l_linestatus AS yv, count(*) AS nxy
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT xv, yv, nxy,
             CAST(sum(nxy) OVER (PARTITION BY xv) AS BIGINT) AS nx,
             CAST(sum(nxy) OVER (PARTITION BY yv) AS BIGINT) AS ny,
             CAST(sum(nxy) OVER () AS BIGINT) AS n
      FROM j
    ),
    t AS (
      SELECT n,
             CAST(floor(nxy * 1.0 / n
               * ln(nxy * 1.0 * n / (nx * 1.0 * ny)) * 1e12 + 0.5) AS BIGINT)
               AS mi_q,
             CAST(floor(-(nxy * 1.0 / n) * ln(nxy * 1.0 / n) * 1e12 + 0.5)
               AS BIGINT) AS hj_q
      FROM m
    ),
    mx AS (
      SELECT xv, CAST(sum(nxy) AS BIGINT) AS nx, min(n) AS n
      FROM m GROUP BY xv
    ),
    my AS (
      SELECT yv, CAST(sum(nxy) AS BIGINT) AS ny, min(n) AS n
      FROM m GROUP BY yv
    )
    SELECT
      (SELECT count(*) FROM j) AS n_cells,
      (SELECT min(n) FROM t) AS n_rows,
      {rnd_sql("(SELECT sum(mi_q) FROM t) / 1e12", 6)} AS mi_nats,
      {rnd_sql("(SELECT sum(hj_q) FROM t) / 1e12", 6)} AS h_joint,
      {rnd_sql(
        "(SELECT CAST(sum(CAST(floor(-(nx * 1.0 / n) * ln(nx * 1.0 / n)"
        " * 1e12 + 0.5) AS BIGINT)) AS BIGINT) FROM mx) / 1e12", 6)} AS h_x,
      {rnd_sql(
        "(SELECT CAST(sum(CAST(floor(-(ny * 1.0 / n) * ln(ny * 1.0 / n)"
        " * 1e12 + 0.5) AS BIGINT)) AS BIGINT) FROM my) / 1e12", 6)} AS h_y
    """,
)
def mutual_information_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) and entropies H(X), H(Y), H(X,Y) between
    l_returnflag and l_linestatus — the categorical feature-association
    diagnostic (feature selection / redundancy detection; Cover & Thomas
    ch.2) computed entirely from the joint count table.

    Exactness: each cell's MI/entropy term is quantized to pico-nat
    BIGINTs before summation (sum order never matters); the ln inputs are
    ratios of exact integers, identical on both engines.

    Scale design: ONE fact shuffle to the (flag, status) grain — the
    joint table is bounded BY CONSTRUCTION at |domain(X)| x |domain(Y)|
    (6 cells here) regardless of corpus size; marginals are windows over
    that bounded table (the empty-partitionBy window runs over <= 6 rows),
    and the readout is a 1-row reduction of it."""
    li = load_table(spark, sf_dir, "lineitem")
    j = li.groupBy(
        F.col("l_returnflag").alias("xv"), F.col("l_linestatus").alias("yv")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    # windows over the bounded joint table: input = |X| x |Y| cells
    # (3 x 2 here), constant in corpus size — boundedness BY CONSTRUCTION
    m = j.select(
        "xv",
        "yv",
        "nxy",
        F.sum("nxy").over(Window.partitionBy("xv")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("yv")).alias("ny"),
        # bounded: the 6-cell joint table (see above)
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    q = lambda c: F.floor(c * 1e12 + F.lit(0.5)).cast("long")  # noqa: E731
    nxy, nx, ny, n = (F.col(c) for c in ("nxy", "nx", "ny", "n"))
    terms = m.select(
        "xv",
        "yv",
        "nxy",
        "n",
        q(nxy * 1.0 / n * F.log(nxy * 1.0 * n / (nx * 1.0 * ny))).alias("mi_q"),
        q(-(nxy * 1.0 / n) * F.log(nxy * 1.0 / n)).alias("hj_q"),
        # marginal terms contributed once per marginal value (first cell
        # of each xv / yv group under a deterministic cell order)
        F.when(
            F.row_number().over(Window.partitionBy("xv").orderBy("yv")) == 1,
            q(-(nx * 1.0 / n) * F.log(nx * 1.0 / n)),
        ).otherwise(F.lit(0)).alias("hx_q"),
        F.when(
            F.row_number().over(Window.partitionBy("yv").orderBy("xv")) == 1,
            q(-(ny * 1.0 / n) * F.log(ny * 1.0 / n)),
        ).otherwise(F.lit(0)).alias("hy_q"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("n").alias("n_rows"),
        rnd(F.sum("mi_q") / 1e12, 6).alias("mi_nats"),
        rnd(F.sum("hj_q") / 1e12, 6).alias("h_joint"),
        rnd(F.sum("hx_q") / 1e12, 6).alias("h_x"),
        rnd(F.sum("hy_q") / 1e12, 6).alias("h_y"),
    )


# --------------------------------------------------------------------------
# Gini impurity / entropy of the order-status mix per market segment
# --------------------------------------------------------------------------
@register(
    "gini_segment_mix",
    tags=("stats", "feature-selection", "agg", "scalable"),
    oracle=f"""
    WITH j AS (
      SELECT c_mktsegment AS seg, o_orderstatus AS st, count(*) AS c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, st, c, CAST(sum(c) OVER (PARTITION BY seg) AS BIGINT) AS tot
      FROM j
    ),
    t AS (
      SELECT seg, tot,
             CAST(floor((c * 1.0 / tot) * (c * 1.0 / tot) * 1e12 + 0.5)
               AS BIGINT) AS p2_q,
             CAST(floor(-(c * 1.0 / tot) * ln(c * 1.0 / tot) * 1e12 + 0.5)
               AS BIGINT) AS h_q
      FROM m
    )
    SELECT seg AS c_mktsegment, min(tot) AS n_orders,
           count(*) AS n_statuses,
           {rnd_sql("1.0 - sum(p2_q) / 1e12", 6)} AS gini,
           {rnd_sql("sum(h_q) / 1e12", 6)} AS entropy
    FROM t GROUP BY seg ORDER BY seg
    """,
)
def gini_segment_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment Gini impurity (1 - sum p^2) and Shannon entropy
    of the order-status mix — the split-quality diagnostics every
    tree-learner and label-balance audit computes (CART, Breiman 1984),
    as a pure count-table reduction.

    Exactness: per-status p^2 and -p ln p terms quantize to pico-unit
    BIGINTs before the per-segment sum. Scale design: one orders-customer
    equi-join (dimension adaptive) and ONE shuffle to the (segment,
    status) grain — bounded BY CONSTRUCTION at 5 x 3 rows; the window
    partitioned by segment runs over that bounded table."""
    od = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # window over the bounded (segment, status) table: 5 x 3 rows max
    m = j.select(
        "seg", "st", "c", F.sum("c").over(Window.partitionBy("seg")).alias("tot")
    )
    p = F.col("c") * 1.0 / F.col("tot")
    t = m.select(
        "seg",
        "tot",
        F.floor(p * p * 1e12 + F.lit(0.5)).cast("long").alias("p2_q"),
        F.floor(-p * F.log(p) * 1e12 + F.lit(0.5)).cast("long").alias("h_q"),
    )
    return (
        t.groupBy("seg")
        .agg(
            F.min("tot").alias("n_orders"),
            F.count(F.lit(1)).alias("n_statuses"),
            rnd(1.0 - F.sum("p2_q") / 1e12, 6).alias("gini"),
            rnd(F.sum("h_q") / 1e12, 6).alias("entropy"),
        )
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n_orders",
            "n_statuses",
            "gini",
            "entropy",
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Deterministic weighted reservoir sample (Efraimidis-Spirakis A-ES)
# --------------------------------------------------------------------------
_WRS_K = 100
_WRS_M = 2147483648  # 2^31; LCG modulus for the deterministic uniform


@register(
    "weighted_reservoir_sample",
    tags=("curation", "sampling", "scalable"),
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey, o_totalprice,
             ((((o_orderkey % {_WRS_M}) * 1103515245 + 12345) % {_WRS_M})
               + 1.0) / {_WRS_M + 1}.0 AS u
      FROM orders
    )
    SELECT o_orderkey,
           {rnd_sql("o_totalprice", 2)} AS weight,
           {rnd_sql("ln(u) / o_totalprice", 9)} AS sample_key
    FROM u
    ORDER BY ln(u) / o_totalprice DESC, o_orderkey ASC
    LIMIT {_WRS_K}
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample of {_WRS_K} orders without replacement —
    the A-ES reservoir algorithm (Efraimidis & Spirakis 2006): each row
    draws u ~ U(0,1] and the top-k rows by u^(1/w) (equivalently
    ln(u)/w) ARE a weighted sample. The uniform comes from a
    deterministic LCG of the key instead of an RNG, so the sample is
    reproducible across backfills — the property any training-data
    sampling pipeline needs.

    Exactness: the LCG is exact BIGINT arithmetic — the key is reduced
    mod 2^31 BEFORE the multiply, bounding the product at ~2.4e18 < 2^63
    at ANY key scale (the unreduced form would overflow BIGINT once
    orderkeys pass ~8.4e9, i.e. around sf5000); ln(u)/w is the same
    per-row IEEE expression on both engines, so the global order (with
    the orderkey tie-break) is identical.

    Scale design: map-only scoring followed by TakeOrderedAndProject —
    Spark's top-k keeps a k-row heap per partition and merges on the
    driver, which IS the distributed reservoir: no global sort, no
    shuffle of the fact, O(k) driver memory at any corpus size."""
    od = load_table(spark, sf_dir, "orders")
    u = (
        (((F.col("o_orderkey") % _WRS_M) * 1103515245 + 12345) % _WRS_M) + 1.0
    ) / float(_WRS_M + 1)
    key = F.log(u) / F.col("o_totalprice")
    return (
        od.select(
            "o_orderkey",
            rnd(F.col("o_totalprice"), 2).alias("weight"),
            rnd(key, 9).alias("sample_key"),
            key.alias("_k"),
        )
        .orderBy(F.desc("_k"), F.asc("o_orderkey"))
        .limit(_WRS_K)
        .drop("_k")
    )


# --------------------------------------------------------------------------
# RFM segmentation with fixed domain bands
# --------------------------------------------------------------------------
# Band edges chosen from the corpus profile (terciles at sf0.01); fixed
# thresholds rather than per-run quantiles so (a) scoring is map-only with
# no global sort, and (b) segment definitions are stable across backfills —
# the form production CRM/curation pipelines use (Hughes 1994, "Strategic
# Database Marketing").
_RFM_R_DAYS = (150, 400)  # recency days: <=150 -> 3, <=400 -> 2, else 1
_RFM_F_ORDERS = (13, 10)  # frequency:    >=13 -> 3, >=10 -> 2, else 1
_RFM_M_CENTS = (330_000_000, 240_000_000)  # monetary cents thresholds


@register(
    "rfm_customer_segments",
    tags=("relational", "segmentation", "agg", "scalable"),
    oracle=f"""
    WITH c AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents,
             max(o_orderdate) AS last_dt
      FROM orders GROUP BY o_custkey
    ),
    g AS (SELECT max(o_orderdate) AS mx FROM orders),
    s AS (
      SELECT
        CASE WHEN date_diff('day', last_dt, mx) <= {_RFM_R_DAYS[0]} THEN 3
             WHEN date_diff('day', last_dt, mx) <= {_RFM_R_DAYS[1]} THEN 2
             ELSE 1 END AS r_score,
        CASE WHEN n_orders >= {_RFM_F_ORDERS[0]} THEN 3
             WHEN n_orders >= {_RFM_F_ORDERS[1]} THEN 2
             ELSE 1 END AS f_score,
        CASE WHEN cents >= {_RFM_M_CENTS[0]} THEN 3
             WHEN cents >= {_RFM_M_CENTS[1]} THEN 2
             ELSE 1 END AS m_score,
        cents
      FROM c CROSS JOIN g
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           {rnd_sql("sum(cents) / (100.0 * count(*))", 2)} AS avg_monetary
    FROM s GROUP BY 1, 2, 3
    ORDER BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary segmentation: per-customer order stats
    scored into fixed 1-3 bands, then the 27-cell segment census with
    average monetary value. Customers without orders are out of scope by
    definition (no last-order date).

    Exactness: monetary quantizes to integer cents map-side; recency is
    exact day arithmetic; band scoring is integer comparison.

    Scale design: ONE fact shuffle to the customer grain, a 1-row
    global-extent broadcast (max order date) folded into the same plan
    via crossJoin(broadcast), then a second tiny shuffle to the bounded
    27-cell grain. No global sort, no per-run quantiles — the fixed
    bands keep scoring map-only (see module header for why)."""
    od = load_table(spark, sf_dir, "orders")
    c = od.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
        F.max("o_orderdate").alias("last_dt"),
    )
    g = od.agg(F.max("o_orderdate").alias("mx"))
    rec = F.datediff(F.col("mx"), F.col("last_dt"))
    s = c.crossJoin(F.broadcast(g)).select(
        F.when(rec <= _RFM_R_DAYS[0], 3)
        .when(rec <= _RFM_R_DAYS[1], 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("n_orders") >= _RFM_F_ORDERS[0], 3)
        .when(F.col("n_orders") >= _RFM_F_ORDERS[1], 2)
        .otherwise(1)
        .alias("f_score"),
        F.when(F.col("cents") >= _RFM_M_CENTS[0], 3)
        .when(F.col("cents") >= _RFM_M_CENTS[1], 2)
        .otherwise(1)
        .alias("m_score"),
        "cents",
    )
    return (
        s.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("cents") / (100.0 * F.count(F.lit(1))), 2).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Pareto frontier (2-D skyline) on a bounded aggregate
# --------------------------------------------------------------------------
@register(
    "pareto_frontier_parts",
    tags=("relational", "skyline", "window"),
    oracle=f"""
    WITH g AS (
      SELECT p_brand, p_type,
             CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents,
             CAST(sum(p_size) AS BIGINT) AS ssize,
             count(*) AS n
      FROM part GROUP BY 1, 2
    ),
    pts AS (
      SELECT p_brand, p_type, n,
             cents * 1.0 / (100.0 * n) AS avg_price,
             ssize * 1.0 / n AS avg_size
      FROM g
    )
    SELECT p_brand, p_type, n AS n_parts,
           {rnd_sql("avg_price", 6)} AS avg_price,
           {rnd_sql("avg_size", 6)} AS avg_size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.avg_price <= p.avg_price AND q.avg_size >= p.avg_size
        AND (q.avg_price < p.avg_price OR q.avg_size > p.avg_size)
    )
    ORDER BY p_brand, p_type
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline; Borzsony/Kossmann/Stocker 2001) of
    (brand, type) groups: minimize average retail price, maximize average
    size — the non-dominated set no other group beats on both axes.

    Instead of the oracle's O(n^2) NOT-EXISTS dominance join, the Spark
    plan is the sort-scan skyline: collapse to one row per distinct
    price level (max size per level), take the running strict-prefix max
    of size over cheaper levels (lag window), and keep levels whose max
    size strictly exceeds it; rows survive iff their level survives and
    they achieve the level max (equal-(price,size) duplicates all
    survive — strict dominance). Provably equivalent to the dominance
    definition for the 2-D case.

    Exactness: averages are single divisions of exact BIGINT sums.
    Boundedness: windows run over the (brand, type) aggregate — bounded
    BY CONSTRUCTION at |brands| x |types| (25 x ~150) rows regardless of
    part-table size; at 100 TB the skyline input is this dimension-sized
    summary, never the fact."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy("p_brand", "p_type").agg(
        F.sum(
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
        F.sum("p_size").alias("ssize"),
        F.count(F.lit(1)).alias("n"),
    )
    pts = g.select(
        "p_brand",
        "p_type",
        "n",
        (F.col("cents") * 1.0 / (100.0 * F.col("n"))).alias("avg_price"),
        (F.col("ssize") * 1.0 / F.col("n")).alias("avg_size"),
    )
    # one row per price level; window over the bounded level table
    # (input = distinct avg-price levels of the 25 x ~150 group table)
    levels = pts.groupBy("avg_price").agg(F.max("avg_size").alias("smax"))
    wl = Window.orderBy("avg_price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_levels = (
        levels.select(
            "avg_price", "smax", F.max("smax").over(wl).alias("mprev")
        )
        .filter(F.col("mprev").isNull() | (F.col("smax") > F.col("mprev")))
        .select(
            F.col("avg_price").alias("f_price"), F.col("smax").alias("f_smax")
        )
    )
    return (
        pts.join(
            F.broadcast(frontier_levels),
            (pts.avg_price == F.col("f_price"))
            & (pts.avg_size == F.col("f_smax")),
        )
        .select(
            "p_brand",
            "p_type",
            F.col("n").alias("n_parts"),
            rnd(pts.avg_price, 6).alias("avg_price"),
            rnd(pts.avg_size, 6).alias("avg_size"),
        )
        .orderBy("p_brand", "p_type")
    )


# --------------------------------------------------------------------------
# Calendar gap fill (date spine + zero-fill)
# --------------------------------------------------------------------------
@register(
    "calendar_gap_fill_revenue",
    tags=("relational", "timeseries", "scalable"),
    oracle=f"""
    WITH rev AS (
      SELECT c_nationkey AS nk, date_trunc('month', o_orderdate) AS mth,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    ext AS (
      SELECT min(date_trunc('month', o_orderdate)) AS lo,
             max(date_trunc('month', o_orderdate)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT n_nationkey, n_name, unnest(generate_series(lo, hi,
               INTERVAL 1 MONTH)) AS mth
      FROM nation CROSS JOIN ext
    )
    SELECT s.n_name AS nation, strftime(s.mth, '%Y-%m') AS month,
           coalesce(r.n_orders, 0) AS n_orders,
           {rnd_sql("coalesce(r.cents, 0) / 100.0", 2)} AS revenue
    FROM spine s LEFT JOIN rev r
      ON s.n_nationkey = r.nk AND s.mth = r.mth
    ORDER BY nation, month
    """,
)
def calendar_gap_fill_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue per nation with missing months explicitly
    zero-filled — the gap-fill operator every time-series consumer needs
    before resampling/forecasting (a month with no orders must be a 0
    row, not an absent row).

    The date spine is sequence(min_month, max_month) off a 1-row extent
    aggregate, cross-joined with the 25-nation dimension — entirely
    broadcast-sided. Scale design: ONE fact shuffle to the (nation,
    month) grain (bounded: 25 x calendar months); the spine LEFT JOIN
    runs broadcast against that bounded aggregate, never against the
    fact. Output months are strings (driver convention: no raw datetime
    columns)."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_trunc("month", "o_orderdate").alias("mth"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    ext = od.agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("lo"),
        F.max(F.date_trunc("month", "o_orderdate")).alias("hi"),
    )
    spine = (
        na.crossJoin(F.broadcast(ext))
        .select(
            "n_nationkey",
            "n_name",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
            ).alias("mth"),
        )
    )
    return (
        spine.join(
            rev,
            (spine.n_nationkey == rev.nk) & (spine.mth == rev.mth),
            "left",
        )
        .select(
            spine.n_name.alias("nation"),
            F.date_format(spine.mth, "yyyy-MM").alias("month"),
            F.coalesce(rev.n_orders, F.lit(0)).alias("n_orders"),
            rnd(F.coalesce(rev.cents, F.lit(0)) / 100.0, 2).alias("revenue"),
        )
        .orderBy("nation", "month")
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection on the daily revenue series
# --------------------------------------------------------------------------
_ROLL_W = 28  # trailing window (days), excludes the current day


@register(
    "rolling_revenue_anomaly",
    tags=("relational", "timeseries", "window", "drift"),
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
               AS dollars
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT day, dollars,
             CAST(count(*) OVER w AS BIGINT) AS nw,
             CAST(sum(dollars) OVER w AS BIGINT) AS sw,
             CAST(sum(dollars * dollars) OVER w AS BIGINT) AS sw2
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN {_ROLL_W} PRECEDING
                   AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, dollars,
           {rnd_sql(
             "(dollars - sw * 1.0 / nw)"
             " / sqrt((sw2 - sw * 1.0 * sw / nw) / (nw - 1))", 6)} AS z,
           CAST(CASE WHEN abs((dollars - sw * 1.0 / nw)
             / sqrt((sw2 - sw * 1.0 * sw / nw) / (nw - 1))) > 3.0
             THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM r
    WHERE nw = {_ROLL_W}
      AND sw2 - sw * 1.0 * sw / nw > 0
    ORDER BY day
    """,
)
def rolling_revenue_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{_ROLL_W}-day z-score anomaly flags on the daily order
    revenue series — the rolling-statistics monitor (control-chart /
    3-sigma rule) a pipeline runs on every ingestion metric. The window
    EXCLUDES the current day, so an anomalous day cannot mask itself.

    Exactness: daily revenue quantizes to whole dollars (BIGINT; squares
    stay in range up to ~sf1000 daily volume), and the rolling mean/std
    are IEEE expressions of exact integer window sums.

    Boundedness: the empty-partitionBy ordered window runs over the
    DAILY table — bounded BY CONSTRUCTION at the TPC-H calendar span
    (~2,400 days at every SF; the date domain does not grow with volume).
    The fact itself sees only ONE shuffle, to the day grain. Zero-variance
    windows (all {_ROLL_W} days equal) are excluded on both engines
    rather than dividing by zero."""
    od = load_table(spark, sf_dir, "orders")
    d = od.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long")).alias(
            "dollars"
        )
    )
    # input = daily series, bounded by the fixed calendar span (~2,400
    # rows at any SF) — safe for an unpartitioned ordered window
    w = Window.orderBy("day").rowsBetween(-_ROLL_W, -1)
    r = d.select(
        "day",
        "dollars",
        F.count(F.lit(1)).over(w).alias("nw"),
        F.sum("dollars").over(w).alias("sw"),
        F.sum(F.col("dollars") * F.col("dollars")).over(w).alias("sw2"),
    )
    mean = F.col("sw") * 1.0 / F.col("nw")
    var = (F.col("sw2") - F.col("sw") * 1.0 * F.col("sw") / F.col("nw")) / (
        F.col("nw") - 1
    )
    z = (F.col("dollars") - mean) / F.sqrt(var)
    return (
        r.filter(
            (F.col("nw") == _ROLL_W)
            & (F.col("sw2") - F.col("sw") * 1.0 * F.col("sw") / F.col("nw") > 0)
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dollars",
            rnd(z, 6).alias("z"),
            F.when(F.abs(z) > 3.0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
                "is_anomaly"
            ),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Stratified k-fold assignment audit
# --------------------------------------------------------------------------
_KFOLDS = 5


@register(
    "stratified_kfold_assignment",
    tags=("curation", "splits", "agg", "scalable"),
    oracle=f"""
    WITH f AS (
      SELECT o_orderpriority AS stratum,
             CAST(o_orderkey % {_KFOLDS} AS INT) AS fold,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT stratum, fold, n,
             CAST(sum(n) OVER (PARTITION BY stratum) AS BIGINT) AS tot
      FROM f
    ),
    t AS (
      SELECT stratum, tot, count(*) AS n_folds,
             CAST(min(n) AS BIGINT) AS min_fold_n,
             CAST(max(n) AS BIGINT) AS max_fold_n,
             CAST(sum(CAST(floor(
               (n - tot * 1.0 / {_KFOLDS}) * (n - tot * 1.0 / {_KFOLDS})
               / (tot * 1.0 / {_KFOLDS}) * 1e9 + 0.5) AS BIGINT))
               AS BIGINT) AS chi2_q
      FROM s GROUP BY stratum, tot
    )
    SELECT stratum, tot AS n_orders, n_folds, min_fold_n, max_fold_n,
           {rnd_sql(f"(max_fold_n - min_fold_n) * {_KFOLDS}.0 / tot", 6)}
             AS imbalance,
           {rnd_sql("chi2_q / 1e9", 6)} AS chi2
    FROM t ORDER BY stratum
    """,
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (fold = key mod
    {_KFOLDS}) audited per stratum (order priority): fold counts,
    imbalance ratio, and the chi-squared statistic against the uniform
    split — the pre-training check that hash-fold assignment didn't
    correlate with a stratum (key-structure leakage into folds).

    Exactness: counts are exact; each stratum's chi-squared terms
    quantize to nano-unit BIGINTs before summing. Scale design: ONE fact
    shuffle to the bounded (stratum, fold) grain (5 x {_KFOLDS} rows BY
    CONSTRUCTION); the per-stratum window and collapse run on that
    constant table."""
    od = load_table(spark, sf_dir, "orders")
    f = od.groupBy(
        F.col("o_orderpriority").alias("stratum"),
        (F.col("o_orderkey") % _KFOLDS).cast("int").alias("fold"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # window over the bounded (stratum, fold) table: 5 x 5 rows
    s = f.select(
        "stratum",
        "fold",
        "n",
        F.sum("n").over(Window.partitionBy("stratum")).alias("tot"),
    )
    exp = F.col("tot") * 1.0 / _KFOLDS
    chi_term = (
        F.floor((F.col("n") - exp) * (F.col("n") - exp) / exp * 1e9 + F.lit(0.5))
        .cast("long")
    )
    return (
        s.groupBy("stratum", "tot")
        .agg(
            F.count(F.lit(1)).alias("n_folds"),
            F.min("n").alias("min_fold_n"),
            F.max("n").alias("max_fold_n"),
            rnd(
                (F.max("n") - F.min("n")) * float(_KFOLDS) / F.first("tot"), 6
            ).alias("imbalance"),
            rnd(F.sum(chi_term) / 1e9, 6).alias("chi2"),
        )
        .select(
            "stratum",
            F.col("tot").alias("n_orders"),
            "n_folds",
            "min_fold_n",
            "max_fold_n",
            "imbalance",
            "chi2",
        )
        .orderBy("stratum")
    )


# --------------------------------------------------------------------------
# Zone-map (data-skipping) statistics across two file layouts
# --------------------------------------------------------------------------
_ZM_BUCKETS = 64
# audit predicate: one quarter of shipdates
_ZM_LO = "1996-01-01 00:00:00"
_ZM_HI = "1996-03-31 00:00:00"


@register(
    "zone_map_stats",
    tags=("layout", "pruning", "agg", "scalable"),
    oracle=f"""
    WITH ext AS (
      SELECT max(l_orderkey) AS mxk FROM lineitem
    ),
    b AS (
      SELECT 'natural' AS layout,
             CAST(floor(l_orderkey * {_ZM_BUCKETS}.0 / (mxk + 1)) AS INT)
               AS bucket,
             l_shipdate
      FROM lineitem CROSS JOIN ext
      UNION ALL
      SELECT 'bydate' AS layout,
             CAST((year(l_shipdate) * 12 + month(l_shipdate) - 1)
               % {_ZM_BUCKETS} AS INT) AS bucket,
             l_shipdate
      FROM lineitem
    ),
    z AS (
      SELECT layout, bucket, count(*) AS n_rows,
             CAST(floor(epoch(min(l_shipdate))) AS BIGINT) AS min_ship_s,
             CAST(floor(epoch(max(l_shipdate))) AS BIGINT) AS max_ship_s
      FROM b GROUP BY 1, 2
    ),
    p AS (
      SELECT layout, bucket, n_rows,
             CASE WHEN max_ship_s < epoch(TIMESTAMP '{_ZM_LO}')
                    OR min_ship_s > epoch(TIMESTAMP '{_ZM_HI}')
                  THEN 1 ELSE 0 END AS pruned
      FROM z
    )
    SELECT layout, count(*) AS n_buckets,
           CAST(sum(pruned) AS BIGINT) AS n_pruned,
           CAST(sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_skipped,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           {rnd_sql(
             "sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END) * 1.0"
             " / sum(n_rows)", 6)} AS skip_fraction
    FROM p GROUP BY layout ORDER BY layout
    """,
)
def zone_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness audit: per-file-bucket min/max shipdate
    statistics (the parquet row-group / Delta file-stats model) computed
    for TWO layouts — 'natural' ({_ZM_BUCKETS} orderkey-range files, the
    as-ingested order) and 'bydate' (files clustered by ship month) —
    then the fraction of rows a [{_ZM_LO[:10]}, {_ZM_HI[:10]}] shipdate
    predicate could skip under each. This is the measurement that
    justifies the zorder_file_layout operator: clustering is worthless
    until its zone maps actually prune.

    Scale design: ONE fact scan; both layouts' bucket assignments are
    computed per row and exploded (2x map rows), then ONE shuffle to the
    bounded (layout, bucket) grain (2 x {_ZM_BUCKETS} rows) carries the
    min/max/count rollup; the orderkey extent is a 1-row broadcast. At
    100 TB this audit is how a table-format maintainer decides whether a
    re-cluster pays for itself."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    ext = li.agg(F.max("l_orderkey").alias("mxk"))
    b = (
        li.crossJoin(F.broadcast(ext))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("natural").alias("layout"),
                        F.floor(
                            F.col("l_orderkey")
                            * float(_ZM_BUCKETS)
                            / (F.col("mxk") + 1)
                        )
                        .cast("int")
                        .alias("bucket"),
                    ),
                    F.struct(
                        F.lit("bydate").alias("layout"),
                        (
                            (
                                F.year("l_shipdate") * 12
                                + F.month("l_shipdate")
                                - 1
                            )
                            % _ZM_BUCKETS
                        )
                        .cast("int")
                        .alias("bucket"),
                    ),
                )
            ).alias("lb"),
            "l_shipdate",
        )
        .select("lb.layout", "lb.bucket", "l_shipdate")
    )
    z = b.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.unix_timestamp(F.min("l_shipdate")).alias("min_ship_s"),
        F.unix_timestamp(F.max("l_shipdate")).alias("max_ship_s"),
    )
    lo_s = F.unix_timestamp(F.lit(_ZM_LO).cast("timestamp"))
    hi_s = F.unix_timestamp(F.lit(_ZM_HI).cast("timestamp"))
    p = z.select(
        "layout",
        "bucket",
        "n_rows",
        F.when(
            (F.col("max_ship_s") < lo_s) | (F.col("min_ship_s") > hi_s), 1
        )
        .otherwise(0)
        .alias("pruned"),
    )
    return (
        p.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("pruned").alias("n_pruned"),
            F.sum(
                F.when(F.col("pruned") == 1, F.col("n_rows")).otherwise(0)
            ).alias("rows_skipped"),
            F.sum("n_rows").alias("total_rows"),
            rnd(
                F.sum(
                    F.when(F.col("pruned") == 1, F.col("n_rows")).otherwise(0)
                )
                * 1.0
                / F.sum("n_rows"),
                6,
            ).alias("skip_fraction"),
        )
        .orderBy("layout")
    )
