"""Round-8 additions: the designed-and-deferred operators from the
round-7 registry plan (queries/registry.py r7 note) plus the driver-
facing query for the keyless binned range join (VERDICT r7 #2 — the one
round-7 operator surface without a CORRECTNESS row).

- Price-band lookup via the bin-bucketed keyless range join: lineitem
  extended price against an OVERLAPPING band table with no equi key —
  the join Spark itself plans as BroadcastNestedLoopJoin; the operator
  turns it into an equi hash join on a quantized bin id (a plan-shape
  test pins the nested loop out of the executed plan).
- Order-value Gini coefficient per nation — inequality-of-spend audit
  via the sorted-rank identity, computed on the tie-collapsed
  (nation, value) grain so the ranking window never carries the fact.
- Hapax/type-token-ratio corpus health audit per document source.

Exactness contract (repo-wide, see round7.py): money quantizes to
integer cents map-side; rank-weighted sums that can exceed 2^63 at
large SF run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); every
surfaced float is a single IEEE expression over exact integers,
half-up rounded through functions/rounding.rnd on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.rangejoin import binned_range_join
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Price-band lookup through the keyless binned range join
# --------------------------------------------------------------------------
# Overlapping price bands over lineitem's extended-price domain
# (~[900, 105000] at every SF — TPC-H prices are SF-invariant). Bands
# overlap ON PURPOSE: a fact row in an overlap region must land in BOTH
# bands, the case a naive bucketing join gets wrong.
_PRICE_BANDS: tuple[tuple[str, float, float], ...] = (
    ("budget", 0.0, 15000.0),
    ("value", 10000.0, 40000.0),
    ("mid", 35000.0, 70000.0),
    ("premium", 65000.0, 95000.0),
    ("luxury", 90000.0, 200000.0),
)
# ~ the median band width / 6: each band explodes into 3..22 bins
# (~60 exploded range rows total), each fact row maps to exactly one bin.
_BAND_BIN_WIDTH = 5000.0

_BANDS_VALUES = ", ".join(
    f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS
)


@register(
    "price_band_lookup_binned",
    tags=("relational", "rangejoin", "scalable"),
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
    SELECT b.band, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           {rnd_sql(
             "sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))"
             " / 100.0", 2)} AS revenue
    FROM lineitem l
    JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice <= b.hi
    GROUP BY b.band ORDER BY b.band
    """,
)
def price_band_lookup_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue/volume per price band where band membership is a pure
    non-equi interval predicate (price BETWEEN lo AND hi, NO equi key,
    bands overlap) — the lookup shape Spark executes as
    BroadcastNestedLoopJoin, O(|fact| x |bands|). The plan here rides
    operators/rangejoin.binned_range_join: bands explode into covering
    5000-wide bins, each fact row maps to ONE bin, and the join is an
    equi hash join on the bin id with the exact BETWEEN re-checked as a
    post-filter (measured 2.9x over the nested loop at sf0.1, gap
    growing with |ranges| — SCALING.md "Keyless binned range join").

    tests/test_round8_ops.py pins BroadcastNestedLoopJoin OUT of this
    query's executed plan; tests/test_rangejoin.py pins the operator's
    exact equality with the nested-loop formulation (hypothesis, incl.
    overlap/degenerate/negative-domain intervals).

    Exactness: counts/quantities are exact BIGINTs; revenue quantizes
    to integer cents map-side (sum of BIGINTs, addition-order-free).

    Scale design: the fact never replicates (one bin per row); the
    exploded ranges side is |bands| x width/bin_width rows (~60 here —
    broadcast-sized by construction); one keyed aggregate to the band
    grain (domain-bounded output, map-side partials)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("xq"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("xc"),
    )
    bands = spark.createDataFrame(
        list(_PRICE_BANDS), "band string, lo double, hi double"
    )
    joined = binned_range_join(
        li, bands, "l_extendedprice", "lo", "hi", _BAND_BIN_WIDTH
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("xq").alias("sum_qty"),
            rnd(F.sum("xc") / 100.0, 2).alias("revenue"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Order-value Gini coefficient per nation
# --------------------------------------------------------------------------
@register(
    "order_value_gini_by_nation",
    tags=("stats", "inequality", "scalable"),
    oracle=f"""
    WITH ov AS (
      SELECT n.n_name,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rk AS (
      SELECT n_name, cents,
             row_number() OVER (PARTITION BY n_name ORDER BY cents) AS i
      FROM ov
    ),
    s AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS t,
             sum(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS s
      FROM rk GROUP BY n_name
    )
    SELECT n_name, n_orders,
           {rnd_sql("t / 100.0", 2)} AS total_value,
           {rnd_sql(
             "2.0 * CAST(s AS DOUBLE)"
             " / (CAST(n_orders AS DOUBLE) * CAST(t AS DOUBLE))"
             " - (CAST(n_orders AS DOUBLE) + 1.0)"
             " / CAST(n_orders AS DOUBLE)", 6)} AS gini
    FROM s ORDER BY n_name
    """,
)
def order_value_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values per customer nation — the
    inequality-of-spend audit (G = 0 everyone spends alike, G -> 1 a few
    whales carry the nation) — via the sorted-rank identity
    G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over ascending-sorted values.

    The oracle ranks row-by-row; the Spark plan computes the SAME exact
    rank-weighted sum on the tie-collapsed (nation, cents) grain: a
    value v appearing cnt times after `below` smaller rows contributes
    ranks below+1 .. below+cnt, so sum(i*x_i) gains
    v * (cnt*below + cnt*(cnt+1)/2). Tie order never changes the sum
    (equal values swap freely), so both formulations produce the
    identical integer.

    Exactness: values quantize to integer cents map-side; the
    rank-weighted sum runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    — BIGINT overflows i*cents*n at large SF (i ~ n ~ 6e8/nation at
    100 TB -> s ~ 1e25); n, t stay exact BIGINTs; the Gini is one IEEE
    expression over the correctly-rounded wide-int -> double casts,
    identical on both engines (the CUSUM precedent, round7.py).

    Scale design: nation broadcasts; AQE owns the customer join (the
    customer dim scales with SF — forcing a broadcast would die at the
    8 GB limit); ONE fact shuffle to the tie-collapsed (nation, cents)
    grain with map-side combine; the per-nation ranking window runs
    over THAT grain — bounded by |nation| x |distinct order values|
    (price domain), never the order count — then one aggregate to the
    25-row nation grain. If a value domain ever outgrows a single
    partition, the bh_fdr_scalable_adjust pattern (range-partitioned
    per-partition prefix sums + broadcast offsets) applies verbatim to
    the cumulative `below` column."""
    g = _gini_grain(spark, sf_dir)
    # bounded: (nation, distinct cents) grain — |price domain| rows per
    # nation, never the order count
    w = (
        Window.partitionBy("n_name")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "n_name",
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
    )
    return _gini_finish(r)


def _gini_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tie-collapsed (nation, cents, cnt) grain both Gini forms
    share: one keyed fact shuffle with map-side combine."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # customer scales with SF — leave its join strategy to AQE (forced
    # broadcast would die at the 8 GB limit long before 100 TB); nation
    # is the fixed 25-row dim, always broadcast
    ov = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return ov.groupBy("n_name", "cents").agg(F.count(F.lit(1)).alias("cnt"))


def _gini_finish(r: DataFrame) -> DataFrame:
    """Rank-weighted Gini from the grain + exclusive `below` counts
    (either the window form or the range-partitioned prefix-sum form)."""
    dec = "decimal(38,0)"
    # ranks below+1..below+cnt for the tie group: exact integer sum;
    # cnt*(cnt+1) fits BIGINT (cnt <= n/nation), the v*ranksum product
    # runs in decimal
    rank_sum = F.col("cnt").cast(dec) * F.col("below").cast(dec) + (
        F.expr("CAST((cnt * (cnt + 1)) DIV 2 AS BIGINT)").cast(dec)
    )
    s = r.groupBy("n_name").agg(
        F.sum("cnt").alias("n_orders"),
        F.sum(F.col("cents").cast(dec) * F.col("cnt").cast(dec))
        .cast("long")
        .alias("t"),
        F.sum(F.col("cents").cast(dec) * rank_sum).alias("s"),
    )
    nd = F.col("n_orders").cast("double")
    td = F.col("t").cast("double")
    gini = (
        F.lit(2.0) * F.col("s").cast("double") / (nd * td)
        - (nd + F.lit(1.0)) / nd
    )
    return s.select(
        "n_name",
        "n_orders",
        rnd(F.col("t") / 100.0, 2).alias("total_value"),
        rnd(gini, 6).alias("gini"),
    ).orderBy("n_name")


def order_value_gini_by_nation_scalable(
    spark: SparkSession, sf_dir: str, buckets: int = 32
) -> DataFrame:
    """The committed escape hatch of ``order_value_gini_by_nation``
    (named in its docstring since r8): the exclusive `below` column via
    ``range_partitioned_prefix_sum`` instead of the per-nation window —
    for the regime where a nation's distinct-value domain outgrows a
    single partition. UNREGISTERED twin (the r9 registration freeze;
    registry.py capacity policy): pinned exactly equal to the window
    form in tests/test_round9_ops.py, including a deliberately-defeated
    tie grain where every value is unique — the done-both-ways
    discipline ``bh_fdr``/``bh_fdr_scalable`` established."""
    from drug_target_discovery_spark.operators.prefixsum import (
        range_partitioned_prefix_sum,
    )

    g = _gini_grain(spark, sf_dir)
    r = range_partitioned_prefix_sum(
        g, ["n_name"], "cents", "cnt", out="below", buckets=buckets
    )
    return _gini_finish(r)


# --------------------------------------------------------------------------
# Hapax legomena / type-token ratio per document source
# --------------------------------------------------------------------------
@register(
    "hapax_ttr_by_source",
    tags=("text", "corpus", "quality", "scalable"),
    oracle=f"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ),
    tt AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           {rnd_sql("count(*) * 1.0 / sum(cnt)", 6)} AS ttr,
           {rnd_sql(
             "sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)",
             6)} AS hapax_frac
    FROM tt GROUP BY source ORDER BY source
    """,
)
def hapax_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health audit per document source: type-token ratio
    (distinct tokens / total tokens — collapses toward 0 on repetitive
    or template-generated text) and the hapax-legomenon fraction
    (share of the source's vocabulary appearing EXACTLY once — healthy
    natural text keeps it near Zipf's ~0.4-0.6; boilerplate and
    dedup-worthy spam crush it). The pair is the standard first look at
    whether a source is worth its mixture weight (complements
    zipf_slope_tokens / boilerplate_ngram_stats, same whitespace-token
    convention as the corpus family).

    Exactness: all four counts are exact BIGINTs; ttr / hapax_frac are
    single IEEE divisions of exact integers, identical on both engines.

    Scale design: token grain collapses with ONE keyed shuffle to
    (source, token) — map-side combinable partials, so the shuffle
    carries vocabulary, not the token stream — then one aggregate to
    the source-domain-bounded output (20 rows here). Never a window,
    never a pairwise join."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    tt = docs.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    n_types = F.count(F.lit(1))
    n_hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return (
        tt.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            n_types.alias("n_types"),
            n_hapax.cast("long").alias("n_hapax"),
            rnd(n_types * 1.0 / F.sum("cnt"), 6).alias("ttr"),
            rnd(n_hapax * 1.0 / n_types, 6).alias("hapax_frac"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Per-user Fano burstiness (designed r8; registered at the r10 gate per
# the plan written at r9 close — see the registry's r10 plan comment)
# --------------------------------------------------------------------------
_FANO_ORACLE = f"""
    WITH e AS (
      SELECT user_id, event_type, date_trunc('day', ts) AS day
      FROM events
    ),
    span AS (
      SELECT date_diff('day', min(day), max(day)) + 1 AS n FROM e
    ),
    ud AS (
      SELECT user_id, event_type, day, CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY 1, 2, 3
    ),
    u AS (
      SELECT user_id, event_type,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM ud GROUP BY 1, 2
    ),
    fan AS (
      SELECT user_id, event_type,
             CAST(floor((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                        * 1e9 + 0.5) AS BIGINT) AS fano_q
      FROM u CROSS JOIN span
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           {rnd_sql("sum(fano_q) * 1.0 / count(*) / 1e9", 6)} AS mean_fano,
           {rnd_sql("min(fano_q) / 1e9", 6)} AS min_fano,
           {rnd_sql("max(fano_q) / 1e9", 6)} AS max_fano,
           CAST(sum(CASE WHEN fano_q > 1000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_overdispersed
    FROM fan GROUP BY event_type ORDER BY event_type
"""


@register(
    "event_burstiness_fano",
    tags=("events", "stats", "scalable"),
    oracle=_FANO_ORACLE,
)
def event_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) Fano factor (variance/mean) of DAILY event
    counts over the corpus calendar span — the burstiness index: Fano = 1
    is Poisson (memoryless traffic), > 1 is overdispersed/bursty (bot
    storms, retry loops, campaign spikes), < 1 is under-dispersed
    (rate-limited or scheduled traffic). The driver row summarizes the
    per-user distribution per event type: user count, mean/min/max Fano,
    and the overdispersed (Fano > 1) user count — bounded by the
    event-type domain.

    Zero-days count: a user's days WITHOUT events are real observations
    of 0 (dropping them biases Fano down), folded in via sufficient
    statistics over the global span n — mean = S/n, var_pop = Q/n -
    (S/n)^2, so Fano = (n*Q - S^2)/(n*S) — without materializing zero
    rows. S >= 1 by construction (the (user, type) pair exists only if
    observed), so the denominator never vanishes.

    Exactness: n, S, Q are exact BIGINTs; each per-user Fano is one IEEE
    expression over their exact-int -> double casts, quantized to
    nano-units before the per-type mean (addition-order-free); the
    nano-unit sum runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
    BIGINT would wrap at ~1e8 users per type.

    Scale design: two keyed shuffles — the fact to the (user, type, day)
    grain, then to the (user, type) grain, both map-side combinable; the
    2-row span aggregate broadcasts; output is event-type-domain-bounded.
    Registered at the r10 gate as planned (decorator move, declared in
    _GATE_PLAN_CHANGED); tests/test_round8_ops.py keeps the python
    recompute cross-check alongside the driver hash row."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
    )
    span = e.agg(
        (F.datediff(F.max("day"), F.min("day")) + F.lit(1)).alias("n")
    )
    ud = e.groupBy("user_id", "event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    u = ud.groupBy("user_id", "event_type").agg(
        F.sum("c").alias("s"), F.sum(F.col("c") * F.col("c")).alias("q")
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    fan = u.crossJoin(F.broadcast(span)).select(
        "user_id",
        "event_type",
        F.floor((nd * qd - sd * sd) / (nd * sd) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("fano_q"),
    )
    n_users = F.count(F.lit(1))
    # sum of nano-unit fano_q can pass 2^63 at ~1e8 users/type — run it
    # in DECIMAL(38,0) like the Gini rank sums (DuckDB's sum(BIGINT)
    # already promotes to HUGEINT)
    fano_sum = F.sum(F.col("fano_q").cast("decimal(38,0)"))
    return (
        fan.groupBy("event_type")
        .agg(
            n_users.alias("n_users"),
            rnd(fano_sum * 1.0 / n_users / 1e9, 6).alias("mean_fano"),
            rnd(F.min("fano_q") / 1e9, 6).alias("min_fano"),
            rnd(F.max("fano_q") / 1e9, 6).alias("max_fano"),
            F.sum(F.when(F.col("fano_q") > 1_000_000_000, 1).otherwise(0))
            .cast("long")
            .alias("n_overdispersed"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Label propagation communities over the near-dup candidate graph
# (designed r8; registered at the r10 gate like fano)
# --------------------------------------------------------------------------
_LPA_ITERS = 4


def _lpa_oracle(n_iter: int) -> str:
    """Unrolled fixed-K LPA as DuckDB SQL over the SAME LSH candidate
    pair CTE connected_components_near_dups oracles against: per
    iteration, the (node, label) vote counts and a row_number argmax
    (cnt DESC, label ASC — the min-label tie-break), LEFT-joined back so
    isolated nodes (none exist in a pair graph, belt-and-braces) keep
    their label. K iterations = K CTE stages; deterministic, so the
    driver hash gate applies."""
    from drug_target_discovery_spark.operators.dedup import MERSENNE61
    from drug_target_discovery_spark.queries.dedup import (
        _BANDS_ROWS,
        _SIG_SQL,
    )

    sql = f"""
    WITH {_SIG_SQL},
    banded AS (
      SELECT doc_id, hash_idx // {_BANDS_ROWS} AS band,
             sum(minhash) % {MERSENNE61} AS bsum, count(*) AS n
      FROM sig GROUP BY doc_id, hash_idx // {_BANDS_ROWS}
      HAVING count(*) = {_BANDS_ROWS}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bsum = b.bsum AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT d1 AS src, d2 AS dst FROM pairs
      UNION ALL SELECT d2, d1 FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)"""
    for k in range(1, n_iter + 1):
        sql += f""",
    w{k} AS (
      SELECT n, lbl FROM (
        SELECT s.dst AS n, x.lbl, count(*) AS cnt,
               row_number() OVER (PARTITION BY s.dst
                 ORDER BY count(*) DESC, x.lbl ASC) AS rn
        FROM sym s JOIN l{k - 1} x ON x.node = s.src
        GROUP BY s.dst, x.lbl
      ) WHERE rn = 1
    ),
    l{k} AS (
      SELECT l.node, coalesce(w.lbl, l.lbl) AS lbl
      FROM l{k - 1} l LEFT JOIN w{k} w ON w.n = l.node
    )"""
    sql += f"""
    SELECT node AS doc_id, lbl AS community
    FROM l{n_iter} ORDER BY doc_id
    """
    return sql


_LPA_ORACLE = _lpa_oracle(_LPA_ITERS)


@register(
    "label_propagation_communities",
    tags=("graph", "dedup", "communities", "scalable"),
    oracle=_LPA_ORACLE,
)
def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Community labels over the LSH near-dup candidate graph via
    deterministic synchronous label propagation ({_LPA_ITERS} rounds,
    min-label tie-break — graph/algorithms.label_propagation): where
    connected_components_near_dups gives the transitive closure, LPA
    splits a component's internal dense regions — chained near-dup
    families (A~B~C with A!~C) separate into their tight cores, the
    signal a dedup reviewer uses to pick cluster representatives.

    Rides the sweep-scoped candidate-pair memo (the LSH band join runs
    once per sweep); the LPA loop is {_LPA_ITERS} keyed join+aggregate
    rounds over the pair graph — SCALING.md measured 2.7x wall at 10x
    edges on hub-skewed synthetic graphs.

    Registered at the r10 gate as planned (decorator move, declared in
    _GATE_PLAN_CHANGED; oracle: _LPA_ORACLE, unrolled fixed-K CTEs over
    the same pair SQL the CC oracle uses); tests/test_round8_ops.py
    keeps the DuckDB cross-check alongside the driver hash row."""
    from drug_target_discovery_spark.graph.algorithms import (
        label_propagation,
    )
    from drug_target_discovery_spark.queries.dedup import candidate_pairs

    pairs = candidate_pairs(spark, sf_dir)
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    lpa = label_propagation(edges, n_iter=_LPA_ITERS)
    return lpa.select(F.col("node").alias("doc_id"), "community").orderBy(
        "doc_id"
    )
