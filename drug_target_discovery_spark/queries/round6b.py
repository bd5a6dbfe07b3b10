"""Round-6 text/corpus additions.

Four LLM-training-corpus operators the registry lacked: vocabulary
out-of-vocabulary coverage (tokenizer-fit audit), a Zipf-law slope fit over
token ranks (corpus-health statistic), asymmetric shingle CONTAINMENT
near-dup pairs (catches quote-inclusion / subset duplication that symmetric
Jaccard misses — Broder 1997's second resemblance measure), and NDCG@k
retrieval evaluation (Järvelin & Kekäläinen 2002).

Exactness contract: counts are exact BIGINTs; every cross-row float
reduction quantizes per-term to BIGINT units first; ln/log2 inputs are
ratios of exact integers so per-row IEEE results agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_VOCAB_K = 100  # top-K token vocabulary


# --------------------------------------------------------------------------
# Vocabulary OOV coverage
# --------------------------------------------------------------------------
@register(
    "vocab_oov_coverage",
    tags=("text", "corpus", "tokenizer", "scalable"),
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token FROM tok GROUP BY token
      ORDER BY count(*) DESC, token ASC LIMIT {_VOCAB_K}
    ),
    marked AS (
      SELECT t.source, t.token,
             CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v ON t.token = v.token
    )
    SELECT source, count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           {rnd_sql("sum(oov) * 1.0 / count(*)", 6)} AS oov_rate
    FROM marked GROUP BY source ORDER BY source
    """,
)
def vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus's own top-
    {_VOCAB_K} token vocabulary — the tokenizer-fit audit run before
    committing a vocab: a source whose OOV rate is an outlier will
    fragment into byte-fallback tokens and train poorly.

    Scale design: token counts collapse with ONE shuffle to the token
    grain; the vocabulary is a TakeOrderedAndProject top-{_VOCAB_K}
    (deterministic count-desc, token-asc tie-break) broadcast back
    against the token stream (map-side membership, no second fact
    shuffle); the per-source rollup is a bounded aggregate. At 100 TB
    the vocab stays driver-sized by construction."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(_VOCAB_K)
        .select("token")
    )
    marked = tok.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "token", "left"
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
            rnd(
                F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Zipf slope over token ranks
# --------------------------------------------------------------------------
_ZIPF_K = 200  # fit over the top-K ranks


@register(
    "zipf_slope_tokens",
    tags=("text", "corpus", "stats"),
    oracle=f"""
    WITH cnt AS (
      SELECT token, count(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) GROUP BY token
    ),
    top AS (
      SELECT c FROM cnt ORDER BY c DESC, token ASC LIMIT {_ZIPF_K}
    ),
    ranked AS (
      SELECT CAST(floor(ln(row_number() OVER (ORDER BY c DESC)) * 1e6 + 0.5)
               AS BIGINT) AS xq,
             CAST(floor(ln(c) * 1e6 + 0.5) AS BIGINT) AS yq
      FROM top
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(yq) AS DOUBLE) AS sy,
             CAST(sum(xq * yq) AS DOUBLE) AS sxy,
             CAST(sum(xq * xq) AS DOUBLE) AS sxx,
             CAST(sum(yq * yq) AS DOUBLE) AS syy
      FROM ranked
    )
    SELECT n AS n_ranks,
           {rnd_sql(
             "(nd * sxy - sx * sy) / (nd * sxx - sx * sx)", 4)} AS slope,
           {rnd_sql(
             "((sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx)"
             " / nd) / 1e6", 4)} AS intercept,
           {rnd_sql(
             "((nd * sxy - sx * sy) * (nd * sxy - sx * sy))"
             " / ((nd * sxx - sx * sx) * (nd * syy - sy * sy))", 4)} AS r2
    FROM s
    """,
)
def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: OLS slope of ln(frequency) on ln(rank) over the top-
    {_ZIPF_K} tokens — the corpus-health statistic (natural text sits
    near slope -1; template/boilerplate-heavy or synthetic corpora
    deviate; Zipf 1949, Piantadosi 2014).

    Exactness: ln(rank) and ln(count) quantize per row to micro-unit
    BIGINTs (inputs to ln are exact integers, identical per-row IEEE);
    the OLS sufficient statistics are then exact integer sums — slope/
    intercept/r2 are bit-identical expressions of them. Quantization at
    1e6 bounds the fit error ~1e-6, so the 4dp rounding is stable.

    Scale design: ONE shuffle to the token grain, TakeOrderedAndProject
    top-{_ZIPF_K} (never a global sort), then the ranking row_number runs
    on the truncated {_ZIPF_K}-row table (bounded BY CONSTRUCTION) and
    collapses to a single row."""
    cnt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("token")).limit(_ZIPF_K).select("c")
    # row_number over the truncated top-K table: bounded at _ZIPF_K rows
    ranked = top.select(
        F.floor(
            F.log(F.row_number().over(Window.orderBy(F.desc("c"))).cast("double"))
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("c").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("yq"),
    )
    # determinants in DOUBLE over the exact integer sums (overflow-safe —
    # n * Σy² would cross 2^63 once token counts reach ln ≈ 28 territory;
    # written identically in the oracle)
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("xq").cast("double").alias("sx"),
        F.sum("yq").cast("double").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("double").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("double").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).cast("double").alias("syy"),
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        F.col("n").alias("n_ranks"),
        rnd(slope, 4).alias("slope"),
        rnd(((sy - slope * sx) / nd) / 1e6, 4).alias("intercept"),
        rnd(
            ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
            / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            4,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# Asymmetric shingle containment pairs
# --------------------------------------------------------------------------
_CONT_N = 3  # shingle width (matches the dedup family)
_CONT_T = 0.5  # containment threshold
_CONT_MAX_DF = 0.5  # stop-shingle document-frequency cap


@register(
    "shingle_containment_pairs",
    tags=("dedup", "containment", "scalable"),
    oracle=f"""
    WITH shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(l, i, i + {_CONT_N - 1}), ' ') AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           unnest(range(1, len(l) - {_CONT_N} + 2)) AS t(i)
      WHERE len(l) >= {_CONT_N}
    ),
    ndocs AS (SELECT count(*) AS n FROM documents),
    stop AS (
      SELECT shingle FROM shingles CROSS JOIN ndocs
      GROUP BY shingle, n HAVING count(*) > {_CONT_MAX_DF} * n
    ),
    sh AS (
      SELECT * FROM shingles
      WHERE shingle NOT IN (SELECT shingle FROM stop)
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS k
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.d1, i.d2, i.k AS n_common,
           CAST(s1.sz AS BIGINT) AS d1_shingles,
           {rnd_sql("i.k * 1.0 / s1.sz", 6)} AS containment
    FROM inter i JOIN sizes s1 ON i.d1 = s1.doc_id
    WHERE i.k * 1.0 / s1.sz >= {_CONT_T}
    ORDER BY d1, d2
    """,
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-dup pairs by shingle CONTAINMENT C(A,B) =
    |S(A) ∩ S(B)| / |S(A)| >= {_CONT_T} — Broder 1997's second
    resemblance measure. Containment is what symmetric Jaccard misses:
    a short document wholly quoted inside a long one has low Jaccard
    (union is large) but containment ~1, and that subset-duplication is
    a real training-corpus contamination mode.

    Same shingle infrastructure as the Jaccard family ({_CONT_N}-token
    distinct shingles, stop-shingles with df > {_CONT_MAX_DF} dropped
    from both intersection and sizes). Delegates to
    ``containment_pairs`` (below), which picks the candidate strategy
    from the THRESHOLD: at this query's t = {_CONT_T} that is the
    memo count-join (the sweep-scoped exact-pairs self-join shared
    with ngram_jaccard_near_dups, measured 5.06x at x10 perturbed);
    prefix filtering auto-enables at t >= {_PREFIX_STRATEGY_T} where
    its (1-t) pruning power actually bites — see containment_pairs
    for the round-7 measurements behind the crossover."""
    return containment_pairs(spark, sf_dir, t=_CONT_T)


# Threshold above which prefix-filter candidate generation beats the memo
# count-join. Measured round 7 (SCALING.md): candidate retention is
# (1-t)-driven — 41% of all intersecting directed pairs at t=0.5, 21%
# at 0.7, 13% at 0.8, 5.8% at 0.9 — while the memo self-join's cost is
# threshold-INDEPENDENT (it materializes every intersecting pair before
# filtering). Head-to-head at x10-perturbed scale: t=0.5 memo 9.6s vs
# prefix 504.6s (the verify re-shuffles shingle arrays for 41% of all
# intersecting pairs); t=0.9 memo 10.4s vs prefix 9.2s — the
# candidate-then-verify architecture only wins once retention is a few
# percent, which at this corpus's pair-similarity profile means t ~ 0.9.
_PREFIX_STRATEGY_T = 0.9


def containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    t: float = _CONT_T,
    strategy: str = "auto",
) -> DataFrame:
    """Containment >= ``t`` with threshold-adaptive candidate generation
    (strategy='auto'): 'memo' (exact-pairs count-join) below
    t = {_PREFIX_STRATEGY_T}, 'prefix' (Chaudhuri 2006 SSJoin / Xiao
    2008 PPJoin prefix filtering + exact verification) at or above it.
    Both strategies return IDENTICAL results at any t (equality and
    candidate-superset pinned in tests/test_round7_ops.py); the choice
    is purely physical.

    Why not prefix always (VERDICT r6 asked for it as the 100 TB path):
    prefix pruning power is (1-t) — each doc probes with its
    floor((1-t)|A|)+1 rarest shingles, so at t=0.5 the prefix is HALF
    the doc and the round-7 probe measured 41% candidate retention and
    a 51x x10-perturbed wall (array shuffles re-verifying what the memo
    join counts in-stream) vs the memo join's 5.06x. At t >= 0.9
    retention drops to 5.8% and prefix wins (measured head-to-head in
    SCALING.md round-7). The stop-shingle df cap bounds posting lists
    for both strategies. At 100 TB the same crossover logic holds with
    corpus-size terms: the memo self-join is Σ df² over capped
    shingles (output-bound), prefix is Σ (1-t)|A| x df (probe-bound) —
    prefix is the scale path exactly when (1-t) is small."""
    if strategy == "auto":
        strategy = "prefix" if t >= _PREFIX_STRATEGY_T else "memo"
    if strategy == "memo":
        return _containment_via_memo(spark, sf_dir, t)
    return _containment_via_prefix(spark, sf_dir, t)


def _containment_via_memo(
    spark: SparkSession, sf_dir: str, t: float
) -> DataFrame:
    """Count-during-join form: the sweep-scoped stop-capped shingle
    self-join (shared with the Jaccard family) already holds every
    intersecting pair's |A ∩ B|; containment is one size join + filter.
    Intersection counts are direction-free, so the canonical d1 < d2
    table unions with its swap to give directed pairs. OUTPUT-BOUND at
    scale: the round-6 clone-mode probe measured 82x wall under 979x
    true-output growth (sub-linear in its own output), 5.06x at honest
    x10 growth."""
    from drug_target_discovery_spark.queries.dedup import (
        shingle_sizes_and_intersections,
    )

    sizes, inter = shingle_sizes_and_intersections(spark, sf_dir)
    directed = inter.select("d1", "d2", "k").unionAll(
        inter.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"), "k")
    )
    return (
        directed.join(sizes.withColumnRenamed("doc_id", "d1"), "d1")
        .filter(F.col("k") * 1.0 / F.col("sz") >= t)
        .select(
            "d1",
            "d2",
            F.col("k").alias("n_common"),
            F.col("sz").alias("d1_shingles"),
            rnd(F.col("k") * 1.0 / F.col("sz"), 6).alias("containment"),
        )
        .orderBy("d1", "d2")
    )


def _containment_via_prefix(
    spark: SparkSession, sf_dir: str, t: float
) -> DataFrame:
    """Prefix-filtered form: each doc probes with its floor((1-t)|A|)+1
    rarest shingles (global ascending-df order; if C(A,B) >= t then
    |A minus B| <= (1-t)|A| < prefix length, so some prefix shingle is
    in B — candidates are provably a superset of the answer). A size
    prefilter drops impossible pairs before arrays move (|A ∩ B| <= |B|,
    so C(A,B) >= t requires |B| >= t|A|); verification is then one JVM
    array_intersect per surviving candidate. Rides the same memoized
    stop-filtered shingle/size tables."""
    from pyspark.sql import Window as W

    from drug_target_discovery_spark.queries.dedup import (
        shingle_sizes_and_intersections,
        shingle_table,
    )

    sh = shingle_table(spark, sf_dir)
    sizes, _ = shingle_sizes_and_intersections(spark, sf_dir)
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # keyed (per-doc) window: rank each doc's shingles rarest-first
    wdoc = W.partitionBy("doc_id").orderBy("df", "shingle")
    # Prefix length floor((1-t)|A|)+1 in EXACT INTEGER arithmetic
    # (hypothesis-caught boundary bug, round 9): the IEEE form
    # floor((1.0 - t) * sz) + 1 computes (1-0.9) as 0.09999...98, so at
    # t=0.9, sz=10 the product is 0.99...98, floor gives 0 and the
    # prefix comes out one SHORTER than the theorem requires — a doc at
    # exactly-threshold containment can then miss the candidate set
    # (tests/test_properties.py::test_containment_prefix_theorem holds
    # the falsifying example). t scaled to an exact integer numerator
    # over 10^6 and DIV keeps every step in integers.
    t_num = int(round(t * 1_000_000))
    prefix = (
        sh.join(df_tbl, "shingle")
        .withColumn("rn", F.row_number().over(wdoc))
        .join(sizes, "doc_id")
        .filter(
            F.col("rn")
            <= F.expr(f"(({1_000_000 - t_num} * sz) DIV 1000000) + 1")
        )
        .select(F.col("doc_id").alias("d1"), "shingle")
    )
    cand = (
        prefix.join(
            sh.select(F.col("doc_id").alias("d2"), "shingle"), "shingle"
        )
        .filter(F.col("d1") != F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # size prefilter: containment needs |B| >= t|A| — prune before the
    # array join so impossible pairs never shuffle shingle arrays.
    # Division form (not _sz2 >= t*_sz1): the verify filter below tests
    # _k/_s1 >= t, and k <= sz2 with float division monotonic in the
    # numerator guarantees the prefilter never prunes a pair the verify
    # would accept — a multiply can round the other way at an exact
    # boundary (ADVICE r7)
    cand = (
        cand.join(
            sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("_sz1")),
            "d1",
        )
        .join(
            sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("_sz2")),
            "d2",
        )
        .filter(F.col("_sz2") * 1.0 / F.col("_sz1") >= t)
        .select("d1", "d2")
    )
    # exact verification: one sorted shingle array per doc, one
    # array_intersect per candidate pair
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("_toks"),
        F.count(F.lit(1)).alias("_sz"),
    )
    s1 = sets.select(
        F.col("doc_id").alias("d1"),
        F.col("_toks").alias("_t1"),
        F.col("_sz").alias("_s1"),
    )
    s2 = sets.select(F.col("doc_id").alias("d2"), F.col("_toks").alias("_t2"))
    k = F.size(F.array_intersect("_t1", "_t2"))
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("_k", k)
        .filter(F.col("_k") * 1.0 / F.col("_s1") >= t)
        .select(
            "d1",
            "d2",
            F.col("_k").alias("n_common"),
            F.col("_s1").alias("d1_shingles"),
            rnd(F.col("_k") * 1.0 / F.col("_s1"), 6).alias("containment"),
        )
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# NDCG@k retrieval evaluation
# --------------------------------------------------------------------------
_NDCG_K = 10
_NDCG_TERMS = ("spark", "join", "filter", "table", "data")
_NDCG_TITLE_LEN = 5  # "title" = first tokens of the document


@register(
    "ndcg_retrieval_eval",
    tags=("corpus", "retrieval", "eval"),
    oracle=f"""
    WITH q(term) AS (VALUES {", ".join(f"('{t}')" for t in _NDCG_TERMS)}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    nd AS (SELECT count(*) AS n FROM documents),
    cand AS (
      SELECT q.term, t.doc_id,
             len(list_filter(t.ts, x -> x = q.term)) AS tf,
             CASE WHEN list_position(list_slice(t.ts, 1, {_NDCG_TITLE_LEN}),
                    q.term) > 0 THEN 3
                  ELSE least(len(list_filter(t.ts, x -> x = q.term)), 2)
             END AS rel
      FROM q JOIN toks t ON list_position(t.ts, q.term) > 0
    ),
    df AS (SELECT term, count(*) AS dfc FROM cand GROUP BY term),
    scored AS (
      SELECT c.term, c.doc_id, c.rel,
             ln((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
               * (c.tf * 1.0 / (c.tf + 1.2)) AS score
      FROM cand c JOIN df USING (term) CROSS JOIN nd
    ),
    ranked AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term
               ORDER BY score DESC, doc_id ASC) AS pos
      FROM scored
    ),
    ideal AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term
               ORDER BY rel DESC, doc_id ASC) AS pos
      FROM scored
    ),
    dcg AS (
      SELECT term, CAST(sum(CAST(floor(
        (pow(2, rel) - 1) / (ln(pos + 1) / ln(2)) * 1e9 + 0.5) AS BIGINT))
        AS BIGINT) AS dcg_q
      FROM ranked WHERE pos <= {_NDCG_K} GROUP BY term
    ),
    idcg AS (
      SELECT term, CAST(sum(CAST(floor(
        (pow(2, rel) - 1) / (ln(pos + 1) / ln(2)) * 1e9 + 0.5) AS BIGINT))
        AS BIGINT) AS idcg_q
      FROM ideal WHERE pos <= {_NDCG_K} GROUP BY term
    )
    SELECT d.term, (SELECT dfc FROM df WHERE df.term = d.term) AS n_candidates,
           {rnd_sql("d.dcg_q / 1e9", 6)} AS dcg,
           {rnd_sql("i.idcg_q / 1e9", 6)} AS idcg,
           {rnd_sql("d.dcg_q * 1.0 / i.idcg_q", 6)} AS ndcg
    FROM dcg d JOIN idcg i ON d.term = i.term
    ORDER BY d.term
    """,
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{_NDCG_K} (Järvelin & Kekäläinen 2002) for {len(_NDCG_TERMS)}
    fixed query terms: the ranking is a BM25-style score (saturating
    tf/(tf+k1) times the BM25 idf; length normalization omitted — the
    full form lives in the bm25_retrieval query), and graded relevance
    is an independent signal — 3 for a "title" match (term within the
    first {_NDCG_TITLE_LEN} tokens), else tf capped at 2 — so NDCG < 1
    genuinely measures ranking/relevance misalignment instead of
    trivially scoring 1 against its own ordering.

    Exactness: each DCG term (2^rel - 1)/log2(pos + 1) quantizes to
    nano-unit BIGINTs before the per-query sum; score ties break on
    doc_id so both engines rank identically.

    Scale design (r6 rewrite: 13.6s cold -> ~3.5s): ONE posexplode
    of the token stream immediately broadcast-semi-joined to the
    {len(_NDCG_TERMS)}-term list — non-matching tokens die map-side and
    the full token array is never replicated per term (the first cut
    crossJoined each doc's token ARRAY against all terms, materializing
    it {len(_NDCG_TERMS)}x); tf/title collapse with one shuffle to the
    (term, doc) grain; the corpus count and per-term df fold in as
    1-row/{len(_NDCG_TERMS)}-row broadcasts (no separate driver count
    action — the VERDICT r5 #3 job-count discipline); the rank windows
    are per-term top-k (hash-partitioned by term) — the standard
    distributed ranking-eval plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )
    q = spark.createDataFrame([(t,) for t in _NDCG_TERMS], ["token"])
    nd_df = docs.agg(F.count(F.lit(1)).alias("nd"))
    cand = (
        toks.join(F.broadcast(q), "token")
        .groupBy(F.col("token").alias("term"), F.col("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # posexplode positions are 0-based; "title" = first
            # _NDCG_TITLE_LEN tokens
            F.max(
                F.when(F.col("pos") < _NDCG_TITLE_LEN, 1).otherwise(0)
            ).alias("title_hit"),
        )
        .select(
            "term",
            "doc_id",
            "tf",
            F.when(F.col("title_hit") == 1, F.lit(3))
            .otherwise(F.least(F.col("tf"), F.lit(2)))
            .alias("rel"),
        )
    )
    from drug_target_discovery_spark.caching import scoped_cache

    cand = scoped_cache(cand)  # consumed by df + ranked + ideal
    df = cand.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    scored = (
        cand.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd_df))
        .select(
            "term",
            "doc_id",
            "rel",
            "dfc",
            (
                F.log(
                    (F.col("nd") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5) + 1.0
                )
                * (F.col("tf") * 1.0 / (F.col("tf") + 1.2))
            ).alias("score"),
        )
    )
    gain = lambda pos: (  # noqa: E731
        F.floor(
            (F.pow(F.lit(2.0), F.col("rel")) - 1)
            / (F.log(pos + 1) / F.log(F.lit(2.0)))
            * 1e9
            + F.lit(0.5)
        ).cast("long")
    )
    # Both rank windows partition by term, so they ride ONE exchange
    # (second window re-sorts in place), and DCG/IDCG collapse into one
    # groupBy with conditional sums — the old ranked/ideal pair shuffled
    # `scored` twice and joined three frames back together (optimization
    # r13, guide §2.4: operations keyed the same way share the exchange;
    # plan went 2 window exchanges + 2 joins -> 1 exchange, 0 joins —
    # dfc rides `scored` already, so n_candidates is a per-term max).
    both = scored.select(
        "term",
        "rel",
        "dfc",
        F.row_number()
        .over(Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("pos_r"),
        F.row_number()
        .over(Window.partitionBy("term").orderBy(F.desc("rel"), F.asc("doc_id")))
        .alias("pos_i"),
    )
    zero = F.lit(0).cast("long")
    res = both.groupBy("term").agg(
        F.max("dfc").alias("n_candidates"),
        F.sum(
            F.when(F.col("pos_r") <= _NDCG_K, gain(F.col("pos_r"))).otherwise(zero)
        ).alias("dcg_q"),
        F.sum(
            F.when(F.col("pos_i") <= _NDCG_K, gain(F.col("pos_i"))).otherwise(zero)
        ).alias("idcg_q"),
    )
    return res.select(
        "term",
        "n_candidates",
        rnd(F.col("dcg_q") / 1e9, 6).alias("dcg"),
        rnd(F.col("idcg_q") / 1e9, 6).alias("idcg"),
        rnd(F.col("dcg_q") * 1.0 / F.col("idcg_q"), 6).alias("ndcg"),
    ).orderBy("term")
