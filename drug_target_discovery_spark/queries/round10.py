"""Round-10 additions, built in the TESTS-ONLY lane (the registration
freeze — queries/registry.py capacity policy): implemented, property-
tested, oracle-cross-checked in pytest, but NOT registered. If a slot
ever opens under the one-in-one-out rule, registration is a decorator
move.

- Cross-source shingle overlap matrix (cross_source_shingle_overlap):
  EXACT pairwise Jaccard + containment between the distinct-shingle
  sets of every source pair — the corpus-level contamination /
  mixing-plan audit run before combining corpora into a training mix
  (the source-grain complement of the doc-grain dedup family). Output
  is the full C(|sources|, 2) matrix including zero-overlap pairs.

- Interpolated bigram LM quality scores (bigram_lm_quality_by_source):
  Jelinek-Mercer bigram language model trained on the corpus itself
  (lambda * c12/c1 + (1-lambda) * c2/N), every document scored by its
  mean bigram log10-probability — the CCNet/Gopher "perplexity filter"
  class one order above the registered unigram_logprob_quality, with
  the same integer micro-log quantization that keeps the per-doc and
  per-source sums order-independent and cross-engine exact.

- Product-quantization ADC recall (pq_adc_recall): train per-subspace
  codebooks with the repo's deterministic Lloyd kernel (one fused scan
  per iteration for ALL subspaces), encode every embedding to m code
  ids, and measure recall@k of asymmetric-distance (ADC) top-k against
  the exact integer-arithmetic L2 top-k for a deterministic probe set —
  the embedding-compression leg that completes the ANN story
  (IVF coarse cells -> PQ fine codes -> measured recall).

Exactness contract as per round7.py-round9.py: integer counts, token
log-probs quantized to integer micro-log units before any sum, one
IEEE division rounded through rnd/rnd_sql on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.dedup import token_shingles
from drug_target_discovery_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Cross-source shingle overlap matrix
# --------------------------------------------------------------------------
_XSRC_N = 3  # shingle width (the dedup family's grain)


def cross_source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise source-overlap matrix over distinct 3-token shingles:
    for every source pair (a < b), |A∩B|, |A|, |B|, Jaccard, and
    containment |A∩B|/min(|A|,|B|) — including zero-overlap pairs, so the
    output is the complete C(|sources|,2) matrix.

    This is the audit a corpus-mixing plan runs FIRST: two "different"
    sources sharing half their shingle mass are one source for dedup and
    mixture-weight purposes (cf. corpus_mixture_rebalance, dsir); the
    doc-grain dedup family can't see it because the duplication is spread
    across many near-but-not-duplicate documents.

    Scale design: the only corpus-sized exchange is the (source, shingle)
    DISTINCT — map-side combinable, shuffling 60-bit-hashable shingle
    strings once. The self-join key is the shingle, and its fan-out per
    shingle is bounded by the SOURCE DOMAIN (a shingle present in all
    sources emits C(|S|,2) pair rows, a constant ~190 here), never by
    corpus size — unlike the doc-grain shingle self-join, no stop-shingle
    cap is needed for skew safety. Source-pair scaffolding (the full
    matrix including empty intersections) is a broadcast cross of the
    |S|-row size table with itself. At production source counts
    (thousands of corpus registries at most) every post-distinct table is
    domain-bounded.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    ss = token_shingles(docs, "text", "source", _XSRC_N).distinct()
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.select(F.col("source").alias("sa"), "shingle")
    b = ss.select(F.col("source").alias("sb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    pairs = (
        sizes.select(F.col("source").alias("sa"), F.col("n").alias("n_a"))
        .crossJoin(
            F.broadcast(
                sizes.select(F.col("source").alias("sb"), F.col("n").alias("n_b"))
            )
        )
        .filter(F.col("sa") < F.col("sb"))
    )
    ni = F.coalesce(F.col("n_inter"), F.lit(0))
    return (
        pairs.join(inter, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("n_a"),
            F.col("n_b"),
            ni.alias("n_inter"),
            rnd(ni * 1.0 / (F.col("n_a") + F.col("n_b") - ni), 6).alias("jaccard"),
            rnd(ni * 1.0 / F.least("n_a", "n_b"), 6).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


_XSRC_ORACLE = f"""
    WITH shingles AS (
      SELECT DISTINCT source,
             array_to_string(list_slice(l, i, i + {_XSRC_N - 1}), ' ') AS shingle
      FROM (SELECT source, string_split(text, ' ') AS l FROM documents),
           unnest(range(1, len(l) - {_XSRC_N} + 2)) AS t(i)
      WHERE len(l) >= {_XSRC_N}
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM shingles GROUP BY source
    ),
    inter AS (
      SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT pa.source AS source_a, pb.source AS source_b,
           pa.n AS n_a, pb.n AS n_b,
           coalesce(i.n_inter, 0) AS n_inter,
           {rnd_sql("coalesce(i.n_inter, 0) * 1.0 / (pa.n + pb.n - coalesce(i.n_inter, 0))", 6)} AS jaccard,
           {rnd_sql("coalesce(i.n_inter, 0) * 1.0 / least(pa.n, pb.n)", 6)} AS containment
    FROM sizes pa
    JOIN sizes pb ON pa.source < pb.source
    LEFT JOIN inter i ON i.sa = pa.source AND i.sb = pb.source
    ORDER BY source_a, source_b
"""


# --------------------------------------------------------------------------
# Jelinek-Mercer interpolated bigram LM quality scores
# --------------------------------------------------------------------------
_JM_LAMBDA = 0.75  # the classic JM mixing weight
# A doc whose mean bigram log10-prob is below this is "low quality"
# (average in-context probability under 10^-1.48 — the synthetic corpus's
# ~10th percentile, so the flag actually separates; production corpora
# calibrate this against a reference distribution). The comparison runs in
# INTEGER space (lp_sum < threshold_micro * n_bigrams), never on a float.
_JM_LOWQ_MICRO = -1_480_000
# Broadcast ceiling for the bigram model (SCALING.md watch-item, VERDICT
# r10 #5): the model is bigram-vocabulary-sized (~vocab^1.5 on natural
# text), and past executor memory a forced broadcast stops helping and
# starts failing. At or under this many distinct bigrams (~200 MB at
# ~100 B/row — inside a default 4-8 GiB executor with headroom) the model
# broadcasts; above it, the join runs keyed on bg (SMJ/shuffle-hash) —
# same results, pinned by tests/test_round10_ops.py.
_BG_BROADCAST_CEILING = 2_000_000


def bigram_lm_quality_by_source(
    spark: SparkSession,
    sf_dir: str,
    broadcast_ceiling: int = _BG_BROADCAST_CEILING,
) -> DataFrame:
    """Per-source quality audit under a Jelinek-Mercer interpolated bigram
    LM trained on the corpus itself:

        P(w2 | w1) = 0.75 * c(w1,w2)/c(w1.) + 0.25 * c(w2)/N

    with c(w1·) the bigram-context count and N the total token count.
    Every document with >= 2 tokens is scored by its mean bigram
    log10-probability; per source the audit reports document count, total
    bigram count, the source-level mean (bits-of-10 per bigram), and the
    number of low-quality documents (mean below the _JM_LOWQ_MICRO
    threshold — checked in pure integer arithmetic, never on a float).

    This is the "perplexity filter" class one Markov order above the
    registered unigram_logprob_quality: boilerplate and template text
    scores HIGH (its bigrams repeat), disfluent or shuffled text scores
    LOW even when its unigrams are common — exactly the separation a
    pretraining-quality gate needs.

    Scale design: TWO SCANS, NO CACHED FACT (the unigram query's shape).
    Pass 1 aggregates the bigram stream to the bigram-vocabulary grain
    (map-side partial counts); context counts c(w1·) derive from that
    table by a second vocab-sized aggregate — the corpus is NOT re-read
    for them — and the unigram model (c2, N) comes from one token-grain
    aggregate of the same scan's token stream. Pass 2 re-scans, joins the
    bigram model onto the exploded bigram stream — BROADCAST while the
    model holds <= broadcast_ceiling distinct bigrams (one cheap count on
    the cached vocab table decides), keyed shuffle join above it (the
    executor-memory fallback SCALING.md names; results identical, both
    paths test-pinned).

    EAGER GATE (ADVICE r11): that cardinality probe (``bg_counts.count()``)
    runs AT PLAN-CONSTRUCTION TIME, materializing the pass-1 vocab cache —
    merely building this DataFrame (e.g. for plan inspection) executes a
    full corpus aggregate. Deliberate: the physical join strategy cannot be
    chosen without the measured model cardinality, and the count is reused
    by the returned plan via the cache. Callers that need an action-free
    build should inspect the sub-plans directly.

    Pass 2 then partial-aggregates (doc, then source) — only integer
    (sum, count) partials shuffle. Log-probs are quantized to integer micro-log units
    at the MODEL (vocab grain, one IEEE expression per distinct bigram) so
    every downstream sum is order-independent and cross-engine exact.

    LIBM-AGREEMENT ASSUMPTION (ADVICE r10): unlike sqrt (correctly rounded
    by IEEE 754, so the temperature-mixture weights are exact by
    guarantee), log10 carries no correct-rounding guarantee — the
    floor(x*1e6+0.5) quantization is cross-engine exact only because the
    JVM (StrictMath-backed), DuckDB, and numpy libms agree to well under
    0.5 micro-units on these inputs, which the oracle cross-check verifies
    empirically per run. A 1-ULP libm divergence EXACTLY at a .5 rounding
    boundary on some other platform would flip one quantized unit; if that
    ever bites, compare lp_q with a +/-1-micro-unit tolerance rather than
    loosening the integer pipeline downstream of the model. The same
    assumption (for exp) covers the MMD kernel quantization below.
    """
    per_doc = _jm_doc_scores(spark, sf_dir, broadcast_ceiling)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").alias("n_bigrams"),
            rnd(F.sum("lp_sum") / (F.lit(1000000.0) * F.sum("nb")), 6).alias(
                "mean_logprob"
            ),
            F.sum(
                (F.col("lp_sum") < F.lit(_JM_LOWQ_MICRO) * F.col("nb")).cast("long")
            ).alias("n_low_quality"),
        )
        .orderBy("source")
    )


def _jm_doc_scores(
    spark: SparkSession,
    sf_dir: str,
    broadcast_ceiling: int = _BG_BROADCAST_CEILING,
    keys: "tuple[str, ...]" = ("source",),
) -> DataFrame:
    """Shared Jelinek-Mercer per-document scorer behind
    ``bigram_lm_quality_by_source`` (keys=("source",), the original
    shape — extracted verbatim, values unchanged, lane-pinned) and
    round-13's ``ccnet_perplexity_buckets`` (keys=("lang",), the CCNet
    grain). Returns one row per document with >= 2 tokens:
    (*keys, doc_id, nb, lp_sum) where lp_sum is the integer micro-log10
    sum over the doc's bigrams under the corpus-trained JM model. All
    scale/eager-gate/libm notes live on the public caller's docstring.
    """
    from drug_target_discovery_spark.caching import scoped_cache

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", *keys, "text"
    )
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_w")) - 2),
        lambda i: F.concat(
            F.element_at(F.col("_w"), i + 1),
            F.lit(" "),
            F.element_at(F.col("_w"), i + 2),
        ),
    )
    base = docs.select("doc_id", *keys, words.alias("_w")).filter(
        F.size("_w") >= 2
    )
    bg_stream = base.select(
        "doc_id", *keys, F.explode(grams).alias("bg")
    )
    # pass 1a: bigram counts (vocab grain) — query-scope cached: it is
    # vocab-sized and has two consumers (the model and the context counts)
    bg_counts = scoped_cache(
        bg_stream.groupBy("bg").agg(F.count(F.lit(1)).cast("double").alias("c12"))
    )
    w1 = F.substring_index(F.col("bg"), " ", 1)
    ctx = bg_counts.groupBy(w1.alias("w1")).agg(F.sum("c12").alias("c1"))
    # pass 1b: unigram counts + N — token-grain aggregate, cached for the
    # same two-consumer reason (c2 model rows and the N total)
    uni = scoped_cache(
        docs.select(F.explode(words).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    n_row = uni.agg(F.sum("c2").alias("n"))
    model = (
        bg_counts.withColumn("w1", w1)
        .withColumn("w2", F.substring_index(F.col("bg"), " ", -1))
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(n_row))
        .select(
            "bg",
            F.floor(
                F.log10(
                    F.lit(_JM_LAMBDA) * (F.col("c12") / F.col("c1"))
                    + F.lit(1 - _JM_LAMBDA) * (F.col("c2") / F.col("n"))
                )
                * 1000000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_q"),
        )
    )
    # Threshold-gated model join (the skew_adaptive_agg_stats pattern:
    # measure, then choose the physical plan): the model's cardinality is
    # one cheap count on the already-cached vocab-grain table. Under the
    # ceiling the model broadcasts (map-side join, no fact shuffle); over
    # it the join runs keyed on bg — the fact stream shuffles once, which
    # beats an executor-memory blowout at 100 TB vocabularies.
    n_model = bg_counts.count()
    model_side = F.broadcast(model) if n_model <= broadcast_ceiling else model
    return (
        bg_stream.join(model_side, "bg")
        .groupBy(*keys, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("lp_q").alias("lp_sum"),
        )
    )


_JM_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    bg_stream AS (
      SELECT doc_id, source, w[i] || ' ' || w[i + 1] AS bg
      FROM (SELECT * FROM base WHERE len(w) >= 2),
           unnest(range(1, len(w))) AS t(i)
    ),
    bg_counts AS (
      SELECT bg, count(*)::DOUBLE AS c12 FROM bg_stream GROUP BY bg
    ),
    ctx AS (
      SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1
      FROM bg_counts GROUP BY 1
    ),
    uni AS (
      SELECT token, count(*)::DOUBLE AS c2
      FROM (SELECT unnest(w) AS token FROM base)
      GROUP BY token
    ),
    tot AS (SELECT sum(c2) AS n FROM uni),
    model AS (
      SELECT bg,
             CAST(floor(log10({_JM_LAMBDA} * (c12 / c1)
                              + {1 - _JM_LAMBDA} * (c2 / n)) * 1000000.0
                        + 0.5) AS BIGINT) AS lp_q
      FROM bg_counts
      JOIN ctx ON split_part(bg, ' ', 1) = ctx.w1
      JOIN uni ON split_part(bg, ' ', 2) = uni.token
      CROSS JOIN tot
    ),
    per_doc AS (
      SELECT source, doc_id,
             CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(lp_q) AS BIGINT) AS lp_sum
      FROM bg_stream JOIN model USING (bg)
      GROUP BY source, doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nb) AS BIGINT) AS n_bigrams,
           {rnd_sql("sum(lp_sum) / (1000000.0 * sum(nb))", 6)} AS mean_logprob,
           CAST(sum(CASE WHEN lp_sum < {_JM_LOWQ_MICRO} * nb THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_quality
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


# --------------------------------------------------------------------------
# Product-quantization ADC recall
# --------------------------------------------------------------------------
_PQ_M = 8  # subspaces (64 dims -> 8 dims each)
_PQ_K = 32  # codes per subspace (an 8x32 codebook: 5 bits x 8 = 5 bytes/vec)
_PQ_ITERS = 3
_PQ_TOPK = 10
_PQ_PROBE_STRIDE = 53  # probe queries: vec_id % 53 == 0 (deterministic)


def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization compression quality, measured: train m={m}
    per-subspace codebooks of k={k} codes on the embedding table (fused
    Lloyd — see operators/pq.py), then for a deterministic probe set
    (vec_id % {stride} == 0) compare ADC top-{topk} against the EXACT
    integer-L2 top-{topk} and report per-query recall@{topk}.

    With 64-dim vectors and an 8x32 codebook every embedding compresses
    to 5 bytes (~100x under float64) — the storage regime that makes
    100-TB-scale similarity search feasible at all; this operator is the
    measurement that tells you what that compression costs in recall,
    per query, before you commit an index build to it (the same
    close-the-loop discipline as ann_recall_eval for the IVF leg and
    ivf_index_refresh_audit for drift).

    Scale design: training shuffles only model-sized integer partials
    (one fused scan per iteration for ALL subspaces); eval is ONE scan
    emitting each batch's local top-k per (leg, query) — the global
    top-k window input is O(batches x queries x k), never corpus-sized.
    Exactness: integer micro-unit vectors end to end; the exact leg is
    pure int64; the ADC leg is a fixed-order float64 sum of m LUT
    entries; ties break to the smaller vec_id on both legs — so the
    whole operator is partitioning-independent and the numpy oracle in
    tests matches it to the last digit.
    """
    from drug_target_discovery_spark.caching import scoped_cache
    from drug_target_discovery_spark.operators.kmeans import quantize_embeddings
    from drug_target_discovery_spark.operators.pq import pq_recall_eval, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    # query-scope cached: consumed by iters training scans, the probe
    # collect, and the eval scan
    vq = scoped_cache(quantize_embeddings(emb.select("vec_id", "embedding")))
    probes = [
        (int(r["vid"]), [int(x) for x in r["v_int"]])
        for r in vq.filter(F.col("vid") % _PQ_PROBE_STRIDE == 0)
        .orderBy("vid")
        .collect()
    ]
    codebooks = pq_train(vq, _PQ_M, _PQ_K, _PQ_ITERS)
    return pq_recall_eval(vq, codebooks, probes, _PQ_TOPK)


pq_adc_recall.__doc__ = pq_adc_recall.__doc__.format(
    m=_PQ_M, k=_PQ_K, stride=_PQ_PROBE_STRIDE, topk=_PQ_TOPK
)


_IVFPQ_NPROBE = 2


def ivfpq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) composed search, measured: the repo's deterministic
    8-cell sign-bit coarse quantizer restricts each probe query to its
    nprobe={nprobe} nearest cells (by exact integer L2 to the exact-integer
    cell centroids), and PQ codes of the RESIDUALS rank candidates inside
    them — the production ANN shape (FAISS IVFPQ) assembled from this
    repo's own verified parts (sign-bit cells: `ann_ivf_bucketed_topk`;
    PQ: `pq_adc_recall`). Output per probe query: recall@{topk} of the
    composed search against the exact whole-corpus top-{topk}, plus
    scan_frac — the fraction of the corpus the probed cells contain, the
    cost side of the trade (recall without its scan fraction is
    marketing, not measurement).

    Same probe set, codebook shape, and exactness contract as
    `pq_adc_recall` (see operators/pq.py:ivfpq_recall_eval for the scale
    argument), so the two rows read side by side: what nprobe/8 of the
    corpus buys vs scanning all of it with the same code budget.
    """
    from drug_target_discovery_spark.caching import scoped_cache
    from drug_target_discovery_spark.operators.kmeans import quantize_embeddings
    from drug_target_discovery_spark.operators.pq import ivfpq_recall_eval

    emb = load_table(spark, sf_dir, "embeddings")
    vq = scoped_cache(quantize_embeddings(emb.select("vec_id", "embedding")))
    probes = [
        (int(r["vid"]), [int(x) for x in r["v_int"]])
        for r in vq.filter(F.col("vid") % _PQ_PROBE_STRIDE == 0)
        .orderBy("vid")
        .collect()
    ]
    return ivfpq_recall_eval(
        vq, _PQ_M, _PQ_K, _PQ_ITERS, probes, _PQ_TOPK, _IVFPQ_NPROBE
    )


ivfpq_adc_recall.__doc__ = ivfpq_adc_recall.__doc__.format(
    nprobe=_IVFPQ_NPROBE, topk=_PQ_TOPK
)


# --------------------------------------------------------------------------
# Hilbert-curve layout vs Z-order: measured skip fractions
# --------------------------------------------------------------------------
_HIL_BITS = 10  # 2^10 buckets per dimension (the zorder query's grid)
_HIL_FILES_SHIFT = 14  # d >> 14 => 64 target files (the zorder convention)
_HIL_N_PREDS = 10  # predicate windows per class


def _hilbert_cols(x, y, bits: int):
    """Hilbert index d of grid cell (x, y) as a Column — the standard
    xy2d loop (rx/ry extraction, quadrant accumulation, rotation) as ONE
    `F.aggregate` fold over the literal array of side lengths with a
    (x, y, d) struct accumulator: the loop runs at RUNTIME inside the
    JVM, so the expression tree stays constant-size. (Unrolling the loop
    into nested whens is a trap: each level re-references x and y twice,
    so the tree grows ~4^bits nodes and Catalyst analysis takes minutes
    at bits=10 — measured before this formulation.) Zero Python on the
    data path, like the zorder query's interleave."""
    sides = F.array(*[F.lit(1 << (bits - 1 - i)) for i in range(bits)])
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        ax, ay = acc.getField("x"), acc.getField("y")
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = acc.getField("d") + (s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        )
        # rotate the quadrant: if ry == 0 { if rx == 1 reflect; swap x/y }
        fx = F.when(rx == 1, (s - 1).cast("long") - ax).otherwise(ax)
        fy = F.when(rx == 1, (s - 1).cast("long") - ay).otherwise(ay)
        nx = F.when(ry == 0, fy).otherwise(ax)
        ny = F.when(ry == 0, fx).otherwise(ay)
        return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

    return F.aggregate(sides, init, step).getField("d")


_HIL_FILES = 64  # equal-row target files per layout


def hilbert_vs_zorder_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head layout measurement: cluster lineitem's
    (l_partkey, l_suppkey) into {files} EQUAL-ROW files along BOTH
    space-filling curves (the registered `zorder_file_layout`'s Morton
    interleave vs a Hilbert curve on the same 2^{bits} grid), then score
    each layout by what its per-file min/max footers let a scan SKIP —
    {n} single-column range predicates per dimension plus {n}
    two-dimensional boxes, all derived from the global extent in integer
    arithmetic. Output per (layout, predicate class): mean fraction of
    files skipped and mean fraction of ROWS scanned — the number a
    100 TB table actually pays.

    Files are EQUAL-ROW runs along the curve (rank r -> file r*F div N),
    the real writer's shape (`repartitionByRange(curve_key)` + target
    file size). The naive alternative — file = curve_index >> k — is
    DEGENERATE for this comparison: at power-of-4 aligned splits both
    curves tile the plane into the SAME axis-aligned quadrant blocks and
    every file statistic is identical (pinned as a test property, and a
    strong cross-check of both curve implementations). Only under
    equal-row splits does Morton's diagonal-jump weakness show up — on
    this corpus Hilbert skips measurably more (box predicates at sf0.01:
    ~.90 vs ~.86 of files) because its unit-step traversal keeps each
    run's key spans narrower.

    Scale shape: extent = ONE map-side 1-row aggregate (bounded collect,
    doubling as the tie-break pack-width guard — production substitutes
    known domain bounds); both curve indexes are constant-size JVM folds
    (see _hilbert_cols —
    unrolling is a 4^bits expression-tree trap, measured); the
    corpus-sized work collapses to the distinct (curve, part, supp)
    triple grain (ONE map-side-combinable shuffle per layout), the exact
    global rank of each triple runs through the repo's
    `range_partitioned_prefix_sum` KEYLESS mode (no corpus-sized
    single-partition window — the epoch shuffle's machinery), each
    triple expands to the <= (cnt x F / N) + 2 files its rank span
    overlaps, and file stats group on {files} ids. The predicate table
    is extent x sequence({n}) and the skip join is files x preds, both
    broadcast-sized at any corpus scale. Everything is int64 until the
    two final fractions, each one IEEE division rounded via rnd.
    """
    from drug_target_discovery_spark.operators.prefixsum import (
        range_partitioned_prefix_sum,
    )
    from drug_target_discovery_spark.queries.layout import (
        _BUCKET_SPARK,
        _interleave_spark,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    # Extent as literals: one bounded 1-row collect (the prefix-sum
    # operator class's cardinality-gated pattern) — it also powers the
    # noisy pack-width guard below; production substitutes known domain
    # bounds without changing the plan shape.
    e = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    ).collect()[0]
    pmin, pmax, smin, smax = int(e[0]), int(e[1]), int(e[2]), int(e[3])
    if pmax - pmin >= (1 << 21) or smax - smin >= (1 << 21):
        raise ValueError(
            "hilbert_vs_zorder_skip_stats: key extent exceeds the 21-bit "
            f"tie-break pack (part span {pmax - pmin}, supp span "
            f"{smax - smin}); widen the ord_key packing"
        )
    scale = (1 << _HIL_BITS) - 1
    bucketed = li.select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            _BUCKET_SPARK.format(col="l_partkey", lo=pmin, hi=pmax, scale=scale)
        )
        .cast("long")
        .alias("bx"),
        F.expr(
            _BUCKET_SPARK.format(col="l_suppkey", lo=smin, hi=smax, scale=scale)
        )
        .cast("long")
        .alias("by"),
    )
    zed = bucketed.select(
        "l_partkey",
        "l_suppkey",
        F.expr(_interleave_spark("bx", "by")).cast("long").alias("d_z"),
        _hilbert_cols(F.col("bx"), F.col("by"), _HIL_BITS).alias("d_h"),
    )
    nf = _HIL_FILES
    stats = None
    for layout, dcol in (("zorder", "d_z"), ("hilbert", "d_h")):
        # total order for the rank: curve index, tie-broken by the raw
        # keys, packed into one BIGINT (20 curve bits + 2 x 21 offset
        # bits; the extent guard above fails noisily past that)
        packed = (
            F.col(dcol) * F.lit(1 << 42)
            + (F.col("l_partkey") - F.lit(pmin)) * F.lit(1 << 21)
            + (F.col("l_suppkey") - F.lit(smin))
        ).alias("ord_key")
        # query-scope cached: three consumers (the prefix sum's internal
        # passes — its own scoped_cache dedupes onto this same plan — the
        # n_total aggregate, and the final stats job) would otherwise
        # each re-run the curve fold + grain collapse from the scan
        from drug_target_discovery_spark.caching import scoped_cache

        triples = scoped_cache(
            zed.select("l_partkey", "l_suppkey", packed)
            .groupBy("ord_key", "l_partkey", "l_suppkey")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        ranked = range_partitioned_prefix_sum(
            triples, [], "ord_key", "cnt", buckets=64, exclusive=True
        ).withColumnRenamed("prefix_sum", "lo")
        n_total = triples.agg(F.sum("cnt").alias("n_total"))
        expanded = (
            ranked.crossJoin(F.broadcast(n_total))
            .withColumn("hi", F.col("lo") + F.col("cnt"))
            .withColumn(
                "file_id",
                F.explode(
                    F.sequence(
                        F.expr(f"(lo * {nf}) div n_total"),
                        F.expr(f"((hi - 1) * {nf}) div n_total"),
                    )
                ),
            )
            .withColumn("b_lo", F.expr(f"(file_id * n_total + {nf} - 1) div {nf}"))
            .withColumn(
                "b_hi", F.expr(f"((file_id + 1) * n_total + {nf} - 1) div {nf}")
            )
            .withColumn(
                "rows_in_file",
                F.least("hi", "b_hi") - F.greatest("lo", "b_lo"),
            )
        )
        s = (
            expanded.groupBy("file_id")
            .agg(
                F.sum("rows_in_file").alias("n_rows"),
                F.min("l_partkey").alias("part_lo"),
                F.max("l_partkey").alias("part_hi"),
                F.min("l_suppkey").alias("supp_lo"),
                F.max("l_suppkey").alias("supp_hi"),
            )
            .withColumn("layout", F.lit(layout))
        )
        stats = s if stats is None else stats.unionByName(s)
    # predicate windows: for i in 0..n-1, a 20%-of-extent range starting
    # at i/n of the extent, per dimension; boxes pair the two. Built
    # driver-side from the collected extent (pure integer arithmetic,
    # n rows).
    n = _HIL_N_PREDS
    preds = spark.createDataFrame(
        [
            (
                i,
                pmin + (pmax - pmin) * i // n,
                pmin + (pmax - pmin) * (i + 2) // n,
                smin + (smax - smin) * i // n,
                smin + (smax - smin) * (i + 2) // n,
            )
            for i in range(n)
        ],
        "i INT, p_lo BIGINT, p_hi BIGINT, s_lo BIGINT, s_hi BIGINT",
    )
    total = li.agg(F.count(F.lit(1)).alias("t_rows"))
    joined = stats.crossJoin(F.broadcast(preds)).crossJoin(F.broadcast(total))
    part_skip = (F.col("part_hi") < F.col("p_lo")) | (F.col("part_lo") > F.col("p_hi"))
    supp_skip = (F.col("supp_hi") < F.col("s_lo")) | (F.col("supp_lo") > F.col("s_hi"))
    out = None
    for pred_dim, skip in (
        ("part_range", part_skip),
        ("supp_range", supp_skip),
        ("box", part_skip | supp_skip),
    ):
        g = (
            joined.withColumn("skipped", skip.cast("long"))
            .groupBy("layout")
            .agg(
                F.count_distinct("file_id").alias("n_files"),
                F.sum("skipped").alias("files_skipped"),
                F.count(F.lit(1)).alias("file_preds"),
                F.sum(
                    F.when(F.col("skipped") == 0, F.col("n_rows")).otherwise(F.lit(0))
                ).alias("rows_scanned"),
                F.max("t_rows").alias("t_rows"),
            )
            .select(
                F.col("layout"),
                F.lit(pred_dim).alias("pred_dim"),
                F.col("n_files").cast("int").alias("n_files"),
                rnd(F.col("files_skipped") * 1.0 / F.col("file_preds"), 6).alias(
                    "mean_skip_frac"
                ),
                rnd(
                    F.col("rows_scanned")
                    * 1.0
                    / (F.col("t_rows") * F.lit(_HIL_N_PREDS)),
                    6,
                ).alias("mean_rows_scanned_frac"),
            )
        )
        out = g if out is None else out.unionByName(g)
    return out.orderBy("pred_dim", "layout")


hilbert_vs_zorder_skip_stats.__doc__ = hilbert_vs_zorder_skip_stats.__doc__.format(
    bits=_HIL_BITS, n=_HIL_N_PREDS, files=_HIL_FILES
)


# --------------------------------------------------------------------------
# Temperature-scaled mixture sampling with exact apportionment
# --------------------------------------------------------------------------
_MIX_ALPHA_IS_HALF = True  # alpha = 0.5 -> sqrt weights (see docstring)
_MIX_SAMPLE_DIV = 5  # T = total div 5 (a 20% mixture)
_MIX_SEED = "mix1"


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixture (the multilingual-pretraining
    standard: sample source s proportionally to n_s^alpha, alpha=0.5, so
    low-resource sources are up-weighted relative to their raw share)
    with EXACT integer apportionment and deterministic selection:

    - weights: w_s = floor(sqrt(n_s) * 1e6 + 0.5) — sqrt is correctly
      rounded in IEEE 754, and quantizing to integer micro-units BEFORE
      the weight total makes every downstream sum/compare exact integer
      arithmetic in any order (the unigram/bigram LM trick applied to
      apportionment: a raw double Sum(sqrt) would be accumulation-order
      dependent across engines);
    - targets: largest-remainder (Hamilton) apportionment of
      T = total div {div} seats — base_s = (T*w_s) div W,
      rem_s = (T*w_s) mod W, the T - Sum(base) leftover seats go to the
      largest remainders (source-asc tie-break) — all integer, so the
      targets are exact and Sum(target_s) == T by construction;
    - selection: each source's target_s lowest documents by the seeded
      60-bit md5 rank (hash tie-broken by doc_id via a DECIMAL(38,0)
      pack), i.e. a deterministic uniform sample within source — same
      seed, same sample, on any cluster (the epoch shuffle's property,
      per source).

    Output per source: n_docs, weight_micro, target_n, sampled_n
    (== target_n, pinned), sample_rate. Bounded by the source domain.

    Scale shape: counts collapse to the |sources|-row grain (one
    map-side-combinable shuffle); apportionment runs entirely on that
    bounded table (its rank window is |sources|-bounded); per-source doc
    ranks run through `range_partitioned_prefix_sum`'s KEYED mode — no
    per-source ordered domain ever lands on one partition, the exact
    hazard a naive row_number() OVER (PARTITION BY source ORDER BY hash)
    hits when one source holds a trillion docs; the target table
    broadcasts.
    """
    from drug_target_discovery_spark.operators.prefixsum import (
        range_partitioned_prefix_sum,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    targets, ranked = mixture_targets_and_ranked(docs)
    sampled = (
        ranked.join(F.broadcast(targets.select("source", "target_n")), "source")
        .filter(F.col("rk") < F.col("target_n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("sampled_n"))
    )
    return (
        targets.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "weight_micro",
            "target_n",
            F.coalesce(F.col("sampled_n"), F.lit(0)).alias("sampled_n"),
            rnd(
                F.coalesce(F.col("sampled_n"), F.lit(0)) * 1.0 / F.col("n_docs"), 6
            ).alias("sample_rate"),
        )
        .orderBy("source")
    )


def mixture_targets_and_ranked(docs: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Shared temperature-mixture selection machinery — micro-unit sqrt
    weights, Hamilton (largest-remainder) apportionment targets, and the
    per-source seeded md5 doc ranks — used by BOTH
    ``temperature_mixture_sample`` and the composed epoch pipeline
    (``round11.training_epoch_manifest``), the curation composition rule:
    the composed run reuses the tier's exact definitions so it cannot
    drift from the tier's standalone evidence.

    ``docs``: (doc_id, source). Returns ``(targets, ranked)``:
    ``targets`` = (source, n_docs, weight_micro, target_n), bounded by
    the source domain; ``ranked`` = (source, doc_id, rk) with ``rk`` the
    exact 0-based rank of md5({seed}:doc_id) within source, computed by
    the keyed ``range_partitioned_prefix_sum`` (no per-source
    single-partition window).
    """
    from drug_target_discovery_spark.operators.prefixsum import (
        range_partitioned_prefix_sum,
    )
    from pyspark.sql.window import Window as W

    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs")) * 1000000.0 + F.lit(0.5)).cast("long")
    )
    tot = weighted.agg(
        F.sum("n_docs").alias("n_total"), F.sum("w").alias("w_total")
    )
    seats = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w",
        F.expr(f"(n_total div {_MIX_SAMPLE_DIV})").alias("t_seats"),
        F.expr(f"((n_total div {_MIX_SAMPLE_DIV}) * w) div w_total").alias("base"),
        F.expr(f"((n_total div {_MIX_SAMPLE_DIV}) * w) % w_total").alias("rem"),
    )
    deficit = seats.agg(
        (F.max("t_seats") - F.sum("base")).alias("deficit")
    )
    # the rank window is |sources|-bounded (the apportionment table)
    w_rank = W.orderBy(F.col("rem").desc(), F.col("source"))
    targets = (
        seats.withColumn("rk", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(deficit))
        .select(
            "source",
            "n_docs",
            F.col("w").alias("weight_micro"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
            ).alias("target_n"),
        )
    )
    # deterministic per-source uniform ranks: seeded 60-bit md5, doc_id
    # tie-break, packed exactly into DECIMAL(38,0)
    h = F.expr(
        "CAST(conv(substring(md5(concat('" + _MIX_SEED + ":', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS DECIMAL(38,0))"
    )
    # Pack-width fuse (ADVICE r10): the (hash, doc_id) pack reserves 18
    # decimal digits for the doc_id tie-break, so a negative or >= 10^18
    # doc_id would silently corrupt the ordering. Guard in-plan with the
    # rangejoin fuse pattern (operators/rangejoin.py:70) — a per-row long
    # compare inside codegen, no extra driver action, raises noisily on
    # the first out-of-range id.
    did_guarded = F.when(
        (F.col("doc_id") < 0) | (F.col("doc_id") >= F.lit(10**18)),
        F.raise_error(
            F.concat(
                F.lit("mixture_targets_and_ranked: doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(" outside the [0, 10^18) ord_key pack width; widen the pack"),
            )
        ),
    ).otherwise(F.col("doc_id").cast("decimal(38,0)"))
    keyed = docs.select(
        "source",
        "doc_id",
        (h * F.lit(10**18).cast("decimal(38,0)") + did_guarded).alias("ord_key"),
        F.lit(1).alias("one"),
    )
    ranked = range_partitioned_prefix_sum(
        keyed, ["source"], "ord_key", "one", out="rk", buckets=64, exclusive=True
    ).select("source", "doc_id", "rk")
    return targets, ranked


temperature_mixture_sample.__doc__ = temperature_mixture_sample.__doc__.format(
    div=_MIX_SAMPLE_DIV
)
mixture_targets_and_ranked.__doc__ = mixture_targets_and_ranked.__doc__.format(
    seed=_MIX_SEED
)

# --------------------------------------------------------------------------
# LSH candidate recall audit (the banding-parameter measurement)
# --------------------------------------------------------------------------
_LSH_RECALL_THRESHOLDS = (5, 6, 7, 8, 9)  # Jaccard thresholds, in tenths


def lsh_candidate_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the MinHash-LSH banding front-end against the
    EXACT Jaccard ground truth, per threshold: of all pairs with exact
    Jaccard >= t, what fraction did the band join actually surface as
    candidates? Reported next to the banding S-curve's theoretical
    per-pair capture probability at exactly t — 1 - (1 - t^r)^b for the
    family's r rows x b bands — which lower-bounds the expected recall
    of the >= t cohort.

    This closes the dedup family's tuning loop the way `ann_recall_eval`
    closes ANN's and `minhash_jaccard_estimate_error` closes the
    estimator's: the banding parameters (16 hashes, 2 rows x 8 bands)
    were chosen from the S-curve; this audit is the committed
    measurement that the real corpus agrees. A recall below the curve at
    any threshold means true near-dups are silently skipping the LSH
    pipeline (and its downstream groups/components/curation consumers).

    Exactness: the threshold predicate runs in PURE INTEGERS
    (10k >= t(s1+s2-k), never a float compare at the boundary); recall
    is one IEEE division rounded via rnd. Scale shape: both inputs ride
    the family's sweep-scoped memos (the stop-capped exact pair table
    and the banded candidate table — shared with five registered
    queries); the audit itself is one broadcast-able left join at the
    candidate grain plus ONE aggregate producing every threshold's
    counters in the same pass (conditional sums, no per-threshold scan).
    """
    from drug_target_discovery_spark.queries.dedup import (
        _BANDS_ROWS,
        _NUM_HASHES,
        candidate_pairs,
        shingle_sizes_and_intersections,
    )

    sizes, inter = shingle_sizes_and_intersections(spark, sf_dir)
    jac = (
        inter.join(
            sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("s1")), "d1"
        )
        .join(
            sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("s2")), "d2"
        )
        .select("d1", "d2", "k", (F.col("s1") + F.col("s2") - F.col("k")).alias("u"))
    )
    cand = candidate_pairs(spark, sf_dir).select("d1", "d2", F.lit(1).alias("hit"))
    flagged = jac.join(cand, ["d1", "d2"], "left")
    aggs = []
    for t in _LSH_RECALL_THRESHOLDS:
        true_t = (F.col("k") * 10 >= F.lit(t) * F.col("u")).cast("long")
        aggs.append(F.sum(true_t).alias(f"n_{t}"))
        aggs.append(
            F.sum(true_t * F.coalesce(F.col("hit"), F.lit(0))).alias(f"c_{t}")
        )
    counters = flagged.agg(*aggs)
    n_bands = _NUM_HASHES // _BANDS_ROWS
    out = None
    for t in _LSH_RECALL_THRESHOLDS:
        curve = 1.0 - (1.0 - (t / 10.0) ** _BANDS_ROWS) ** n_bands
        row = counters.select(
            rnd(F.lit(t) * 1.0 / 10.0, 6).alias("threshold"),
            F.col(f"n_{t}").alias("n_true_pairs"),
            F.col(f"c_{t}").alias("n_candidates_caught"),
            rnd(
                F.when(
                    F.col(f"n_{t}") > 0, F.col(f"c_{t}") * 1.0 / F.col(f"n_{t}")
                ),
                6,
            ).alias("recall"),
            rnd(F.lit(curve), 6).alias("curve_capture_at_t"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("threshold")


# DuckDB oracle: the family's shared signature/banding CTEs + the exact
# stop-capped pair table, same integer threshold predicate.
def _lsh_recall_oracle() -> str:
    from drug_target_discovery_spark.queries.dedup import (
        _BANDED_CAND_SQL,
        _BANDS_ROWS,
        _NUM_HASHES,
        _SHINGLES_SQL,
        _SIG_SQL,
    )

    n_bands = _NUM_HASHES // _BANDS_ROWS
    legs = []
    for t in _LSH_RECALL_THRESHOLDS:
        curve = 1.0 - (1.0 - (t / 10.0) ** _BANDS_ROWS) ** n_bands
        legs.append(
            f"""SELECT {rnd_sql(f"{t} * 1.0 / 10.0", 6)} AS threshold,
               CAST(sum(CASE WHEN 10 * k >= {t} * u THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_pairs,
               CAST(sum(CASE WHEN 10 * k >= {t} * u AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_candidates_caught,
               {rnd_sql(
                   f"CASE WHEN sum(CASE WHEN 10 * k >= {t} * u THEN 1 ELSE 0 END) > 0"
                   f" THEN sum(CASE WHEN 10 * k >= {t} * u AND hit = 1 THEN 1 ELSE 0 END) * 1.0"
                   f" / sum(CASE WHEN 10 * k >= {t} * u THEN 1 ELSE 0 END) END", 6)}
                 AS recall,
               {rnd_sql(f"CAST({curve!r} AS DOUBLE)", 6)} AS curve_capture_at_t
            FROM flagged"""
        )
    union = " UNION ALL ".join(legs)
    return f"""
    WITH {_SIG_SQL},
    {_BANDED_CAND_SQL},
    {_SHINGLES_SQL.replace("shingles AS", "shingles2 AS")},
    ndocs AS (SELECT count(*) AS n FROM documents),
    stop AS (
      SELECT shingle FROM shingles2 CROSS JOIN ndocs
      GROUP BY shingle, n HAVING count(*) > 0.5 * n
    ),
    sh AS (SELECT * FROM shingles2 WHERE shingle NOT IN (SELECT shingle FROM stop)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS k
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT d1, d2, k, s1.sz + s2.sz - k AS u
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    ),
    flagged AS (
      SELECT j.*, CASE WHEN c.d1 IS NULL THEN 0 ELSE 1 END AS hit
      FROM jac j LEFT JOIN cand c ON j.d1 = c.d1 AND j.d2 = c.d2
    )
    SELECT * FROM ({union}) ORDER BY threshold
    """


# --------------------------------------------------------------------------
# Embedding-distribution drift: linear-time MMD two-sample test
# --------------------------------------------------------------------------
_MMD_SIGMA2 = 64.0  # RBF bandwidth sigma^2, fixed (embeddings ~N(0,1), D=64)


def embedding_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space two-sample drift: the linear-time MMD^2 estimator
    (Gretton et al. 2012, §6 "MMD_l") between the base corpus stripes
    and the refresh-batch stripe of the embeddings table, next to a
    same-distribution NULL leg — extending the scalar drift family
    (ks_test_price_drift / psi_price_stability / chi2) to the embedding
    column, where no per-dimension scalar test can see a JOINT shift.

    Estimator: for aligned quadruples (x1, x2, y1, y2),
    h = k(x1,x2) + k(y1,y2) - k(x1,y2) - k(x2,y1), MMD^2 = mean(h),
    with the RBF kernel k(a,b) = exp(-||a-b||^2 / (2 sigma^2)),
    sigma^2 = {s2} fixed (bandwidth heuristics would add a
    data-dependent pass; a FIXED bandwidth keeps the statistic exact
    and comparable across runs — the PSI-bucket philosophy).

    DETERMINISTIC PAIRING WITHOUT A SORT (the design point): quadruples
    are formed by pure vec_id arithmetic on the table's own %10 stripe
    layout (the IVF audit's convention: stripe 9 is the refresh batch).
    Block b contributes drift quadruple (20b, 20b+10 | 20b+9, 20b+19)
    and null quadruple (20b, 20b+10 | 20b+1, 20b+11) — same x-pair,
    batch vs base y-pair. No rank, no window, no shuffle beyond ONE
    map-side-combinable groupBy on the block id; blocks missing any
    member drop out deterministically.

    Exactness: squared distances fold in exact int64 micro-units
    (JVM zip_with/aggregate); each block's h is a fixed-order float64
    expression, quantized to integer picounits BEFORE the sum
    (DECIMAL(38,0) — the bigram-LM trick), so the statistic is
    partitioning-independent to the last digit and the numpy oracle
    matches exactly. Output per leg: (comparison, n_quadruples,
    mmd2_pico BIGINT-exact, mmd2 rounded). The picounit quantization of
    exp inherits the bigram-LM LIBM-AGREEMENT ASSUMPTION documented on
    bigram_lm_quality_by_source: exp is not correctly rounded, so
    cross-engine exactness rests on JVM/numpy libm agreement at these
    inputs (verified empirically by the oracle cross-check per run); a
    platform libm divergence at a .5 boundary would flip one picounit.
    """
    from drug_target_discovery_spark.operators.kmeans import quantize_embeddings

    vq = quantize_embeddings(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    roled = vq.select(
        (F.col("vid") % 20).alias("slot"),
        F.expr("vid div 20").alias("b"),
        "v_int",
    ).filter(F.col("slot").isin(0, 10, 9, 19, 1, 11))
    wide = roled.groupBy("b").agg(
        *[
            F.first(F.when(F.col("slot") == s, F.col("v_int")), ignorenulls=True).alias(
                f"s{s}"
            )
            for s in (0, 10, 9, 19, 1, 11)
        ]
    )

    def d2(a: str, bcol: str):
        # exact int64 squared distance in micro-units^2
        return F.aggregate(
            F.zip_with(F.col(a), F.col(bcol), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    def k(a: str, bcol: str):
        # micro^2 -> real^2 is /1e12; fixed-order float64 expression
        return F.exp(-(d2(a, bcol) / F.lit(1e12)) / F.lit(2.0 * _MMD_SIGMA2))

    legs = (
        ("base_vs_batch", "s9", "s19"),
        ("base_vs_base_null", "s1", "s11"),
    )
    out = None
    for name, y1, y2 in legs:
        quads = wide.filter(
            F.col("s0").isNotNull()
            & F.col("s10").isNotNull()
            & F.col(y1).isNotNull()
            & F.col(y2).isNotNull()
        )
        h = k("s0", "s10") + k(y1, y2) - k("s0", y2) - k("s10", y1)
        row = (
            quads.select(
                F.floor(h * F.lit(1e12) + F.lit(0.5))
                .cast("decimal(38,0)")
                .alias("h_pico")
            )
            .agg(
                F.count(F.lit(1)).alias("n_quadruples"),
                F.sum("h_pico").alias("sum_pico"),
            )
            .select(
                F.lit(name).alias("comparison"),
                F.col("n_quadruples"),
                F.col("sum_pico").cast("string").alias("sum_h_pico"),
                rnd(
                    F.col("sum_pico").cast("double")
                    / (F.lit(1e12) * F.col("n_quadruples")),
                    9,
                ).alias("mmd2"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("comparison")


embedding_mmd_drift.__doc__ = embedding_mmd_drift.__doc__.format(s2=_MMD_SIGMA2)


# --------------------------------------------------------------------------
# Character-level cross-corpus contamination (decontamination ground truth)
# --------------------------------------------------------------------------
_XCON_L = 25  # span length threshold (the round-9 substring grain)
_XCON_BENCH_MOD = 10  # benchmark split: doc_id % 10 == _XCON_BENCH_REM
_XCON_BENCH_REM = 7


def cross_corpus_contamination(
    spark: SparkSession, sf_dir: str, min_len: int = _XCON_L
) -> DataFrame:
    """Character-level EXACT benchmark contamination: for every TRAINING
    document, the characters covered by some length->=``min_len``
    substring that also occurs ANYWHERE in the held-out benchmark set
    (here the deterministic doc_id % {mod} == {rem} slice), unioned into
    maximal spans — per-source (n_train_docs, docs_contaminated,
    contam_chars, total_chars, contam_share).

    This is the exact-character ground truth under the registered
    `benchmark_decontamination` (token n-gram overlap) — the Lee et al.
    2022 decontamination predicate applied ACROSS corpora, where
    `exact_substring_dup_stats` applies it within one. Same Spark-first
    machinery, one-sided:

    1. Both sides stream gram HASHES only (xxhash64 inside the mapper —
       the benchmark side collapses to DISTINCT 8-byte hashes
       map-side); no exchange ever carries gram strings for a full
       position stream.
    2. Train candidates = positions semi-joined to benchmark hashes
       (24-byte rows; AQE broadcasts the benchmark hash set when small
       — at real benchmark scales it always is).
    3. Exact verify, collision-proof: candidate train grams re-extract
       via ONE doc-grain join; the matching BENCHMARK grams re-extract
       the same way restricted to candidate hashes; a semi join on the
       gram STRING confirms true cross-corpus occurrence (an xxhash64
       collision can only ADD candidates, never flag a span).
    4. Interval union per train doc (doc-bounded window), two keyed
       aggregates to the source grain.

    Output columns mirror `exact_substring_dup_stats` so the two audits
    read side by side; contamination of benchmark docs by themselves is
    definitionally excluded (they are not in the training side).
    """
    L = int(min_len)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("len")
    )
    is_bench = (F.col("doc_id") % _XCON_BENCH_MOD) == _XCON_BENCH_REM
    train = docs.filter(~is_bench)
    bench = docs.filter(is_bench)

    def positions(side: DataFrame) -> DataFrame:
        eligible = side.filter(F.col("len") >= L)
        return eligible.select(
            "doc_id",
            F.expr(
                f"posexplode(transform(sequence(1, len - {L} + 1),"
                f" i -> xxhash64(substring(text, i, {L}))))"
            ).alias("pos0", "h"),
        ).select("doc_id", (F.col("pos0") + 1).alias("i"), "h")

    train_pos = positions(train)
    bench_pos = positions(bench)
    bench_hashes = bench_pos.select("h").distinct()
    candidates = train_pos.join(bench_hashes, "h", "leftsemi")

    from drug_target_discovery_spark.caching import scoped_cache

    # query-scoped: feeds the verify semi join AND the flagged filter
    cand_grams = scoped_cache(
        candidates.join(train.select("doc_id", "text"), "doc_id").select(
            "doc_id", "i", "h", F.expr(f"substring(text, i, {L})").alias("gram")
        )
    )
    cand_hashes = cand_grams.select("h").distinct()
    bench_grams = (
        bench_pos.join(cand_hashes, "h", "leftsemi")
        .join(bench.select("doc_id", "text"), "doc_id")
        .select(F.expr(f"substring(text, i, {L})").alias("gram"))
        .distinct()
    )
    flagged = cand_grams.join(bench_grams, "gram", "leftsemi").select("doc_id", "i")

    w = Window.partitionBy("doc_id").orderBy("i")
    spans = (
        flagged.withColumn("prev_i", F.lag("i").over(w))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev_i").isNull() | (F.col("i") - F.col("prev_i") > L), 1
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "span_id")
        .agg((F.max("i") - F.min("i") + L).alias("covered"))
    )
    per_doc = spans.groupBy("doc_id").agg(F.sum("covered").alias("contam_chars"))
    return (
        train.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("contam_chars").alias("docs_contaminated"),
            F.coalesce(F.sum("contam_chars"), F.lit(0)).alias("contam_chars"),
            F.sum("len").alias("total_chars"),
            rnd(
                F.when(
                    F.sum("len") > 0,
                    F.coalesce(F.sum("contam_chars"), F.lit(0))
                    / F.sum("len").cast("double"),
                ),
                6,
            ).alias("contam_share"),
        )
        .orderBy("source")
    )


cross_corpus_contamination.__doc__ = cross_corpus_contamination.__doc__.format(
    mod=_XCON_BENCH_MOD, rem=_XCON_BENCH_REM
)

_XCON_ORACLE = f"""
WITH train AS (
  SELECT * FROM documents WHERE doc_id % {_XCON_BENCH_MOD} <> {_XCON_BENCH_REM}
),
bench AS (
  SELECT * FROM documents WHERE doc_id % {_XCON_BENCH_MOD} = {_XCON_BENCH_REM}
),
tpos AS (
  SELECT doc_id, unnest(generate_series(1, length(text) - {_XCON_L} + 1)) AS i
  FROM train WHERE length(text) >= {_XCON_L}
),
tg AS (
  SELECT p.doc_id, p.i, substr(d.text, CAST(p.i AS BIGINT), {_XCON_L}) AS gram
  FROM tpos p JOIN train d ON d.doc_id = p.doc_id
),
bpos AS (
  SELECT doc_id, unnest(generate_series(1, length(text) - {_XCON_L} + 1)) AS i
  FROM bench WHERE length(text) >= {_XCON_L}
),
bg AS (
  SELECT DISTINCT substr(d.text, CAST(p.i AS BIGINT), {_XCON_L}) AS gram
  FROM bpos p JOIN bench d ON d.doc_id = p.doc_id
),
fl AS (SELECT doc_id, i FROM tg WHERE gram IN (SELECT gram FROM bg)),
lagged AS (
  SELECT doc_id, i,
         lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev_i
  FROM fl
),
grp AS (
  SELECT doc_id, i,
         sum(CASE WHEN prev_i IS NULL OR i - prev_i > {_XCON_L}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS span_id
  FROM lagged
),
spans AS (
  SELECT doc_id, span_id, max(i) - min(i) + {_XCON_L} AS covered
  FROM grp GROUP BY doc_id, span_id
),
per_doc AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS contam_chars
  FROM spans GROUP BY doc_id
)
SELECT d.source,
       count(*) AS n_train_docs,
       count(p.doc_id) AS docs_contaminated,
       CAST(coalesce(sum(p.contam_chars), 0) AS BIGINT) AS contam_chars,
       CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
       {rnd_sql(
           "CASE WHEN sum(length(d.text)) > 0 THEN"
           " coalesce(sum(p.contam_chars), 0)"
           " / CAST(sum(length(d.text)) AS DOUBLE) END", 6)} AS contam_share
FROM train d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
GROUP BY d.source ORDER BY d.source
"""


# --------------------------------------------------------------------------
# Split-conformal prediction intervals with exact rank-k quantiles
# --------------------------------------------------------------------------
_CONF_ALPHAS = ((10, 1), (20, 1))  # alpha = 1/10 and 1/20, as exact fractions
_CONF_SEED = "conf1"


def split_conformal_price_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction (Vovk et al.; Angelopoulos & Bates 2021
    survey) over a transparent per-brand price model, all-integer:

    - SPLIT: each lineitem goes to calibration or test by the parity of
      its seeded 60-bit md5 hash (deterministic, partitioning-free);
    - MODEL: per-brand round-half-up integer mean of calibration cents
      ((2s+n) div (2n) — exact in any accumulation order);
    - SCORES: nonconformity r = |cents - brand_mean| (pure int64);
    - QUANTILE: for each alpha the split-conformal threshold is the
      k-th smallest calibration score with k = ceil((1-alpha)(n_cal+1)),
      computed EXACTLY as min r with inclusive-prefix-count >= k through
      `range_partitioned_prefix_sum`'s keyless mode at the tie-collapsed
      score grain — the exact distributed order statistic, where
      percentile_approx would trade away the conformal guarantee and a
      global sort would trade away the cluster;
    - COVERAGE: the fraction of MODELED test rows with
      |cents - mean| <= q_hat — the number the conformal guarantee
      (>= 1-alpha marginally) is about, measured rather than asserted.

    Degenerate-split handling (ADVICE r10): test rows whose brand has no
    calibration rows (so no model and no interval) are NOT silently
    dropped — the test side LEFT-joins the model and the output counts
    them per alpha as n_test_unmodeled, excluded from the coverage
    denominator (a row with no interval can't be covered). And when the
    calibration set is too small for an alpha (k = ceil((1-a)(n_cal+1))
    > n_cal, so no score has prefix-count >= k), q_hat is NULL and the
    query raises noisily in-plan (the rangejoin fuse pattern) instead of
    emitting NULL q_hat/coverage rows.

    Output per alpha: n_cal, n_test, n_test_unmodeled, k, q_hat_cents,
    coverage, target.
    This is the uncertainty-quantification leg of the eval family
    (calibration_curve_bins measures probability calibration; this
    measures interval validity) — the audit run before shipping model
    scores with error bars into a labeling or filtering pipeline.

    Scale shape: one broadcast dim join (part), one map-side-combinable
    aggregate per split to the brand/model grain, scores collapse to the
    distinct-|r| grain before the prefix sum (value-domain-sized, not
    corpus-sized), thresholds reduce to ONE row broadcast back over the
    test side's bounded aggregate. Integer end to end; the only IEEE
    division is the final coverage ratio, rounded via rnd.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    h = F.expr(
        "CAST(conv(substring(md5(concat('"
        + _CONF_SEED
        + ":', CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    fact = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"), "cents", (h % 2 == 0).alias("is_cal")
    )
    cal = fact.filter(F.col("is_cal"))
    test = fact.filter(~F.col("is_cal"))
    model = cal.groupBy("brand").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    ).select(
        "brand",
        F.expr("(2 * s + n) div (2 * n)").alias("mean_c"),
    )
    r_cal = cal.join(F.broadcast(model), "brand").select(
        F.abs(F.col("cents") - F.col("mean_c")).alias("r")
    )
    grain = r_cal.groupBy("r").agg(F.count(F.lit(1)).alias("cnt"))
    from drug_target_discovery_spark.operators.prefixsum import (
        range_partitioned_prefix_sum,
    )

    cum = range_partitioned_prefix_sum(
        grain, [], "r", "cnt", out="cum", buckets=64, exclusive=False
    )
    n_cal_row = grain.agg(F.sum("cnt").alias("n_cal"))
    # thresholds: ONE bounded aggregate over the score grain — k and
    # q_hat per alpha, folded into a single row
    thr_cols = []
    for denom, num in _CONF_ALPHAS:
        # k = ceil((1 - num/denom) * (n_cal + 1)), exact integers
        k = F.expr(f"(({denom - 1} * (n_cal + 1)) + {denom} - 1) div {denom}").alias(
            f"k_{denom}"
        )
        thr_cols.append(k)
    with_k = cum.crossJoin(F.broadcast(n_cal_row.select("n_cal", *thr_cols)))
    agg_cols = []
    for denom, _ in _CONF_ALPHAS:
        agg_cols.append(
            F.min(
                F.when(F.col("cum") >= F.col(f"k_{denom}"), F.col("r"))
            ).alias(f"q_{denom}")
        )
    thresholds = with_k.agg(
        F.max("n_cal").alias("n_cal"),
        *[F.max(f"k_{d}").alias(f"k_{d}") for d, _ in _CONF_ALPHAS],
        *agg_cols,
    )
    # LEFT join: a test brand absent from the model keeps its rows with a
    # NULL r (counted below), instead of silently vanishing in an inner
    # join (ADVICE r10).
    r_test = test.join(F.broadcast(model), "brand", "left").select(
        F.abs(F.col("cents") - F.col("mean_c")).alias("r")
    )
    cov = r_test.crossJoin(F.broadcast(thresholds)).agg(
        F.max("n_cal").alias("n_cal"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.col("r").isNull().cast("long")).alias("n_unmod"),
        *[F.max(f"k_{d}").alias(f"k_{d}") for d, _ in _CONF_ALPHAS],
        *[F.max(f"q_{d}").alias(f"q_{d}") for d, _ in _CONF_ALPHAS],
        *[
            F.sum((F.col("r") <= F.col(f"q_{d}")).cast("long")).alias(f"c_{d}")
            for d, _ in _CONF_ALPHAS
        ],
    )
    out = None
    for denom, num in _CONF_ALPHAS:
        # Degenerate-calibration fuse: k > n_cal leaves no score with
        # prefix-count >= k, so q_{d} is NULL — raise in-plan rather than
        # ship NULL intervals (operators/rangejoin.py:70 pattern).
        q_guarded = (
            F.when(
                F.col(f"q_{denom}").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "split_conformal_price_intervals: q_hat is NULL "
                            f"at alpha={num}/{denom} — k="
                        ),
                        F.col(f"k_{denom}").cast("string"),
                        F.lit(" exceeds n_cal="),
                        F.col("n_cal").cast("string"),
                        F.lit(
                            " (calibration split too small for this alpha);"
                            " enlarge the calibration set or relax alpha"
                        ),
                    )
                ),
            )
            .otherwise(F.col(f"q_{denom}").cast("long"))
            .alias("q_hat_cents")
        )
        row = cov.select(
            rnd(F.lit(num) * 1.0 / F.lit(denom), 6).alias("alpha"),
            F.col("n_cal"),
            F.col("n_test"),
            F.col("n_unmod").alias("n_test_unmodeled"),
            F.col(f"k_{denom}").cast("long").alias("k"),
            q_guarded,
            # All-unmodeled fuse (ADVICE r11): when every test brand lacks
            # calibration rows the denominator is zero and both engines
            # would emit NULL coverage silently — the same silent-NULL
            # failure mode the q_hat fuse above just closed. Fail loudly.
            F.when(
                (F.col("n_test") - F.col("n_unmod")) == 0,
                F.raise_error(
                    F.lit(
                        "split_conformal_price_intervals: every test brand "
                        "is unmodeled (no calibration rows) — coverage is "
                        "undefined; enlarge the calibration split"
                    )
                ),
            )
            .otherwise(
                rnd(
                    F.col(f"c_{denom}") * 1.0 / (F.col("n_test") - F.col("n_unmod")),
                    6,
                )
            )
            .alias("coverage"),
            rnd(F.lit(denom - num) * 1.0 / F.lit(denom), 6).alias("target"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("alpha")


_CONF_THRESH_SQL = " , ".join(
    f"""(SELECT min(r) FROM cum, ncal
         WHERE cum >= ((({d - 1}) * (n_cal + 1)) + {d} - 1) // {d}) AS q_{d},
        (SELECT ((({d - 1}) * (n_cal + 1)) + {d} - 1) // {d} FROM ncal) AS k_{d}"""
    for d, _ in _CONF_ALPHAS
)

_CONF_ORACLE = f"""
    WITH fact AS (
      SELECT p.p_brand AS brand,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             (CAST(('0x' || substr(md5('{_CONF_SEED}:' || CAST(l.l_orderkey AS VARCHAR)
                    || ':' || CAST(l.l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0)
               AS is_cal
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    model AS (
      SELECT brand, (2 * sum(cents) + count(*)) // (2 * count(*)) AS mean_c
      FROM fact WHERE is_cal GROUP BY brand
    ),
    r_cal AS (
      SELECT abs(cents - mean_c) AS r
      FROM fact JOIN model USING (brand) WHERE is_cal
    ),
    grain AS (SELECT r, count(*) AS cnt FROM r_cal GROUP BY r),
    cum AS (
      SELECT r, sum(cnt) OVER (ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM grain
    ),
    ncal AS (SELECT sum(cnt) AS n_cal FROM grain),
    thresh AS (SELECT {_CONF_THRESH_SQL}),
    r_test AS (
      SELECT abs(cents - mean_c) AS r
      FROM fact LEFT JOIN model USING (brand) WHERE NOT is_cal
    ),
    cov AS (
      SELECT (SELECT n_cal FROM ncal) AS n_cal,
             count(*) AS n_test,
             sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS n_unmod,
             {", ".join(f"sum(CASE WHEN r <= (SELECT q_{d} FROM thresh) THEN 1 ELSE 0 END) AS c_{d}" for d, _ in _CONF_ALPHAS)}
      FROM r_test
    )
    SELECT * FROM (
      {" UNION ALL ".join(
        f'''SELECT {rnd_sql(f"{num} * 1.0 / {d}", 6)} AS alpha,
               CAST(n_cal AS BIGINT) AS n_cal,
               CAST(n_test AS BIGINT) AS n_test,
               CAST(n_unmod AS BIGINT) AS n_test_unmodeled,
               CAST((SELECT k_{d} FROM thresh) AS BIGINT) AS k,
               CAST((SELECT q_{d} FROM thresh) AS BIGINT) AS q_hat_cents,
               {rnd_sql(f"c_{d} * 1.0 / (n_test - n_unmod)", 6)} AS coverage,
               {rnd_sql(f"{d - num} * 1.0 / {d}", 6)} AS target
            FROM cov'''
        for d, num in _CONF_ALPHAS
      )}
    ) ORDER BY alpha
"""


_MIX_ORACLE = f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(n_docs) * 1000000.0 + 0.5) AS BIGINT) AS w
      FROM counts
    ),
    tot AS (
      SELECT sum(n_docs) AS n_total, sum(w) AS w_total FROM weighted
    ),
    seats AS (
      SELECT source, n_docs, w,
             (n_total // {_MIX_SAMPLE_DIV}) AS t_seats,
             ((n_total // {_MIX_SAMPLE_DIV}) * w) // w_total AS base,
             ((n_total // {_MIX_SAMPLE_DIV}) * w) % w_total AS rem
      FROM weighted CROSS JOIN tot
    ),
    deficit AS (SELECT max(t_seats) - sum(base) AS d FROM seats),
    targets AS (
      SELECT source, n_docs, w AS weight_micro,
             base + CASE WHEN row_number()
                           OVER (ORDER BY rem DESC, source) <= (SELECT d FROM deficit)
                         THEN 1 ELSE 0 END AS target_n
      FROM seats
    ),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5('{_MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        doc_id
             ) - 1 AS rk
      FROM documents
    ),
    sampled AS (
      SELECT r.source, CAST(count(*) AS BIGINT) AS sampled_n
      FROM ranked r JOIN targets t USING (source)
      WHERE r.rk < t.target_n
      GROUP BY r.source
    )
    SELECT t.source,
           t.n_docs,
           t.weight_micro,
           CAST(t.target_n AS BIGINT) AS target_n,
           CAST(coalesce(s.sampled_n, 0) AS BIGINT) AS sampled_n,
           {rnd_sql("coalesce(s.sampled_n, 0) * 1.0 / t.n_docs", 6)} AS sample_rate
    FROM targets t LEFT JOIN sampled s USING (source)
    ORDER BY t.source
"""
