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

from pyspark.sql import DataFrame, SparkSession
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


def bigram_lm_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    broadcast bigram model onto the exploded bigram stream, and
    partial-aggregates (doc, then source) — only integer (sum, count)
    partials shuffle. Log-probs are quantized to integer micro-log units
    at the MODEL (vocab grain, one IEEE expression per distinct bigram) so
    every downstream sum is order-independent and cross-engine exact.
    """
    from drug_target_discovery_spark.caching import scoped_cache

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_w")) - 2),
        lambda i: F.concat(
            F.element_at(F.col("_w"), i + 1),
            F.lit(" "),
            F.element_at(F.col("_w"), i + 2),
        ),
    )
    base = docs.select("doc_id", "source", words.alias("_w")).filter(
        F.size("_w") >= 2
    )
    bg_stream = base.select(
        "doc_id", "source", F.explode(grams).alias("bg")
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
    per_doc = (
        bg_stream.join(F.broadcast(model), "bg")
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("lp_q").alias("lp_sum"),
        )
    )
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
