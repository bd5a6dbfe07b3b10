"""Corpus-statistics tier (SURVEY §2.12 [EXT]): exact sketch-bounded heavy
hitters and CCNet-style unigram LM document scoring over ``documents``.

Both are standard large-scale training-data-pipeline operators with no
reference-engine counterpart (the reference has no corpus tier); they join
the dedup/similarity/quality families the build brief adds beyond
/root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.heavyhitters import exact_heavy_hitters
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_HH_K = 31  # Misra-Gries counters; threshold = N/(k+1). Production: ~10^4.


@register(
    "heavy_hitter_tokens",
    tags=("corpus", "sketch", "scalable"),
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    t2 AS (SELECT token FROM toks WHERE token <> ''),
    tot AS (SELECT count(*) AS n FROM t2)
    SELECT token, count(*) AS cnt
    FROM t2, tot
    GROUP BY token, n
    HAVING count(*) * {_HH_K + 1} > n
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters — every token with count > N/{k+1} and its exact
    count — via two-pass Misra-Gries (operators/heavyhitters.py): pass 1 is
    a map-only Arrow-batched k-counter summary per partition (only
    O(k·partitions) summary rows ever shuffle), pass 2 re-counts the
    candidate superset exactly behind a broadcast semi-join. The oracle is
    the brute-force GROUP BY/HAVING — the sketch changes what shuffles, not
    the answer, which is why this row can hash-match. The synthetic corpus
    vocabulary (31 tokens) sits below production k; the summary-shrink path
    (vocab >> k) is pinned on a skewed fixture in
    tests/test_heavyhitters.py."""
    return exact_heavy_hitters(
        load_table(spark, sf_dir, "documents"), text_col="text", k=_HH_K
    )


# Quantized unigram log-probability: floor(log10(p)*1e6 + 0.5) as BIGINT.
# Integer token scores make the per-document SUM order-independent and
# therefore cross-engine exact — summing raw double log-probs would expose
# the driver's value-hash to Spark-vs-DuckDB float addition order.
_LP_Q_SQL = "CAST(floor(log10(cnt / n) * 1000000.0 + 0.5) AS BIGINT)"


@register(
    "unigram_logprob_quality",
    tags=("corpus", "quality", "scalable"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    tot AS (SELECT count(*)::DOUBLE AS n FROM t2),
    model AS (
      SELECT token, {_LP_Q_SQL} AS lp_q
      FROM (SELECT token, count(*)::DOUBLE AS cnt FROM t2 GROUP BY token), tot
    )
    SELECT t2.doc_id,
           count(*) AS n_tokens,
           {rnd_sql("sum(lp_q) / (1000000.0 * count(*))", 6)} AS mean_logprob
    FROM t2 JOIN model ON t2.token = model.token
    GROUP BY t2.doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shape LM quality score: train a unigram model on the corpus
    (token -> log10 relative frequency), then score every document by its
    mean token log-probability — the classic "perplexity filter" used to
    rank web text against a reference LM, here with the corpus as its own
    model so the whole query is closed-form and oracle-checkable.

    Scale design: TWO SCANS, NO CACHED FACT. Pass 1 aggregates the token
    stream down to the vocabulary (map-side partial counts; only
    vocab-sized partials shuffle). Pass 2 re-scans, broadcast-joins the
    vocabulary model onto the exploded tokens (a vocabulary fits executor
    memory up to ~10^7 entries), and partial-aggregates per doc_id — the
    token stream itself never shuffles; only (doc_id, sum, count) partials
    do. Caching the exploded fact between passes would trade a cheap
    columnar re-scan for materializing the corpus ×tokens — wrong at 100
    TB. Token log-probs are quantized to integer micro-log units before
    the per-doc sum (see _LP_Q_SQL) so the aggregation is order-independent
    and the driver's value-hash is stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    n_row = toks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    model = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "token",
            F.floor(F.log10(F.col("cnt") / F.col("n")) * 1000000.0 + F.lit(0.5))
            .cast("long")
            .alias("lp_q"),
        )
    )
    return (
        toks.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            rnd(
                F.sum("lp_q") / (F.lit(1000000.0) * F.count(F.lit(1))), 6
            ).alias("mean_logprob"),
        )
    )
