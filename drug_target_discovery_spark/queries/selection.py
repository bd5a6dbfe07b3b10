"""Training-data selection via importance resampling (DSIR shape).

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (NeurIPS): featurize documents as HASHED n-gram counts,
fit bag-of-words models on a target corpus and the raw corpus, and
score every raw document by its importance log-ratio
``sum_f count_f(doc) * [log p_target(f) - log p_raw(f)]`` — documents
distributionally closest to the target bubble up. The paper samples
with Gumbel noise; this deterministic variant ranks by the
length-normalized mean log-ratio (RNG-free, oracle-checkable) and takes
the top-k, which is DSIR's argmax special case.

No reference counterpart (LLM-pipeline extension surface, brief §"data
selection"); feature hashing follows operators/dedup.py's md5 idiom so
DuckDB computes bit-identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.caching import scoped_cache
from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.dedup import MD5_INT_DUCK, MD5_INT_SPARK
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_B = 512  # hashed-feature buckets (bounded model size, paper uses 10^4)
_TARGET_LANG = "en"  # target distribution: English docs (quality proxy)
_TOP_K = 200

# word-bigram list from a pre-split token array (1-indexed in both engines;
# empty tokens dropped pairwise; < 2 tokens -> empty list)
_BIGRAMS_SPARK = """
  CASE WHEN size(_a) >= 2 THEN
    filter(
      transform(sequence(1, size(_a) - 1), i ->
        CASE WHEN element_at(_a, i) <> '' AND element_at(_a, i + 1) <> ''
             THEN concat(element_at(_a, i), ' ', element_at(_a, i + 1)) END),
      x -> x IS NOT NULL)
  ELSE array() END
"""
_BIGRAMS_DUCK = """
  list_filter(
    list_transform(generate_series(1, greatest(len(a) - 1, 0)),
      i -> CASE WHEN a[i] <> '' AND a[i + 1] <> ''
                THEN a[i] || ' ' || a[i + 1] END),
    x -> x IS NOT NULL)
"""


@register(
    "dsir_importance_selection",
    tags=("selection", "text", "scalable"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents
    ),
    bg AS (
      SELECT doc_id, lang, unnest({_BIGRAMS_DUCK}) AS bigram FROM toks
    ),
    f AS (
      SELECT doc_id, lang,
             {MD5_INT_DUCK.format(col="bigram")} % {_B} AS bkt
      FROM bg
    ),
    cnts AS (
      SELECT bkt,
             count(*) AS r_cnt,
             count(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 END) AS t_cnt
      FROM f GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot,
             CAST(sum(t_cnt) AS BIGINT) AS t_tot
      FROM cnts
    ),
    w AS (
      SELECT bkt,
             CAST(floor((log10((t_cnt + 1.0) / (t_tot + {_B}.0))
                       - log10((r_cnt + 1.0) / (r_tot + {_B}.0)))
                       * 1000000.0 + 0.5) AS BIGINT) AS w_q
      FROM cnts CROSS JOIN tot
    ),
    scored AS (
      SELECT doc_id, count(*) AS n_feats,
             CAST(sum(w_q) AS BIGINT) AS s_sum
      FROM f JOIN w USING (bkt) GROUP BY doc_id
    )
    SELECT doc_id, n_feats,
           {rnd_sql("s_sum / (1000000.0 * n_feats)", 6)} AS dsir_score
    FROM scored
    ORDER BY s_sum * 1.0 / n_feats DESC, doc_id ASC
    LIMIT {_TOP_K}
    """,
)
def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: top-{_TOP_K} documents by hashed-bigram
    importance log-ratio against the '{_TARGET_LANG}'-language target
    distribution (add-1 smoothed, {_B} buckets).

    Scale design: TWO SCANS, NO CACHED FACT (the unigram_logprob_quality
    contract). Pass 1 aggregates the hashed-bigram stream to the
    {_B}-row bucket table carrying BOTH corpus counts (raw, and
    conditionally the target — one pass, not one per corpus); the totals
    come from that bounded table, never a third fact scan, and the
    per-bucket log-ratio weights are quantized to integer micro-log units
    (order-independent sums, driver-hash stable). Pass 2 re-scans,
    broadcast-joins the bounded weight table onto the bigram stream, and
    partial-aggregates per doc — only (doc_id, count, sum) partials
    shuffle; the token stream never does. Ranking divides two exact
    integers (identical doubles in both engines, doc_id tie-break), and
    top-k is TakeOrderedAndProject, never a global sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("_a")
    )
    feats = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_BIGRAMS_SPARK)).alias("bigram"),
    ).select(
        "doc_id",
        "lang",
        (F.expr(MD5_INT_SPARK.format(col="bigram")) % _B).alias("bkt"),
    )
    cnts = scoped_cache(
        feats.groupBy("bkt").agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.count(F.when(F.col("lang") == _TARGET_LANG, 1)).alias("t_cnt"),
        )
    )
    tot = cnts.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    w = cnts.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.floor(
            (
                F.log10((F.col("t_cnt") + 1.0) / (F.col("t_tot") + float(_B)))
                - F.log10((F.col("r_cnt") + 1.0) / (F.col("r_tot") + float(_B)))
            )
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_q"),
    )
    scored = (
        feats.join(F.broadcast(w), "bkt")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("w_q").alias("s_sum"))
    )
    return (
        scored.select(
            "doc_id",
            "n_feats",
            rnd(F.col("s_sum") / (1000000.0 * F.col("n_feats")), 6).alias(
                "dsir_score"
            ),
            (F.col("s_sum") * 1.0 / F.col("n_feats")).alias("_rank"),
        )
        .orderBy(F.desc("_rank"), F.asc("doc_id"))
        .limit(_TOP_K)
        .drop("_rank")
    )
