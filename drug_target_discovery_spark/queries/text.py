"""Text-analysis tier (SURVEY §2.12 [EXT]): token stats, quality scoring,
stopword language-ID, rolling-hash fingerprints, TF-IDF — over `documents`.

Everything is built from JVM-side column functions (split/explode/regexp/
aggregate) — no Python UDF in any hot path. Token counting and quality
scores are one map-side pass; TF-IDF is two aggregations + a broadcast join
of the (tiny) document-frequency dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "que"],
    "zh": ["的", "是", "了", "在", "和"],
}
_EN_STOP = _STOPWORDS["en"]


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------
@register(
    "token_count_stats",
    tags=("text",),
    oracle=f"""
    WITH per_doc AS (
      SELECT source, len(string_split(text, ' ')) AS n_tokens, n_chars
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {rnd_sql("avg(n_tokens)", 4)} AS avg_tokens,
           {rnd_sql("avg(n_chars * 1.0 / n_tokens)", 4)} AS avg_chars_per_token
    FROM per_doc GROUP BY source
    """,
)
def token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts aggregated per source — the LLM-pipeline
    'how many tokens is this corpus' primitive. Pure map-side split+size,
    one aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        "n_chars",
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        rnd(F.avg("n_tokens"), 4).alias("avg_tokens"),
        rnd(F.avg(F.col("n_chars") * 1.0 / F.col("n_tokens")), 4).alias("avg_chars_per_token"),
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------
_QUALITY_EXPR_SQL = (
    "0.4 * (n_distinct * 1.0 / n_tokens) "
    "+ 0.3 * least(n_stop * 5.0 / n_tokens, 1.0) "
    "+ 0.3 * least(n_tokens / 100.0, 1.0)"
)


@register(
    "text_quality_scores",
    tags=("text",),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
    ),
    feat AS (
      SELECT doc_id, n_chars,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(list_filter(toks, x -> x IN ({_sql_list(_EN_STOP)}))) AS n_stop
      FROM t
    )
    SELECT doc_id, n_tokens,
      {rnd_sql("n_distinct * 1.0 / n_tokens", 6)} AS distinct_ratio,
      {rnd_sql("n_stop * 1.0 / n_tokens", 6)} AS stopword_ratio,
      {rnd_sql("n_chars * 1.0 / n_tokens", 6)} AS avg_token_len,
      {rnd_sql(_QUALITY_EXPR_SQL, 6)} AS quality_score
    FROM feat
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score per document: lexical diversity + stopword
    presence + length saturation (the standard pretraining quality-filter
    features). Single map-side pass, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = ", ".join(f"'{w}'" for w in _EN_STOP)
    feat = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({stop_arr}))")).alias("n_stop"),
    )
    distinct_ratio = F.col("n_distinct") * 1.0 / F.col("n_tokens")
    stop_ratio = F.col("n_stop") * 1.0 / F.col("n_tokens")
    return feat.select(
        "doc_id",
        "n_tokens",
        rnd(distinct_ratio, 6).alias("distinct_ratio"),
        rnd(stop_ratio, 6).alias("stopword_ratio"),
        rnd(F.col("n_chars") * 1.0 / F.col("n_tokens"), 6).alias("avg_token_len"),
        rnd(
            0.4 * distinct_ratio
            + 0.3 * F.least(F.col("n_stop") * 5.0 / F.col("n_tokens"), F.lit(1.0))
            + 0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
            6,
        ).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Language ID (stopword-profile heuristic)
# --------------------------------------------------------------------------
_LANG_SCORE_SQL = ",\n".join(
    f"len(list_filter(toks, x -> x IN ({_sql_list(ws)}))) AS s_{lang}"
    for lang, ws in _STOPWORDS.items()
)
_LANG_CASE_SQL = "\n".join(
    f"WHEN s_{lang} = g THEN '{lang}'" for lang in _STOPWORDS
)


@register(
    "lang_id_stopwords",
    tags=("text",),
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang, {_LANG_SCORE_SQL}
      FROM t
    ),
    g AS (
      SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS g FROM scored
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN g = 0 THEN 'unknown'
                {_LANG_CASE_SQL}
           END AS pred_lang
    FROM g
    """,
)
def lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: per-language stopword hit counts,
    argmax with a fixed tie-break order (en>es>de>fr>zh), 'unknown' when no
    profile hits. Pure column expressions — the n-gram-profile upgrade slots
    into the same shape."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({_sql_list(ws)}))")).alias(
                f"s_{lang}"
            )
            for lang, ws in _STOPWORDS.items()
        ],
    )
    g = F.greatest(*[F.col(f"s_{lang}") for lang in _STOPWORDS])
    pred = F.when(g == 0, "unknown")
    for lang in _STOPWORDS:
        pred = pred.when(F.col(f"s_{lang}") == g, lang)
    return scored.select("doc_id", "actual_lang", pred.alias("pred_lang"))


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint
# --------------------------------------------------------------------------
@register(
    "rolling_hash_fingerprint",
    tags=("text", "hash"),
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 1073741824)),
             (acc, x) -> (acc * 31 + x) % 2147483647
           ) AS fingerprint
    FROM documents
    """,
)
def rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over token hashes
    (fingerprint = fold (acc*31 + h) mod p): detects exact token-sequence
    duplicates cheaper than sha256-of-text when tokens are already
    materialized. Map-side only."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.expr(
        """
        aggregate(
          transform(split(text, ' '),
            s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % 1073741824),
          CAST(0 AS BIGINT),
          (acc, x) -> (acc * 31 + x) % 2147483647
        )
        """
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# TF-IDF top terms
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    tags=("text", "window"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks WHERE term <> '' GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, {rnd_sql("tfidf", 6)} AS tfidf, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: two aggregations (tf, df) + a
    broadcast join of the term-df table + a per-doc window top-k. The df
    table is vocabulary-sized (Heaps-law sublinear in the corpus) — the
    same broadcast-the-model shape as the unigram LM scorer; a deployment
    whose vocabulary outgrows the broadcast threshold caps df to a top-V
    vocabulary (the standard TF-IDF practice) or swaps this one hint for a
    term-keyed shuffle join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", rnd("tfidf", 6).alias("tfidf"), "rnk")
    )
