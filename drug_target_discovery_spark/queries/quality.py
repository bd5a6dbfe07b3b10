"""Corpus-quality tier (SURVEY §2.12 [EXT]): benchmark decontamination,
repetition filtering, heuristic quality gates, winnowing fingerprints —
the document-level filters a training-data pipeline runs before packing.

All n-gram construction is JVM-side array algebra (split → sequence →
slice → array_join) so the per-doc passes stay inside whole-stage codegen;
the only shuffles are the final aggregations and, for decontamination, one
broadcast join against the (small) benchmark n-gram set. Hashes reuse the
md5-derived 60-bit idiom from operators/dedup.py so DuckDB computes the
exact same integers.

No reference counterpart (pipeline2.py stops at expression matrices); these
are the Gopher/C4-style corpus filters (Rae et al. 2021, Raffel et al.
2020) re-expressed as Spark plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.dedup import MD5_INT_DUCK, MD5_INT_SPARK
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table


def word_grams(words: Column, k: int) -> Column:
    """Contiguous word k-grams of an array column, as space-joined strings.

    `sequence(0, size-k)` DESCENDS when size < k (Spark generates stepped
    sequences toward the stop), so short docs are guarded to an empty list
    rather than producing phantom reversed grams.
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - k),
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )
    return F.when(F.size(words) >= k, grams).otherwise(F.array().cast("array<string>"))


def _grams_sql(k: int) -> str:
    """DuckDB mirror of word_grams over a list column `w` (1-based slices)."""
    return (
        f"list_transform(generate_series(1, greatest(len(w) - {k - 1}, 0)), "
        f"i -> array_to_string(w[i:i+{k - 1}], ' '))"
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: shared word-5-gram join against a held-out set
# --------------------------------------------------------------------------
@register(
    "benchmark_decontamination",
    tags=("quality", "dedup"),
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
      FROM words, LATERAL unnest(generate_series(1, len(w) - 4)) AS t(i)
      WHERE len(w) >= 5
    ),
    hashed AS (
      SELECT doc_id, {MD5_INT_DUCK.format(col="g")} AS hg FROM grams
    ),
    bench AS (SELECT DISTINCT hg FROM hashed WHERE doc_id % 20 = 0),
    train AS (SELECT * FROM hashed WHERE doc_id % 20 <> 0)
    SELECT train.doc_id,
           count(*) AS n_grams,
           CAST(count(bench.hg) AS BIGINT) AS n_hit,
           {rnd_sql("count(bench.hg) * 1.0 / count(*)", 4)} AS contamination,
           CASE WHEN count(bench.hg) > 0 THEN 1 ELSE 0 END AS is_contaminated
    FROM train LEFT JOIN bench ON train.hg = bench.hg
    GROUP BY train.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training docs sharing any word 5-gram
    with a held-out benchmark split (here: doc_id % 20 == 0, deterministic).

    Scale shape: per-doc distinct grams are built map-side (array_distinct
    BEFORE explode, so duplicate grams never hit the shuffle), and only a
    60-bit md5 gram hash ever reaches the join — never the gram string.
    The benchmark split is carved from the corpus itself, so it grows
    linearly with the corpus; no broadcast hint is forced — AQE picks
    broadcast when the bench side is genuinely small at runtime and falls
    back to a shuffled hash join when it is not. (Both engines join on the
    identical md5-derived integers, so hash collisions — ~2^-60 — cannot
    diverge the counts.) One aggregation by doc_id closes the plan.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    hg = F.expr(MD5_INT_SPARK.format(col="g"))
    grams = (
        docs.filter(F.size("w") >= 5)
        .select(
            "doc_id", F.explode(F.array_distinct(word_grams(F.col("w"), 5))).alias("g")
        )
        .select("doc_id", hg.alias("hg"))
    )
    bench = (
        grams.filter(F.col("doc_id") % 20 == 0)
        .select("hg")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % 20 != 0)
    joined = train.join(bench, "hg", "left")
    n_hit = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        n_hit.alias("n_hit"),
        rnd(n_hit * 1.0 / F.count(F.lit(1)), 4).alias("contamination"),
        F.when(n_hit > 0, 1).otherwise(0).alias("is_contaminated"),
    )


# --------------------------------------------------------------------------
# Repetition filter: duplicate-n-gram fraction (Gopher repetition rules)
# --------------------------------------------------------------------------
@register(
    "repeated_ngram_fraction",
    tags=("quality",),
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             greatest(len(w) - 1, 0) AS t2, len(list_distinct(g2)) AS d2,
             greatest(len(w) - 2, 0) AS t3, len(list_distinct(g3)) AS d3
      FROM (SELECT source, w, {_grams_sql(2)} AS g2,
                   {_grams_sql(3)} AS g3
            FROM (SELECT source, string_split(text, ' ') AS w FROM documents))
    ),
    fracs AS (
      SELECT source,
             CASE WHEN t2 > 0 THEN 1.0 - d2 * 1.0 / t2 ELSE 0.0 END AS dup2,
             CASE WHEN t3 > 0 THEN 1.0 - d3 * 1.0 / t3 ELSE 0.0 END AS dup3
      FROM per_doc
    )
    SELECT source, count(*) AS n_docs,
           {rnd_sql("avg(dup2)", 4)} AS avg_dup_2gram,
           {rnd_sql("avg(dup3)", 4)} AS avg_dup_3gram,
           CAST(sum(CASE WHEN dup2 > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
    FROM fracs GROUP BY source
    """,
)
def repeated_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-doc duplicate 2-/3-gram fraction
    (1 - distinct/total), aggregated per source with a flag count.

    Entirely map-side per doc — the gram lists never explode; distinct
    counting is `size(array_distinct(...))` inside codegen. One aggregation
    shuffle on source. The per-doc fractions are exact rationals of small
    integers, so the >0.05 flag is bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("w")
    )
    per_doc = docs.select(
        "source",
        F.greatest(F.size("w") - 1, F.lit(0)).alias("t2"),
        F.size(F.array_distinct(word_grams(F.col("w"), 2))).alias("d2"),
        F.greatest(F.size("w") - 2, F.lit(0)).alias("t3"),
        F.size(F.array_distinct(word_grams(F.col("w"), 3))).alias("d3"),
    )
    dup2 = F.when(F.col("t2") > 0, 1.0 - F.col("d2") * 1.0 / F.col("t2")).otherwise(0.0)
    dup3 = F.when(F.col("t3") > 0, 1.0 - F.col("d3") * 1.0 / F.col("t3")).otherwise(0.0)
    fracs = per_doc.select("source", dup2.alias("dup2"), dup3.alias("dup3"))
    return fracs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("dup2"), 4).alias("avg_dup_2gram"),
        rnd(F.avg("dup3"), 4).alias("avg_dup_3gram"),
        F.sum(F.when(F.col("dup2") > 0.05, 1).otherwise(0)).alias("n_repetitive"),
    )


# --------------------------------------------------------------------------
# Heuristic quality gate (Gopher rules subset)
# --------------------------------------------------------------------------
_ALL_STOPWORDS = [
    "the", "a", "of", "and", "to",
    "el", "la", "de", "y", "que",
    "der", "die", "und", "das", "ist",
    "le", "les", "et",
    "的", "是", "了", "在", "和",
]
_STOP_SQL = ", ".join(f"'{s}'" for s in _ALL_STOPWORDS)

# The Gopher keep-rule thresholds — shared constants so every consumer
# of the rule (this module's gopher_quality_flags and round13's
# quality_gate_kappa heuristic rater, Spark AND oracle sides) moves
# together if they are ever recalibrated; a literal copy in one site
# would let the kappa gate silently diverge from the real gate.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 5000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 9.0


@register(
    "gopher_quality_flags",
    tags=("quality",),
    oracle=f"""
    WITH per_doc AS (
      SELECT source, lang,
             len(w) AS n_words,
             list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS mwl,
             CASE WHEN len(list_intersect(w, [{_STOP_SQL}])) > 0 THEN 1 ELSE 0 END
               AS has_stop
      FROM (SELECT source, lang, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) > 0
    ),
    flagged AS (
      SELECT source, lang, n_words, mwl, has_stop,
             CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                       AND mwl BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI}
                       AND has_stop = 1
                  THEN 1 ELSE 0 END AS keep
      FROM per_doc
    )
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           {rnd_sql("avg(keep * 1.0)", 4)} AS keep_rate,
           {rnd_sql("avg(mwl)", 4)} AS avg_word_len
    FROM flagged GROUP BY source, lang
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality gate (Gopher rules subset): word-count
    bounds, mean-word-length bounds, stopword presence → keep flag, rates
    per (source, lang).

    One codegen'd map pass per doc (aggregate over the word array for total
    length, arrays_overlap for the stopword test — no explode, no UDF), one
    aggregation shuffle. mean_word_len is a ratio of exact small-integer
    sums, so the 3.0..9.0 band test cannot diverge between engines.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.split("text", " ").alias("w")
    )
    sum_len = F.aggregate(
        F.transform(F.col("w"), lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    stop_arr = F.array([F.lit(s) for s in _ALL_STOPWORDS])
    per_doc = docs.filter(F.size("w") > 0).select(
        "source",
        "lang",
        F.size("w").alias("n_words"),
        (sum_len * 1.0 / F.size("w")).alias("mwl"),
        F.when(F.arrays_overlap(F.col("w"), stop_arr), 1).otherwise(0).alias("has_stop"),
    )
    keep = F.when(
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mwl").between(GOPHER_MWL_LO, GOPHER_MWL_HI)
        & (F.col("has_stop") == 1),
        1,
    ).otherwise(0)
    return (
        per_doc.withColumn("keep", keep)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_keep"),
            rnd(F.avg(F.col("keep") * 1.0), 4).alias("keep_rate"),
            rnd(F.avg("mwl"), 4).alias("avg_word_len"),
        )
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003 — MOSS local fingerprinting)
# --------------------------------------------------------------------------
@register(
    "winnowing_fingerprints",
    tags=("quality", "fingerprint", "window"),
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             {MD5_INT_DUCK.format(col="array_to_string(w[i:i+2], ' ')")} AS h
      FROM words, LATERAL unnest(generate_series(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 3
    ),
    keyed AS (
      SELECT doc_id, pos,
             lpad(CAST(h AS VARCHAR), 20, '0') || ':' ||
               lpad(CAST(pos AS VARCHAR), 8, '0') AS k
      FROM grams
    ),
    sel AS (
      SELECT doc_id, pos,
             min(k) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
      FROM keyed
    )
    SELECT doc_id,
           count(*) AS n_windows,
           count(DISTINCT fp) AS n_fingerprints,
           {rnd_sql("count(DISTINCT fp) * 1.0 / count(*)", 4)} AS density
    FROM sel WHERE pos >= 3 GROUP BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document fingerprints: hash word 3-grams, slide a
    4-hash window, keep each window's minimum — guaranteeing any shared run
    of ≥6 words between two docs shares a fingerprint, with ~2/(w+1) of the
    positions selected.

    The (hash, position) pair is encoded as one zero-padded sortable string
    so the window min IS the winnowing tie-break (smallest hash, then
    leftmost position) in both engines. Plan: one shuffle for the per-doc
    position window, one aggregation; the md5-derived 60-bit hash matches
    DuckDB bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams = (
        docs.filter(F.size("w") >= 3)
        .select("doc_id", F.posexplode(word_grams(F.col("w"), 3)).alias("pos", "g"))
        .select(
            "doc_id",
            "pos",
            F.expr(MD5_INT_SPARK.format(col="g")).alias("h"),
        )
    )
    keyed = grams.select(
        "doc_id",
        "pos",
        F.concat(
            F.lpad(F.col("h").cast("string"), 20, "0"),
            F.lit(":"),
            F.lpad(F.col("pos").cast("string"), 8, "0"),
        ).alias("k"),
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    sel = keyed.select("doc_id", "pos", F.min("k").over(win).alias("fp")).filter(
        F.col("pos") >= 3
    )
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("fp").alias("n_fingerprints"),
        rnd(F.countDistinct("fp") * 1.0 / F.count(F.lit(1)), 4).alias("density"),
    )


# --------------------------------------------------------------------------
# Blocklist filter + redaction stats (C4-style badwords gate / PII scrub)
# --------------------------------------------------------------------------
# An innocuous stand-in term list: the mechanics (word-boundary alternation
# scan, per-doc counts, redaction) are exactly the C4 badwords filter and
# the regex tier of a PII scrub; swap the list for the real one in
# production. \b and alternation behave identically in Java regex and RE2
# over ASCII corpora.
_BLOCKLIST_PAT = r"\b(spark|window|shuffle)\b"


@register(
    "blocklist_redaction_stats",
    tags=("quality", "text"),
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN regexp_matches(text, '{_BLOCKLIST_PAT}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(len(regexp_extract_all(text, '{_BLOCKLIST_PAT}')))
                AS BIGINT) AS total_matches,
           {rnd_sql(f"avg(length(regexp_replace(text, '{_BLOCKLIST_PAT}', '[REDACTED]', 'g')))", 4)}
             AS avg_redacted_len
    FROM documents GROUP BY source
    """,
)
def blocklist_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-policy filter stats per source: docs flagged by a
    word-boundary blocklist scan, total term occurrences, and the mean
    document length after redaction — the C4 badwords-gate / regex-PII
    shape. Entirely map-side scalar regex inside codegen (flag, count,
    replace are all per-row); ONE aggregation by source closes the plan.
    At 100 TB the regex scan is embarrassingly parallel and the shuffle
    carries only per-source partial sums."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    pat = _BLOCKLIST_PAT
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("text").rlike(pat).cast("long")).alias("n_flagged"),
        F.sum(F.regexp_count("text", F.lit(pat))).alias("total_matches"),
        rnd(
            F.avg(F.length(F.regexp_replace("text", pat, "[REDACTED]"))), 4
        ).alias("avg_redacted_len"),
    )


# --------------------------------------------------------------------------
# Boilerplate / template-fragment detection (cross-document repetition)
# --------------------------------------------------------------------------
_BP_N = 6  # template fragment width (word 6-grams)


@register(
    "boilerplate_ngram_stats",
    tags=("quality", "dedup"),
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             {MD5_INT_DUCK.format(col=f"array_to_string(w[i:i+{_BP_N - 1}], ' ')")} AS hg
      FROM words, LATERAL unnest(generate_series(1, len(w) - {_BP_N - 1})) AS t(i)
      WHERE len(w) >= {_BP_N}
    ),
    df AS (
      SELECT source, hg, count(*) AS n_docs FROM grams GROUP BY source, hg
    ),
    shared AS (SELECT source, hg FROM df WHERE n_docs >= 2)
    SELECT g.doc_id,
           count(*) AS n_grams,
           CAST(count(s.hg) AS BIGINT) AS n_shared,
           {rnd_sql("count(s.hg) * 1.0 / count(*)", 6)} AS shared_frac,
           CASE WHEN 4 * count(s.hg) >= count(*) THEN 1 ELSE 0 END AS is_templated
    FROM grams g
    LEFT JOIN shared s ON g.source = s.source AND g.hg = s.hg
    GROUP BY g.doc_id
    """,
)
def boilerplate_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate / template-fragment detection (the RefinedWeb / CCNet
    curation step adapted to n-grams): a word {_BP_N}-gram appearing in 2+
    DIFFERENT documents of the same source is a shared template fragment
    (navigation chrome, license footers, form letters); each doc reports
    its distinct-gram count, how many of them are shared, the shared
    fraction, and an ``is_templated`` flag (>= 25% shared — the integer
    comparison ``4*n_shared >= n_grams``, exact on both engines). This is
    the CROSS-document complement of ``repeated_ngram_fraction`` (within-
    doc) and ``benchmark_decontamination`` (cross-corpus).

    Scale shape: per-doc distinct grams are built map-side
    (array_distinct BEFORE explode) and only the 60-bit md5 hash ever
    shuffles — never the gram string. The shared flag is a window COUNT
    over (source, hg) — n_docs per gram read off the same shuffled
    partition the old df-rollup + left-join pair needed TWO gram passes
    and three exchanges for (optimization r13, guide §2.4: the join and
    the aggregate were keyed the same way; the window computes the group
    size in place, so the gram table is built once and shuffled once
    before the per-doc rollup). The hottest (source, gram) window group
    is bounded by that source's doc count — same bound the join's hot
    group had."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    hg = F.expr(MD5_INT_SPARK.format(col="g"))
    grams = (
        docs.filter(F.size("w") >= _BP_N)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(word_grams(F.col("w"), _BP_N))).alias("g"),
        )
        .select("doc_id", "source", hg.alias("hg"))
    )
    n_docs = F.count(F.lit(1)).over(W.partitionBy("source", "hg"))
    flagged = grams.withColumn(
        "hit", F.when(n_docs >= 2, 1).otherwise(0)
    )
    n_shared = F.sum("hit")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        n_shared.alias("n_shared"),
        rnd(n_shared * 1.0 / F.count(F.lit(1)), 6).alias("shared_frac"),
        F.when(4 * n_shared >= F.count(F.lit(1)), 1).otherwise(0).alias("is_templated"),
    )
