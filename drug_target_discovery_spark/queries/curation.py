"""Training-data curation tier (SURVEY §2.12 [EXT], north-star surface):
the dataset-assembly operators an LLM pipeline runs between raw crawl and
training shards — deterministic stratified sampling, per-source (domain)
caps, fixed-budget chunk packing, and mixture rebalance planning.

No reference counterpart (the reference is a microarray pipeline); these are
first-class extension operators over the driver's `documents` table.

Scale design:
- sampling is a map-side filter on an md5-derived hash — zero shuffles, and
  the SAME hash on every engine (reproducible across reruns/backfills, the
  property real curation pipelines need; RNG sampling is neither
  deterministic nor oracle-checkable).
- per-source caps are one window shuffle; the rank predicate lets Spark plan
  WindowGroupLimit (top-k per group without a full sort of each group).
- chunk packing is a pure map-side explode of a `sequence()` — no shuffle,
  no Python.
- mixture rebalance aggregates per-stratum counts (one shuffle) and joins
  the 1-row corpus total by broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drug_target_discovery_spark.functions.rounding import rnd, rnd_sql
from drug_target_discovery_spark.operators.dedup import (
    MD5_INT_DUCK,
    MD5_INT_SPARK,
    NORM_SHA_DUCK,
    norm_sha_col,
)
from drug_target_discovery_spark.queries.registry import register
from drug_target_discovery_spark.sources.tables import load_table

# Per-language keep rates (downsample head languages, keep the tail):
# deterministic hash-threshold sampling — doc kept iff
# md5_int(doc_id) % 1000 < rate * 1000.
_LANG_RATES: dict[str, float] = {"en": 0.2, "es": 0.5, "de": 0.5, "fr": 0.5, "zh": 0.8}
_DEFAULT_RATE = 0.1

_HASH_SPARK = MD5_INT_SPARK.format(col="CAST(doc_id AS STRING)")
_HASH_DUCK = MD5_INT_DUCK.format(col="CAST(doc_id AS VARCHAR)")

_CHUNK = 64   # tokens per packed chunk
_CAP = 10     # max docs per source


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in _LANG_RATES.items()
    )
    return f"CASE lang {whens} ELSE {_DEFAULT_RATE} END"


def _rate_col():
    expr = None
    for lang, rate in _LANG_RATES.items():
        cond = F.col("lang") == lang
        expr = F.when(cond, F.lit(rate)) if expr is None else expr.when(cond, F.lit(rate))
    return expr.otherwise(F.lit(_DEFAULT_RATE))


# --------------------------------------------------------------------------
# Deterministic hash-stratified sampling
# --------------------------------------------------------------------------
@register(
    "hash_stratified_sample",
    tags=("curation", "sampling"),
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ({_HASH_DUCK}) % 1000 < ({_rate_case_sql()}) * 1000
    """,
)
def hash_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling: keep a doc iff its md5-derived
    hash falls under the stratum's keep-rate threshold. Map-side filter
    only — no shuffle, no RNG, reproducible across engines and reruns (the
    property curation backfills require)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_HASH_SPARK)
    return docs.filter((h % 1000) < _rate_col() * 1000).select(
        "doc_id", "lang", "source"
    )


# --------------------------------------------------------------------------
# Per-source (domain) cap
# --------------------------------------------------------------------------
@register(
    "per_source_doc_cap",
    tags=("curation", "window"),
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ({_HASH_DUCK}) ASC, doc_id ASC
             ) AS priority
      FROM documents
    )
    SELECT doc_id, source, priority FROM ranked WHERE priority <= {_CAP}
    """,
)
def per_source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source (domain) at _CAP documents, selecting by
    deterministic hash priority — the anti-boilerplate / anti-SEO-farm
    mixture control. One window shuffle on source; the rank<=K predicate
    plans as WindowGroupLimit (per-group top-k, no full per-group sort
    retention)."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.expr(_HASH_SPARK).asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("priority"))
        .filter(F.col("priority") <= _CAP)
    )


# --------------------------------------------------------------------------
# Fixed-budget chunk packing
# --------------------------------------------------------------------------
@register(
    "doc_chunk_packing",
    tags=("curation", "array"),
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT s.doc_id, t.chunk_id,
           least({_CHUNK}, s.n_tokens - t.chunk_id * {_CHUNK}) AS chunk_tokens
    FROM sized s,
         unnest(generate_series(0, CAST(ceil(s.n_tokens * 1.0 / {_CHUNK}) AS BIGINT) - 1))
           AS t(chunk_id)
    """,
)
def doc_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document's token stream into fixed _CHUNK-token training
    chunks: (doc_id, chunk_id, chunk_tokens) with a short tail chunk. Pure
    map-side sequence+explode — no shuffle, no Python; at 100 TB this runs
    entirely inside the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    n_chunks = F.floor((n + _CHUNK - 1) / _CHUNK).cast("bigint")
    return (
        docs.select("doc_id", n.alias("n_tokens"), n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(
                F.lit(_CHUNK).cast("bigint"),
                F.col("n_tokens") - F.col("chunk_id") * _CHUNK,
            ).alias("chunk_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Mixture rebalance planning
# --------------------------------------------------------------------------
@register(
    "corpus_mixture_rebalance",
    tags=("curation", "agg"),
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_docs) AS total, count(*) AS n_langs FROM counts
    )
    SELECT c.lang, c.n_docs,
           {rnd_sql("least(1.0, (t.total * 1.0 / t.n_langs) / c.n_docs)", 6)} AS keep_frac,
           CAST(floor(c.n_docs * least(1.0, (t.total * 1.0 / t.n_langs) / c.n_docs))
                AS BIGINT) AS expected_kept
    FROM counts c CROSS JOIN tot t
    """,
)
def corpus_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan a uniform language mixture: per-stratum keep fraction =
    min(1, target_share/actual_share) and the expected post-sampling count.
    One aggregation shuffle; the 1-row corpus total joins by broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    target = F.col("total") / F.col("n_langs")
    frac = F.least(F.lit(1.0), target / F.col("n_docs"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            rnd(frac, 6).alias("keep_frac"),
            F.floor(F.col("n_docs") * frac).cast("bigint").alias("expected_kept"),
        )
    )


# --------------------------------------------------------------------------
# End-to-end curation pipeline (flagship composition)
# --------------------------------------------------------------------------
_MIN_TOKENS, _MAX_TOKENS = 5, 1000
_MAX_AVG_TOKEN_LEN = 15.0


@register(
    "curation_pipeline_summary",
    tags=("curation", "pipeline"),
    oracle=f"""
    WITH canon AS (
      SELECT doc_id, lang, source, n_chars, text,
             min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id
      FROM documents
    ),
    deduped AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM canon WHERE doc_id = canonical_id
    ),
    gated AS (
      SELECT * FROM deduped
      WHERE n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
        AND n_chars * 1.0 / n_tokens < {_MAX_AVG_TOKEN_LEN}
    ),
    sampled AS (
      SELECT * FROM gated
      WHERE ({_HASH_DUCK}) % 1000 < ({_rate_case_sql()}) * 1000
    ),
    capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY source
                 ORDER BY ({_HASH_DUCK}) ASC, doc_id ASC
               ) AS priority
        FROM sampled
      ) WHERE priority <= {_CAP}
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {rnd_sql("avg(n_tokens)", 4)} AS avg_tokens
    FROM capped GROUP BY lang
    """,
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as one composed plan: exact dedup (sha256
    canonical) -> token/length quality gate -> deterministic stratified
    sample -> per-source cap -> per-language corpus summary. Every stage is
    a DataFrame transform, so Catalyst fuses the dedup window, the map-side
    gates, and the cap window into one pipeline with two shuffles (digest,
    source) plus the final aggregation — the shape a 100 TB curation run
    needs."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_HASH_SPARK)
    w_dup = W.partitionBy(F.sha2("text", 256))
    deduped = (
        docs.withColumn("canonical_id", F.min("doc_id").over(w_dup))
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .select(
            "doc_id", "lang", "source", "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
    )
    gated = deduped.filter(
        F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
        & (F.col("n_chars") * 1.0 / F.col("n_tokens") < _MAX_AVG_TOKEN_LEN)
    )
    sampled = gated.filter((h % 1000) < _rate_col() * 1000)
    w_cap = W.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    capped = sampled.withColumn("priority", F.row_number().over(w_cap)).filter(
        F.col("priority") <= _CAP
    )
    return capped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        rnd(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


# --------------------------------------------------------------------------
# Greedy sequence packing (applyInPandas stateful scan, recursive-CTE oracle)
# --------------------------------------------------------------------------
_PACK_BUDGET = 256  # tokens per training sequence


@register(
    "sequence_packing",
    tags=("curation", "applyInPandas"),
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk(source, rn, doc_id, n_tokens, pack_id, pack_pos, cum_tokens) AS (
      SELECT source, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.source, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN w.cum_tokens + o.n_tokens > {_PACK_BUDGET}
                  THEN w.pack_id + 1 ELSE w.pack_id END,
             CASE WHEN w.cum_tokens + o.n_tokens > {_PACK_BUDGET}
                  THEN 0 ELSE w.pack_pos + 1 END,
             CASE WHEN w.cum_tokens + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE w.cum_tokens + o.n_tokens END
      FROM walk w JOIN ordered o ON o.source = w.source AND o.rn = w.rn + 1
    )
    SELECT doc_id, source AS group_key, n_tokens, pack_id, pack_pos FROM walk
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy packing of documents into fixed token-budget training
    sequences per source — the shard-assembly step after chunking. The
    assignment is a running sum that resets on overflow: a stateful scan no
    SQL window expresses, so it runs as a grouped-map applyInPandas kernel
    (one shuffle on the group key, Arrow both ways). The DuckDB oracle
    replays the same scan as a recursive CTE — the kernel is still
    exact-value-checked despite not being window-expressible."""
    from drug_target_discovery_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_sequences(
        docs, budget=_PACK_BUDGET, group_col="source", id_col="doc_id",
        tokens_col="n_tokens",
    )


# --------------------------------------------------------------------------
# Mixture diagnostics: per-source language entropy
# --------------------------------------------------------------------------
@register(
    "source_lang_entropy",
    tags=("curation", "diagnostics"),
    oracle=f"""
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
    SELECT c.source,
           count(*) AS n_langs,
           {rnd_sql("-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot))", 6)}
             AS lang_entropy
    FROM c JOIN t ON c.source = t.source
    GROUP BY c.source
    """,
)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mixture — the diversity
    diagnostic curation dashboards track (a source collapsing to one
    language flags a crawler or classifier fault). Two aggregations on the
    same key; the per-source totals join co-partitioned."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            rnd(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )


# --------------------------------------------------------------------------
# Doc-length histogram per language
# --------------------------------------------------------------------------
_BUCKET_W = 50   # tokens per histogram bucket
_N_BUCKETS = 10  # last bucket is open-ended


@register(
    "doc_length_histogram",
    tags=("curation", "diagnostics"),
    oracle=f"""
    WITH sized AS (
      SELECT lang,
             least({_N_BUCKETS - 1},
                   CAST(floor(len(string_split(text, ' ')) * 1.0 / {_BUCKET_W}) AS BIGINT))
               AS bucket
      FROM documents
    )
    SELECT lang, bucket,
           bucket * {_BUCKET_W} AS bucket_lo,
           count(*) AS n_docs
    FROM sized GROUP BY lang, bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width token-length histogram per language (open-ended top
    bucket) — the length-distribution diagnostic behind truncation/packing
    decisions. Map-side bucket arithmetic + one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    bucket = F.least(
        F.lit(_N_BUCKETS - 1).cast("bigint"),
        F.floor(n * 1.0 / _BUCKET_W).cast("bigint"),
    )
    return (
        docs.select(F.col("lang"), bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("lang", "bucket", (F.col("bucket") * _BUCKET_W).alias("bucket_lo"), "n_docs")
    )


# --------------------------------------------------------------------------
# Weighted systematic sampling (token-budget-proportional)
# --------------------------------------------------------------------------
_W_STEP = 2000  # select ~1 doc per 2000 chars of stratum weight


@register(
    "weighted_systematic_sample",
    tags=("curation", "sampling", "scalable"),
    oracle=f"""
    WITH ordered AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY ({_HASH_DUCK}) ASC, doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM ordered
    WHERE cum // {_W_STEP} > (cum - n_chars) // {_W_STEP}
    """,
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without RNG or floats: per source the
    docs are laid on a line in a deterministic md5-shuffled order, each
    occupying its n_chars of length, and every doc straddling a
    {_W_STEP}-char boundary is selected — classic systematic sampling,
    inclusion probability ~ n_chars / {_W_STEP}. Pure INTEGER arithmetic
    (prefix-sum + floor-division), so both engines select literally the
    same docs — the reproducibility a curation backfill needs and an RNG
    sampler can't give. Cost: one window shuffle per stratum key; the
    md5 order decorrelates the selection from ingest order, giving the
    variance-reduction property systematic samplers are used for."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.expr(_HASH_SPARK).asc(), F.col("doc_id").asc()
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_chars").over(w)
    return (
        docs.select("doc_id", "source", "n_chars", cum.alias("cum"))
        .filter(
            F.floor(F.col("cum") / _W_STEP)
            > F.floor((F.col("cum") - F.col("n_chars")) / _W_STEP)
        )
        .select("doc_id", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# Leakage-safe train/validation/test split (group-aware holdout)
# --------------------------------------------------------------------------
_SPLIT_TRAIN = 80  # bucket < 80            -> train   (~80%)
_SPLIT_VAL = 90    # 80 <= bucket < 90      -> validation (~10%), rest test

_SPLIT_H_DUCK = MD5_INT_DUCK.format(col="n.digest")
_SPLIT_H_SPARK = MD5_INT_SPARK.format(col="digest")


@register(
    "leakage_safe_splits",
    tags=("curation", "dedup", "pipeline"),
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {NORM_SHA_DUCK.format(col="text")} AS digest
      FROM documents
    ),
    groups AS (
      SELECT digest, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM norm GROUP BY digest
    ),
    b AS (
      SELECT n.doc_id, g.canonical_id, g.group_size,
             ({_SPLIT_H_DUCK}) % 100 AS bkt
      FROM norm n JOIN groups g USING (digest)
    )
    SELECT doc_id, canonical_id, CAST(group_size AS BIGINT) AS group_size,
           CASE WHEN bkt < {_SPLIT_TRAIN} THEN 'train'
                WHEN bkt < {_SPLIT_VAL} THEN 'validation'
                ELSE 'test' END AS split,
           doc_id = canonical_id AS is_canonical
    FROM b
    """,
)
def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/validation/test assignment: documents are first
    collapsed into normalized-duplicate groups (the C4-style
    canonicalization of ``normalized_dedup_groups``), then the WHOLE group
    is hashed into a split — so a near-identical pair can never straddle
    train and test (the split-leakage failure mode that inflates eval
    scores; cf. the test-set decontamination literature). The split hash
    keys on the content digest, not doc_id, so assignment survives
    re-ingestion and doc-id renumbering — the reproducibility property a
    backfill needs.

    Scale design: digest is computed map-side (the text never shuffles,
    and the scan is read ONCE); the group rollup rides a single
    digest-partitioned window (min/count over the whole partition), so the
    entire query is one exchange — the groupBy-then-join form would cost
    three digest exchanges at a scale where AQE can't broadcast the group
    table. Skew bound: a window cannot partially aggregate, so the hottest
    digest's whole group lands in one task — the right trade while
    duplication multiplicity is bounded (dozens-to-thousands of copies);
    a corpus with a degenerate hot group (millions of byte-identical
    boilerplate pages) should pre-collapse through the partial-aggregating
    ``normalized_dedup_groups`` and join, accepting the extra exchanges.
    The split decision is pure codegen arithmetic on the 15-hex-digit md5
    fold — deterministic, engine-identical, no RNG state anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select("doc_id", norm_sha_col("text").alias("digest"))
    w = W.partitionBy("digest")
    bkt = F.expr(_SPLIT_H_SPARK) % 100
    return norm.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        F.when(bkt < _SPLIT_TRAIN, "train")
        .when(bkt < _SPLIT_VAL, "validation")
        .otherwise("test")
        .alias("split"),
    ).withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))


# --------------------------------------------------------------------------
# Split-contamination audit (near-dup pairs straddling train/test)
# --------------------------------------------------------------------------
# leakage_safe_splits guarantees NORMALIZED-exact duplicate groups never
# straddle splits; NEAR-duplicates (Jaccard > t but not byte/normalized
# equal) still can. This audit surfaces them — the check an eval team runs
# before trusting held-out numbers.
from drug_target_discovery_spark.queries.dedup import (  # noqa: E402
    _BANDED_CAND_SQL,
    _JACCARD_T,
    _N,
    _SIG_SQL,
)



@register(
    "split_contamination_audit",
    tags=("curation", "dedup", "pipeline"),
    oracle=f"""
    WITH {_SIG_SQL},
    {_BANDED_CAND_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS k
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.d1, c.d2, i.k * 1.0 / (s1.sz + s2.sz - i.k) AS j
      FROM cand c
      JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
      JOIN sizes s1 ON c.d1 = s1.doc_id
      JOIN sizes s2 ON c.d2 = s2.doc_id
      WHERE i.k * 1.0 / (s1.sz + s2.sz - i.k) > {_JACCARD_T}
    ),
    b AS (
      SELECT doc_id, ({MD5_INT_DUCK.format(col="n.digest")}) % 100 AS bkt
      FROM (SELECT doc_id, {NORM_SHA_DUCK.format(col="text")} AS digest
            FROM documents) n
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN bkt < {_SPLIT_TRAIN} THEN 'train'
                  WHEN bkt < {_SPLIT_VAL} THEN 'validation'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT v.d1, v.d2, {rnd_sql("v.j", 6)} AS jaccard,
           p1.split AS split_d1, p2.split AS split_d2,
           p1.split <> p2.split AS crosses_split
    FROM verified v
    JOIN sp p1 ON v.d1 = p1.doc_id
    JOIN sp p2 ON v.d2 = p2.doc_id
    """,
)
def split_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the leakage guard's blind spot: find NEAR-duplicate pairs
    (LSH candidates verified at shingle-Jaccard > 0.8) whose two
    members landed in different splits of ``leakage_safe_splits``. The
    split hash keys on the normalized digest, so normalized-exact dups are
    split-safe by construction — but a near-dup pair with real edits can
    straddle train and test, silently inflating eval scores. Every
    verified pair is reported with both splits and a ``crosses_split``
    flag (the contamination worklist: re-home or drop the test-side doc).

    Scale design: rides the sweep-scoped LSH memos (signatures + banded
    candidate pairs — built once, shared with the near-dup tier), exact
    verification only on candidate members, and the split table reuses the
    one-exchange digest window of ``leakage_safe_splits``. The verified
    pair set is candidates << corpus by construction, so the two
    pair-to-split joins broadcast the pair side under AQE.
    """
    from drug_target_discovery_spark.queries.dedup import verified_pairs

    verified = verified_pairs(spark, sf_dir)
    sp = leakage_safe_splits(spark, sf_dir).select("doc_id", "split")
    s1 = sp.select(F.col("doc_id").alias("d1"), F.col("split").alias("split_d1"))
    s2 = sp.select(F.col("doc_id").alias("d2"), F.col("split").alias("split_d2"))
    return (
        verified.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            rnd("jaccard", 6).alias("jaccard"),
            "split_d1",
            "split_d2",
            (F.col("split_d1") != F.col("split_d2")).alias("crosses_split"),
        )
    )


# --------------------------------------------------------------------------
# End-to-end curation pipeline (the nightly materialization, composed)
# --------------------------------------------------------------------------
# Tiers, in order: normalized-exact dedup -> near-dup prune -> Gopher
# quality gate -> leakage-safe split. Each tier reuses the SAME shared
# definitions as its standalone query (norm_sha_col digest, LSH
# signature/candidate memos, jaccard verification, Gopher bounds, split
# hash), so the composed run cannot drift from the per-tier evidence.
from drug_target_discovery_spark.queries.quality import (  # noqa: E402
    _ALL_STOPWORDS,
    _STOP_SQL,
)

_QUAL_SQL = (
    "n_words BETWEEN 30 AND 5000 "
    "AND sum_len * 1.0 / n_words BETWEEN 3.0 AND 9.0 AND has_stop = 1"
)


@register(
    "curation_end_to_end",
    tags=("curation", "dedup", "quality", "pipeline"),
    oracle=f"""
    WITH {_SIG_SQL},
    {_BANDED_CAND_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS k
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.d1, c.d2
      FROM cand c
      JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
      JOIN sizes s1 ON c.d1 = s1.doc_id
      JOIN sizes s2 ON c.d2 = s2.doc_id
      WHERE i.k * 1.0 / (s1.sz + s2.sz - i.k) > {_JACCARD_T}
    ),
    q AS (
      SELECT doc_id, source, lang, digest,
             len(wtoks) AS n_words,
             list_sum(list_transform(wtoks, x -> len(x))) AS sum_len,
             CASE WHEN len(list_intersect(wtoks, [{_STOP_SQL}])) > 0
                  THEN 1 ELSE 0 END AS has_stop
      FROM (SELECT doc_id, source, lang,
                   {NORM_SHA_DUCK.format(col="text")} AS digest,
                   string_split(text, ' ') AS wtoks
            FROM documents)
    ),
    staged AS (
      SELECT *,
             min(doc_id) OVER (PARTITION BY digest) AS canonical_id,
             ({MD5_INT_DUCK.format(col="digest")}) % 100 AS bkt
      FROM q
    ),
    pruned AS (
      SELECT DISTINCT v.d2 AS doc_id
      FROM verified v
      JOIN staged s ON v.d1 = s.doc_id AND s.doc_id = s.canonical_id
    ),
    decided AS (
      SELECT s.doc_id, s.source, s.lang, s.canonical_id, s.bkt,
             CASE WHEN s.doc_id <> s.canonical_id THEN 'exact_dup'
                  WHEN p.doc_id IS NOT NULL THEN 'near_dup'
                  WHEN NOT ({_QUAL_SQL}) THEN 'low_quality'
                  ELSE 'kept' END AS status
      FROM staged s LEFT JOIN pruned p ON s.doc_id = p.doc_id
    )
    SELECT doc_id, source, lang, canonical_id, status,
           CASE WHEN status = 'kept' THEN
             CASE WHEN bkt < {_SPLIT_TRAIN} THEN 'train'
                  WHEN bkt < {_SPLIT_VAL} THEN 'validation'
                  ELSE 'test' END
           END AS split
    FROM decided
    """,
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed nightly curation materialization: every document with
    its final disposition after the full tier chain —
    ``exact_dup`` (not the min-id canonical of its normalized-digest
    group), ``near_dup`` (has a verified shingle-Jaccard > {_JACCARD_T}
    neighbor with a smaller id that survived exact dedup — the same
    single-hop min-id star convention as ``near_dup_groups``),
    ``low_quality`` (fails the Gopher word-count / mean-word-length /
    stopword gate of ``gopher_quality_flags``), or ``kept`` with its
    leakage-safe split (the digest-keyed hash of ``leakage_safe_splits``,
    so the assignment is identical to the standalone split query's).
    Kept docs form an independent set of the verified-pair graph by
    construction, so no near-dup pair can straddle train/test — the
    invariant ``split_contamination_audit`` checks from the outside.

    Proves the tiers COMPOSE without re-reading the corpus per tier: one
    full map-side documents pass computes digest + quality features
    together (tier 1 + 3 share the scan), the near-dup tier rides the
    sweep-scoped LSH signature/candidate memos and scans only
    candidate-member texts for verification, and the split is codegen
    arithmetic on the already-computed digest — no extra exchange beyond
    the digest window. A plan-shape test pins the documents-scan count.

    Scale shape: the text column never shuffles (digest + quality features
    reduce it map-side); the only full-width exchange is the digest window
    (same skew caveat as ``leakage_safe_splits``); the prune join keys on
    d1 with the tiny verified-pair table, broadcastable under AQE without
    hints."""
    from drug_target_discovery_spark.caching import scoped_cache
    from drug_target_discovery_spark.queries.dedup import verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    wtoks = F.split("text", " ")
    sum_len = F.aggregate(
        F.transform(wtoks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    stop_arr = F.array([F.lit(s) for s in _ALL_STOPWORDS])
    # The narrow per-doc feature frame (digest + quality counters, NO text)
    # feeds both the main disposition frame and the exact-survivor set —
    # query-scoped cache so the docs scan and the normalization regex run
    # ONCE, not once per consumer. At 100 TB this is the materialized
    # intermediate a nightly pipeline writes anyway (≈50 B/doc).
    q = scoped_cache(
        docs.select(
            "doc_id",
            "source",
            "lang",
            norm_sha_col("text").alias("digest"),
            F.size(wtoks).alias("n_words"),
            sum_len.alias("sum_len"),
            F.when(F.arrays_overlap(wtoks, stop_arr), 1)
            .otherwise(0)
            .alias("has_stop"),
        )
    )
    w = W.partitionBy("digest")
    staged = q.select(
        "*",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.expr(MD5_INT_SPARK.format(col="digest")) % 100).alias("bkt"),
    )
    verified = verified_pairs(spark, sf_dir).select("d1", "d2")
    # exact-dedup survivors = the group minima — a partial-aggregating
    # groupBy over the cached feature frame (cheaper than re-running the
    # digest window on this branch)
    surv1 = q.groupBy("digest").agg(F.min("doc_id").alias("d1")).select("d1")
    pruned = (
        verified.join(surv1, "d1")
        .select(F.col("d2").alias("doc_id"))
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    quality_ok = (
        F.col("n_words").between(30, 5000)
        & (F.col("sum_len") * 1.0 / F.col("n_words")).between(3.0, 9.0)
        & (F.col("has_stop") == 1)
    )
    status = (
        F.when(F.col("doc_id") != F.col("canonical_id"), "exact_dup")
        .when(F.col("_pruned").isNotNull(), "near_dup")
        .when(~quality_ok, "low_quality")
        .otherwise("kept")
    )
    decided = staged.join(pruned, "doc_id", "left").withColumn("status", status)
    split = F.when(
        F.col("status") == "kept",
        F.when(F.col("bkt") < _SPLIT_TRAIN, "train")
        .when(F.col("bkt") < _SPLIT_VAL, "validation")
        .otherwise("test"),
    )
    return decided.select(
        "doc_id", "source", "lang", "canonical_id", "status", split.alias("split")
    )


# --------------------------------------------------------------------------
# Training-shard assignment (budgeted bin packing, globally numbered)
# --------------------------------------------------------------------------
_SHARD_CHARS = 20_000  # char budget per training shard


@register(
    "training_shard_assignment",
    tags=("curation", "packing", "scalable"),
    oracle=f"""
    WITH ordered AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY ({_HASH_DUCK}) ASC, doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM documents
    ),
    local AS (
      SELECT doc_id, source, n_chars, cum,
             (cum - n_chars) // {_SHARD_CHARS} AS local_shard
      FROM ordered
    ),
    per_source AS (
      SELECT source, max(local_shard) + 1 AS n_shards FROM local GROUP BY source
    ),
    offsets AS (
      SELECT source,
             CAST(coalesce(sum(n_shards) OVER (ORDER BY source ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM per_source
    )
    SELECT l.doc_id, l.source, l.n_chars,
           CAST(l.local_shard AS BIGINT) AS local_shard,
           CAST(l.local_shard + o.off AS BIGINT) AS shard_id
    FROM local l JOIN offsets o ON l.source = o.source
    """,
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted training-shard assignment: lay each source's documents on a
    line in a deterministic md5-shuffled order and cut it every
    {_SHARD_CHARS} chars — a doc belongs to the shard its START falls in
    (document-contiguous greedy packing: shards can overflow by at most
    one document, never split one; a single doc larger than the budget
    occupies its start shard and leaves the ids it spans empty). Shard
    ids are globally DISJOINT and ordered across sources via per-source
    offsets — the numbering a shard-writing job needs — without any
    global sort: local ids come from one per-source prefix-sum window,
    and the offset table is a per-source aggregate (rows = #sources)
    prefix-summed in a second tiny window.

    Pure integer arithmetic end to end (cumsum + floor-division), so both
    engines assign literally the same shards — rerunning a backfill
    produces byte-identical shard manifests, the reproducibility property
    RNG-based shufflers can't give. Scale shape: ONE window exchange over
    the corpus (partitioned by source — real parallelism), then a
    #sources-row aggregate whose window runs single-partition by design
    (bounded by the source count, not the corpus); the join back carries
    no broadcast hint — AQE broadcasts the offset table when small. The
    md5 order decorrelates shard composition from ingest order, so shards
    are IID-ish slices — the property training-data loaders assume."""
    docs = load_table(spark, sf_dir, "documents")
    w_cum = W.partitionBy("source").orderBy(
        F.expr(_HASH_SPARK).asc(), F.col("doc_id").asc()
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    local = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(w_cum).alias("cum"),
    ).withColumn(
        "local_shard",
        F.floor((F.col("cum") - F.col("n_chars")) / _SHARD_CHARS),
    )
    per_source = local.groupBy("source").agg(
        (F.max("local_shard") + 1).alias("n_shards")
    )
    # unpartitioned window bounded: input = per-source table (|sources|
    # rows, constant)
    w_off = W.orderBy(F.col("source").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = per_source.select(
        "source",
        F.coalesce(F.sum("n_shards").over(w_off), F.lit(0)).alias("off"),
    )
    return (
        local.join(offsets, "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("local_shard").cast("long").alias("local_shard"),
            (F.col("local_shard") + F.col("off")).cast("long").alias("shard_id"),
        )
    )


# --------------------------------------------------------------------------
# Temporal embargo split (time-series holdout with purge gap)
# --------------------------------------------------------------------------
# leakage_safe_splits guards against CONTENT leakage (near-identical docs
# straddling splits); time-series models leak through TIME instead —
# autocorrelated features computed near the train/test boundary see the
# "future" through rolling windows. The standard hygiene (cf. the purged
# walk-forward splits of the financial-ML literature, e.g. de Prado 2018
# ch.7) is a chronological split with an EMBARGO gap excluded from both
# sides. Cutoffs are fractions of the observed span in pure integer
# arithmetic so both engines label literally the same rows.
_EMB_TRAIN_NUM = 8   # train = first 8/10 of the observed time span
_EMB_GAP_DEN = 20    # embargo gap = span/20 (5%) after the train cutoff


@register(
    "temporal_embargo_split",
    tags=("curation", "events", "holdout"),
    oracle=f"""
    WITH e AS (
      SELECT event_type, user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events
    ),
    ext AS (SELECT min(s) AS mn, max(s) AS mx FROM e),
    lab AS (
      SELECT e.event_type, e.user_id, e.value,
             CASE WHEN e.s <= ext.mn + ({_EMB_TRAIN_NUM} * (ext.mx - ext.mn)) // 10
                    THEN 'train'
                  WHEN e.s <= ext.mn + ({_EMB_TRAIN_NUM} * (ext.mx - ext.mn)) // 10
                              + (ext.mx - ext.mn) // {_EMB_GAP_DEN}
                    THEN 'embargo'
                  ELSE 'test' END AS split
      FROM e CROSS JOIN ext
    )
    SELECT split, event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {rnd_sql("avg(value)", 6)} AS avg_value
    FROM lab GROUP BY split, event_type ORDER BY split, event_type
    """,
)
def temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chronological train/embargo/test assignment over the event stream:
    train = the first {_EMB_TRAIN_NUM}/10 of the observed time span, then a
    span/{_EMB_GAP_DEN} embargo gap excluded from both sides, test = the
    remainder. The embargo prevents look-ahead leakage through
    autocorrelated rolling features straddling the boundary — the
    time-series twin of ``leakage_safe_splits``'s content-hash groups.

    Determinism: cutoffs are integer arithmetic on floor-epoch seconds
    derived from a 1-row min/max extent — no quantiles, no RNG — so the
    assignment is reproducible across backfills and bit-identical across
    engines. Degenerate single-instant spans collapse to all-train on
    both sides.

    Scale design: the extent is a 1-row map-side-combined aggregate
    broadcast back (the calibration/z-order extent pattern); labeling is
    pure codegen arithmetic, so the only exchange is the final
    (split, event_type) aggregate — bounded at 3 x |event types| rows.
    Two scans of the fact, no cached copy (the unigram-LM two-scan
    contract); the single-distinct n_users rides Spark's standard
    two-level partial distinct aggregate, no Expand."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", "user_id", "value", F.col("ts").cast("long").alias("s")
    )
    ext = e.agg(F.min("s").alias("mn"), F.max("s").alias("mx"))
    train_end = F.expr(f"mn + ({_EMB_TRAIN_NUM} * (mx - mn)) div 10")
    emb_end = F.expr(
        f"mn + ({_EMB_TRAIN_NUM} * (mx - mn)) div 10"
        f" + (mx - mn) div {_EMB_GAP_DEN}"
    )
    lab = e.crossJoin(F.broadcast(ext)).select(
        "event_type",
        "user_id",
        "value",
        F.when(F.col("s") <= train_end, "train")
        .when(F.col("s") <= emb_end, "embargo")
        .otherwise("test")
        .alias("split"),
    )
    return (
        lab.groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            rnd(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("split", "event_type")
    )
