"""Deduplication operators for large-scale text corpora (SURVEY §2.12,
north-star extension surface — no reference counterpart).

All hash families are built from md5 so the DuckDB oracle can compute the
exact same integers (Spark: ``conv(substr(md5(x),1,15),16,10)``; DuckDB:
``CAST('0x'||substr(md5(x),1,15) AS BIGINT)`` — 60 bits, always positive).

Scale design:
- exact dedup: hash-groupBy on sha256(text) — one shuffle on the digest, not
  the text payload.
- shingle Jaccard: explode distinct shingles -> self-join on shingle ->
  per-pair intersection counts. The join key is the (small) shingle string;
  frequent-shingle skew is the known hazard -> ``max_shingle_df`` drops
  shingles appearing in more than a fraction of docs (standard stop-shingle
  practice, also keeps the pair blow-up bounded).
- MinHash/LSH: k independent permutations approximated by (a*h+b) mod p;
  banding groups rows of the signature; candidate pairs only within equal
  band-hash buckets. Everything is DataFrame ops -> Catalyst handles the
  rest. This is the 100 TB path: cost is O(docs * k) + bucket-local joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60-bit md5-derived token/shingle hash, cross-engine reproducible
MD5_INT_SPARK = "CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT)"
MD5_INT_DUCK = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"

# C4-style normalization digest (lowercase, strip punctuation, collapse
# whitespace, sha256) — THE single definition for every consumer
# (normalized_dedup_groups, leakage_safe_splits, split_contamination_audit):
# the split/audit pair is only leakage-safe if all sites bucket docs by the
# byte-identical digest, so never inline a copy of these expressions.
# NULL text coalesces to '' so both engines keep every document (DuckDB
# drops NULL join/group keys differently than a Spark window partition).
# The whitespace class is spelled out as [ \t\n\r\f] rather than \s:
# Java's \s includes vertical tab (\x0B) while RE2's excludes it, so a
# \x0B in a document made the two engines normalize to different strings
# (measured divergence); with the explicit class both treat \x0B as
# punctuation and strip it.
NORM_SHA_DUCK = (
    "sha256(trim(regexp_replace(regexp_replace(lower(coalesce({col}, '')),"
    " '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'), '[ \\t\\n\\r\\f]+', ' ', 'g')))"
)


def norm_sha_col(col: str = "text"):
    """Spark twin of NORM_SHA_DUCK, built from DataFrame-API functions so
    the regex literals bypass SQL-string escaping entirely."""
    return F.sha2(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.coalesce(F.col(col), F.lit(""))),
                    r"[^a-z0-9 \t\n\r\f]",
                    "",
                ),
                r"[ \t\n\r\f]+",
                " ",
            )
        ),
        256,
    )

MERSENNE61 = (1 << 61) - 1


def sha_exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: sha256 digest -> group size + canonical (min) id.
    Only the 32-byte digest shuffles, never the document payload."""
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def token_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct n-token shingles per document: (id, shingle).

    The token array is materialized ONCE per row before the shingle
    transform: lambda bodies are not subexpression-eliminated, so writing
    ``slice(split(text), i, n)`` inside the transform re-splits the text
    per shingle index — O(tokens²) splits per document (measured: the LSH
    signature build at sf0.1 drops 6.6s -> 4.3s, the shingle self-join
    7.1s -> 5.7s)."""
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_w")) - n),
        lambda i: F.array_join(F.slice(F.col("_w"), i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col), w.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: float | None = 0.5,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """All-pairs n-token-shingle Jaccard similarity above ``threshold``.

    |A ∩ B| from a shingle join, |A ∪ B| = |A| + |B| - |A ∩ B|.
    Shingles occurring in > max_shingle_df of documents are dropped from
    BOTH the intersection and the set sizes (consistent metric; kills join
    skew from boilerplate shingles).

    ``prefix_filter`` enables the AllPairs/PPJoin prefix principle: under a
    global rarity order, two sets with Jaccard >= t MUST share a shingle in
    their first ``|A| - ceil(t*|A|) + 1`` shingles — so the candidate join
    runs on the (1-t)-sized prefixes only (~(1-t)^2 of the pair blow-up),
    and candidates are verified exactly against the full per-doc shingle
    arrays JVM-side (array_intersect). Lossless: the final predicate is the
    same exact Jaccard either way. This is the 100 TB path — the full
    shingle self-join's pair explosion never materializes.

    Default (None) auto-selects: small corpora take the plain self-join
    (the prefix machinery's extra shuffles cost more than the join saves
    below ~100K docs); large corpora take the prefix path, where the
    quadratic pair blow-up is the thing that matters.
    """
    # docs.count() is an eager full-scan job — only pay for it when a branch
    # actually needs the cardinality (auto-select or the relative df cap)
    n_docs: int | None = None
    if prefix_filter is None:
        n_docs = docs.count()
        prefix_filter = n_docs > 100_000
    sh = token_shingles(docs, text_col, id_col, n)
    if max_shingle_df is not None:
        if n_docs is None:
            n_docs = docs.count()
        common = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df * n_docs)
            .select("shingle")
        )
        # bounded broadcast: shingles with df > f*n_docs number at most
        # total_shingles/(f*n_docs) ~= avg_doc_len/f — independent of
        # corpus size, so the hint survives any scale-up.
        sh = sh.join(F.broadcast(common), "shingle", "left_anti")
    from drug_target_discovery_spark.caching import scoped_cache

    # intra-plan diamond: sh feeds sizes + both join sides (and, on the
    # prefix path, df_tbl/ordered/sets). Query-scoped — harness loops
    # release it after the result is consumed.
    sh = scoped_cache(sh)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    if not prefix_filter:
        a = sh.select(F.col(id_col).alias("d1"), "shingle")
        b = sh.select(F.col(id_col).alias("d2"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("d1") < F.col("d2"))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("k"))
        )
        return (
            inter.join(sizes.withColumnsRenamed({"doc_id": "d1", "sz": "s1"}), "d1")
            .join(sizes.withColumnsRenamed({"doc_id": "d2", "sz": "s2"}), "d2")
            .withColumn("jaccard", F.col("k") / (F.col("s1") + F.col("s2") - F.col("k")))
            .filter(F.col("jaccard") > threshold)
            .select("d1", "d2", "jaccard", F.col("k").alias("n_common"))
        )

    from pyspark.sql import Window as W

    # canonical rarity order (global df asc, shingle asc): rare shingles
    # first makes prefixes maximally selective
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w_doc = W.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("shingle"))
    ordered = (
        sh.join(df_tbl, "shingle")
        .withColumn("_pos", F.row_number().over(w_doc))
        .join(sizes, id_col)
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = ordered.filter(F.col("_pos") <= prefix_len).select(id_col, "shingle")
    cand = (
        prefix.select(F.col(id_col).alias("d1"), "shingle")
        .join(prefix.select(F.col(id_col).alias("d2"), "shingle"), "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # exact verification: per-doc sorted shingle arrays, JVM array_intersect
    return _score_candidate_pairs(sh, cand, id_col, threshold)


def _score_candidate_pairs(
    sh: DataFrame, cand: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact shingle-Jaccard scoring of a candidate (d1, d2) set: one sorted
    shingle array per doc, one JVM ``array_intersect`` per pair. The single
    home of the verification metric — shared by the prefix-filtered ngram
    path and ``jaccard_verify_pairs`` so the two chains cannot diverge."""
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("_toks"),
        F.count(F.lit(1)).alias("_sz"),
    )
    s1 = sets.select(
        F.col(id_col).alias("d1"), F.col("_toks").alias("_t1"), F.col("_sz").alias("_s1")
    )
    s2 = sets.select(
        F.col(id_col).alias("d2"), F.col("_toks").alias("_t2"), F.col("_sz").alias("_s2")
    )
    k = F.size(F.array_intersect("_t1", "_t2"))
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("_k", k)
        .withColumn("jaccard", F.col("_k") / (F.col("_s1") + F.col("_s2") - F.col("_k")))
        .filter(F.col("jaccard") > threshold)
        .select("d1", "d2", "jaccard", F.col("_k").alias("n_common"))
    )


def _minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a odd, b arbitrary, both < 2^31)
    from a fixed LCG (public-domain constants) — the oracle SQL embeds the
    same literal values, so both engines evaluate the identical hash family."""
    coeffs = []
    state = seed & 0xFFFFFFFF
    for _ in range(num_hashes):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        a = (state % ((1 << 31) - 2)) | 1
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        b = state % ((1 << 31) - 1)
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document, long format (id, hash_idx, minhash).

    The i-th permutation is h_i(x) = (a_i * (x mod 2^30) + b_i) mod (2^31-1):
    the shingle hash is folded to 30 bits so a*h fits signed int64 in BOTH
    engines (no silent overflow divergence); 2^-30 fold-collision odds are
    irrelevant for dedup banding.

    Physical shape: ONE aggregation with num_hashes min columns (map-side
    partial min means only #docs x num_hashes longs ever shuffle), then a
    zero-shuffle ``stack`` to long format — never an explode of
    #shingles x num_hashes rows."""
    sh = token_shingles(docs, text_col, id_col, n)
    return minhash_signatures_from_shingles(
        sh, id_col=id_col, num_hashes=num_hashes, seed=seed
    )


def minhash_signatures_from_shingles(
    shingles: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """`minhash_signatures` over an already-built distinct (id, shingle)
    table — split out (optimization r13) so a sweep-scoped raw-shingle
    memo can feed BOTH the signature build and the exact-pairs self-join
    instead of each reconstructing the shingle stream from text."""
    coeffs = _minhash_coeffs(num_hashes, seed)
    p = (1 << 31) - 1
    h30 = (F.expr(MD5_INT_SPARK.format(col="shingle")) % (1 << 30)).alias("h")
    sh = shingles.select(id_col, h30)
    aggs = [
        F.min((F.col("h") * a + b) % p).alias(f"_m{i}") for i, (a, b) in enumerate(coeffs)
    ]
    wide = sh.groupBy(id_col).agg(*aggs)
    stack = (
        f"stack({num_hashes}, "
        + ", ".join(f"{i}, _m{i}" for i in range(num_hashes))
        + ") AS (hash_idx, minhash)"
    )
    return wide.select(id_col, F.expr(stack))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the long-format signature and emit candidate pairs sharing any
    band bucket. Bucket key = (band, sum-combined row hashes) — equal full
    bands always collide; unequal bands collide only when their minhash sums
    coincide mod M61 (rare false positives, filtered by the downstream
    Jaccard verification and mirrored in the oracle). Join is bucket-local:
    the 100 TB-safe path.

    The band count is determined by the signature itself
    (num_hashes / rows_per_band) — it is not an independent knob."""
    sig = signatures.withColumn("band", (F.col("hash_idx") / rows_per_band).cast("int"))
    band_key = sig.groupBy(id_col, "band").agg(
        # order-independent combine of the band's minhashes
        (F.sum("minhash") % MERSENNE61).alias("bsum"),
        F.count(F.lit(1)).alias("_n"),
    ).filter(F.col("_n") == rows_per_band)
    a = band_key.select(F.col(id_col).alias("d1"), "band", "bsum")
    b = band_key.select(F.col(id_col).alias("d2"), "band", "bsum")
    return (
        a.join(b, ["band", "bsum"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash document fingerprint: per bit, sum +1/-1 over token-hash bits;
    fingerprint = sum of (bit_set << bit). Explode tokens x bits -> two
    aggregations. Width constraint: ``bits <= 60`` — that is all the entropy
    the 15-hex-digit md5 prefix hash carries (and it keeps the fingerprint
    sign-safe in int64). Prefer the full 60 (the callers' _SH_BITS): width
    is what keeps banded near-dup joins sub-quadratic, since bucket
    occupancy is N / 2^(bits/blocks) — see simhash_near_dups.

    Optimization r13 note: a single wide aggregate with ``bits``
    conditional-sum columns (the minhash_signatures idiom) was tried and
    REVERTED — 60 sum() aggregates evaluated per token row cost far more
    than the explode's row expansion here (isolated A/B at sf0.1:
    wide-agg 20.4/9.4/10.9s vs this form 4.7/2.3/2.7s cold/warm/warm;
    simhash_near_dups 9.6/8.0/6.3 vs 4.0/2.4/2.0). The explode shuffles
    partial-aggregated (doc, bit) votes, not the raw token stream, so
    the two-level aggregate was already map-side-collapsed."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.expr(MD5_INT_SPARK.format(col="tok"))
    toks = toks.select(id_col, h.alias("h"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    tb = toks.select(id_col, "h", bit)
    # SQL shiftright/shiftleft accept a column shift amount (the DataFrame
    # API functions require a literal)
    votes = tb.groupBy(id_col, "bit").agg(
        F.sum(
            F.when(F.expr("shiftright(h, bit)").bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias("vote")
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def jaccard_verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard verification of a GIVEN candidate pair set
    (d1, d2): returns the pairs with jaccard > threshold plus the score.

    The cheap half of the LSH chain done right: shingles are built only
    for docs that appear in some pair, collected into one sorted array per
    doc, and each pair is scored with a single JVM ``array_intersect`` —
    work is O(|pairs| * doc_len), never a shingle x shingle self-join
    among the members (which re-explodes every co-occurring shingle pair
    and was ~2x slower at sf0.1). Docs with fewer than ``n`` tokens have
    no shingles and drop out (inner joins), matching the oracle's
    shingles CTE semantics."""
    members = (
        pairs.select(F.col("d1").alias(id_col))
        .union(pairs.select("d2"))
        .distinct()
    )
    # members grows with the corpus's near-dup incidence, so no forced
    # broadcast: AQE broadcasts the semi-join side while it fits and falls
    # back to a keyed shuffle beyond the threshold.
    docs_cand = docs.join(members, id_col, "left_semi")
    sh = token_shingles(docs_cand, text_col, id_col, n)
    return _score_candidate_pairs(sh, pairs, id_col, threshold)
