"""Round-12 lane operators: the BPE trainer's two production scale forms.

``round9.bpe_top_merges`` (the sequential distributed trainer) runs ONE
driver round-trip per merge — exactly right for the lane's k=10 evidence,
and measurably schedule-bound already at k=10 (the x30-flat epoch probe,
SCALING.md). A real tokenizer is k = 32K-100K merges, where a constant
~0.3-0.5 s/merge driver round becomes hours — the one place the epoch
composition's 100 TB story still hand-waved (VERDICT r11 #5). This module
adds the two forms a production pipeline actually runs, both VALUE-EQUAL
to the sequential trainer (pinned in tests/test_round12_ops.py and
tools/lane_check.py):

- ``bpe_top_merges_batched``: exact distributed training with j merges
  per driver round. Per round, ONE vocabulary-bounded pair-count
  aggregate is collected to its top-M rows and a PROVABLY-SAFE batch is
  chosen greedily on the driver (see ``_safe_batch`` for the exactness
  argument); the whole batch is applied as one chained JVM-side
  projection and cached once. Worst case degenerates to the sequential
  trainer (batch size 1); on Zipf-shaped pair spectra early rounds batch
  tens of merges.

- ``bpe_top_merges_local``: the HF-tokenizers / SentencePiece shape —
  the corpus-sized work (whitespace tokenize -> distinct-word counts) is
  ONE distributed aggregate, and the k-merge loop runs driver-local over
  the collected word-count table with a lazy-deletion heap and
  incremental pair updates (only words containing the merged pair are
  touched). Threshold-gated on the distinct-word count (the bigram-LM
  broadcast-ceiling pattern, round10.py): above ``max_vocab_rows`` it
  raises and the batched distributed form is the documented fallback.
  At k=100K this is seconds of driver CPU after the single scan — the
  form every production tokenizer trainer uses.

Reference parity note: the reference engine (pipeline2.py) has no
tokenizer-training operator; this family extends SURVEY.md §2.12 (BPE
train+apply bullets). Algorithm: Sennrich, Haddow & Birch 2016.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drug_target_discovery_spark.sources.tables import load_table

_BPE_SCHEMA = (
    "merge_rank int, left string, right string, merged string, pair_count long"
)

# Distinct-word ceiling for the driver-local trainer (the bigram-LM
# broadcast-ceiling rationale, round10.py: ~2M short strings + counts is
# comfortably inside driver memory; past it, collect() is the wrong tool
# and the batched distributed trainer is the fallback).
_LOCAL_VOCAB_CEILING = 2_000_000


def _word_counts(spark: SparkSession, sf_dir: str, docs: "DataFrame | None"):
    """The shared corpus scan: whitespace tokenize -> distinct-word
    counts (map-side combined) — byte-identical to the sequential
    trainer's pass so all three forms train on the same table."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents").select("text")
    else:
        docs = docs.select("text")
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Batched distributed trainer
# ---------------------------------------------------------------------------


def _safe_batch(rows, m: int):
    """Greedy prefix of the rank-ordered top-M pair rows that sequential
    BPE is GUARANTEED to pick in this exact order. Exactness argument:

    Applying merge p = (l, r) can only change the counts of pairs that
    SHARE a symbol with p (occurrences absorbed into the merged token),
    and every pair it CREATES — (x, lr) needs an (x, l) adjacency,
    (lr, y) needs (r, y), (lr, lr) needs (r, l), and for l == r the
    created (ll, ll) needs (l, l) itself — is bounded by the pre-batch
    count of one of those sharers. Sharers outside the collected top-M
    are bounded by the M-th count. So after taking p, let S be the
    maximum pre-batch count over [top-M pairs sharing a symbol with p
    (p itself only when l == r)] U [the M-th count]: every pair whose
    count a sequential run could have changed or created so far counts
    <= S. A later candidate is safe iff its symbols are disjoint from
    every taken pair's (its own count is then unchanged) AND its count
    is STRICTLY above S (it outranks every changed/created pair, ties
    impossible). The first candidate is the global argmax including the
    lex tie-break (the aggregate's own ordering), so it is always taken.
    When a candidate fails either condition the batch ENDS (skipping
    would reorder against the sequential rule). Recorded pair_counts are
    the pre-batch counts, which equal each taken pair's count at its
    sequential moment (disjointness). Token-collision safety — a merged
    token string equal to an EXISTING vocab symbol can INFLATE that
    symbol's pair counts, which S (a bound on decreases/creations) does
    not cover — is handled by the caller, which cuts the batch after the
    first take whose merged token collides (checked against the live
    vocab in one filter job)."""
    if not rows:
        return []
    n_m = int(rows[-1]["n"]) if len(rows) >= m else 0
    taken: list[tuple[str, str, int]] = []
    used: set[str] = set()
    bound = 0
    for row in rows:
        l, r, n = row["l"], row["r"], int(row["n"])
        if taken:
            if n <= bound or l in used or r in used:
                break
        taken.append((l, r, n))
        sharer = max(
            (
                int(rr["n"])
                for rr in rows
                if (rr["l"] in (l, r) or rr["r"] in (l, r))
                and not (rr["l"] == l and rr["r"] == r)
            ),
            default=0,
        )
        bound = max(bound, sharer, n_m)
        if l == r:  # created (ll, ll) is bounded only by this pair itself
            bound = max(bound, n)
        used.update((l, r))
    return taken


def bpe_top_merges_batched(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    docs: "DataFrame | None" = None,
    m: int = 1024,
    stats: "dict | None" = None,
) -> DataFrame:
    """Exact batched BPE training: identical output to
    ``round9.bpe_top_merges`` (same deterministic merge rule, same
    schema), with j >= 1 merges learned per driver round instead of 1.

    Scale design: the corpus is scanned ONCE (the shared word-count
    aggregate); each ROUND then costs one vocabulary-bounded pair-count
    aggregate collected to its top-M rows, one tiny symbol-collision
    filter job over the <= batch candidate tokens, and one chained
    ``_bpe_merge_fold`` projection (cached, superseding generation
    released) applying the whole batch. The provably-safe batch rule
    (``_safe_batch``) keeps the result bit-identical to sequential
    training; on Zipf-shaped pair spectra the strictly-dominant head of
    the distribution batches tens of merges per round early on and
    degenerates gracefully to 1/round near ties — measured in
    tools/round9_probe.py (bpek) and read in SCALING.md. This is the
    distributed fallback ABOVE the driver-local trainer's vocab ceiling;
    under the ceiling prefer ``bpe_top_merges_local``.

    ``stats`` (probe instrumentation): when a dict is passed, it is
    filled with ``rounds`` (driver rounds used) and ``batch_sizes`` (the
    per-round merge counts) — how tools/round9_probe.py's bpek probe
    reads the batching efficiency without touching the result plan."""
    from drug_target_discovery_spark.caching import track
    from drug_target_discovery_spark.queries.round9 import _bpe_merge_fold

    words = _word_counts(spark, sf_dir, docs)
    vocab = words.select(
        F.expr("filter(split(w, ''), s -> s != '')").alias("syms"), "cnt"
    ).cache()
    merges: list[tuple[int, str, str, str, int]] = []
    batch_sizes: list[int] = []
    while len(merges) < k:
        rows = (
            vocab.select(
                F.explode(
                    F.expr(
                        "zip_with(slice(syms, 1, size(syms) - 1),"
                        " slice(syms, 2, size(syms) - 1),"
                        " (a, b) -> struct(a AS l, b AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(m)
            .collect()
        )
        rows = [row for row in rows if int(row["n"]) > 0]
        batch = _safe_batch(rows, m)[: k - len(merges)]
        if not batch:
            break
        # Collision cut (see _safe_batch docstring): one pushdown filter
        # over the live vocab's symbols — candidates are few, the filter
        # is an isin over <= |batch| strings.
        tokens = [l + r for (l, r, _) in batch]
        colliding = {
            row["s"]
            for row in vocab.select(F.explode("syms").alias("s"))
            .filter(F.col("s").isin(tokens))
            .distinct()
            .collect()
        }
        if colliding:
            cut = next(
                i for i, (l, r, _) in enumerate(batch) if l + r in colliding
            )
            batch = batch[: cut + 1]
        base = len(merges)
        merges.extend(
            (base + i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(batch)
        )
        batch_sizes.append(len(batch))
        col = F.col("syms")
        for l, r, _ in batch:
            col = _bpe_merge_fold(col, l, r)
        new_vocab = vocab.select(col.alias("syms"), "cnt").cache()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    track(vocab)
    if stats is not None:
        stats["rounds"] = len(batch_sizes)
        stats["batch_sizes"] = batch_sizes
    if not merges:
        return spark.createDataFrame([], _BPE_SCHEMA)
    return spark.createDataFrame(merges, _BPE_SCHEMA)


# ---------------------------------------------------------------------------
# Driver-local trainer (threshold-gated)
# ---------------------------------------------------------------------------


def _local_bpe(word_counts, k: int):
    """Exact incremental BPE over a (word, count) table — the same
    deterministic rule as ``round9.bpe_top_merges`` and the pytest
    python oracle (overlapping adjacent pair counting; argmax by
    (count desc, (left, right) lex asc); exact left-to-right
    non-overlapping application), but each merge touches ONLY the words
    containing the merged pair, via a pair -> word-ids index and a
    lazy-deletion heap, instead of a full vocabulary recount. O(total
    pair updates) across all k merges — the standard production-trainer
    inner loop."""
    words = [list(w) for w, _ in word_counts]
    cnts = [int(c) for _, c in word_counts]
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def _add_word(i: int, sign: int) -> None:
        c = cnts[i] * sign
        syms = words[i]
        for p in zip(syms, syms[1:]):
            pair_count[p] = pair_count.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        _add_word(i, +1)
    for p, n in pair_count.items():
        heap.append((-n, p))
    heapq.heapify(heap)

    def _apply(syms, le, ri):
        out, pend = [], None
        for x in syms:
            if pend is None:
                pend = x
            elif pend == le and x == ri:
                out.append(le + ri)
                pend = None
            else:
                out.append(pend)
                pend = x
        if pend is not None:
            out.append(pend)
        return out

    merges = []
    for rank in range(1, k + 1):
        while heap and pair_count.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)  # stale lazy-deletion entry
        if not heap or -heap[0][0] <= 0:
            break
        n, (le, ri) = -heap[0][0], heap[0][1]
        merges.append((rank, le, ri, le + ri, n))
        touched = sorted(pair_words.pop((le, ri), set()))
        changed: set[tuple[str, str]] = set()
        for i in touched:
            before = set(zip(words[i], words[i][1:]))
            _add_word(i, -1)
            words[i] = _apply(words[i], le, ri)
            _add_word(i, +1)
            changed |= before | set(zip(words[i], words[i][1:]))
        for p in changed:
            if pair_count.get(p, 0) > 0:
                heapq.heappush(heap, (-pair_count[p], p))
            else:
                pair_count.pop(p, None)
                pair_words.pop(p, None)
    return merges


def bpe_top_merges_local(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    docs: "DataFrame | None" = None,
    max_vocab_rows: int = _LOCAL_VOCAB_CEILING,
) -> DataFrame:
    """Driver-local BPE training behind ONE distributed aggregate — the
    shape every production tokenizer trainer uses (HF tokenizers,
    SentencePiece): the 100 TB corpus reduces to its distinct-word count
    table in one map-side-combined scan; the k-merge loop is then pure
    vocabulary-sized driver CPU (incremental heap, ``_local_bpe``), so
    k = 100K merges cost seconds instead of 100K driver round-trips.

    Threshold-gated (the graph family's driver-exact-strategy valve):
    raises ValueError when the corpus holds more than ``max_vocab_rows``
    distinct words — past the ceiling the collect is the wrong tool and
    ``bpe_top_merges_batched`` is the documented distributed fallback.
    Value-equal to ``round9.bpe_top_merges`` (pinned at k up to 1000
    against the independent python oracle in tests/test_round12_ops.py
    and tools/lane_check.py)."""
    words = _word_counts(spark, sf_dir, docs)
    rows = words.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"bpe_top_merges_local: corpus holds > {max_vocab_rows} distinct "
            "words — over the driver-collect ceiling; use "
            "bpe_top_merges_batched (distributed) instead"
        )
    # deterministic driver-side order (collect order is partition-luck)
    word_counts = sorted((r["w"], int(r["cnt"])) for r in rows)
    merges = _local_bpe(word_counts, k)
    if not merges:
        return spark.createDataFrame([], _BPE_SCHEMA)
    return spark.createDataFrame(merges, _BPE_SCHEMA)
