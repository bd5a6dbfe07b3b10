"""Two-pass exact Misra-Gries heavy hitters (operators/heavyhitters.py).

The registered query's corpus has a vocabulary smaller than k, so the
summary-shrink path never fires there; these tests pin it on a skewed
fixture with vocab >> k, where correctness genuinely depends on the
pigeonhole guarantee (global heavy hitter => survives some partition
summary) rather than on "everything fit in the counters".
"""

from __future__ import annotations

import collections


from drug_target_discovery_spark.operators.heavyhitters import (
    exact_heavy_hitters,
    misra_gries_partials,
)

K = 20


def _skewed_docs(spark):
    """600 docs over a 500-token vocab: a few dominant tokens plus a long
    tail, deterministic (no RNG so the exact expectation is closed-form)."""
    rows = []
    for i in range(600):
        toks = []
        # dominant tokens: hot0 in every doc (x3), hot1 in every 2nd, ...
        for h in range(5):
            if i % (h + 1) == 0:
                toks += [f"hot{h}"] * 3
        # long tail: each doc carries 8 distinct rare tokens
        toks += [f"rare{(i * 8 + j) % 500}" for j in range(8)]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(7)


def _exact_counts(df) -> tuple[collections.Counter, int]:
    counts: collections.Counter = collections.Counter()
    for r in df.select("text").collect():
        counts.update(t for t in r["text"].split(" ") if t)
    return counts, sum(counts.values())


def test_partials_bounded_and_total(spark):
    docs = _skewed_docs(spark)
    parts = misra_gries_partials(docs, k=K).collect()
    per_part_tokens = [r for r in parts if r["token"] is not None]
    totals = [r for r in parts if r["token"] is None]
    # <= k summary rows per partition: 7 partitions * K is the global cap
    assert len(per_part_tokens) <= 7 * K
    counts, n = _exact_counts(docs)
    assert sum(r["lb"] for r in totals) == n
    # residuals are lower bounds on true counts
    true = dict(counts)
    for r in per_part_tokens:
        assert r["lb"] <= true[r["token"]]


def test_exact_heavy_hitters_matches_bruteforce(spark):
    docs = _skewed_docs(spark)
    counts, n = _exact_counts(docs)
    expected = {t: c for t, c in counts.items() if c * (K + 1) > n}
    assert expected, "fixture must produce at least one heavy hitter"
    assert len(counts) > K, "fixture must exercise the shrink path"
    got = {
        r["token"]: r["cnt"]
        for r in exact_heavy_hitters(docs, k=K).collect()
    }
    assert got == expected


def test_no_heavy_hitters_on_uniform(spark):
    # 300 docs, each a distinct token: nothing crosses N/(K+1)
    docs = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(300)], "doc_id long, text string"
    )
    assert exact_heavy_hitters(docs, k=K).count() == 0


def test_empty_and_blank_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "x x x")], "doc_id long, text string"
    )
    got = {r["token"]: r["cnt"] for r in exact_heavy_hitters(docs, k=K).collect()}
    assert got == {"x": 3}


def test_null_text_contributes_nothing(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "a a a"), (2, None), (3, "b")],
        "doc_id long, text string",
    )
    parts = misra_gries_partials(docs, k=K).collect()
    total = sum(r["lb"] for r in parts if r["token"] is None)
    assert total == 4  # 3x a + 1x b; NULLs add no "None" tokens
    got = {r["token"]: r["cnt"] for r in exact_heavy_hitters(docs, k=K).collect()}
    assert got == {"a": 3, "b": 1}
