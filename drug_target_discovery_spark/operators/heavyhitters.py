"""Exact distributed heavy hitters: two-pass Misra-Gries (SURVEY §2.12 [EXT]).

Production LLM-data pipelines need "which tokens/domains/urls dominate the
corpus" at 100 TB, where a plain ``GROUP BY token`` shuffles every token
occurrence. The classical fix (Misra-Gries 1982; mergeable-summaries form,
Agarwal et al., PODS 2012) runs in two passes:

pass 1 (map-only)  — each partition streams its tokens through a k-counter
                     Misra-Gries summary and emits <= k (token, lower-bound)
                     rows plus one partition-total row. Nothing shuffles but
                     the summaries: O(k * partitions) rows regardless of
                     corpus size.
pass 2 (candidates)— any token with global count > N/(k+1) is GUARANTEED to
                     survive some partition summary (if f_p <= n_p/(k+1) in
                     every partition, summing gives f <= N/(k+1) — the
                     pigeonhole step), so the union of summary keys is a
                     superset of the heavy hitters. Re-count exactly, with
                     the token stream semi-joined (broadcast) to the
                     candidate set first: the exact aggregation only ever
                     shuffles candidate tokens.

The output is therefore EXACT — every token with count*(k+1) > N, with its
exact count — not an estimate, which is what makes it oracle-checkable by a
plain SQL GROUP BY/HAVING (the sketch bounds which keys can win, not their
reported counts).

No reference-engine counterpart (the reference has no sketch tier); this is
part of the LLM-pipeline surface the build brief adds beyond
/root/reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(
    docs: DataFrame, text_col: str = "text", k: int = 1024
) -> DataFrame:
    """Pass 1: per-partition k-counter Misra-Gries summaries over
    whitespace tokens.

    Output schema ``token STRING, lb BIGINT``: <= k summary rows per
    partition (lb = the counter's residual, a lower bound on the partition
    count) plus exactly one ``token IS NULL`` row whose lb is the
    partition's total token count — so a single tiny table carries both
    the candidate keys and the addends of N.

    Arrow-batched: tokenization is vectorized pandas (split/explode/
    value_counts); only the merge of <= |batch vocab| counter updates runs
    as a Python loop. Batch-exact counts merged into the running summary
    then shrunk to k counters by subtracting the (k+1)-th largest residual
    is the MERGE operation of Agarwal et al. — same error bound
    (<= n_p/(k+1)) as item-at-a-time MG, far fewer Python iterations.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for batch in batches:
            # dropna BEFORE astype(str): a NULL text cell must contribute
            # nothing, not a literal "None" token (which would inflate the
            # partition total N relative to the JVM-side recount pass)
            toks = batch[text_col].dropna().astype(str).str.split(" ").explode()
            toks = toks[(toks != "") & toks.notna()]
            total += len(toks)
            for tok, c in toks.value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest residual from everything;
                # <= k counters stay strictly positive
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - dec for t, c in counters.items() if c > dec}
        out = pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "lb": list(counters.values()) + [total],
            }
        )
        yield out.astype({"lb": "int64"})

    return docs.select(text_col).mapInPandas(summarize, "token string, lb long")


def exact_heavy_hitters(
    docs: DataFrame, text_col: str = "text", k: int = 1024
) -> DataFrame:
    """Two-pass exact heavy hitters: every token with count*(k+1) > N.

    Returns ``token, cnt`` with exact global counts. The second pass is
    JVM-side end to end: codegen'd split/explode, broadcast semi-join
    against the candidate set (O(k * partitions) keys), partial-aggregated
    groupBy — the full token stream is never shuffled.
    """
    from drug_target_discovery_spark.caching import scoped_cache

    partials = scoped_cache(misra_gries_partials(docs, text_col, k))
    candidates = partials.filter(F.col("token").isNotNull()).select("token").distinct()
    n_row = partials.filter(F.col("token").isNull()).agg(
        F.sum("lb").alias("_n_total")
    )
    toks = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_row))
        .filter(F.col("cnt") * (k + 1) > F.col("_n_total"))
        .select("token", "cnt")
    )
