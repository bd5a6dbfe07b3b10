"""Bin-bucketed non-equi range join (point-in-interval, NO equi key).

Spark executes a pure non-equi join predicate (``fact.v BETWEEN r.lo AND
r.hi`` with no equality conjunct) as BroadcastNestedLoopJoin — every fact
row compared against every range, O(|fact| x |ranges|) work that is the
classic silent killer of band-lookup joins at scale (the repo's other
interval joins — events_in_purchase_hour, interval_join — always carry a
user/key equality, so the hash join carries them; this operator covers
the keyless case: value -> band, timestamp -> maintenance window, IP ->
CIDR block).

The standard fix, implemented here: quantize the domain into fixed-width
bins; each range explodes into the bins it covers, each fact row maps to
exactly ONE bin, and the join becomes an equi hash join on the bin id
with the exact BETWEEN re-checked as a post-filter. Work drops to
O(|fact| + sum(range_width)/bin_width x |ranges| + matches) and the
shuffle is keyed — every 100 TB engine's range-join strategy (e.g. the
binning join Databricks documents as its range-join optimization hint)
is this shape.

No duplicates by construction: a fact row lives in one bin, and a
(fact, range) pair can only meet in that one bin no matter how many bins
the range spans.

Bin-width choice: ~ the MEDIAN range width. Too narrow -> the ranges
side explodes into many bins (replication cost); too wide -> many
non-matching pairs survive to the post-filter (compare cost). Both ends
stay correct — the parameter trades replication against filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guarded_bin_sequence(
    lo_col: str, hi_col: str, bin_width: float, max_bins_per_range: int
) -> Column:
    """The ranges-side bin fan-out expression: array of covered bin ids,
    raise_error past the fuse, NULL (dropped by explode) for inverted
    (lo > hi) or NULL-bounded ranges — neither can match under BETWEEN.

    Module-level so tests can pin the fan-out shape directly (the join
    output can't distinguish a dropped inverted range from one that
    exploded into a descending mega-sequence and was post-filtered)."""

    def _bin(c: Column) -> Column:
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    # Branch order matters for the NULL-bounds contract: a NULL lo/hi
    # makes n_bins NULL, both when-conditions evaluate NULL and fall
    # through to otherwise, and sequence(NULL, ...) yields NULL which
    # explode drops — so NULL-bounded ranges never match (SQL BETWEEN
    # semantics) and never trip the fuse. The inverted form (when(ok,
    # seq)) would instead route NULL bounds into raise_error.
    #
    # The n_bins < 1 branch (ADVICE r8): an INVERTED range (lo > hi) has
    # non-positive n_bins, so the oversize fuse never fires — but
    # sequence(start, stop) defaults to step -1 when start > stop, so a
    # reversed mega-span would still explode into millions of descending
    # bins that the BETWEEN post-filter then discards one by one. Under
    # BETWEEN semantics lo > hi can never match anything, so route it to
    # a NULL sequence (dropped by explode): correct, and the fuse's OOM
    # protection now covers the bad-data shape it targets.
    n_bins = _bin(F.col(hi_col)) - _bin(F.col(lo_col)) + F.lit(1)
    return (
        F.when(
            n_bins > F.lit(int(max_bins_per_range)),
            F.raise_error(
                F.concat(
                    F.lit("binned_range_join: range spans "),
                    n_bins.cast("string"),
                    F.lit(
                        f" bins > max_bins_per_range={max_bins_per_range} "
                        f"at bin_width={bin_width} (range ["
                    ),
                    F.col(lo_col).cast("string"),
                    F.lit(", "),
                    F.col(hi_col).cast("string"),
                    F.lit(
                        "]); widen bin_width or raise max_bins_per_range"
                    ),
                )
            ).cast("array<long>"),
        )
        .when(n_bins < F.lit(1), F.lit(None).cast("array<long>"))
        .otherwise(F.sequence(_bin(F.col(lo_col)), _bin(F.col(hi_col))))
    )


def binned_range_join(
    fact: DataFrame,
    ranges: DataFrame,
    fact_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins_per_range: int = 100_000,
) -> DataFrame:
    """INNER join of ``fact`` rows to every ``ranges`` row whose
    ``[lo_col, hi_col]`` (inclusive both ends) contains ``fact_col``,
    without a nested-loop: equi hash join on the bin id + exact
    post-filter. Output columns = fact's then ranges' (names must be
    disjoint). NULL values / bounds never match (SQL BETWEEN
    semantics).

    ``max_bins_per_range`` is the mis-parameterization fuse (ADVICE r7):
    one wide range with a too-small ``bin_width`` would otherwise
    silently generate (hi-lo)/bin_width sequence elements per range —
    billions at the pathological end, where Spark's ``sequence`` hard-
    fails near 2^31 and executors OOM long before. The guard raises in-
    plan (first task that hits an oversized range, with the offending
    span and the bin_width that would fix it) instead of letting a bad
    parameter surface as an opaque job failure; raise it explicitly for
    legitimately huge spans."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if max_bins_per_range <= 0:
        raise ValueError("max_bins_per_range must be positive")

    def _bin(c: Column) -> Column:
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    guarded_seq = _guarded_bin_sequence(
        lo_col, hi_col, bin_width, max_bins_per_range
    )
    r = ranges.withColumn("_bin", F.explode(guarded_seq))
    f = fact.withColumn("_bin", _bin(F.col(fact_col)))
    return (
        f.join(r, "_bin")
        .filter(
            (F.col(fact_col) >= F.col(lo_col))
            & (F.col(fact_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
