"""Pairwise Pearson correlation over a long-format value table
(SURVEY §2.5 A7 + §2.4 J4 + §2.3 P7 — the reference's
``expr_data.T.corr()`` at pipeline2.py:702-703, re-expressed as a fused
self-join + corr aggregate).

Scale design: the reference materializes a dense K×K matrix; we never do.
The long table self-joins on the sample key (co-located shuffle on one key),
the upper triangle (``g1 < g2``) halves the pair space, and ``F.corr``
aggregates with map-side partial co-moments. Output is the sparse edge list
the downstream graph actually needs — at 100 TB the dense matrix is
impossible, the edge list is routine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_pearson(
    long_df: DataFrame,
    key: str,
    sample: str,
    value: str,
    min_periods: int = 3,
) -> DataFrame:
    """All-pairs Pearson r between keys over their common samples.

    Input: long table (key, sample, value), one row per (key, sample).
    Output: (g1, g2, r, n_samples) with g1 < g2 and n_samples >= min_periods.

    Pairs sharing fewer than ``min_periods`` samples are dropped (pandas
    corr(min_periods) semantics); constant series yield NULL r (pandas NaN —
    normalize to NULL for oracle parity, SURVEY §7.4).
    """
    a = long_df.select(
        F.col(key).alias("g1"), F.col(sample).alias("_s"), F.col(value).alias("_v1")
    )
    b = long_df.select(
        F.col(key).alias("g2"), F.col(sample).alias("_s"), F.col(value).alias("_v2")
    )
    pairs = a.join(b, "_s").filter(F.col("g1") < F.col("g2"))
    out = pairs.groupBy("g1", "g2").agg(
        F.corr("_v1", "_v2").alias("r"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    # NaN (constant series) -> NULL, then keep well-defined pairs only
    return out.withColumn(
        "r", F.when(F.isnan("r"), F.lit(None).cast("double")).otherwise(F.col("r"))
    ).filter(F.col("n_samples") >= min_periods)


def corr_edges(
    long_df: DataFrame,
    key: str,
    sample: str,
    value: str,
    threshold: float = 0.7,
    min_periods: int = 3,
) -> DataFrame:
    """Thresholded co-expression edge list (P7+G1, pipeline2.py:708-717):
    keep |r| > threshold, weight = |r|. NULL r never passes (explicit
    isNotNull guard — in Spark NaN compares greater-than, so the NaN->NULL
    normalization in pairwise_pearson matters)."""
    r = pairwise_pearson(long_df, key, sample, value, min_periods)
    return r.filter(F.col("r").isNotNull() & (F.abs("r") > threshold)).select(
        "g1", "g2", F.abs("r").alias("weight"), "r", "n_samples"
    )
