"""As-of (temporal) join [EXT] — not in the reference (SURVEY §2.4 notes
anything beyond equi/theta-on-rank is extension surface), but essential for
event/feature pipelines.

Implementation is the scalable union trick, NOT a range self-join:
tag both sides, union on aligned schemas, one window per key ordered by
(ts, side) carrying the last right-side attributes forward
(``last_value IGNORE NULLS``), then keep left rows. Cost: ONE shuffle on
the key — a naive inequality join would be O(n_left x n_right) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts within the same key ``on`` (and within
    ``tolerance_seconds`` when given). Right columns arrive as
    ``asof_<col>`` plus ``asof_ts_s`` (epoch seconds, NULL if no match)."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt_cols = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    rt = (
        right.select(on, F.col(right_ts).alias("_ts"), *rt_cols)
        .withColumn("_side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in right_cols:
        if f"_r_{c}" not in lt.columns:
            lt = lt.withColumn(f"_r_{c}", F.lit(None))
    cols = [on, "_ts", "_side"] + [c for c in left.columns if c not in (on,)] + [
        f"_r_{c}" for c in right_cols
    ]
    u = lt.select(*cols).unionByName(rt.select(*cols))

    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn(
        "_asof_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    )
    for c in right_cols:
        carried = carried.withColumn(
            f"_carry_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True).over(w),
        )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_asof_ts").isNotNull()
            & (F.col("_ts").cast("long") - F.col("_asof_ts").cast("long") <= tolerance_seconds)
        )
        out = out.withColumn("_asof_ts", F.when(in_tol, F.col("_asof_ts")))
        for c in right_cols:
            out = out.withColumn(f"_carry_{c}", F.when(in_tol, F.col(f"_carry_{c}")))
    result = out.select(
        on,
        *[c for c in left.columns if c != on],
        F.unix_timestamp("_asof_ts").alias("asof_ts_s"),
        *[F.col(f"_carry_{c}").alias(f"asof_{c}") for c in right_cols],
    )
    return result
