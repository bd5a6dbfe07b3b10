"""Event-time operators, batch- and stream-capable (SURVEY §2.10 [EXT]).

Each transform takes a DataFrame that may come from ``spark.read`` (batch)
or ``spark.readStream`` (Structured Streaming) — the logical plan is
identical; only the sink differs. Watermarks are applied when requested and
are required for append-mode streaming aggregation; on batch inputs
``withWatermark`` is a no-op, so the same function serves both paths
(tests/test_streaming.py runs both and compares).

Event-time semantics are deterministic on a static table, which is what
makes these oracle-checkable in DuckDB (time_bucket etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time window
    aggregation per event_type: count + sum(value). Streaming: pass a
    watermark (late rows beyond it are dropped by the engine)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_builtin(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows via the built-in ``session_window`` (merging state
    machine — the streaming-native form). Batch output matches the
    lag/cumsum formulation in queries/events.py (asserted in tests)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


USER_TOTALS_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, s DOUBLE"


def stateful_user_totals(stream_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator (SURVEY §2.10:
    applyInPandasWithState): running per-user event count + value sum,
    state carried across micro-batches. The batch-equivalent is a plain
    groupBy aggregate — tests assert the streamed final state matches it.

    This is the template for reference-style accumulating analytics over an
    unbounded stream (per-gene running statistics, per-user profiles):
    state is a tiny fixed-width tuple per key, never the event history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        stream_df.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_user_totals_tws(stream_df: DataFrame) -> DataFrame:
    """The same running per-user totals through ``transformWithStateInPandas``
    — Spark 4's arbitrary-stateful-processing successor to
    ``applyInPandasWithState`` (typed state handles, timers, TTL; here a
    single ValueState tuple per key). Keeping both forms documents the
    migration path; the parity test pins them to the same batch aggregate.

    RUNTIME GATE: Spark's TWS state protocol needs ``google.protobuf``
    (the driver worker imports its generated StateMessage stubs). This
    container ships without protobuf, so the operator raises
    NotImplementedError here and the parity test skips; on a cluster with
    protobuf installed it runs as-is (the applyInPandasWithState twin above
    is the dependency-free form this runtime executes).
    """
    import pandas as pd

    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (Spark TWS "
            "state protocol); use stateful_user_totals in this runtime"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return (
        stream_df.groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=USER_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Exactly-once by key: batch ``dropDuplicates``; with a watermark on a
    stream this becomes ``dropDuplicatesWithinWatermark`` (bounded state —
    the only form that survives an unbounded stream)."""
    keys = keys or ["event_id"]
    if watermark is not None:
        df = events.withWatermark(ts_col, watermark)
        if df.isStreaming:
            return df.dropDuplicatesWithinWatermark(keys)
        return df.dropDuplicates(keys)
    return events.dropDuplicates(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str = "user_id",
    right_on: str = "r_user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Time-interval (attribution-window) join: each left row pairs with
    every right row of the same key whose timestamp falls in
    ``[left_ts - lookback, left_ts]``.

    Batch and stream share the plan. As a stream-stream join, Spark uses
    the watermark plus BOTH time bounds to expire buffered state — per-key
    state is bounded by (watermark delay + lookback) of rows, the only
    join shape that survives two unbounded streams. ``how='left_outer'``
    additionally requires the watermark (outer rows emit once the
    watermark passes their window); inner results emit as matches arrive.

    The two sides must carry disjoint column names (key and ts included —
    rename before calling); the output keeps all of both, so downstream
    aggregation can group by the left key without ambiguity. Batch plan:
    one hash exchange per side on the equality key; the range predicate is
    a post-match filter, so the worst case is per-key purchase x view
    pairs inside the window — never a cross product.
    """
    l, r = left, right
    if watermark is not None:
        l = l.withWatermark(left_ts, watermark)
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_on) == F.col(right_on))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return l.join(r, cond, how)


def enrich_events_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: the event stream (or its batch twin)
    joined to a STATIC dimension snapshot — the standard lookup-enrichment
    shape (user -> segment, product -> category). No watermark is needed:
    the static side holds no streaming state, and Structured Streaming
    re-evaluates the static relation per micro-batch, so a dimension
    backed by a mutable table is read at its latest snapshot each batch
    (slowly-changing enrichment for free; pin a version upstream if
    point-in-time semantics are required — see scd2_user_value_history
    for the as-of form).

    Scale: the dimension broadcasts (default) so the unbounded stream
    side never shuffles — the enrichment is map-side per micro-batch;
    pass broadcast_dim=False for dimensions beyond broadcast size (keyed
    shuffle on the stream side then applies per batch)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, how)


def idempotent_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Exactly-once parquet sink via foreachBatch + deterministic
    batch-keyed overwrite: each micro-batch writes its FULL contents to
    ``{out_dir}/batch_id=N`` with mode('overwrite'). Structured
    Streaming's foreachBatch guarantee is at-least-once with a STABLE
    batch_id across replays — a batch re-delivered after a failure
    rewrites the same directory with the same rows instead of appending
    duplicates, which upgrades the pipeline to effectively-exactly-once
    on an object store / filesystem without a transactional table format.
    (This is the pattern table formats internalize; the test pins the
    replay-idempotence property by re-invoking the batch function.)

    Preconditions for the exactly-once claim (ADVICE r7):

    - The plan upstream of the sink must be DETERMINISTIC across
      replays — no rand()/uuid()/current_timestamp() or nondeterministic
      UDFs before the sink. A replayed batch that recomputes DIFFERENT
      rows silently overwrites the directory with the new rows; the
      batch-id keying only dedupes identical re-deliveries.
    - The per-batch overwrite (delete + rewrite) is NOT atomic to
      concurrent readers: a reader scanning ``{out_dir}`` mid-overwrite
      can observe a partially-deleted ``batch_id=N`` directory. Gate
      readers on query progress (or use a transactional table format)
      when the output is consumed while the stream runs.

    Returns (query, batch_fn) — the started availableNow query and the
    batch function itself so callers/tests can simulate a replay."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        import os

        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, write_batch
