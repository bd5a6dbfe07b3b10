"""Structured Streaming parity (SURVEY §2.10): the event-time transforms
produce identical results under readStream (availableNow micro-batches) and
plain batch — the core guarantee that makes them one operator, not two."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from drug_target_discovery_spark.sources.tables import load_table
from drug_target_discovery_spark.streaming.events import (
    dedup_events,
    sessionize_builtin,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir():
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF}/events.parquet", f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _open_stream(spark, d):
    """readStream over the raw parquet (ts arrives as nano-long via
    nanosAsLong) + the same micros normalization load_table applies."""
    raw_schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(raw_schema).parquet(d)
    if dict(src.dtypes)["ts"] == "bigint":
        src = src.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    elif dict(src.dtypes)["ts"] == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _as_sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestStreamingParity:
    def test_windowed_counts_stream_equals_batch(self, spark, events_stream_dir):
        batch_src = load_table(spark, SF, "events")
        stream_src = _open_stream(spark, events_stream_dir)
        got = _run_stream(
            spark,
            windowed_event_counts(stream_src, window="1 hour", watermark="2 hours"),
            "win_counts",
        )
        expected = windowed_event_counts(batch_src, window="1 hour")
        assert _as_sorted_rows(got) == _as_sorted_rows(expected)

    def test_session_builtin_matches_gap_formulation(self, spark):
        from drug_target_discovery_spark.queries.events import session_windows_gap

        builtin = sessionize_builtin(load_table(spark, SF, "events"), gap="30 minutes")
        got = sorted(
            (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 4))
            for r in builtin.collect()
        )
        gap = session_windows_gap(spark, SF)
        expected = sorted(
            (r["user_id"], r["session_start_s"], r["n_events"], r["sum_value"])
            for r in gap.collect()
        )
        assert got == expected

    def test_interval_join_stream_equals_batch(self, spark, events_stream_dir):
        """Stream-stream time-interval join: the watermarked append-mode
        run over two readStream sides emits exactly the batch pairs."""
        from drug_target_discovery_spark.streaming.events import interval_join

        def split(src):
            p = src.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"), "ts"
            )
            v = src.filter(F.col("event_type") == "view").select(
                F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("r_ts"),
                F.col("event_id").alias("view_id"),
            )
            return p, v

        bp, bv = split(load_table(spark, SF, "events"))
        expected = interval_join(bp, bv, lookback="1 hour").select(
            "purchase_id", "view_id"
        )
        sp, sv = split(_open_stream(spark, events_stream_dir))
        joined = interval_join(
            sp, sv, lookback="1 hour", watermark="2 hours"
        ).select("purchase_id", "view_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("ij_pairs")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM ij_pairs")
        assert _as_sorted_rows(got) == _as_sorted_rows(expected)
        assert expected.count() > 0

    def test_stateful_user_totals_matches_batch(self, spark, events_stream_dir):
        """applyInPandasWithState: the last update per user equals the plain
        batch aggregate — running state across micro-batches is correct."""
        from drug_target_discovery_spark.streaming.events import stateful_user_totals

        stream_src = _open_stream(spark, events_stream_dir)
        q = (
            stateful_user_totals(stream_src)
            .writeStream.format("memory")
            .queryName("user_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"
        # update mode appends one row per user per batch: keep each user's max
        got = {
            r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
            for r in spark.sql(
                """SELECT user_id, max_by(n_events, n_events) n_events,
                          max_by(sum_value, n_events) sum_value
                   FROM user_totals GROUP BY user_id"""
            ).collect()
        }
        batch = load_table(spark, SF, "events")
        expected = {
            r["user_id"]: (r["n"], round(r["s"], 4))
            for r in batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == expected

    def test_stateful_user_totals_tws_matches_batch(self, spark, events_stream_dir):
        """transformWithStateInPandas (Spark 4 typed-state API): same final
        per-user totals as the applyInPandasWithState form and the batch
        aggregate."""
        pytest.importorskip(
            "google.protobuf.descriptor",
            reason="Spark TWS state protocol needs protobuf (absent here)",
        )
        from drug_target_discovery_spark.streaming.events import (
            stateful_user_totals_tws,
        )

        stream_src = _open_stream(spark, events_stream_dir)
        q = (
            stateful_user_totals_tws(stream_src)
            .writeStream.format("memory")
            .queryName("user_totals_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"
        got = {
            r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
            for r in spark.sql(
                """SELECT user_id, max_by(n_events, n_events) n_events,
                          max_by(sum_value, n_events) sum_value
                   FROM user_totals_tws GROUP BY user_id"""
            ).collect()
        }
        batch = load_table(spark, SF, "events")
        expected = {
            r["user_id"]: (r["n"], round(r["s"], 4))
            for r in batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == expected

    def test_tws_gate_raises_without_protobuf(self, spark, events_stream_dir):
        """In a runtime without protobuf the TWS operator must fail loudly
        at construction (NotImplementedError), never crash mid-stream."""
        try:
            import google.protobuf.descriptor  # noqa: F401

            pytest.skip("protobuf present: gate not applicable")
        except ImportError:
            pass
        from drug_target_discovery_spark.streaming.events import (
            stateful_user_totals_tws,
        )

        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful_user_totals_tws(_open_stream(spark, events_stream_dir))

    def test_dedup_events_batch_and_stream(self, spark, events_stream_dir):
        batch_src = load_table(spark, SF, "events")
        doubled = batch_src.union(batch_src)
        assert dedup_events(doubled).count() == batch_src.count()

        stream_src = _open_stream(spark, events_stream_dir)
        deduped = dedup_events(stream_src, watermark="1 hour")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"
        assert spark.sql("SELECT count(*) c FROM dedup_stream").collect()[0]["c"] == batch_src.count()


class TestCheckpointRecovery:
    def test_available_now_resumes_from_checkpoint(self, spark):
        """Exactly-once across restarts: a second availableNow run with the
        same checkpoint processes ONLY files that arrived after the first
        run — the property that makes incremental batch-over-stream
        (file-arrival ETL) safe to re-trigger blindly."""
        import os
        import shutil
        import tempfile

        work = tempfile.mkdtemp(prefix="ckpt_")
        src, sink, ckpt = [os.path.join(work, d) for d in ("src", "sink", "ck")]
        os.makedirs(src)
        try:
            batch = load_table(spark, SF, "events").select("event_id", "user_id")
            n_total = batch.count()
            half1 = batch.filter(F.col("event_id") % 2 == 0)
            half2 = batch.filter(F.col("event_id") % 2 == 1)
            half1.write.mode("overwrite").parquet(os.path.join(src, "f1"))

            def run_once():
                stream = (
                    spark.readStream.schema(batch.schema)
                    .option("recursiveFileLookup", "true")
                    .parquet(src)
                )
                q = (
                    stream.writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(120)

            run_once()
            assert spark.read.parquet(sink).count() == half1.count()
            half2.write.mode("overwrite").parquet(os.path.join(src, "f2"))
            run_once()
            # no duplicates from re-reading f1: counts add up exactly
            got = spark.read.parquet(sink)
            assert got.count() == n_total
            assert got.select("event_id").distinct().count() == n_total
        finally:
            shutil.rmtree(work, ignore_errors=True)


class TestIntervalJoinLateData:
    def test_left_outer_late_data_across_watermark(self, spark):
        """The one streaming semantics previously argued from the manual:
        left_outer interval join under out-of-order arrivals. Four pinned
        micro-batches (maxFilesPerTrigger=1, mtime-ordered files):

        b1: P1+V1 (inner match), P2 and P3 unmatched buffer
        b2: V2 arrives LATE (event time < b1's max) but inside the
            watermark -> must still match P2; an advancer PAIR (one
            purchase + one matching view, distinct user) pushes BOTH
            sides' event-time max — the global watermark is the MIN
            across the two watermark operators, so advancing only the
            view side would stall it forever (measured: it did)
        b3: advancer pair only -> watermark (11:15) now exceeds every
            original purchase's join-window end, P3's buffered state
            expires and its NULL row emits (exactly once)
        b4: V3 arrives for P3's window AFTER the state is gone (and
            beyond the watermark) -> matches nothing, resurrects nothing

        Expected exactly once each: (P1,V1), (P2,V2), (P3,NULL), plus the
        three self-matched advancer pairs — matched rows never NULL-emit,
        expired rows NULL-emit exactly once, and a post-expiry arrival
        cannot re-match or duplicate. (Join state eviction is lazy WITHIN
        a batch — a late row arriving in the same batch as the expiry can
        still match — so the guarantee pinned here is the cross-batch one
        Spark actually makes.)
        """
        import os
        import shutil
        import tempfile
        from datetime import datetime

        import pandas as pd

        from drug_target_discovery_spark.streaming.events import interval_join

        d = tempfile.mkdtemp(prefix="ij_late_")
        try:
            def ts(h, m):
                return datetime(2024, 1, 1, h, m, 0)

            batches = [
                # (event_type, user_id, event_id, ts)
                [  # b1
                    ("purchase", 1, 101, ts(10, 0)),
                    ("view", 1, 201, ts(9, 30)),
                    ("purchase", 2, 102, ts(10, 0)),
                    ("purchase", 3, 103, ts(10, 0)),
                ],
                [  # b2: late-but-valid view for P2 + advancer pair
                    ("view", 2, 202, ts(9, 45)),
                    ("purchase", 7, 901, ts(11, 45)),
                    ("view", 7, 911, ts(11, 45)),
                ],
                [  # b3: advancer pair — P3's state expires, NULL row emits
                    ("purchase", 8, 902, ts(12, 30)),
                    ("view", 8, 912, ts(12, 30)),
                ],
                [  # b4: post-expiry view for P3 + advancer pair
                    ("view", 3, 203, ts(9, 50)),
                    ("purchase", 9, 903, ts(13, 30)),
                    ("view", 9, 913, ts(13, 30)),
                ],
            ]
            for i, rows in enumerate(batches):
                pdf = pd.DataFrame(
                    rows, columns=["event_type", "user_id", "event_id", "ts"]
                )
                pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
                path = os.path.join(d, f"b{i}.parquet")
                pdf.to_parquet(path)
                os.utime(path, (1700000000 + i * 10, 1700000000 + i * 10))

            schema = spark.read.parquet(d).schema
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                # pandas writes TIMESTAMP_NTZ; watermarks need TIMESTAMP
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )
            p = src.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"), "ts"
            )
            v = src.filter(F.col("event_type") == "view").select(
                F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("r_ts"),
                F.col("event_id").alias("view_id"),
            )
            joined = interval_join(
                p, v, lookback="1 hour", watermark="30 minutes", how="left_outer"
            ).select("purchase_id", "view_id")
            q = (
                joined.writeStream.format("memory")
                .queryName("ij_late")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not finish in 180s"
            got = sorted(
                (r["purchase_id"], r["view_id"])
                for r in spark.sql("SELECT * FROM ij_late").collect()
            )
            assert got == [
                (101, 201),
                (102, 202),
                (103, None),
                (901, 911),
                (902, 912),
                (903, 913),
            ], got
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestWindowedAggLateData:
    def test_append_mode_late_merge_and_drop(self, spark):
        """Watermarked tumbling-window aggregation under out-of-order
        arrivals, append mode, pinned micro-batches:

        b1: three events in the 10:00 window (max ts 10:30 -> wm 10:00)
        b2: a LATE event at 10:15 — before b1's max — merges into the
            still-live 10:00 window; an advancer at 12:00 raises the
            watermark past the window end
        b3: advancer only -> wm 11:30 >= window end 11:00, the 10:00
            window EMITS (count 4) and its state is evicted
        b4: a TOO-LATE event at 10:20 arrives AFTER eviction — this is
            the drop Spark actually guarantees (rows merging into
            still-live state are accepted even past the watermark; the
            one-directional guarantee is that an emitted window never
            re-emits) — plus an advancer
        b5: advancer — flushes pending windows

        The 10:00 window must emit EXACTLY ONCE with count 4; the
        post-eviction row must neither re-open it nor emit a duplicate.
        """
        import os
        import shutil
        import tempfile
        from datetime import datetime

        import pandas as pd

        d = tempfile.mkdtemp(prefix="wagg_late_")
        try:
            def ts(h, m):
                return datetime(2024, 1, 1, h, m, 0)

            batches = [
                [
                    ("click", 1, 1, ts(10, 0), 1.0),
                    ("click", 2, 2, ts(10, 10), 1.0),
                    ("click", 3, 3, ts(10, 30), 1.0),
                ],
                [
                    ("click", 4, 4, ts(10, 15), 1.0),   # late, state live
                    ("click", 9, 901, ts(12, 0), 1.0),  # advancer
                ],
                [
                    ("click", 9, 902, ts(13, 0), 1.0),  # advancer: emits 10:00
                ],
                [
                    ("click", 5, 5, ts(10, 20), 1.0),   # post-eviction: dropped
                    ("click", 9, 903, ts(14, 0), 1.0),  # advancer
                ],
                [
                    ("click", 9, 904, ts(15, 0), 1.0),  # advancer
                ],
            ]
            for i, rows in enumerate(batches):
                pdf = pd.DataFrame(
                    rows,
                    columns=["event_type", "user_id", "event_id", "ts", "value"],
                )
                pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
                path = os.path.join(d, f"b{i}.parquet")
                pdf.to_parquet(path)
                os.utime(path, (1700000000 + i * 10,) * 2)

            schema = spark.read.parquet(d).schema
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )
            agg = windowed_event_counts(src, window="1 hour", watermark="30 minutes")
            q = (
                agg.writeStream.format("memory")
                .queryName("wagg_late")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not finish in 180s"
            h10 = int(datetime(2024, 1, 1, 10, 0).timestamp())
            rows = [
                (r["window_start"], r["n_events"])
                for r in spark.sql("SELECT * FROM wagg_late").collect()
            ]
            h10_rows = [n for w, n in rows if w == h10]
            # exactly one emission, count 4: the live-state late merge is
            # included, the post-eviction row is dropped and cannot
            # re-emit a (h10, 1) duplicate
            assert h10_rows == [4], rows
            # the post-eviction drop is observable in the state metrics
            dropped = sum(
                so.get("numRowsDroppedByWatermark", 0)
                for pr in q.recentProgress
                for so in pr["stateOperators"]
            )
            assert dropped >= 1, "expected the post-eviction row to be dropped"
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestSessionWindowRecovery:
    def test_session_state_survives_checkpoint_restart(self, spark):
        """Session-window merging state under a checkpointed RESTART
        (VERDICT r5 #7): two availableNow runs over the same checkpoint.

        run 1 (files b0, b1, one micro-batch each):
          b0: user 1 at 10:00 and 10:10 (one open session); advancer
              user 9 at 13:00 -> wm 12:30, session [10:00, 10:40) closes
              and EMITS (n=2) during run 1
          b1: user 3 at 13:45 — a session still LIVE at end of run 1
              (wm 13:15 < its end 14:15)
        -- restart: new query, SAME checkpoint --
        run 2 (files b2, b3):
          b2: user 3 again at 14:00 — within the 30-min gap of the
              RECOVERED session state, must MERGE across the restart
              (one session, n=2), plus user 2 at 15:00 (new session)
          b3: advancer user 9 at 18:00 -> everything closes and emits

        Exactly-once across both runs: user 1's session must not
        re-emit in run 2; user 3's pre/post-restart events form ONE
        merged session."""
        import os
        from datetime import datetime

        import pandas as pd

        work = tempfile.mkdtemp(prefix="sess_ckpt_")
        src, sink, ckpt = [os.path.join(work, d) for d in ("src", "sink", "ck")]
        os.makedirs(src)
        try:
            def ts(h, m):
                return datetime(2024, 1, 1, h, m, 0)

            def write_batch(i, rows):
                pdf = pd.DataFrame(
                    rows, columns=["user_id", "event_id", "ts", "value"]
                )
                pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
                path = os.path.join(src, f"b{i}.parquet")
                pdf.to_parquet(path)
                os.utime(path, (1700000000 + i * 10, 1700000000 + i * 10))

            def run_once():
                schema = spark.read.parquet(src).schema
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                    .withColumn("ts", F.col("ts").cast("timestamp"))
                )
                out = sessionize_builtin(
                    stream, gap="30 minutes", watermark="30 minutes"
                )
                q = (
                    out.writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(180), "run did not finish"

            write_batch(0, [
                (1, 11, ts(10, 0), 1.0),
                (1, 12, ts(10, 10), 1.0),
                (9, 91, ts(13, 0), 1.0),
            ])
            write_batch(1, [(3, 31, ts(13, 45), 1.0)])
            run_once()
            after1 = {
                (r["user_id"], r["session_start"]): r["n_events"]
                for r in spark.read.parquet(sink).collect()
            }
            u1_key = (1, int(ts(10, 0).timestamp()))
            assert after1.get(u1_key) == 2, after1
            # user 3's session is still open — must NOT have emitted yet
            assert not any(u == 3 for u, _ in after1), after1

            write_batch(2, [
                (3, 32, ts(14, 0), 1.0),
                (2, 21, ts(15, 0), 1.0),
            ])
            write_batch(3, [(9, 92, ts(18, 0), 1.0)])
            run_once()
            got = {
                (r["user_id"], r["session_start"]): r["n_events"]
                for r in spark.read.parquet(sink).collect()
            }
            rows = spark.read.parquet(sink).collect()
            # exactly once: no (user, session_start) appears twice
            assert len(rows) == len(got), rows
            # user 1's run-1 session did not re-emit (still exactly n=2)
            assert got[u1_key] == 2
            # user 3 merged ACROSS the restart into one session of 2
            assert got[(3, int(ts(13, 45).timestamp()))] == 2, got
            assert not any(
                u == 3 and s != int(ts(13, 45).timestamp()) for u, s in got
            ), got
            assert got[(2, int(ts(15, 0).timestamp()))] == 1
        finally:
            shutil.rmtree(work, ignore_errors=True)


class TestDedupWithinWatermarkRecovery:
    def test_dedup_state_survives_checkpoint_restart(self, spark):
        """dropDuplicatesWithinWatermark under a checkpointed RESTART
        (VERDICT r5 #7): the dedup key-state must survive recovery, so a
        duplicate that arrives in run 2 — within the watermark — of a key
        first seen in run 1 is still dropped.

        run 1: b0 has event_id 100 (10:00) and an in-batch duplicate
               (10:01); b1 advances the watermark a little (11:00 ->
               wm 10:30, key-100 state retained: 10:00 + delay not yet
               passed... retained until wm > first-seen + delay)
        -- restart, same checkpoint --
        run 2: b2 replays event_id 100 at 10:20 (inside the watermark
               of the recovered state) -> must be DROPPED; a fresh
               event_id 300 passes; b3 advances further."""
        import os
        from datetime import datetime

        import pandas as pd

        work = tempfile.mkdtemp(prefix="dedup_ckpt_")
        src, sink, ckpt = [os.path.join(work, d) for d in ("src", "sink", "ck")]
        os.makedirs(src)
        try:
            def ts(h, m):
                return datetime(2024, 1, 1, h, m, 0)

            def write_batch(i, rows):
                pdf = pd.DataFrame(
                    rows, columns=["user_id", "event_id", "ts", "value"]
                )
                pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
                path = os.path.join(src, f"b{i}.parquet")
                pdf.to_parquet(path)
                os.utime(path, (1700000000 + i * 10, 1700000000 + i * 10))

            def run_once():
                schema = spark.read.parquet(src).schema
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                    .withColumn("ts", F.col("ts").cast("timestamp"))
                )
                out = dedup_events(
                    stream, keys=["event_id"], watermark="1 hour"
                ).select("event_id", "user_id")
                q = (
                    out.writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(180), "run did not finish"

            write_batch(0, [
                (1, 100, ts(10, 0), 1.0),
                (1, 100, ts(10, 1), 1.0),   # in-batch duplicate
                (2, 200, ts(10, 5), 1.0),
            ])
            write_batch(1, [(9, 901, ts(11, 0), 1.0)])
            run_once()
            got1 = [r["event_id"] for r in spark.read.parquet(sink).collect()]
            assert sorted(got1) == [100, 200, 901], got1

            write_batch(2, [
                (1, 100, ts(10, 20), 1.0),  # cross-restart duplicate
                (3, 300, ts(11, 10), 1.0),  # fresh key
            ])
            write_batch(3, [(9, 902, ts(12, 0), 1.0)])
            run_once()
            got2 = [r["event_id"] for r in spark.read.parquet(sink).collect()]
            # key 100 emitted exactly once across both runs
            assert sorted(got2) == [100, 200, 300, 901, 902], got2
        finally:
            shutil.rmtree(work, ignore_errors=True)


class TestStreamStaticAndIdempotentSink:
    def test_stream_static_enrichment_matches_batch(
        self, spark, events_stream_dir
    ):
        """Stream-static join parity: enriching the availableNow stream
        against a static dimension equals the same join run as batch."""
        from drug_target_discovery_spark.streaming.events import (
            enrich_events_with_dim,
        )

        dim = spark.createDataFrame(
            [(i, f"seg{i % 3}") for i in range(200)], "user_id long, segment string"
        )
        batch = load_table(spark, SF, "events")
        expected = _as_sorted_rows(
            enrich_events_with_dim(batch, dim, "user_id")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        src = _open_stream(spark, events_stream_dir)
        out = (
            enrich_events_with_dim(src, dim, "user_id")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = _as_sorted_rows(_run_stream(spark, out, "stream_static_enrich"))
        assert got == expected

    def test_foreachbatch_sink_is_replay_idempotent(
        self, spark, events_stream_dir
    ):
        """The exactly-once contract: after the availableNow run, the sink
        holds exactly the input rows; re-invoking the batch function with a
        repeated batch_id (a simulated post-failure re-delivery) leaves the
        output byte-identical instead of appending duplicates."""
        import glob as _glob
        import os

        from drug_target_discovery_spark.streaming.events import (
            idempotent_parquet_sink,
        )

        out_dir = tempfile.mkdtemp(prefix="idem_sink_out_")
        ckpt = tempfile.mkdtemp(prefix="idem_sink_ckpt_")
        try:
            src = _open_stream(spark, events_stream_dir).select(
                "event_id", "user_id", "event_type"
            )
            q, batch_fn = idempotent_parquet_sink(src, out_dir, ckpt)
            q.awaitTermination(120)
            parts = sorted(_glob.glob(os.path.join(out_dir, "batch_id=*")))
            assert parts, "sink wrote no batches"
            read_all = lambda: sorted(
                tuple(r)
                for p in _glob.glob(os.path.join(out_dir, "batch_id=*"))
                for r in spark.read.parquet(p).collect()
            )
            first = read_all()
            expected = _as_sorted_rows(
                load_table(spark, SF, "events").select(
                    "event_id", "user_id", "event_type"
                )
            )
            assert first == expected
            # simulate a foreachBatch re-delivery: same data, same batch_id
            # (materialize first — the write overwrites the directory the
            # lazy plan would otherwise still be reading from)
            b0 = spark.read.parquet(parts[0])
            replay_df = spark.createDataFrame(b0.collect(), b0.schema)
            batch_fn(replay_df, int(parts[0].rsplit("=", 1)[1]))
            assert read_all() == first
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)


class TestCrawlIngestUrlDedup:
    """Round-13 streaming tier: the crawl-ingest canonical-URL dedup
    (stream-static anti-join + watermark-bounded first-wins state)."""

    ROWS = [
        # (doc_id, url, fetched_at offset minutes)
        (1, "http://a.com/x?b=2&a=1", 0),        # novel
        (2, "https://WWW.A.com/x/?a=1&b=2", 5),  # dup of 1 (same canon)
        (3, "http://b.com/y", 1),                # in reference -> dropped
        (4, "HTTP://b.com/y#frag", 2),           # ditto
        (5, "http://c.com/z?utm_source=s", 3),   # novel
        (6, "http://a.com/other", 4),            # novel, same domain as 1
    ]
    REF = [("b.com/y",)]
    EXPECTED_NOVEL = {"a.com/x?a=1&b=2", "c.com/z", "a.com/other"}

    def _crawl_df(self, spark):
        return spark.createDataFrame(
            [
                (d, u, F'2024-01-01 10:{m:02d}:00')
                for d, u, m in self.ROWS
            ],
            "doc_id long, url string, fetched_at string",
        ).withColumn("fetched_at", F.to_timestamp("fetched_at"))

    def _ref_df(self, spark):
        return spark.createDataFrame(self.REF, "canon_url string")

    def test_batch_twin(self, spark):
        from drug_target_discovery_spark.streaming.crawl import (
            crawl_ingest_url_dedup,
        )

        out = crawl_ingest_url_dedup(
            self._crawl_df(spark), self._ref_df(spark)
        )
        rows = out.collect()
        assert {r["canon_url"] for r in rows} == self.EXPECTED_NOVEL
        assert len(rows) == len(self.EXPECTED_NOVEL)
        # domain rides along, derived from the same canonical host rule
        assert {r["domain"] for r in rows} == {"a.com", "c.com"}

    def test_stream_equals_batch_twin(self, spark):
        import shutil as _sh
        import tempfile as _tf

        from drug_target_discovery_spark.streaming.crawl import (
            crawl_ingest_url_dedup,
        )

        d = _tf.mkdtemp(prefix="crawl_stream_")
        try:
            batch = self._crawl_df(spark)
            batch.write.mode("overwrite").parquet(f"{d}/crawl.parquet")
            src = spark.readStream.schema(batch.schema).parquet(
                f"{d}/crawl.parquet"
            )
            novel = crawl_ingest_url_dedup(src, self._ref_df(spark))
            assert novel.isStreaming
            q = (
                novel.writeStream.format("memory")
                .queryName("crawl_novel")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish in 120s"
            got = spark.sql("SELECT canon_url FROM crawl_novel").collect()
            assert {r["canon_url"] for r in got} == self.EXPECTED_NOVEL
            assert len(got) == len(self.EXPECTED_NOVEL)
        finally:
            _sh.rmtree(d, ignore_errors=True)

    def test_dedup_state_spans_micro_batches(self, spark):
        """A re-crawl arriving in a LATER micro-batch, inside the
        watermark horizon, is still deduplicated — the property the
        within-watermark state exists for (file source: one file per
        micro-batch under maxFilesPerTrigger=1)."""
        import shutil as _sh
        import tempfile as _tf

        from drug_target_discovery_spark.streaming.crawl import (
            crawl_ingest_url_dedup,
        )

        d = _tf.mkdtemp(prefix="crawl_stream2_")
        try:
            import time as _time

            b1 = spark.createDataFrame(
                [(1, "http://a.com/x", "2024-01-01 10:00:00")],
                "doc_id long, url string, fetched_at string",
            ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
            b2 = spark.createDataFrame(
                [
                    (2, "https://www.a.com/x/", "2024-01-01 10:10:00"),
                    (3, "http://d.com/new", "2024-01-01 10:11:00"),
                ],
                "doc_id long, url string, fetched_at string",
            ).withColumn("fetched_at", F.to_timestamp("fetched_at"))
            # two part-files in one source dir with distinct mtimes —
            # maxFilesPerTrigger=1 then delivers them as two
            # micro-batches in modification-time order
            b1.coalesce(1).write.mode("append").parquet(f"{d}/in")
            _time.sleep(1.1)
            b2.coalesce(1).write.mode("append").parquet(f"{d}/in")
            src = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/in")
            )
            novel = crawl_ingest_url_dedup(src, self._ref_df(spark))
            q = (
                novel.writeStream.format("memory")
                .queryName("crawl_novel2")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish in 120s"
            got = sorted(
                (r["doc_id"], r["canon_url"])
                for r in spark.sql(
                    "SELECT doc_id, canon_url FROM crawl_novel2"
                ).collect()
            )
            # doc 2 (10 min later, inside the 1 h watermark) deduped;
            # exactly one a.com/x survivor and the d.com novelty
            assert [c for _, c in got].count("a.com/x") == 1
            assert ("3", "d.com/new") in {(str(i), c) for i, c in got}
            assert len(got) == 2
        finally:
            _sh.rmtree(d, ignore_errors=True)

    def test_streaming_requires_watermark(self, spark):
        """watermark=None on a genuinely streaming input must fail fast
        — Spark would accept dropDuplicates on the stream and grow
        per-key state unboundedly (one entry per canonical URL,
        forever)."""
        import shutil as _sh
        import tempfile as _tf

        from drug_target_discovery_spark.streaming.crawl import (
            crawl_ingest_url_dedup,
        )

        d = _tf.mkdtemp(prefix="crawl_stream3_")
        try:
            batch = self._crawl_df(spark)
            batch.write.mode("overwrite").parquet(f"{d}/crawl.parquet")
            src = spark.readStream.schema(batch.schema).parquet(
                f"{d}/crawl.parquet"
            )
            with pytest.raises(ValueError, match="requires a watermark"):
                crawl_ingest_url_dedup(src, self._ref_df(spark), watermark=None)
        finally:
            _sh.rmtree(d, ignore_errors=True)


class TestScrubIngest:
    """Round-13 streaming tier: the PII scrub as an ingest stage —
    stateless map projection + watermark-bounded windowed census."""

    DOCS = [
        # (doc_id, source, text, hour, minute)
        (1, "s0", "reach user1@mail2.org or admin@mail0.net", 10, 0),
        (2, "s1", "call 555-123-4567 now", 10, 10),
        (3, "s0", "clean text only", 10, 20),
        (4, "s1", "ping 10.1.2.3 ok", 10, 25),
    ]
    # hour-10 window census: source -> (n_docs, n_email_docs, n_emails,
    # n_phone_docs, n_phones, n_ip_docs, n_ips, pii_chars, n_hit)
    EXPECTED = {
        "s0": (2, 1, 2, 0, 0, 0, 0, 30, 1),
        "s1": (2, 0, 0, 1, 1, 1, 1, 20, 2),
    }

    def _docs_df(self, spark, rows=None):
        from datetime import datetime

        return spark.createDataFrame(
            [
                (d, s, t, datetime(2024, 1, 1, h, m, 0))
                for d, s, t, h, m in (rows or self.DOCS)
            ],
            "doc_id long, source string, text string, fetched_at timestamp",
        )

    def test_map_stage_counts_and_redaction(self, spark):
        from drug_target_discovery_spark.streaming.scrub import scrub_ingest

        rows = {
            r["doc_id"]: r
            for r in scrub_ingest(self._docs_df(spark)).collect()
        }
        assert (
            rows[1]["n_email"],
            rows[1]["pii_chars"],
            rows[1]["text_redacted"],
        ) == (2, 30, "reach <EMAIL> or <EMAIL>")
        assert (rows[2]["n_phone"], rows[2]["pii_chars"]) == (1, 12)
        assert (rows[4]["n_ip"], rows[4]["pii_chars"]) == (1, 8)
        assert (
            rows[3]["n_email"],
            rows[3]["n_phone"],
            rows[3]["n_ip"],
            rows[3]["pii_chars"],
            rows[3]["text_redacted"],
        ) == (0, 0, 0, 0, "clean text only")

    def test_batch_twin_totals_match_batch_operator(self, spark):
        """Summing the windowed census over windows per source must
        reproduce the batch operator's census exactly (same
        expressions by construction)."""
        from drug_target_discovery_spark.queries.round13 import (
            pii_redaction_census,
        )
        from drug_target_discovery_spark.streaming.scrub import (
            scrub_ingest_census,
        )

        docs = self._docs_df(spark)
        census = scrub_ingest_census(docs).collect()
        got = {}
        for r in census:
            key = r["source"]
            prev = got.get(key, (0,) * 9)
            cur = tuple(r)[3:]
            got[key] = tuple(a + b for a, b in zip(prev, cur))
        assert got == self.EXPECTED
        batch = {
            r["source"]: tuple(r)
            for r in pii_redaction_census(
                spark, "", docs=docs.select("doc_id", "source", "text")
            ).collect()
        }
        for src, vals in self.EXPECTED.items():
            # batch op: source, n_docs, ..., pii_chars, pii_doc_share
            assert batch[src][1:9] == vals[:8]

    def test_stream_census_equals_batch_twin(self, spark):
        """File-source micro-batches with advancer rows to push the
        watermark: the hour-10 windows finalize and emit exactly the
        batch-twin census; the advancer's own window never finalizes
        and must NOT appear (append-mode contract)."""
        import os
        from datetime import datetime

        import pandas as pd

        from drug_target_discovery_spark.streaming.scrub import (
            scrub_ingest_census,
        )

        d = tempfile.mkdtemp(prefix="scrub_stream_")
        try:
            batches = [
                [r for r in self.DOCS if r[0] <= 2],
                [r for r in self.DOCS if r[0] > 2]
                + [(9, "s9", "advancer", 12, 0)],
                [(9, "s9", "advancer", 13, 0)],
            ]
            for i, rows in enumerate(batches):
                pdf = pd.DataFrame(
                    [
                        (did, s, t, datetime(2024, 1, 1, h, m, 0))
                        for did, s, t, h, m in rows
                    ],
                    columns=["doc_id", "source", "text", "fetched_at"],
                )
                pdf["fetched_at"] = pd.to_datetime(pdf["fetched_at"]).astype(
                    "datetime64[us]"
                )
                path = os.path.join(d, f"b{i}.parquet")
                pdf.to_parquet(path)
                os.utime(path, (1700000000 + i * 10,) * 2)

            schema = spark.read.parquet(d).schema
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                .withColumn(
                    "fetched_at", F.col("fetched_at").cast("timestamp")
                )
            )
            census = scrub_ingest_census(
                src, window="1 hour", watermark="30 minutes"
            )
            assert census.isStreaming
            q = (
                census.writeStream.format("memory")
                .queryName("scrub_census")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish in 120s"
            got = {
                r["source"]: tuple(r)[3:]
                for r in spark.sql("SELECT * FROM scrub_census").collect()
            }
            assert got == self.EXPECTED  # advancer window absent
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_streaming_requires_watermark(self, spark):
        from drug_target_discovery_spark.streaming.scrub import (
            scrub_ingest_census,
        )

        d = tempfile.mkdtemp(prefix="scrub_stream2_")
        try:
            batch = self._docs_df(spark)
            batch.write.mode("overwrite").parquet(f"{d}/docs.parquet")
            src = spark.readStream.schema(batch.schema).parquet(
                f"{d}/docs.parquet"
            )
            with pytest.raises(ValueError, match="needs a watermark"):
                scrub_ingest_census(src, watermark=None)
        finally:
            shutil.rmtree(d, ignore_errors=True)
