"""applyInPandasWithState: cross-batch, cross-restart sessionization.

Three availableNow query runs share one checkpoint + file sink:
run 1 sees the start of user 1's session, run 2 continues it (state
crosses the restart) then closes it with a gap event, run 3 closes the
run-2 leftovers — one session by gap, one by event-time TIMEOUT (the
watermark from run 2 proves no event can extend it). Sessions still open
at the end are never emitted. Expected rows are the exact gap semantics
of the batch `events_sessionize` oracle query (gap = 1800 s).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.streaming.stateful import sessionize_stream

T0 = 1_700_000_000
EVENTS = "event_id long, user_id long, ts timestamp"


def _write_chunk(spark, watch_dir, name, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_sec long")
    df.select(
        "event_id", "user_id", F.timestamp_seconds("ts_sec").alias("ts")
    ).coalesce(1).write.parquet(str(watch_dir / f"chunk={name}"))


def _run(spark, watch_dir, out, ckpt):
    ev = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{watch_dir}/*")
    )
    q = (
        sessionize_stream(ev, gap_sec=1800, watermark="10 minutes")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def test_sessionize_stream_across_restarts(spark, tmp_path):
    watch, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    watch.mkdir()

    # run 1: user 1 session opens (2 events), user 2 session opens
    _write_chunk(
        spark, watch, "a", [(1, 1, T0), (2, 1, T0 + 600), (10, 2, T0)]
    )
    _run(spark, watch, out, ckpt)

    # run 2: e3 continues user 1's session ACROSS the restart; e4 closes it
    # by gap; e11 closes user 2's singleton by gap. Watermark advances to
    # T0 + 9400 (max ts 10000 - 10 min delay).
    _write_chunk(
        spark, watch, "b", [(3, 1, T0 + 1200), (4, 1, T0 + 7200), (11, 2, T0 + 10000)]
    )
    _run(spark, watch, out, ckpt)

    # run 3: user 1's open session (last ts T0+7200, timeout T0+9000) is
    # now behind the restored watermark -> closed by TIMEOUT, no data
    # needed for that key; e12 closes user 2's session 2 by gap; the new
    # tails (user 2 s3, user 3 s1) stay open and must not be emitted.
    _write_chunk(spark, watch, "c", [(12, 2, T0 + 100_000), (20, 3, T0 + 100_000)])
    _run(spark, watch, out, ckpt)

    got = {
        tuple(r)
        for r in spark.read.parquet(str(out))
        .select("user_id", "session_id", "n_events", "first_event", "last_event")
        .collect()
    }
    assert got == {
        (1, 1, 3, 1, 3),  # spans runs 1+2, closed by gap in run 2
        (1, 2, 1, 4, 4),  # closed by event-time timeout in run 3
        (2, 1, 1, 10, 10),  # closed by gap in run 2
        (2, 2, 1, 11, 11),  # closed by gap in run 3
    }
