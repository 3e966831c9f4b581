"""Structured Streaming: incremental extraction == batch extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark import synth
from ner_spark.streaming import ingest as ST


@pytest.fixture(scope="module")
def doc_chunks(spark, tmp_path_factory):
    """Two parquet chunks of timestamped docs landing in one stream dir."""
    d = tmp_path_factory.mktemp("stream_in")
    docs = synth.synth_docs(spark, 120, seed=42).withColumn(
        "event_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.xxhash64("doc_id") % 300)),
    )
    docs.filter(F.xxhash64("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(d / "chunk=a")
    )
    docs.filter(F.xxhash64("doc_id") % 2 != 0).coalesce(1).write.parquet(
        str(d / "chunk=b")
    )
    return d, docs


def test_stream_mentions_match_batch(spark, gazetteer, patterns, doc_chunks, tmp_path):
    d, docs = doc_chunks
    stream = ST.stream_docs(spark, f"{d}/*", max_files=1)
    mentions = ST.stream_mentions(stream, gazetteer, patterns)
    q = (
        mentions.writeStream.format("memory")
        .queryName("stream_mentions_t")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("stream_mentions_t")

    # batch reference over the same docs (no dedup on either side)
    batch = ST.stream_mentions(
        docs, gazetteer, patterns
    )  # static DF through the same code path
    key = ["doc_uid", "NE", "label", "start", "end", "method"]
    g = {tuple(r) for r in got.select(*key).collect()}
    b = {tuple(r) for r in batch.select(*key).collect()}
    assert g == b and len(g) > 100


def test_windowed_counts_and_consensus_sink(spark, gazetteer, patterns, doc_chunks, tmp_path):
    d, docs = doc_chunks
    stream = ST.stream_docs(spark, f"{d}/*", max_files=1)
    mentions = ST.stream_mentions(stream, gazetteer, patterns)

    q = (
        ST.windowed_label_counts(mentions)
        .writeStream.format("memory")
        .queryName("label_counts_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    counts = spark.table("label_counts_t")
    # append mode only emits windows the watermark has closed; every emitted
    # window must match the batch recomputation exactly
    batch_counts = {
        (r["window_start"], r["window_end"], r["label"]): r["n_mentions"]
        for r in ST.windowed_label_counts(
            ST.stream_mentions(docs, gazetteer, patterns)
        ).collect()
    }
    emitted = counts.collect()
    assert len(emitted) > 0
    for r in emitted:
        key = (r["window_start"], r["window_end"], r["label"])
        assert batch_counts.get(key) == r["n_mentions"], (key, r["n_mentions"])

    combos = [c["slots"] for c in synth.TRUSTED_COMBOS]
    out = tmp_path / "consensus_out"
    sink = ST.consensus_sink(mentions, combos, str(out), str(tmp_path / "ckpt3"))
    sq = sink.start()
    sq.awaitTermination(300)
    result = spark.read.parquet(str(out))
    assert result.count() > 0
    methods = {r["method"] for r in result.select("method").distinct().collect()}
    assert any("_" in m for m in methods)  # fusion happened inside batches

def test_dedup_stream_drops_redeliveries(spark, doc_chunks, tmp_path):
    """Redelivered doc ids (chunk written twice) surface exactly once."""
    d, docs = doc_chunks
    redelivery = tmp_path / "redelivered_in"
    half = docs.filter(F.xxhash64("doc_id") % 2 == 0)
    half.coalesce(1).write.parquet(str(redelivery / "chunk=first"))
    half.coalesce(1).write.parquet(str(redelivery / "chunk=retry"))

    stream = ST.stream_docs(spark, f"{redelivery}/*", max_files=1)
    q = (
        ST.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dedup_stream_t")
    n_unique = half.select("doc_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("doc_id").distinct().count() == n_unique


def test_incremental_ingest_processes_only_new_files(spark, tmp_path):
    """Scheduled incremental batch (trigger=availableNow + checkpoint): a
    re-run after new files land processes ONLY the new files — the pattern
    for periodic 100 TB ingestion without reprocessing history."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    docs = synth.synth_docs(spark, 100, seed=7).withColumn(
        "event_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    a = docs.filter(F.xxhash64("doc_id") % 2 == 0)
    b = docs.filter(F.xxhash64("doc_id") % 2 != 0)
    a.coalesce(1).write.parquet(str(src / "chunk=a"))

    def run_once():
        q = (
            ST.stream_docs(spark, f"{src}/*", max_files=1)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    got1 = spark.read.parquet(str(out))
    assert got1.count() == a.count()

    b.coalesce(1).write.parquet(str(src / "chunk=b"))
    run_once()
    got2 = spark.read.parquet(str(out))
    # second run appended exactly the new chunk: no history reprocessing
    assert got2.count() == docs.count()
    ids = {r["doc_id"] for r in got2.select("doc_id").collect()}
    assert ids == {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_consensus_sink_replay_is_idempotent(spark, gazetteer, patterns, tmp_path):
    """foreachBatch is at-least-once: a crash between the parquet write and
    the checkpoint commit re-delivers the batch. Replaying the SAME batch_id
    must leave the sink byte-identical (dynamic overwrite of the batch's own
    partition), never append duplicates."""
    docs = synth.synth_docs(spark, 60, seed=11).withColumn(
        "event_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    mentions = ST.stream_mentions(docs, gazetteer, patterns)
    combos = [c["slots"] for c in synth.TRUSTED_COMBOS]
    out = str(tmp_path / "sink")
    writer = ST.consensus_batch_writer(combos, out)

    writer(mentions, 0)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0

    writer(mentions, 0)  # simulated redelivery of the same micro-batch
    second = spark.read.parquet(out)
    assert second.count() == n1
    # a genuinely NEW batch still lands alongside, untouched by the replay
    writer(mentions.limit(0), 1)  # empty batch: no-op
    writer(mentions, 2)
    assert spark.read.parquet(out).count() == 2 * n1
    assert {r["batch_id"] for r in
            spark.read.parquet(out).select("batch_id").distinct().collect()} == {0, 2}
