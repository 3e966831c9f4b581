"""Semantics for relational-operator batch 3 (queries_relops3) and the
chunking/vocab corpus additions: salting is result-invariant, chunks
reconstruct the document, Q17/Q18 predicates hold row-wise, and the OOV
rate is exact integer arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.queries import _t
from ner_spark.queries_corpus import (
    _CHUNK_S,
    _CHUNK_W,
    doc_chunk_stride,
    vocab_oov_rate,
)
from ner_spark.queries_relops3 import skew_salted_join, tpch_q17, tpch_q18

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    """The salt must never change the result: compare against the plain
    unsalted join written directly."""
    out = skew_salted_join(spark, SF)
    ev = _t(spark, SF, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    plain = (
        ev.select("event_id", "event_type", cents.alias("cents"))
        .join(dim, "event_type")
        .select(
            "event_id",
            "event_type",
            "n_type",
            (F.col("cents") * F.col("n_type") > F.col("total_cents")).alias(
                "above_avg"
            ),
        )
    )
    assert out.exceptAll(plain).isEmpty() and plain.exceptAll(out).isEmpty()


def test_salted_join_plan_has_no_broadcast(spark):
    """hint("shuffle_hash") must hold — otherwise the salt never spreads
    anything and the query demonstrates nothing."""
    plan = skew_salted_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_chunks_reconstruct_document(spark):
    """Dropping each chunk's overlap tail (keep the first S chars; the last
    chunk keeps everything) and concatenating in chunk order must give back
    the original text exactly."""
    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, SF, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .collect()
    }
    chunks = doc_chunk_stride(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        rebuilt = "".join(
            r["chunk"] if i == len(rows) - 1 else r["chunk"][:_CHUNK_S]
            for i, r in enumerate(rows)
        )
        assert rebuilt == docs[doc_id]
        for i, r in enumerate(rows):
            assert r["chunk_idx"] == i + 1
            assert r["chunk_start"] == i * _CHUNK_S
            assert r["chunk_len"] == len(r["chunk"]) <= _CHUNK_W
        # chunks that end strictly inside the doc are full-width W
        n = len(docs[doc_id])
        assert all(
            r["chunk_len"] == _CHUNK_W
            for r in rows
            if r["chunk_start"] + _CHUNK_W <= n
        )


def test_q17_small_quantity_predicate(spark):
    """Every output part's small-lineitem count must equal a brute-force
    recount below 0.2x that part's average."""
    out = {r["p_partkey"]: r for r in tpch_q17(spark, SF).collect()}
    assert out
    li = _t(spark, SF, "lineitem")
    part_b = _t(spark, SF, "part").filter(F.col("p_brand") == "Brand#2")
    rows = (
        li.join(part_b, li.l_partkey == part_b.p_partkey)
        .select("l_partkey", "l_quantity")
        .collect()
    )
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["l_partkey"], []).append(r["l_quantity"])
    for pk, rec in out.items():
        qtys = by_part[pk]
        avg = sum(qtys) / len(qtys)
        assert rec["n_small"] == sum(1 for q in qtys if q < 0.2 * avg)
    # parts with no qualifying lineitems must NOT appear
    for pk, qtys in by_part.items():
        avg = sum(qtys) / len(qtys)
        if not any(q < 0.2 * avg for q in qtys):
            assert pk not in out


def test_q18_threshold_holds(spark):
    out = tpch_q18(spark, SF).collect()
    assert all(r["total_qty"] > 300 for r in out)
    # join-back is lossless: one output row per qualifying order
    li = _t(spark, SF, "lineitem")
    n_big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 300)
        .count()
    )
    assert len(out) == n_big


def test_vocab_oov_exact_integer_rate(spark):
    out = vocab_oov_rate(spark, SF).collect()
    assert out
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_per_10k"] == (r["n_oov"] * 10000) // r["n_tokens"]
