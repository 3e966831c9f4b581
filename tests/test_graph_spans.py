"""Triangle counting brute force, funnel semantics, and the interleaved
span-sequence invariant (sort-by-offset recovery + text reassembly)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ner_spark.operators.graph import triangle_counts
from ner_spark.queries_spans import interleaved_spans, span_sequence_fingerprint


def _triangles_py(edges: list[tuple[str, str]]) -> dict[str, int]:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    counts = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                counts[n] += 1
    return {n: c for n, c in counts.items() if c > 0}


def test_triangle_counts_matches_bruteforce(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # triangle abc
        ("b", "d"), ("d", "c"),                      # triangle bcd
        ("d", "e"),                                  # dangling edge
        ("b", "a"),                                  # reverse duplicate
        ("e", "e"),                                  # self loop (dropped)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _triangles_py(edges)
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_counts_empty_when_no_closure(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    assert triangle_counts(df).count() == 0


def test_span_fingerprint_recovers_scrambled_order(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta") for i in range(50)],
        "doc_id long, text string",
    )
    out = span_sequence_fingerprint(interleaved_spans(docs))
    rows = out.collect()
    assert len(rows) == 50
    # reassembly must hold for EVERY doc regardless of array scrambling
    assert all(r["text_ok"] for r in rows)
    # the interleaver plants media spans in a hash-selected subset
    media = {r["doc_id"]: r["n_media"] for r in rows}
    assert 0 < sum(media.values()) < 50
    assert all(
        (r["n_spans"] == 3) == (r["n_media"] == 1) for r in rows
    )


def test_span_fingerprint_is_order_sensitive(spark):
    """Swapping two offsets changes the fingerprint — the invariant the
    driver oracle pins (a position-insensitive hash would be vacuous)."""
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    base = interleaved_spans(docs)
    swapped = base.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> struct(s.kind AS kind, s.text AS text,"
            " s.media_ref AS media_ref,"
            " cast(size(spans) - 1 - s.offset AS int) AS offset))"
        ),
    )
    fp0 = span_sequence_fingerprint(base).collect()[0]["seq_fp"]
    fp1 = span_sequence_fingerprint(swapped).collect()[0]["seq_fp"]
    assert fp0 != fp1
