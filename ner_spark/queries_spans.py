"""Interleaved-span driver queries (input_hint shape).

The north-star input is an Iceberg table of interleaved text + media
documents — ``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)`` —
with a per-row invariant: span-sequence equality (kind, text, media_ref,
order) against the reference walk. These queries exercise that invariant
end-to-end on the driver's ``documents`` table: a deterministic,
SQL-replayable interleaver builds a spans column (media spans spliced into
the text for a hash-selected quarter of the docs, array order deliberately
scrambled), and the engine must recover original offset order with
JVM-side array ops before fingerprinting the sequence.

All randomness is md5-derived (bit-identical in DuckDB), so the oracle
states the EXPECTED ordered sequence directly — if the engine's span sort
or reassembly ever diverged from offset order, the fingerprint hash would
mismatch. Per-row arrays are ≤3 elements, so the sort/transform HOFs stay
tiny and per-row (the interpreted-HOF cliff only bites downstream of wide
aggregations — see BENCH/BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import md5_60
from .queries import _t, query

_SEP = "\\x1f"  # unit separator between span renderings


def interleaved_spans(documents: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, spans) in the input_hint shape.

    Docs with ``md5_60(doc_id) % 4 == 0`` get a media span spliced between
    the two halves of their text; every doc with ``md5_60 % 2 == 1`` has
    its spans array REVERSED (offsets still correct) so downstream
    consumers cannot rely on array position — exactly the property the
    north-rule invariant checks.
    """
    h = md5_60(F.col("doc_id").cast("string"))
    t1 = F.expr("substring(text, 1, greatest(1, cast(length(text)/2 as int)))")
    t2 = F.expr("substring(text, greatest(1, cast(length(text)/2 as int)) + 1)")

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    nul = F.lit(None).cast("string")
    media_ref = F.concat(F.lit("img_"), (h % 1000).cast("string"))
    with_media = F.array(
        span("text", t1, nul, F.lit(0)),
        span("media", nul, media_ref, F.lit(1)),
        span("text", t2, nul, F.lit(2)),
    )
    without = F.array(span("text", t1, nul, F.lit(0)), span("text", t2, nul, F.lit(1)))
    spans = F.when(h % 4 == 0, with_media).otherwise(without)
    spans = F.when(h % 2 == 1, F.reverse(spans)).otherwise(spans)
    return documents.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select("doc_id", F.col("text").alias("_text"), spans.alias("spans"))


def span_sequence_fingerprint(docs_spans: DataFrame) -> DataFrame:
    """Per-doc span stats + an order-sensitive sequence fingerprint.

    Spans are sorted by ``offset`` (struct-min ordering — offset leads the
    sort struct), rendered ``kind:payload``, joined with a unit separator,
    and md5-hashed: any deviation from original offset order changes the
    hash. ``text_ok`` additionally checks that concatenating the text
    spans in order reproduces the document text (the reassembly half of
    the span-sequence invariant). Pure column expressions throughout.
    """
    ordered = F.expr(
        "array_sort(transform(spans, s -> struct(s.offset AS offset, s.kind AS kind,"
        " s.text AS text, s.media_ref AS media_ref)))"
    )
    rendered = F.expr(
        "transform(__ordered, s -> concat(s.kind, ':', coalesce(s.text, s.media_ref)))"
    )
    reassembled = F.expr(
        "array_join(transform(filter(__ordered, s -> s.kind = 'text'), s -> s.text), '')"
    )
    return (
        docs_spans.withColumn("__ordered", ordered)
        .select(
            "doc_id",
            F.size("spans").cast("long").alias("n_spans"),
            F.expr("size(filter(spans, s -> s.kind = 'media'))")
            .cast("long")
            .alias("n_media"),
            F.md5(F.array_join(rendered, _SEP.encode().decode("unicode_escape"))).alias(
                "seq_fp"
            ),
            (reassembled == F.col("_text")).alias("text_ok"),
        )
    )


@query(
    "spans_interleave_order",
    """
    WITH d AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
             greatest(1, CAST(trunc(length(text) / 2) AS INT)) AS mid
      FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
           CAST(CASE WHEN h % 4 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_spans,
           CAST(CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_media,
           md5(CASE WHEN h % 4 = 0 THEN
                 'text:' || substr(text, 1, mid) || chr(31)
                 || 'media:img_' || CAST(h % 1000 AS VARCHAR) || chr(31)
                 || 'text:' || substr(text, mid + 1)
               ELSE
                 'text:' || substr(text, 1, mid) || chr(31)
                 || 'text:' || substr(text, mid + 1)
               END) AS seq_fp,
           TRUE AS text_ok
    FROM d
    """,
)
def spans_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule span-sequence invariant as a driver query: interleave
    media spans into the documents table (scrambled array order), then
    recover offset order and fingerprint the sequence. The oracle states
    the expected ordered rendering directly from the construction — the
    engine's hash only matches if its sort-by-offset and text reassembly
    are exact."""
    return span_sequence_fingerprint(interleaved_spans(_t(spark, sf_dir, "documents")))
