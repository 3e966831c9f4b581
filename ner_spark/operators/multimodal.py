"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched functions over ``mapInPandas`` so whole batches of bytes
cross the JVM/Python boundary once.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is stubbed: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake produces
(width, height, n_frames) from the payload hash. Everything around the stub
— schemas, batch iteration, partition-preserving shapes, output contracts —
is real and tested; swapping in a real codec changes only ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("content_length", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_docs(docs: DataFrame) -> DataFrame:
    """Extract media spans from interleaved docs into the MEDIA schema.

    Payload bytes are synthesized from the ref string (this sandbox has no
    object store); in production this column is the fetched object or an
    Iceberg binary column.
    """
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media")
    return spans.select(
        F.col("s.media_ref").alias("media_ref"),
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col("s.media_ref"), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col("s.media_ref")).cast("long").alias("content_length"),
            F.lit("fake/ref").alias("codec"),
        ).alias("meta"),
    )


def media_from_ref_table(documents: DataFrame) -> DataFrame:
    """MEDIA rows derived deterministically from the flat ``documents``
    table (doc_id: long), so the multimodal path scales with the sf input
    instead of an internal generator: every second doc carries one media
    object whose type cycles image/audio/video. Payload bytes are the
    utf-8 ref string (no object store in this sandbox); the construction
    is pure-column and SQL-replayable."""
    with_media = documents.filter(F.col("doc_id") % 2 == 0)
    ref = F.format_string("media://%08d", F.col("doc_id"))
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return with_media.select(
        ref.alias("media_ref"),
        F.format_string("doc%08d", F.col("doc_id")).alias("doc_id"),
        mtype.alias("media_type"),
        F.encode(ref, "utf-8").alias("payload"),
        F.struct(
            F.length(ref).cast("long").alias("content_length"),
            F.lit("fake/ref").alias("codec"),
        ).alias("meta"),
    )


def _decode_one(payload: bytes, media_type: str, fake: bool):
    if not fake:
        # real codec path (PIL / ffmpeg) — not available in this container
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; call with fake=True for the deterministic stub"
        )
    # md5 (not blake2b) so the DuckDB oracle can replay the fake dimensions
    # byte-for-byte: width = 64 + digest[0] % 192, etc.
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h[2] % 30
    feats = [((b % 97) - 48) / 48.0 for b in h]
    return width, height, n_frames, feats


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """MEDIA -> DECODED via mapInPandas (batch-at-a-time, schema-checked)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _decode_one(p, mt, fake)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(batches, schema=DECODED)


def resize_spec(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Pure-column resize planning (aspect-preserving target dimensions);
    the pixel work would happen in the decode UDF in production."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "media_ref",
        "doc_id",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def sample_frames(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan: one row per selected frame index (explode of a
    JVM-side sequence — no Python)."""
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
    )
    return decoded.select(
        "media_ref", "doc_id", F.explode(idx).alias("frame_idx")
    )
