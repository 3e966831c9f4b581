"""Shared plumbing for mention extractors.

Each extractor is a *pandas UDF* over the deduped document text: Arrow moves
whole batches across the JVM/Python boundary, the Python side runs a compiled
matcher over ~10k docs per batch, and the result comes back as one
``array<struct>`` column that Spark explodes JVM-side. No per-row Python on
the driver, no collect — the shape the north_rule mandates. The reference
instead drives its taggers with ``iterrows`` on the driver
(reference: src/utils/spacy_config.py:136) or one giant concat string
(reference: src/utils/stanza_config.py:111-124); Arrow batching subsumes both
hand-rolled strategies (SURVEY.md §4 O2/O3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..functions.text import context_window

MENTION_ARR = T.ArrayType(schemas.MENTION)


def explode_mentions(
    docs: DataFrame, mentions_col, method: str, window: int = 30
) -> DataFrame:
    """(doc_uid, text) + array<mention> column -> MENTIONS-schema rows.

    The ±window context (reference: casen_config.py:276-279) is computed as a
    JVM-side substring after the explode — cheaper than shipping it through
    Arrow, and Catalyst prunes it when the consumer doesn't select it.
    """
    m = F.explode(mentions_col).alias("m")
    out = docs.select(F.col("doc_uid"), F.col("text"), m).select(
        "doc_uid",
        F.col("m.NE").alias("NE"),
        F.col("m.label").alias("label"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.lit(method).alias("method"),
        F.col("m.grfs").alias("grfs"),
        context_window(F.col("text"), F.col("m.start"), F.col("m.end"), window).alias(
            "context"
        ),
    )
    return out
