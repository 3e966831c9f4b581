"""C2: manual-correction join (reference: src/utils/ner_config.py:200-307).

The reference explodes the mention's ``files_id`` tuple to scalar ids, left-
joins the correction Excel on (NE, label, files_id), re-collapses per
original row taking the first non-null correction, and lets the correction
value win over any existing column. Spark form: explode -> **broadcast**
hash join (corrections are a small dimension) -> groupBy re-collapse with a
deterministic min-by-id "first non-null" -> join back.

No extra shuffle in context: mentions arrive hash-partitioned by doc_uid
(consensus output); explode and the broadcast join are narrow, and both the
re-collapse groupBy and the join-back key on supersets of doc_uid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .consensus import KEYS

CORR_COLS = ("manual_cat", "correct", "extent", "NER_category")


def _first_non_null_by(col: Column, order: Column) -> Column:
    # sentinel (not NULL) for the null-value case: struct comparison sorts
    # NULL fields first, which would invert the preference
    return F.min(
        F.struct(
            F.when(col.isNotNull(), order).otherwise(F.lit("￿")).alias("o"),
            order.alias("o2"),
            col.alias("v"),
        )
    )["v"]


def apply_corrections(
    mentions: DataFrame, corrections: DataFrame, corr_cols: tuple[str, ...] = CORR_COLS
) -> DataFrame:
    """mentions must carry ``files_id: array<string>``; corrections follow
    schemas.CORRECTIONS. Returns mentions with correction columns injected
    (correction value wins, reference: ner_config.py:277-289) and placed
    first (reference: ner_config.py:291-302)."""
    cols = [c for c in corr_cols if c in corrections.columns]
    # dedup correction rows on the join key with a pinned WHOLE-ROW
    # survivor (min over the row struct): the reference keeps one whole
    # row (drop_duplicates, ner_config.py:222), so per-column mins would
    # synthesize a correction no human entered when duplicate rows
    # differ column-wise with nulls
    corr = (
        corrections.filter(F.col("files_id").isNotNull())
        .groupBy("NE", "label", "files_id")
        .agg(F.min(F.struct(*[F.col(c).alias(c) for c in cols])).alias("_row"))
        .select(
            "NE",
            "label",
            F.col("files_id").alias("fid"),
            *[F.col(f"_row.{c}").alias(c) for c in cols],
        )
    )

    exploded = mentions.select(
        *KEYS, F.explode("files_id").alias("fid")
    )
    joined = exploded.join(F.broadcast(corr), ["NE", "label", "fid"], "left")
    found = joined.groupBy(*KEYS).agg(
        *[
            _first_non_null_by(F.col(c), F.col("fid")).alias(f"__corr_{c}")
            for c in cols
        ]
    )

    out = mentions.join(found, list(KEYS), "left")
    for c in cols:
        if c in mentions.columns:
            out = out.withColumn(c, F.coalesce(F.col(f"__corr_{c}"), F.col(c)))
            out = out.drop(f"__corr_{c}")
        else:
            out = out.withColumnRenamed(f"__corr_{c}", c)
    # correction columns first, then the original order
    front = [c for c in corr_cols if c in out.columns]
    rest = [c for c in out.columns if c not in front]
    return out.select(*front, *rest)
