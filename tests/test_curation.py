"""Semantics for the curation batch (queries_curation): repetition
fractions are well-formed and hand-checkable on a constructed doc, and
anonymization redacts exactly the PER gazetteer aliases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.queries_curation import (
    _PER_ALIASES,
    doc_anonymize,
    doc_repetition_filter,
)

SF = "/root/testdata/sf0.001"


def test_repetition_fractions_well_formed(spark):
    out = doc_repetition_filter(spark, SF)
    bad = out.filter(
        (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
        | (F.col("top_frac") <= 0)
        | (F.col("top_frac") > 1)
        | (F.col("n_trigrams") <= 0)
    )
    assert bad.isEmpty()
    # keep flag is exactly the threshold predicate
    assert out.filter(
        (F.col("dup_frac") <= 0.20) != F.col("keep")
    ).isEmpty()


def test_repetition_hand_computed(spark):
    # "a b a b a b": trigrams = [a b a, b a b, a b a, b a b] -> all dup
    df = spark.createDataFrame([(1, "a b a b a b"), (2, "x y z w")], ["doc_id", "text"])
    df.write.mode("overwrite").parquet("/tmp/curation_docs/documents.parquet")
    out = (
        doc_repetition_filter(spark, "/tmp/curation_docs")
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["n_trigrams"] == 4 and out[0]["dup_frac"] == 1.0
    assert not out[0]["keep"]
    assert out[1]["n_trigrams"] == 2 and out[1]["dup_frac"] == 0.0
    assert out[1]["keep"] and out[1]["top_frac"] == 0.5


def test_anonymize_redacts_all_per_aliases(spark):
    out = doc_anonymize(spark, SF)
    # no PER alias survives as a standalone token in anon_text
    rx = r"\b(" + "|".join(_PER_ALIASES) + r")\b"
    assert out.filter(F.col("anon_text").rlike(rx)).isEmpty()
    # redaction count equals the number of [PER] placeholders inserted
    mism = out.filter(
        F.size(F.split("anon_text", r"\[PER\]")) - 1 != F.col("n_redacted")
    )
    assert mism.isEmpty()
