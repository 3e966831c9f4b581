"""Invariants for the training-export packing batch (queries_packing).

The driver's oracle check proves Spark == DuckDB; these tests prove the
SEMANTICS are right: concat-and-cut conservation laws, chunk coverage and
overlap arithmetic, and mixture-rate bounds.
"""

from pyspark.sql import functions as F

from ner_spark.queries_packing import (
    _BUDGET,
    _CHUNK,
    _STRIDE,
    corpus_mixture_sample,
    doc_chunk_split,
    pack_concat_cut,
)

SF = "/root/testdata/sf0.001"


def test_pack_conservation(spark):
    """Token mass is conserved: sum of per-context fills == total tokens;
    every context except each lane's last is filled to exactly _BUDGET."""
    out = pack_concat_cut(spark, SF).cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    total = docs.select(
        F.sum(
            F.size(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "))
        ).alias("t")
    ).first()["t"]
    assert out.agg(F.sum("n_tokens")).first()[0] == total

    last = out.groupBy("lane").agg(F.max("ctx_id").alias("last_ctx"))
    partial = (
        out.join(last, "lane")
        .filter(F.col("ctx_id") < F.col("last_ctx"))
        .filter(F.col("n_tokens") != _BUDGET)
        .count()
    )
    assert partial == 0, "non-terminal context not filled to budget"
    # carried docs are straddlers: a context with n_carried>0 must not be
    # the lane's first, and carried count is bounded by its doc count
    bad = out.filter(
        (F.col("n_carried") > 0) & (F.col("ctx_id") == 0)
        | (F.col("n_carried") > F.col("n_docs"))
    ).count()
    assert bad == 0
    out.unpersist()


def test_chunk_coverage(spark):
    """Chunks tile each document: first chunk starts at token 1, chunk i
    starts at i*stride+1, the last chunk reaches token n, and re-joining
    chunk 0 of a short doc reproduces its normalized text."""
    out = doc_chunk_split(spark, SF).cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    norm = docs.select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("norm"),
        F.size(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")).alias(
            "n"
        ),
    )
    # chunk count per doc matches the stride formula
    got = out.groupBy("doc_id").agg(F.count("*").alias("k"), F.max("chunk_idx").alias("mx"))
    expect = norm.select(
        "doc_id",
        (
            F.greatest(
                F.ceil((F.col("n") - F.lit(_CHUNK)) / F.lit(float(_STRIDE))),
                F.lit(0),
            )
            + 1
        ).alias("k_exp"),
    )
    mismatch = (
        got.join(expect, "doc_id").filter(F.col("k") != F.col("k_exp")).count()
    )
    assert mismatch == 0
    # last chunk token count: n - last_idx*stride (and every chunk <= CHUNK)
    assert out.filter(F.col("n_chunk_toks") > _CHUNK).count() == 0
    # short docs (n <= CHUNK): single chunk, text equals normalized text
    short = (
        out.join(norm, "doc_id")
        .filter(F.col("n") <= _CHUNK)
        .filter((F.col("chunk_idx") != 0) | (F.col("chunk_text") != F.col("norm")))
        .count()
    )
    assert short == 0
    out.unpersist()


def test_mixture_bounds(spark):
    """Rates are in (0, 1]; sampled counts never exceed source counts; the
    hash-Bernoulli sample lands near rate * n_source in expectation."""
    rows = corpus_mixture_sample(spark, SF).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0
        assert 0 <= r["n_sampled"] <= r["n_source"]
        assert r["weight"] in (1, 2, 3, 4)
    # aggregate mass should be within 50% of the target at this tiny SF
    n_total = sum(r["n_source"] for r in rows)
    n_samp = sum(r["n_sampled"] for r in rows)
    assert 0.15 * n_total <= n_samp <= 0.75 * n_total
