"""Deduplication suite for large-scale training-data pipelines.

The reference only has exact-duplicate elimination (SURVEY.md §2 D1,
reference: src/utils/epg_cleaner.py:61-69); a 100 TB corpus needs the whole
ladder: exact (hash groupBy), near-dup candidates by n-gram Jaccard
(shingle-blocking join), MinHash+LSH (band-bucket join — the scale path:
candidate generation cost is O(docs x bands), never O(docs^2)), and SimHash
(64-bit fingerprint, hamming-radius candidates).

Everything except SimHash is pure column expressions (whole-stage codegen);
SimHash needs per-token bit accumulation and runs as an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_P = 1_000_003  # prime modulus for shingle hashing


def tokens(col):
    return F.split(F.trim(col), r"\s+")


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column."""
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(F.array(F.concat_ws(" ", t)))
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy; returns groups with >1 members."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.1,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard via shingle-blocking join.

    |A ∩ B| from a shingle-equality self-join (only docs sharing >=1
    shingle are ever paired — the blocking step), then
    J = inter / (|A| + |B| - inter). Exact, deterministic; quadratic only
    within a shingle's posting list, which is the standard exact-verify
    step after blocking. For corpus-scale candidate pruning use
    minhash_lsh_pairs instead.
    """
    sh = (
        docs.filter(F.col(text_col).isNotNull() & (F.length(F.trim(text_col)) > 0))
        .select(F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    posting = sh.select("doc", "n_sh", F.explode("sh").alias("shingle"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 32, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signatures, pure column expressions.

    Permutation j = xxhash64(shingle, j) mod P; signature element = min over
    the doc's shingles. JVM-side and deterministic at any parallelism.
    """
    # project the shingle array ONCE: referencing the raw expression inside
    # all k permutation expressions would re-tokenize and re-build the
    # n-gram array k times per row (no CSE across sibling expressions) —
    # measured 20x slower on long documents
    with_sh = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(text_col)) > 0)
    ).select(F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh"))

    def perm_min(j: int):
        # NB: the lambda must take exactly ONE argument — a two-arg lambda
        # (e.g. `lambda s, j=j`) is treated by F.transform as
        # (element, array_index) and silently shadows the closure variable
        return F.array_min(
            F.transform(
                F.col("sh"), lambda s: F.pmod(F.xxhash64(s, F.lit(j)), F.lit(HASH_P))
            )
        )

    sig = F.array(*[perm_min(j) for j in range(k)])
    return with_sh.select("doc", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join per band.

    Cost is O(docs x bands) for bucketing plus within-bucket pairing — the
    100 TB-safe candidate generator. Pairs are distinct; verify with
    ngram_jaccard on the candidates if exact scores are needed.
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(docs, k, n, text_col, id_col)
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(F.slice("sig", bi * r + 1, r)).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (Arrow-batched pandas UDF).

    Per-token 64-bit blake2b hash; bit b contributes +1/-1 to counter b;
    fingerprint bit = sign. Near-dups have small hamming distance.
    """

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            counters = [0] * 64
            for tok in t.split():
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
                )
                for b in range(64):
                    counters[b] += 1 if (h >> b) & 1 else -1
            v = 0
            for b in range(64):
                if counters[b] > 0:
                    v |= 1 << b
            # to signed 64-bit
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out, dtype="int64")

    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"), _simhash(F.col(text_col)).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit quarters (a pair within
    hamming<=3 of 64 bits shares at least one identical quarter), verify
    hamming exactly with bit_count — no O(n^2) compare."""
    sh = simhash64(docs, text_col, id_col)
    quarters = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("simhash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("doc", "simhash", "qq.q", "qq.v")
    a, b = quarters.alias("a"), quarters.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
