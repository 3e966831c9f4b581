"""Dedup suite + similarity search: properties and recall vs exact baselines."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ner_spark.operators import dedup as D
from ner_spark.operators import similarity as S


@pytest.fixture(scope="module")
def corpus(spark):
    """Docs with planted near-duplicates."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "completely different content about spark query engines and shuffles",
        "a third document mentioning customers suppliers and orders in detail",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        # near-dup: first word doubled (guaranteed-nonempty edit)
        first = t.split()[0]
        rows.append((i * 10 + 1, t.replace(first, first + " " + first, 1)))
    rows.append((99, "totally unrelated singleton text with unique words only"))
    rows.append((100, base[0]))  # exact dup of doc 0
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(spark, corpus):
    groups = D.exact_dup_groups(corpus).collect()
    assert len(groups) == 1
    [g] = groups
    assert g["members"] == [0, 100] and g["keep_id"] == 0


def test_jaccard_finds_planted_near_dups(spark, corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and (10, 11) in pairs and (20, 21) in pairs
    assert pairs[(0, 100)] == 1.0  # exact dup
    assert all(0 < v <= 1.0 for v in pairs.values())
    # unrelated docs never pair
    assert not any(99 in p for p in pairs)


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark, corpus):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.6).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(corpus, k=32, bands=16).collect()
    }
    # 16 bands of r=2: P(candidate) = 1-(1-J^2)^16 -> J>=0.6 => ~0.999
    assert exact <= cand


def test_simhash_properties(spark, corpus):
    sh = {r["doc"]: r["simhash"] for r in D.simhash64(corpus).collect()}
    assert sh[0] == sh[100]  # identical text -> identical fingerprint
    near = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_pairs(corpus, max_hamming=16).collect()
    }
    assert near[(0, 100)] == 0
    assert (0, 1) in near  # one-word edit stays within radius


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(3)
    rows = []
    for i in range(80):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # planted near-neighbor of vector 0
    v0 = rows[0][1]
    rows.append((999, [x + rng.gauss(0, 0.01) for x in v0]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_exact(spark, vectors):
    got = S.brute_force_topk(
        vectors, vectors.filter(F.col("vec_id") == 0), k=3, round_digits=4
    ).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["nb_id"] == 999 and got[0]["score"] > 0.99


def test_lsh_topk_recall(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 10)
    exact = {
        (r["q_id"], r["nb_id"])
        for r in S.brute_force_topk(vectors, queries, k=1).collect()
    }
    approx = {
        (r["q_id"], r["nb_id"])
        for r in S.lsh_topk(vectors, queries, k=1, n_planes=4, dim=16).collect()
    }
    # top-1 recall with 4 planes should be decent on 80 vectors
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    # the planted near-identical pair lands in the same bucket always
    assert (0, 999) in approx or (0, 999) not in exact


def test_embedding_near_dup_pairs_finds_planted(spark, vectors):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["score"]
        for r in S.embedding_near_dup_pairs(
            vectors, threshold=0.95, n_planes=6, dim=16
        ).collect()
    }
    assert (0, 999) in pairs and pairs[(0, 999)] > 0.99
