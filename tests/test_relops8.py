"""Semantics for the batch-8 operators: integer Lloyd k-means vs a
NumPy re-derivation of the same exact-arithmetic algorithm, the strict
funnel vs per-user brute force, and shard assignment vs hand-computed
md5 keys."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from ner_spark.queries_relops8 import (
    _KM_ASSIGN_ROUNDS,
    _KM_K,
    _SHARD_N,
    _SHARD_SEED,
    embedding_kmeans_lloyd,
    events_funnel_steps,
    training_shard_assign,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_matches_numpy_integer_replay(spark):
    """The engine's 3-round Lloyd trajectory equals an independent NumPy
    implementation of the same integer algorithm (milli-quantize,
    argmin with lowest-cluster tie-break, floor-mean centroid update)."""
    out = {r["vec_id"]: (r["cluster"], r["d2"]) for r in
           embedding_kmeans_lloyd(spark, SF).collect()}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.floor(
        np.stack(emb.embedding.values).astype(np.float64) * 1000
    ).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    order = np.argsort(ids)
    V, ids = V[order], ids[order]
    cent = {int(ids[i]): V[i].copy() for i in range(len(ids)) if ids[i] < _KM_K}
    for rnd in range(_KM_ASSIGN_ROUNDS):
        clusters = sorted(cent)
        C = np.stack([cent[c] for c in clusters])
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        pick = d2.argmin(axis=1)  # argmin returns first (lowest) index on ties
        assign = {int(ids[i]): (clusters[pick[i]], int(d2[i, pick[i]]))
                  for i in range(len(ids))}
        if rnd < _KM_ASSIGN_ROUNDS - 1:
            members = defaultdict(list)
            for i in range(len(ids)):
                members[clusters[pick[i]]].append(V[i])
            cent = {
                c: np.floor(
                    np.sum(m, axis=0).astype(np.float64) / len(m)
                ).astype(np.int64)
                for c, m in members.items()
            }
    assert out == assign
    assert len({c for c, _ in out.values()}) > 1, "k-means degenerated"


def test_funnel_matches_bruteforce(spark):
    rows = events_funnel_steps(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = {r["user_id"]: r for r in rows}
    assert len(rows) == ev.user_id.nunique(), "one row per user"
    for uid, g in ev.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "ts"].min()
        t2 = (
            g.loc[(g.event_type == "click") & (g.ts > t1), "ts"].min()
            if pd.notna(t1)
            else pd.NaT
        )
        t3 = (
            g.loc[(g.event_type == "purchase") & (g.ts > t2), "ts"].min()
            if pd.notna(t2)
            else pd.NaT
        )
        r = got[uid]
        for col, exp in (("t_view", t1), ("t_click", t2), ("t_purchase", t3)):
            val = r[col]
            assert (val is None) == pd.isna(exp), (uid, col, val, exp)
            if val is not None:
                assert pd.Timestamp(val) == exp, (uid, col)
        assert r["steps_reached"] == (
            3 if pd.notna(t3) else 2 if pd.notna(t2) else 1 if pd.notna(t1) else 0
        )


def test_shard_assign_keys_and_positions(spark):
    rows = training_shard_assign(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    kept = docs[docs.text.notna() & (docs.text.str.strip() != "")]
    assert len(rows) == len(kept)
    per_shard = defaultdict(list)
    for r in rows:
        # replay the md5 key
        h = hashlib.md5(f"{_SHARD_SEED}:{r['doc_id']}".encode()).hexdigest()
        key = int(h[:15], 16)
        assert r["sort_key"] == key
        assert r["shard"] == key % _SHARD_N
        per_shard[r["shard"]].append((r["pos"], key, r["doc_id"]))
    for shard, entries in per_shard.items():
        entries.sort(key=lambda e: (e[1], e[2]))
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1)), (
            "in-shard positions must be dense, md5-ordered"
        )
