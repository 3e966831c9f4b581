"""Semantics for the round-3 curation additions, each checked against an
independent Python re-derivation (not the SQL oracle): DSIR importance
weights vs a Counter/math.log replay, and SemDeDup pruning vs a NumPy
assign-block-cosine replay."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _round_half_away(x: float, digits: int = 0) -> float:
    """Mirror Spark HALF_UP / DuckDB round (Python round() is half-even)."""
    scale = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def _docs():
    # mirror the engine filter exactly: F.trim strips SPACES only, so a
    # tab/newline-only text passes length(trim(text)) > 0 in both engines
    d = pd.read_parquet(f"{SF}/documents.parquet")
    return d[d.text.notna() & (d.text.str.strip(" ") != "")]


def _engine_tokens(text: str) -> list[str]:
    # F.split(F.trim(text), r"\s+") with Spark's limit=-1: space-trim only,
    # and leading/trailing NON-space whitespace yields empty edge tokens
    return re.split(r"\s+", text.strip(" "))


def test_importance_weights_match_counter_replay(spark):
    from ner_spark.queries_curation3 import _B, _TARGET_LANG, corpus_importance_weights

    doc_buckets: dict[int, Counter] = {}
    doc_lang: dict[int, str] = {}
    tgt: Counter = Counter()
    raw: Counter = Counter()
    for _, row in _docs().iterrows():
        toks = _engine_tokens(row.text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        buckets = Counter(_md5_60(f) % _B for f in feats)
        doc_buckets[row.doc_id] = buckets
        doc_lang[row.doc_id] = row.lang
        raw.update(buckets)
        if row.lang == _TARGET_LANG:
            tgt.update(buckets)
    tot_t, tot_r = sum(tgt.values()), sum(raw.values())
    s_e6 = {
        b: int(
            _round_half_away(
                (
                    math.log((tgt.get(b, 0) + 1.0) / (tot_t + _B))
                    - math.log((raw[b] + 1.0) / (tot_r + _B))
                )
                * 1e6
            )
        )
        for b in raw
    }
    exp = {
        d: (
            doc_lang[d],
            sum(c.values()),
            sum(n * s_e6[b] for b, n in c.items()),
        )
        for d, c in doc_buckets.items()
    }

    got = {
        r["doc_id"]: (r["lang"], r["n_feats"], r["weight_e6"])
        for r in corpus_importance_weights(spark, SF).collect()
    }
    assert got == exp

    # the weight separates the target slice: English docs should score
    # higher on average than the rest (that is the point of DSIR)
    en = [w for (lg, _, w) in got.values() if lg == _TARGET_LANG]
    rest = [w for (lg, _, w) in got.values() if lg != _TARGET_LANG]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_semantic_prune_matches_numpy_replay(spark):
    from ner_spark.queries_hash import (
        SEM_THRESHOLD,
        _dedup_semantic_prune,
        ivf_centroids_for,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    # planted jittered copies (mirrors queries._jittered_embeddings)
    for vid in sorted(V):
        if vid < 1_000_000_000 and vid % 10 == 0:
            V[vid + 1_000_000_000] = V[vid] + 0.05 * np.sin(
                np.arange(64, dtype=np.float64) + vid
            )

    C = np.asarray(ivf_centroids_for(SF), dtype=np.float64)
    cells: dict[int, int] = {}
    for vid, v in V.items():
        d = np.round(np.sum(C * C, axis=1) - 2.0 * (C @ v), 6)
        cells[vid] = int(np.lexsort((np.arange(len(C)), d))[0])

    by_cell = defaultdict(list)
    for vid in sorted(V):
        by_cell[cells[vid]].append(vid)
    exp = {}
    for cell, members in by_cell.items():
        for j, vid in enumerate(members):
            best = None
            for keeper in members[:j]:
                a, b = V[keeper], V[vid]
                score = _round_half_away(
                    float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))),
                    4,
                )
                if score >= SEM_THRESHOLD and (
                    best is None or (-score, keeper) < (-best[1], best[0])
                ):
                    best = (keeper, score)
            if best is not None:
                exp[vid] = (cell, best[0], best[1])

    got = {
        r["vec_id"]: (r["cell"], r["keeper"], r["score"])
        for r in _dedup_semantic_prune(spark, SF).collect()
    }
    assert got == exp
    # every planted copy whose source shares its cell must be pruned by it
    pruned_to_source = sum(
        1 for v, (_, k, _) in got.items() if v >= 1_000_000_000 and k == v - 1_000_000_000
    )
    assert pruned_to_source > 0
