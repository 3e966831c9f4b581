"""Semantics for the iterative BPE trainer: the engine's 4 learned merges
must equal a classic dict-based BPE replay (weighted vocab, overlapping
pair counts, greedy left-to-right non-overlapping merge application)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _classic_bpe(rounds: int):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab: Counter = Counter()
    for t in docs.text.dropna():
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    state = {w: list(w) for w in vocab}
    merges = []
    for r in range(rounds):
        cnt: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += vocab[w]
        # argmax count, tie-break lexicographically smallest pair
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, c))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def test_bpe_train_matches_classic_replay(spark):
    from ner_spark.queries_textmine2 import _BPE_ROUNDS, bpe_train_merges

    got = sorted(
        (r["merge_round"], r["a"], r["b"], r["cnt"])
        for r in bpe_train_merges(spark, SF).collect()
    )
    exp = _classic_bpe(_BPE_ROUNDS)
    assert got == exp
    # the merges must be distinct rules (each round eliminates its pair)
    assert len({(a, b) for _, a, b, _ in got}) == _BPE_ROUNDS


def test_bpe_train_empty_vocab_yields_no_rows(spark, tmp_path):
    """A corpus with no [a-z]{2,} words must yield ZERO merges (not
    all-NULL struct-min rows) — mirrors the oracle's empty LIMIT 1."""
    import pandas as pd

    from ner_spark.queries_textmine2 import bpe_train_merges

    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["123 456 !!", None],
         "lang": ["en", "en"], "source": ["s", "s"], "n_chars": [10, 0]}
    ).to_parquet(tmp_path / "documents.parquet")
    assert bpe_train_merges(spark, str(tmp_path)).count() == 0
