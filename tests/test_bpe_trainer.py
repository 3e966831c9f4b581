"""Parameterized BPE trainer vs a literal plain-Python textbook BPE.

Round-4 directive 3's "done" gate: M=50 merges on a sampled weighted
vocabulary must equal a reference implementation transcribed from the BPE
definition (Sennrich et al., ACL 2016) — same merge pairs, same counts,
same order, including the greedy left-to-right non-overlap semantics and
the (count desc, pair asc) tie-break the SQL oracle uses.
"""

from __future__ import annotations

import pytest


def _reference_bpe(vocab: dict[str, int], n_merges: int):
    """Textbook BPE: per round, count adjacent symbol pairs weighted by
    word frequency, merge the (most frequent, lexicographically smallest)
    pair greedily left-to-right in every word."""
    state = {w: [c for c in w] for w in vocab}
    merges = []
    for r in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + vocab[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2  # greedy: consume both, no overlap
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges, state


# deterministic "sampled vocab": repetitive enough for 50+ distinct merges,
# with overlap traps (aaaa), weight-driven winners, and tie candidates
_WORDS = [
    ("low", 5), ("lower", 2), ("lowest", 6), ("newer", 6), ("newest", 3),
    ("wider", 3), ("widest", 2), ("aaaa", 7), ("aaab", 4), ("banana", 5),
    ("bandana", 2), ("analysis", 3), ("analyze", 2), ("annals", 1),
    ("sparking", 4), ("sparkle", 3), ("sparse", 2), ("parser", 5),
    ("partition", 3), ("partial", 2), ("repartition", 1), ("shuffle", 4),
    ("shuffled", 2), ("shuffling", 1), ("scheduler", 2), ("schedule", 3),
    ("streaming", 4), ("stream", 6), ("streams", 2), ("upstream", 1),
    ("tokenize", 3), ("tokenizer", 2), ("tokens", 5), ("token", 7),
    ("merge", 6), ("merges", 3), ("merged", 2), ("merging", 1),
    ("mississippi", 2), ("mississippian", 1), ("abracadabra", 3),
]


@pytest.mark.parametrize("n_merges", [50])
def test_bpe_train_matches_python_reference(spark, n_merges):
    from ner_spark.operators.bpe import bpe_train

    vocab = dict(_WORDS)
    expected, _ = _reference_bpe(vocab, n_merges)
    vdf = spark.createDataFrame(list(vocab.items()), "w string, wc long")
    # scratch_every=7 forces multiple parquet lineage barriers inside 50
    # rounds, exercising the shared-storage round path, not just persist
    got = [
        (r["merge_round"], r["a"], r["b"], r["cnt"])
        for r in bpe_train(vdf, n_merges, scratch_every=7)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected


def test_bpe_segment_matches_reference_state(spark):
    """Applying the trained rules reproduces the reference's final
    segmentation word-for-word (the tokenizer-side contract)."""
    from ner_spark.operators.bpe import bpe_segment, bpe_train

    vocab = dict(_WORDS[:20])
    n = 25
    expected_merges, expected_state = _reference_bpe(vocab, n)
    vdf = spark.createDataFrame(list(vocab.items()), "w string, wc long")
    merges = [
        (r["merge_round"], r["a"], r["b"], r["cnt"])
        for r in bpe_train(vdf, n).orderBy("merge_round").collect()
    ]
    assert merges == expected_merges
    seg = bpe_segment(vdf, merges)
    got: dict[str, list[str]] = {}
    for row in seg.orderBy("w", "pos").collect():
        got.setdefault(row["w"], []).append(row["sym"])
    assert got == expected_state


def test_bpe_train_early_stop_on_exhausted_vocab(spark):
    """Single-symbol words have no adjacent pairs after enough merges —
    the trainer must stop early, mirroring the oracle's empty LIMIT 1."""
    from ner_spark.operators.bpe import bpe_train

    vdf = spark.createDataFrame([("ab", 3), ("ab", 0)][:1], "w string, wc long")
    out = bpe_train(vdf, n_merges=10).collect()
    assert [(r["merge_round"], r["a"], r["b"], r["cnt"]) for r in out] == [
        (0, "a", "b", 3)
    ]
