"""Invariant tests for sorted-neighborhood dedup (queries_snm.py /
operators/dedup.py:sorted_neighborhood_pairs). The full procedure — key
normalization, prefix blocking, window adjacency, Jaccard verify — is
re-derived independently in python over the same rows."""

from __future__ import annotations

import re

import pytest

from ner_spark.operators.dedup import sorted_neighborhood_pairs


@pytest.fixture(scope="module")
def corpus():
    return [
        # 1/2: same long prefix, one token edited mid-document -> adjacent
        # in sort order, Jaccard above 0.8
        (1, "the quick brown fox jumps over the lazy dog near the old barn"),
        (2, "the quick brown fox leaps over the lazy dog near the old barn"),
        # 3: same 2-char block ("th") but different key -> sorts away
        (3, "things fall apart the centre cannot hold mere anarchy is loosed"),
        # 4/5: exact duplicates in another block
        (4, "zebra patterns emerge when stripes align across the savanna"),
        (5, "zebra patterns emerge when stripes align across the savanna"),
        # 6: lone doc in its own block
        (6, "quorum reads dominate the tail latency of the replicated log"),
        # 7: empty-after-normalization -> dropped
        (7, "!!! ???"),
        (8, None),
    ]


def _snm_python(rows, window=3, pct=80, key_len=64, block_len=2):
    keyed = []
    for doc, text in rows:
        if text is None or not text.strip():
            continue
        skey = re.sub(r"[^a-z0-9]+", "", text.lower())[:key_len]
        if not skey:
            continue
        toks = frozenset(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
        keyed.append((skey[:block_len], skey, doc, toks))
    out = {}
    blocks: dict[str, list] = {}
    for blk, skey, doc, toks in keyed:
        blocks.setdefault(blk, []).append((skey, doc, toks))
    for blk, items in blocks.items():
        items.sort()
        for i, (_, doc, toks) in enumerate(items):
            for off in range(1, window):
                if i + off >= len(items):
                    break
                _, d2, t2 = items[i + off]
                a, b = min(doc, d2), max(doc, d2)
                inter = len(toks & t2)
                uni = len(toks) + len(t2) - inter
                if inter * 100 >= uni * pct:
                    out[(a, b)] = round(inter / uni, 4)
    return out


def test_matches_python_recompute(spark, corpus):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in sorted_neighborhood_pairs(df, window=3, threshold_pct=80).collect()
    }
    assert got == _snm_python(corpus)
    # the mid-document edit and the exact dup are both caught
    assert (1, 2) in got and (4, 5) in got
    # the same-block-different-key doc pairs with nobody
    assert all(3 not in p for p in got)


def test_window_width_bounds_comparisons(spark):
    # five docs sharing one key prefix, each a superset of the last: with
    # window=2 only sort-adjacent pairs can surface; window=4 reaches 3 out
    base = "same same same alpha beta gamma delta epsilon".split()
    rows = [
        (i, " ".join(base + [f"extra{j}" for j in range(i)])) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    narrow = {
        (r.doc_a, r.doc_b)
        for r in sorted_neighborhood_pairs(df, window=2, threshold_pct=10).collect()
    }
    wide = {
        (r.doc_a, r.doc_b)
        for r in sorted_neighborhood_pairs(df, window=4, threshold_pct=10).collect()
    }
    assert narrow <= wide
    for a, b in narrow:
        # sort order here is doc order (keys are prefix-nested, len-sorted
        # equal-prefix ties break on skey then doc) -> adjacency means b-a
        # within window-1
        assert abs(b - a) <= 1
    assert all(abs(b - a) <= 3 for a, b in wide)


def test_cross_block_pairs_never_compared(spark):
    # identical token sets but keys start with different characters: the
    # documented recall trade of single-pass SNM — never compared
    rows = [
        (1, "apple banana cherry damson elderberry fig grape"),
        (2, "banana apple cherry damson elderberry fig grape"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert sorted_neighborhood_pairs(df, threshold_pct=10).count() == 0


class TestMultipass:
    def test_reversed_pass_recovers_boundary_misses(self, spark):
        from ner_spark.operators.dedup import sorted_neighborhood_multipass

        rows = [
            # 1/2: first token swapped (different forward blocks) but the
            # long shared tail means the REVERSED keys agree -> pass-2 catch
            (1, "apple banana cherry damson elderberry fig grapefruit kiwi"),
            (2, "banana apple cherry damson elderberry fig grapefruit kiwi"),
            # 3/4: forward-adjacent near-dups (pass-1 catch, regression)
            (3, "zebra stripes align across the savanna at golden hour"),
            (4, "zebra stripes align across the savanna at golden dusk"),
            # 5: unrelated
            (5, "query planner chooses hash join over sort merge join"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        single = {
            (r.doc_a, r.doc_b)
            for r in sorted_neighborhood_pairs(df, threshold_pct=60).collect()
        }
        multi = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in sorted_neighborhood_multipass(df, threshold_pct=60).collect()
        }
        # multipass is a strict superset of the single pass
        assert single <= set(multi)
        # the boundary-straddling pair is pass-2-only
        assert (1, 2) not in single and (1, 2) in multi
        # same token sets -> Jaccard 1.0
        assert multi[(1, 2)] == 1.0
        # the forward-adjacent pair survives both
        assert (3, 4) in single and (3, 4) in multi

    def test_matches_python_recompute(self, spark, corpus):
        from ner_spark.operators.dedup import sorted_neighborhood_multipass

        df = spark.createDataFrame(corpus, ["doc_id", "text"])
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in sorted_neighborhood_multipass(
                df, window=3, threshold_pct=80
            ).collect()
        }
        want = dict(_snm_python(corpus))
        # reversed-key pass re-derived with key = norm[::-1]
        rows_rev = [
            (d, t) for d, t in corpus
        ]
        keyed = []
        for doc, text in rows_rev:
            if text is None or not text.strip():
                continue
            norm = re.sub(r"[^a-z0-9]+", "", text.lower())
            skey = norm[::-1][:64]
            if not skey:
                continue
            toks = frozenset(
                t for t in re.split(r"[^a-z0-9]+", text.lower()) if t
            )
            keyed.append((skey[:2], skey, doc, toks))
        blocks: dict[str, list] = {}
        for blk, skey, doc, toks in keyed:
            blocks.setdefault(blk, []).append((skey, doc, toks))
        for blk, items in blocks.items():
            items.sort()
            for i, (_, doc, toks) in enumerate(items):
                for off in (1, 2):
                    if i + off >= len(items):
                        break
                    _, d2, t2 = items[i + off]
                    a, b = min(doc, d2), max(doc, d2)
                    inter = len(toks & t2)
                    uni = len(toks) + len(t2) - inter
                    if inter * 100 >= uni * 80:
                        want[(a, b)] = round(inter / uni, 4)
        assert got == want
