"""Invariant tests for the final IR/anomaly/containment batch
(ner_spark/queries_ir2.py): each property is re-derived independently in
pandas/python over the same rows, never trusted from the operator."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ner_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from ner_spark.operators.textstats import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # doc 2 contains doc 1 verbatim plus a long unrelated tail:
        # containment(1,2)=1.0 while Jaccard is diluted by the tail
        (
            2,
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen seventeen",
        ),
        (3, "totally unrelated words about database engines and storage"),
        (4, "totally unrelated words about database engines and storage"),
        (5, "query planner chooses hash join over sort merge join today"),
    ]
    return rows


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    return spark.createDataFrame(corpus, ["doc_id", "text"])


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip())
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class TestContainment:
    def test_subset_dup_caught_where_jaccard_misses(self, corpus_df):
        pairs = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(corpus_df, threshold_pct=50).collect()
        }
        # doc 1 inside doc 2: full directional containment
        assert pairs[(1, 2)] == 1.0
        # the same pair is invisible to a 0.5-resemblance Jaccard pass
        jac = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(corpus_df, threshold=0.5).collect()
        }
        assert (1, 2) not in jac
        # exact duplicates score 1.0 under both
        assert pairs[(3, 4)] == 1.0 and (3, 4) in jac

    def test_matches_python_recompute(self, corpus_df, corpus):
        got = {
            (r.doc_a, r.doc_b): (r.n_a, r.n_b, r.inter, r.containment)
            for r in containment_pairs(corpus_df, threshold_pct=50).collect()
        }
        sh = {d: _shingles(t) for d, t in corpus}
        want = {}
        for a in sh:
            for b in sh:
                if a < b and sh[a] & sh[b]:
                    inter = len(sh[a] & sh[b])
                    small = min(len(sh[a]), len(sh[b]))
                    if inter * 100 >= small * 50:
                        want[(a, b)] = (
                            len(sh[a]),
                            len(sh[b]),
                            inter,
                            round(inter / small, 4),
                        )
        assert got == want


class TestBM25:
    def test_matches_python_recompute(self, corpus_df, corpus):
        out = bm25_topk(corpus_df, k=3, n_query_terms=4, min_term_len=4)
        rows = out.collect()
        # python recompute (same tokenization, same rational form)
        tf: Counter = Counter()
        dl: dict[int, int] = {}
        for d, t in corpus:
            toks = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
            dl[d] = len(toks)
            for w in toks:
                tf[(d, w)] += 1
        df: Counter = Counter()
        for (d, w), _ in tf.items():
            df[w] += 1
        n = len(dl)
        s = sum(dl.values())
        qterms = sorted(
            (w for w in df if len(w) >= 4), key=lambda w: (-df[w], w)
        )[:4]
        want = {}
        for w in qterms:
            scored = []
            for d in dl:
                if (d, w) in tf:
                    t_ = tf[(d, w)]
                    idf = math.log((2.0 * (n + 1)) / (2 * df[w] + 1))
                    tfn = (22.0 * t_ * s) / (10.0 * t_ * s + 3.0 * s + 9.0 * dl[d] * n)
                    scored.append((round(idf * tfn, 6), d, t_))
            scored.sort(key=lambda x: (-x[0], x[1]))
            for rk, (sc, d, t_) in enumerate(scored[:3], 1):
                want[(w, d)] = (t_, df[w], dl[d], sc, rk)
        got = {(r.term, r.doc_id): (r.tf, r.df, r.dl, r.score, r.rk) for r in rows}
        assert got == want

    def test_ranking_is_per_term_and_monotone(self, corpus_df):
        rows = bm25_topk(corpus_df, k=3, n_query_terms=4, min_term_len=4).collect()
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r.term, []).append(r)
        assert len(by_term) <= 4
        for term, rs in by_term.items():
            rs.sort(key=lambda r: r.rk)
            assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
            scores = [r.score for r in rs]
            assert scores == sorted(scores, reverse=True)


class TestAnomalyZscore:
    def test_matches_python_recompute(self, spark):
        # deterministic synthetic stream: 3 users x 30 events, a few spikes
        rows = []
        eid = 0
        for u in range(3):
            for i in range(30):
                v = 10.0 + (i % 5)  # tight cluster
                if i == 7:
                    v = 500.0 + u  # clear spike
                rows.append((eid, u, v))
                eid += 1
        # one user below the n floor
        rows += [(eid + j, 99, 1000.0 * j) for j in range(5)]
        df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])

        from ner_spark.queries_ir2 import _Z_MIN_N

        dec = "decimal(38,0)"
        v = df.select(
            "event_id", "user_id", F.floor(F.col("value") * 1000).alias("v_milli")
        )
        vm = F.col("v_milli").cast(dec)
        st = v.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_user"),
            F.sum(vm).alias("s"),
            F.sum(vm * vm).alias("q"),
        )
        dev = F.col("n_user").cast(dec) * F.col("v_milli").cast(dec) - F.col("s")
        var_n2 = F.col("n_user").cast(dec) * F.col("q") - F.col("s") * F.col("s")
        out = (
            v.join(F.broadcast(st), "user_id")
            .filter(
                (F.col("n_user") >= _Z_MIN_N)
                & (dev * dev > F.lit(9).cast(dec) * var_n2)
            )
            .select("event_id", "user_id", "v_milli", "n_user")
        )
        got = {(r.event_id, r.user_id) for r in out.collect()}

        # exact-integer recompute
        per_user: dict[int, list[tuple[int, int]]] = {}
        for e, u, val in rows:
            per_user.setdefault(u, []).append((e, math.floor(val * 1000)))
        want = set()
        for u, evs in per_user.items():
            n = len(evs)
            if n < _Z_MIN_N:
                continue
            s_ = sum(v_ for _, v_ in evs)
            q_ = sum(v_ * v_ for _, v_ in evs)
            for e, v_ in evs:
                if (n * v_ - s_) ** 2 > 9 * (n * q_ - s_ * s_):
                    want.add((e, u))
        assert got == want
        # exactly the three injected spikes (one per eligible user)
        assert len(got) == 3
        assert all(u != 99 for _, u in got)
