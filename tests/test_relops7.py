"""Semantics for the batch-7 operators: Q13 zero-group accounting, Q7
direction filter + revenue brute force, Gopher repetition signals vs a
Python re-derivation, segment first-seen dedup vs brute force, and the
clustering coefficient vs a hand-computed small graph."""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from ner_spark.operators.dedup import segment_firstseen
from ner_spark.operators.graph import clustering_coefficients
from ner_spark.queries_relops7 import (
    doc_repetition_signals,
    tpch_q7,
    tpch_q13,
)

SF = "/root/testdata/sf0.001"


def test_q13_distribution_accounts_for_every_customer(spark):
    """sum(custdist) == |customer| (zero-order customers included), and
    the zero group matches a brute-force count."""
    out = {r["c_count"]: r["custdist"] for r in tpch_q13(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = cust.count()
    assert sum(out.values()) == n_cust
    per = Counter(
        r["o_custkey"]
        for r in orders.filter(
            ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ).collect()
    )
    keys = {r["c_custkey"] for r in cust.collect()}
    brute = Counter(per.get(k, 0) for k in keys)
    assert out == dict(brute)


def test_q7_matches_bruteforce_pandas(spark):
    """Direction filter and floor-unit revenue replayed row-at-a-time."""
    rows = tpch_q7(spark, SF).collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    nn = n.set_index("n_nationkey")["n_name"]
    sup = s.assign(supp_nation=s.s_nationkey.map(nn))[["s_suppkey", "supp_nation"]]
    cst = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cst["cust_nation"] = cst.c_nationkey.map(nn)
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        cst[["o_orderkey", "cust_nation"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j = j[(j.l_shipdate >= "1996-01-01") & (j.l_shipdate < "1998-01-01")]
    ok = ((j.supp_nation == "NATION_1") & (j.cust_nation == "NATION_2")) | (
        (j.supp_nation == "NATION_2") & (j.cust_nation == "NATION_1")
    )
    j = j[ok]
    expected = {}
    for _, r in j.iterrows():
        # mirror the engine's DECIMAL floor exactly: scale to int cents-ish
        units = int(
            (
                int(round(r.l_extendedprice * 1e6)) * int(round((1 - r.l_discount) * 1e6))
            )
            // 10**12
        )
        key = (r.supp_nation, r.cust_nation, r.l_shipdate.year)
        agg = expected.setdefault(key, [0, 0])
        agg[0] += units
        agg[1] += 1
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): [
            r["revenue_units"],
            r["n_lines"],
        ]
        for r in rows
    }
    assert got == expected


def test_repetition_signals_bruteforce(spark):
    out = {r["doc_id"]: r for r in doc_repetition_signals(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    checked = 0
    for _, d in docs.iterrows():
        if d.text is None or not d.text.strip():
            assert d.doc_id not in out
            continue
        toks = d.text.strip().split()
        r = out[d.doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(set(toks))
        assert r["dup_token_frac"] == round(1 - len(set(toks)) / len(toks), 6)
        if len(toks) >= 2:
            g2 = Counter(
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            )
            top = min(g2.items(), key=lambda kv: (-kv[1], kv[0]))
            assert (r["top_2gram"], r["top_2gram_n"]) == top
            assert r["top_2gram_frac"] == round(top[1] / (len(toks) - 1), 6)
        if len(toks) >= 5:
            g5 = Counter(
                " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
            )
            total = sum(g5.values())
            assert r["dup_5gram_frac"] == round(
                (total - len(g5)) / total, 6
            )
        checked += 1
    assert checked == len(out)


def test_segment_firstseen_bruteforce(spark):
    W = 7
    rows = [
        (1, "a b c d e f g h i j"),  # segs: "a..g", "h i j"
        (2, "a b c d e f g h i j"),  # exact dup of doc 1
        (3, "h i j"),                # equals doc 1's tail segment
        (4, "zz"),
        (5, None),
        (6, "   "),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["seg"]: (r["doc_id"], r["seg_idx"], r["n_occ"])
        for r in segment_firstseen(docs, width=W).collect()
    }
    # brute force
    occ = {}
    for doc_id, text in rows:
        if text is None or not text.strip():
            continue
        toks = text.strip().split()
        for i in range(0, (len(toks) - 1) // W + 1):
            seg = " ".join(toks[i * W : i * W + W])
            first, cnt = occ.get(seg, ((doc_id, i), 0))
            occ[seg] = (min(first, (doc_id, i)), cnt + 1)
    expected = {seg: (f[0], f[1], c) for seg, (f, c) in occ.items()}
    assert out == expected
    # the hot shared segment survives in doc 1, counted 3x
    assert out["h i j"] == (1, 1, 3)


def test_clustering_coefficient_handcomputed(spark):
    """K4 minus one edge: nodes of the missing edge have coeff 1.0 (their
    only pair of neighbors is connected), the other two have 2/3."""
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    # missing edge: (c, d)
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert out["c"]["deg"] == 2 and out["c"]["clustering_coeff"] == 1.0
    assert out["d"]["deg"] == 2 and out["d"]["clustering_coeff"] == 1.0
    assert out["a"]["deg"] == 3 and out["a"]["n_triangles"] == 2
    assert out["a"]["clustering_coeff"] == round(2 * 2 / (3 * 2), 6)
    assert out["b"]["clustering_coeff"] == round(2 * 2 / (3 * 2), 6)
    # brute check triangles for every node on a random-ish graph
    pairs = list(itertools.combinations("abcdefg", 2))
    edges2 = [p for i, p in enumerate(pairs) if i % 3 != 0]
    adj = {}
    for u, v in edges2:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out2 = {
        r["node"]: r
        for r in clustering_coefficients(
            spark.createDataFrame(edges2, ["src", "dst"])
        ).collect()
    }
    for node, nbrs in adj.items():
        if len(nbrs) < 2:
            assert node not in out2
            continue
        tri = sum(
            1 for x, y in itertools.combinations(sorted(nbrs), 2) if y in adj[x]
        )
        r = out2[node]
        assert r["n_triangles"] == tri
        assert r["clustering_coeff"] == round(
            2 * tri / (len(nbrs) * (len(nbrs) - 1)), 6
        )
