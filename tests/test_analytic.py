"""Analytic query semantics: fixed-point PageRank brute force, exact
percentile interpolation, and broadcast plan shape for the top-k revenue."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.operators.graph import BASE, DAMP_NUM, UNIT, pagerank_fixedpoint
from tests.test_plans import plan_of


def _pagerank_py(edges: list[tuple[str, str, int]], iters: int = 3) -> dict[str, int]:
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    outdeg: dict[str, int] = {}
    for u, _, w in edges:
        outdeg[u] = outdeg.get(u, 0) + w
    rank = {n: UNIT for n in nodes}
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for u, v, w in edges:
            contrib[v] += rank[u] * w // outdeg[u]
        rank = {n: BASE + DAMP_NUM * contrib[n] // UNIT for n in nodes}
    return rank


def test_pagerank_fixedpoint_matches_bruteforce(spark):
    edges = [
        ("a", "b", 2),
        ("a", "c", 1),
        ("b", "c", 1),
        ("c", "a", 1),
        ("d", "a", 3),  # d has no in-edges -> settles at BASE
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in pagerank_fixedpoint(df, iters=3).collect()}
    assert got == _pagerank_py(edges, iters=3)
    assert got["d"] == BASE


def test_pagerank_total_mass_conserved_modulo_truncation(spark):
    """Every node's rank stays in [BASE, n*UNIT] and dangling-free graphs
    keep total mass near n*UNIT (truncation only loses < 1 unit per edge)."""
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    ranks = [r["rank"] for r in pagerank_fixedpoint(df, iters=5).collect()]
    assert all(r >= BASE for r in ranks)
    assert abs(sum(ranks) - 3 * UNIT) <= 5 * len(edges)


def test_percentile_matches_linear_interpolation(spark):
    df = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4, 10]], "q double")
    row = df.agg(
        F.expr("percentile(q, 0.5)").alias("p50"),
        F.expr("percentile(q, 0.75)").alias("p75"),
    ).collect()[0]
    assert row["p50"] == 3.0
    assert row["p75"] == 4.0  # index 0.75*(5-1)=3 exactly
    row2 = (
        spark.createDataFrame([(1.0,), (2.0,)], "q double")
        .agg(F.expr("percentile(q, 0.25)").alias("p"))
        .collect()[0]
    )
    assert row2["p"] == 1.25  # 1 + 0.25*(2-1)


def test_running_total_window_is_partitioned(spark):
    """The cumulative-spend window must hash-partition by customer — a
    single-partition Exchange here would serialize the whole table."""
    from ner_spark.queries_analytic import orders_running_total

    plan = plan_of(orders_running_total(spark, "/root/testdata/sf0.001"), "simple")
    assert "SinglePartition" not in plan
    assert "hashpartitioning(o_custkey" in plan


def test_nation_top_parts_broadcasts_dims(spark):
    from ner_spark.queries_analytic import nation_top_parts

    plan = plan_of(nation_top_parts(spark, "/root/testdata/sf0.001"), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_entity_profiles_top5_matches_bruteforce(spark):
    from collections import Counter

    from ner_spark.queries_analytic import kg_entity_profiles

    sf = "/root/testdata/sf0.001"
    texts = [r["text"] for r in
             spark.read.parquet(f"{sf}/documents.parquet").collect()
             if r["text"] is not None]
    co = Counter()
    for t in texts:
        ws = t.strip().split()
        for a, b in zip(ws, ws[1:]):
            if a != b:
                co[(a, b)] += 1
                co[(b, a)] += 1
    want = {}
    nodes = {a for a, _ in co}
    for n in nodes:
        nbrs = sorted(((-c, nbr) for (a, nbr), c in co.items() if a == n))[:5]
        want[n] = [(nbr, -negc, i + 1) for i, (negc, nbr) in enumerate(nbrs)]
    got = {}
    for r in kg_entity_profiles(spark, sf).collect():
        got.setdefault(r["node"], []).append((r["nbr"], r["weight"], r["rk"]))
    for n in got:
        got[n].sort(key=lambda x: x[2])
    assert got == want


def test_window_uniques_matches_distinct(spark):
    from pyspark.sql import functions as F

    from ner_spark.queries_analytic import events_window_uniques

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/events.parquet")
    direct = {
        r["w"]: r["u"]
        for r in e.groupBy(F.window("ts", "1 hour").start.alias("w"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    got = {r["win_start"]: r["unique_users"]
           for r in events_window_uniques(spark, sf).collect()}
    assert got == direct
