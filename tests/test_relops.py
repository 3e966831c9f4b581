"""Semantics for the relational-operator batch 2 (queries_relops):
fuzzy-linking blocking losslessness + corruption distance, MERGE row
accounting, sliding RANGE frame brute force, pivot vs conditional agg,
and k-hop BFS vs a Python brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.queries_relops import (
    events_pivot,
    events_sliding_window,
    kg_fuzzy_linking,
    orders_merge_upsert,
    wordgraph_khop,
)

SF = "/root/testdata/sf0.001"


def test_fuzzy_linking_every_mention_links_at_distance_le_1(spark):
    """Corruption is one deletion or one substitution, the dictionary holds
    every original token, and the length blocking covers len±1 — so every
    corrupted surface must link, at distance <= 1."""
    out = kg_fuzzy_linking(spark, SF).collect()
    assert len(out) > 0
    assert all(r["dist"] <= 1 for r in out)
    # corruption guarantees the surface differs from its source token, but a
    # surface may collide with ANOTHER vocab word at distance 0 — both cases
    # must resolve deterministically to the lexicographically-first best
    by_surface = {}
    for r in out:
        assert r["surface"] not in by_surface, "one row per distinct surface"
        by_surface[r["surface"]] = r
    zero = [r for r in out if r["dist"] == 0]
    for r in zero:
        assert r["surface"] == r["alias"]


def test_fuzzy_linking_blocking_is_lossless_at_distance_1(spark):
    """Brute-force (no blocking) best candidate == blocked best candidate."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .filter(F.length("t") >= 4)
        .distinct()
    )
    vocab = [r["t"] for r in toks.collect()]
    out = {r["surface"]: (r["alias"], r["dist"]) for r in
           kg_fuzzy_linking(spark, SF).collect()}

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for surface, (alias, dist) in out.items():
        cands = sorted(
            (lev(surface, a), a) for a in vocab if lev(surface, a) <= 1
        )
        assert cands, surface
        assert (cands[0][1], cands[0][0]) == (alias, dist)


def test_merge_upsert_row_accounting(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    keys = [r[0] for r in orders.select("o_orderkey").collect()]
    n_del = sum(1 for k in keys if k % 13 == 0)
    n_upd = sum(1 for k in keys if k % 7 == 0 and k % 13 != 0)
    n_ins = sum(1 for k in keys if k % 11 == 0)

    out = orders_merge_upsert(spark, SF)
    by_op = {r["merge_op"]: r["n"] for r in
             out.groupBy("merge_op").agg(F.count("*").alias("n")).collect()}
    assert by_op.get("U", 0) == n_upd
    assert by_op.get("I", 0) == n_ins
    assert by_op.get("B", 0) == n - n_upd - n_del
    assert "D" not in by_op
    # updates priced at 1.10x, inserts at 0.50x, keys disjoint from base
    rows = out.collect()
    assert all(r["o_orderstatus"] == "X" for r in rows if r["merge_op"] == "U")
    assert all(r["o_orderkey"] >= 10000000 for r in rows if r["merge_op"] == "I")


def test_sliding_window_matches_bruteforce(spark):
    out = events_sliding_window(spark, SF).collect()
    evs = sorted((r["user_id"], r["ts_us"], r["event_id"]) for r in out)
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, t, e in evs:
        by_user.setdefault(u, []).append((t, e))
    expect: dict[int, int] = {}
    for u, lst in by_user.items():
        for t, e in lst:
            expect[e] = sum(1 for t2, _ in lst if t - 3600000000 <= t2 <= t)
    for r in out:
        assert r["n_1h"] == expect[r["event_id"]], r


def test_pivot_matches_conditional_agg(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = {r["user_id"]: r.asDict() for r in events_pivot(spark, SF).collect()}
    manual = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_n"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view_n"),
    ).collect()
    assert len(out) == len(manual)
    for r in manual:
        assert out[r["user_id"]]["click_n"] == r["click_n"]
        assert out[r["user_id"]]["view_n"] == r["view_n"]


def test_khop_matches_python_bfs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r["text"] for r in docs.collect() if r["text"] is not None]
    edges = set()
    for t in texts:
        ws = t.strip().split()
        for a, b in zip(ws, ws[1:]):
            edges.add((a, b))
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    got = {r["node"]: r["dist"] for r in wordgraph_khop(spark, SF).collect()}
    seeds = {n for n in nodes if n in got and got[n] == 0}
    assert seeds, "md5 seed predicate selected no node at sf0.001"
    # Python BFS, 3 bounded hops over the directed edge set
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in (1, 2, 3):
        nxt = {v for u, v in edges if u in frontier and v not in dist}
        for v in nxt:
            dist[v] = d
        frontier = nxt
    assert got == dist


def test_json_extract_malformed_degrade(spark):
    from ner_spark.queries_relops import _EVENT_TYPES  # noqa: F401  (module import sanity)
    from pyspark.sql import functions as F

    rows = [
        (1, '{"k": 5}'),
        (2, "not json"),
        (3, '{"other": 1}'),
        (4, None),
        (5, '{"k": "7"}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, props string")
    k = F.get_json_object("props", "$.k")
    got = {
        r["event_id"]: (r["k"], r["valid"])
        for r in df.select(
            "event_id", k.cast("int").alias("k"), k.isNotNull().alias("valid")
        ).collect()
    }
    assert got == {1: (5, True), 2: (None, False), 3: (None, False),
                   4: (None, False), 5: (7, True)}


def test_forward_fill_matches_bruteforce(spark):
    from ner_spark.queries_timeseries import events_forward_fill

    sf = "/root/testdata/sf0.001"
    ev = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    )
    expect = {}
    last = {}
    for u, ts, e, typ, v in ev:
        if typ != "error" and v is not None:
            last[u] = v
        expect[e] = last.get(u)
    got = {r["event_id"]: r["filled_value"]
           for r in events_forward_fill(spark, sf).collect()}
    assert got == expect
