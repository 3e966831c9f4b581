"""Graph ranking: fixed-point PageRank over a weighted edge list.

Ranks are BIGINT micro-units (1.0 == 1_000_000) and every step is integer
multiply / integer division — exact, order-independent arithmetic, so the
unrolled iterations replay bit-for-bit in ANSI SQL (float PageRank cannot be
hash-compared across engines: double sums are order-sensitive). Truncating
division is applied per edge, making the semantics fully deterministic at
any parallelism.

Scale shape: one iteration = join edges->outdeg (both keyed by src; the
outdeg table reuses the edges shuffle partitioning) + one groupBy(dst) sum.
Iterations unroll into a single Catalyst plan; for many iterations persist
the rank table per round instead (lineage growth), and pre-partition edges
by src so every round reuses the same exchange.

Companion to the connected-components canonicalizer
(operators/canonicalize.py) — together they cover the iterative-algorithm
class the north-star pipeline needs (cluster, then rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scratch import scratch_persist

UNIT = 1_000_000
DAMP_NUM = 850_000  # 0.85 in micro-units
BASE = UNIT - DAMP_NUM  # 0.15


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """PageRank over weighted directed edges, fixed-point integer form:

        r0(v)     = UNIT
        contrib_e = (r(u) * w_e) div outdeg(u)        -- per-edge truncation
        r'(v)     = BASE + (DAMP * sum contrib) div UNIT

    Nodes with no in-edges settle at BASE; out-edge-less nodes leak mass
    (the standard simplification). Returns (node, rank) with rank in
    micro-units.
    """

    # e / nodes / outdeg are consumed by EVERY unrolled iteration — without
    # barriers the edge-derivation subtree recomputes iters(+2) times per
    # action (same multi-consumer pattern as minhash_verified_pairs)
    e = scratch_persist(edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).cast("long").alias("w")
    ))
    nodes = scratch_persist(
        e.select(F.col("u").alias("node")).union(e.select("v")).distinct()
    )
    outdeg = e.groupBy("u").agg(F.sum("w").alias("outdeg"))
    rank = nodes.select("node", F.lit(UNIT).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(rank.withColumnRenamed("node", "u"), "u")
            .join(outdeg, "u")
            .select("v", F.expr("rank * w div outdeg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = nodes.join(
            contrib.withColumnRenamed("v", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit(BASE)
                + F.expr(f"{DAMP_NUM} * coalesce(contrib, 0L) div {UNIT}")
            ).cast("long").alias("rank"),
        )
    return rank


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Synchronous weighted mode-label propagation (community detection).

    Labels start as the node's own id; each round every node adopts the
    label carrying the highest incident edge weight among its neighbors'
    current labels, ties broken to the lexicographically smallest label —
    fully deterministic, so the unrolled rounds replay in ANSI SQL. The
    directed input is symmetrized (u->v and v->u, weights summed) and
    self-loops dropped.

    Scale shape per round: one shuffle on (node, label) for the weighted
    vote (map-side combinable) + a per-node argmax window (partitioned by
    node — never a global sort). The symmetrized edge list feeds every
    round, hence the explicit barrier (multi-consumer pattern as in
    pagerank_fixedpoint).
    """
    from pyspark.sql import Window

    d = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    e = scratch_persist(
        d.unionByName(d.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    rk = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("label"))
    for _ in range(rounds):
        votes = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.sum("w").alias("wsum"))
        )
        labels = (
            votes.withColumn("__rk", F.row_number().over(rk))
            .filter(F.col("__rk") == 1)
            .select("node", "label")
        )
    return labels


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    Canonical ordered enumeration: every edge is normalized to ``u < v``
    and deduplicated, then a triangle ``a < b < c`` is found exactly once
    as the wedge (a,b)+(b,c) closed by (a,c) — two equi-joins, no
    candidate is generated twice, so no post-hoc dedup shuffle is needed.

    Scale shape: the wedge join keys on the shared vertex ``b``; its
    output size is sum(deg(b)^2 / 2), so at 100 TB the standard prefilter
    is to drop (or handle separately) super-hub vertices above a degree
    cap before the join — hub handling mirrors the salted self-join in
    operators/linking.py. The closing join is an equi-join on both
    endpoints. The normalized edge list is consumed by three plan
    branches, hence the explicit barrier (same multi-consumer pattern as
    pagerank_fixedpoint above).
    """

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = scratch_persist(e)
    wedge = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(
            e.select(F.col("u").alias("b"), F.col("v").alias("c")),
            "b",
        )
    )
    tri = wedge.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def link_prediction_cn(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Common-neighbor / neighborhood-Jaccard link prediction over an
    undirected graph: score every NON-adjacent pair that shares at least
    one neighbor.

    Same canonical normalization as :func:`triangle_counts` (u < v,
    dedup), then the symmetric adjacency list self-joins on the shared
    neighbor — the wedge join. A wedge (a, v, b) contributes one common
    neighbor to the pair (a, b); pairs that are themselves edges are
    removed with a left-anti join, NOT a NOT-IN subquery (anti hash join
    scales; NOT IN re-shuffles the candidate set per probe).

    Exactness: cn / deg are integers; the reported neighborhood Jaccard
    cn / (deg_a + deg_b - cn) is a single IEEE division of two exact
    integers, identical on any engine, rounded once at the edge of the
    query (same policy as the dedup operators).

    Scale shape: wedge output is sum(deg(v)^2 / 2) over shared vertices —
    at 100 TB apply the super-hub degree cap before the join (hubs'
    common-neighbor counts are uninformative anyway; the cap is the
    standard AllPairs/CN prefilter, mirroring the salted-join note in
    operators/linking.py). Degrees attach by two equi-joins keyed on the
    pair endpoints; the degree table is |V|-sized and broadcasts.
    """

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = scratch_persist(e)
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    wedge = (
        adj.select(F.col("node").alias("node_a"), "nbr")
        .join(adj.select(F.col("node").alias("node_b"), "nbr"), "nbr")
        .filter(F.col("node_a") < F.col("node_b"))
    )
    cand = wedge.groupBy("node_a", "node_b").agg(F.count(F.lit(1)).alias("cn"))
    non_edges = cand.join(
        e,
        (cand.node_a == e.u) & (cand.node_b == e.v),
        "left_anti",
    )
    da = F.broadcast(deg.select(F.col("node").alias("node_a"), F.col("deg").alias("deg_a")))
    db = F.broadcast(deg.select(F.col("node").alias("node_b"), F.col("deg").alias("deg_b")))
    out = non_edges.join(da, "node_a").join(db, "node_b")
    jacc = F.col("cn") / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
    return out.select(
        "node_a",
        "node_b",
        "cn",
        "deg_a",
        "deg_b",
        F.round(jacc, 6).alias("nbr_jaccard"),
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient 2T / (d*(d-1)) over an
    undirected graph (nodes with degree >= 2; T = triangles through the
    node).

    Reuses the ordered-wedge triangle enumeration of
    :func:`triangle_counts` (each triangle found exactly once, no
    post-hoc dedup shuffle) and the symmetric-adjacency degree count.
    Zero-triangle nodes are preserved with a LEFT join + coalesce — the
    coefficient's denominator d*(d-1) is exact-integer, and the single
    IEEE division is rounded once at the edge of the query, so the
    result replays bit-identically on any engine.

    Scale shape: identical to triangle_counts (wedge join keyed on the
    middle vertex; super-hub degree cap is the standard prefilter at
    100 TB); the degree table is |V|-sized and joins map-side after the
    triangle aggregate.
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    adj = e.distinct()
    deg = (
        adj.select(F.col("u").alias("node"))
        .union(adj.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(e, src="u", dst="v")
    out = deg.filter(F.col("deg") >= 2).join(tri, "node", "left")
    n_tri = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    coeff = (F.lit(2) * n_tri) / (F.col("deg") * (F.col("deg") - 1))
    return out.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        n_tri.alias("n_triangles"),
        F.round(coeff, 6).alias("clustering_coeff"),
    )
