"""S6 canonicalization: connected components over a similarity edge list.

North_star stage (no reference counterpart; the reference's exact-match
dedup D1 and consensus join C1 are degenerate exact-key forms of blocking +
resolution, SURVEY.md §2 "capability gaps").

Connected components WITHOUT GraphFrames: the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14) expressed on DataFrames. Each iteration is two
groupBy-min shuffles; converges in O(log^2 n) iterations on pathological
graphs, 2-4 iterations on the star-ish alias graphs linking produces.

Skew: hot entities ("France") produce high-degree nodes. large-star/
small-star is specifically skew-tolerant (a high-degree node's edges hash
across partitions; the groupBy key is the node, and its min-neighbor
aggregate is a partial-aggregatable min). The salted self-join helper below
is for *building* similarity edges over a skewed blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _edge_stats(e: DataFrame) -> tuple[int, int]:
    """(count, order-independent checksum) of an edge set in ONE action.

    Convergence probe: two consecutive rounds with equal count AND equal
    sum-of-xxhash64 are the same distinct edge set (collision odds ~2^-64
    per round). Replaces the round-1 ``exceptAll``/isEmpty probe, which was
    a full anti-join shuffle per iteration; the checksum is a map-side
    partial aggregate (summed as decimal so 10^12 edges cannot overflow).
    """
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"] or 0)


def _driver_union_find(pairs: list[tuple]) -> dict:
    """Union-find with min-label union: attaching the larger root under the
    smaller keeps every root equal to the minimum member of its set, so
    ``find(x)`` at the end IS the canonical component id."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame, max_iter: int = 30, small_graph_threshold: int = 100_000
) -> DataFrame:
    """(src, dst) edge list -> (node, component) with component = min node id
    of the component (lexicographic for strings — stable, deterministic).

    Graphs whose distinct edge count is <= ``small_graph_threshold`` resolve
    driver-side (one collect + union-find, same output) — the iterative
    star rounds are pure fixed scheduling cost at that size.

    Alternating large-star / small-star (Kiveris et al., SOCC'14):
    - edges are kept oriented larger -> smaller (``src > dst``);
    - large-star(u): over the full neighborhood, connect every *larger*
      neighbor v to m = min(N(u) ∪ {u});
    - small-star(u): over the smaller neighbors, connect every v ∈ N(u) ∪
      {u} (except m itself) to m = min(N(u));
    - converged when a round leaves the edge set unchanged (star forest).

    Each iteration is two aggregations + two joins on the node id; the min
    aggregate is partial-aggregatable, so a high-degree (skewed) node's
    neighborhood combines map-side.

    Per-round barrier: each round's edge set is written to parquet under a
    cluster-visible scratch dir (``session_scratch_dir``) and read back.
    This truncates the otherwise exponentially-growing logical plan (each
    round references the previous round's frame ~12×) exactly like a
    checkpoint, but fault-tolerantly: a ``localCheckpoint`` stores blocks
    on executors, so on a real cluster one lost executor mid-CC kills the
    whole truncated lineage — a parquet round on shared storage survives
    executor loss and is recomputable partition-by-partition. The write
    alternates between two subdirs (round i only reads round i-1), so
    storage stays O(|edges|) regardless of round count.
    """
    from .scratch import session_scratch_dir

    spark = edges.sparkSession
    # the initial distinct edge set feeds _edge_stats AND round 0 (or the
    # fast-path collect); persist — not localCheckpoint — keeps the lineage
    # recoverable while preventing a recompute between the two consumers
    e = (
        _symmetrize(edges)
        .select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
        .distinct()
        .persist()
    )
    e0 = e
    n_edges, chk = _edge_stats(e)
    if n_edges <= small_graph_threshold:
        # Small-graph fast path: each large/small-star round is ~6 Spark jobs
        # of pure scheduling cost; below the threshold the distinct edge set
        # fits trivially in the driver, and one collect + union-find returns
        # the identical (node, component) assignment. The distributed path
        # below is the 10^12-doc scale recipe; pass small_graph_threshold=0
        # to force it (tests compare both). The collect is bounded by the
        # threshold and e is already materialized by the _edge_stats pass.
        from pyspark.sql.types import StructField, StructType

        mapping = _driver_union_find([(r["src"], r["dst"]) for r in e.collect()])
        node_t = e.schema["src"].dataType
        out_schema = StructType(
            [StructField("node", node_t), StructField("component", node_t)]
        )
        e0.unpersist()
        return spark.createDataFrame(sorted(mapping.items()), out_schema)
    scratch = session_scratch_dir(spark, prefix="cc_rounds")
    for i in range(max_iter):
        # --- large-star ---
        sym = _symmetrize(e)  # (src=u, dst=neighbor)
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # --- small-star (input already oriented src>dst) ---
        mins2 = large.groupBy("src").agg(F.min("dst").alias("m"))
        part1 = (
            large.join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        part2 = mins2.select("src", F.col("m").alias("dst"))
        out_dir = f"{scratch}/r{i % 2}"
        part1.unionByName(part2).distinct().write.mode("overwrite").parquet(out_dir)
        e_new = spark.read.parquet(out_dir)
        if i == 0:
            e0.unpersist()  # rounds now source from parquet, not the input set
        n_new, chk_new = _edge_stats(e_new)
        if n_new == n_edges and chk_new == chk:
            e = e_new
            break
        e, n_edges, chk = e_new, n_new, chk_new
    else:
        # falling through without the convergence break would label rows of
        # one true component with DIFFERENT ids — fail loudly instead of
        # returning a silently-inconsistent assignment
        e0.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} star rounds"
        )
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = (
        comp.select(F.col("component").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return comp.unionByName(roots).distinct()


def incremental_components(
    prev: DataFrame, new_edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Delta-update connected components: fold a batch of NEW edges into an
    existing ``(node, component)`` assignment without re-walking the
    historical edge set.

    This is the 100 TB canonicalization recipe: a daily alias-graph delta is
    tiny next to the accumulated graph, so re-running CC over everything is
    O(history) per day. Instead: (1) contract each endpoint of a delta edge
    through the previous assignment (old node -> its component
    representative, unseen node -> itself); (2) run CC on the contracted
    delta graph only; (3) compose labels back (an untouched component keeps
    its label; merged components take the min representative). Cost is
    O(|delta| + |assignment|), independent of historical edge count.

    Correct because contraction preserves connectivity: every old component
    is already connected, so the union graph's components are exactly the
    components of the contracted delta graph expanded by membership — and
    labels stay "min member id" since min(A ∪ B) = min(min A, min B).
    """
    msrc = prev.select(F.col("node").alias("src"), F.col("component").alias("_csrc"))
    mdst = prev.select(F.col("node").alias("dst"), F.col("component").alias("_cdst"))
    contracted = (
        new_edges.join(msrc, "src", "left")
        .join(mdst, "dst", "left")
        .select(
            F.coalesce("_csrc", "src").alias("src"),
            F.coalesce("_cdst", "dst").alias("dst"),
        )
    )
    delta_cc = connected_components(contracted, max_iter=max_iter)
    relabel = delta_cc.select(
        F.col("node").alias("_rep"), F.col("component").alias("_newc")
    )
    old = (
        prev.join(relabel, prev.component == F.col("_rep"), "left")
        .select("node", F.coalesce("_newc", "component").alias("component"))
    )
    # delta_cc nodes are either old representatives (every rep has its own
    # row in prev) or brand-new nodes; the anti-join keeps only the latter
    brand_new = delta_cc.join(
        prev.select("node"), "node", "left_anti"
    ).select("node", "component")
    return old.unionByName(brand_new)


def salted_self_join(
    df: DataFrame,
    key: str,
    n_salt: int = 16,
    payload_cols: list[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Skew-defused self-join on a blocking key (north_rule's salted
    self-join for similarity edges over hot surface forms).

    Replicates each row to ``n_salt`` buckets on the LEFT and assigns one
    deterministic bucket on the RIGHT; joining on (key, salt) splits a hot
    key's pairs across ``n_salt`` reducers instead of one. Emits each
    unordered pair once (ordered by a per-row uid).

    Pass ``id_col`` (a row-unique column) when the input can contain rows
    with identical payloads: without it the uid is built from the payload
    values, so two exact-duplicate rows share a uid and their pair — the
    most similar pair possible — is silently never emitted.
    """
    payload_cols = payload_cols or [c for c in df.columns if c != key]
    uid = _pair_uid(payload_cols, id_col)
    left = (
        df.withColumn("_uid", uid)
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    )
    right = df.withColumn("_uid", uid).withColumn(
        "_salt", F.pmod(F.xxhash64(uid), F.lit(n_salt)).cast("int")
    )
    lcols = [F.col(f"l.{c}").alias(f"{c}_l") for c in payload_cols]
    rcols = [F.col(f"r.{c}").alias(f"{c}_r") for c in payload_cols]
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l._salt") == F.col("r._salt"))
            & (F.col("l._uid") < F.col("r._uid")),
        )
        .select(F.col(f"l.{key}").alias(key), *lcols, *rcols)
    )


def _pair_uid(payload_cols: list[str], id_col: str | None):
    """Row uid for unordered-pair emission (shared by the salted and plain
    self-join paths so the two branches of the skew-aware join agree)."""
    if id_col is not None:
        return F.col(id_col).cast("string")
    # null-sentinel per column: bare concat_ws SKIPS nulls, which would
    # collide ('x', NULL) with ('x', '') into one uid
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in payload_cols
        ],
    )


def skew_aware_self_join(
    df: DataFrame,
    key: str,
    hot_threshold: int = 10_000,
    n_salt: int = 16,
    payload_cols: list[str] | None = None,
    id_col: str | None = None,
    _tag_branch: bool = False,
) -> DataFrame:
    """Blocking self-join that salts ONLY the hot keys (north_rule: "salted
    self-join to defuse hot-key skew on frequent entities").

    ``salted_self_join`` replicates the whole left side ``n_salt``x — paying
    that on every block when only a handful are hot wastes n_salt x the
    corpus in shuffle volume. Here a per-key frequency aggregate (map-side
    combinable; the hot set — keys with more than ``hot_threshold`` rows —
    is tiny by definition and broadcasts) routes each row: cold keys take
    the plain equi-self-join, hot keys the salted path, and the union is
    exactly the plain join's pair set (pinned by tests). Per-row cost is
    one broadcast-hash probe; no collect.

    Single-scan contract (round-5 directive 2): the input is persisted via
    ``scratch_persist`` inside this operator, so the UNDERLYING SOURCE is
    scanned exactly once — the frequency aggregate materializes the cache
    and the cold (left_anti) and hot (left_semi) branch probes read the
    in-memory copy, not the source. At 100 TB that is 1x the mention-table
    read, not 3x. The cache is registered for the host's next
    ``release_scratch()`` boundary (see operators/scratch.py host
    contract); a plan test pins that zero source scans survive in the
    physical plan outside the single InMemoryRelation.

    The threshold is the reducer-size bound: a key with f rows produces
    f(f-1)/2 pairs on ONE reducer unsalted, f^2/(2 n_salt) per reducer
    salted — pick hot_threshold around the row count a single task should
    hold. ``_tag_branch`` adds a ``via_salted`` bool for the regression
    guard test; production callers leave it off.
    """
    from .scratch import scratch_persist

    payload_cols = payload_cols or [c for c in df.columns if c != key]
    uid = _pair_uid(payload_cols, id_col)
    src = scratch_persist(df)
    hot = (
        src.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") > hot_threshold)
        .select(key)
    )
    cold_df = src.join(F.broadcast(hot), key, "left_anti")
    hot_df = src.join(F.broadcast(hot), key, "left_semi")
    # cold path: plain equi-join on the key (no replication)
    lcols = [F.col(f"l.{c}").alias(f"{c}_l") for c in payload_cols]
    rcols = [F.col(f"r.{c}").alias(f"{c}_r") for c in payload_cols]
    cw = cold_df.withColumn("_uid", uid)
    cold_pairs = (
        cw.alias("l")
        .join(
            cw.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l._uid") < F.col("r._uid")),
        )
        .select(F.col(f"l.{key}").alias(key), *lcols, *rcols)
    )
    hot_pairs = salted_self_join(
        hot_df, key, n_salt=n_salt, payload_cols=payload_cols, id_col=id_col
    )
    if _tag_branch:
        cold_pairs = cold_pairs.withColumn("via_salted", F.lit(False))
        hot_pairs = hot_pairs.withColumn("via_salted", F.lit(True))
    return cold_pairs.unionByName(hot_pairs)


def canonical_entities(linked: DataFrame) -> DataFrame:
    """Build the alias-entity bipartite edges from linked mentions and
    resolve coreferent entities via connected components.

    Nodes: ``ent:<entity_id>`` and ``surf:<normalized surface>``. An
    ambiguous alias (one surface linked to two entities across mentions)
    bridges its entities into one component; ``canonical_id`` = component.
    """
    from ..functions.text import normalize_surface

    edges = (
        linked.filter(F.col("entity_id").isNotNull())
        .select(
            F.concat(F.lit("ent:"), F.col("entity_id")).alias("src"),
            F.concat(F.lit("surf:"), normalize_surface(F.col("NE"))).alias("dst"),
        )
        .distinct()
    )
    cc = connected_components(edges)
    ent_nodes = cc.filter(F.col("node").startswith("ent:"))
    return ent_nodes.select(
        F.expr("substring(node, 5)").alias("entity_id"),
        F.col("component").alias("canonical_id"),
    )
