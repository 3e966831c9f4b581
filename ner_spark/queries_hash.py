"""Generated SQL oracles for the hash/LSH-based dedup + similarity queries.

Round 1 left minhash/simhash/hyperplane-LSH as rows-only driver checks
("no DuckDB xxhash64", "plane literals impractical"). Both objections fall
with generation: the engine's md5-based hash (dedup.md5_60) is bit-identical
to ``('0x' || substr(md5(x), 1, 15))::BIGINT`` in DuckDB, and the hyperplane
sets are small enough to inline as SQL array literals (repr-formatted
doubles reproduce the exact IEEE values). The SQL below is *generated from
the same parameters* as the Spark queries but executes entirely inside
DuckDB — an independent replay of signatures, banding, candidate joins, and
scoring.

Float caveat: dot products use DuckDB's list_dot_product vs the engine's
sequential fold; orders differ at ~1e-16 relative, which only matters if a
dot lands within ~1e-13 of a bucket-sign boundary or a score lands equally
close to the rounded threshold — vanishingly unlikely at these data sizes,
and the driver re-checks every round.
"""

from __future__ import annotations

from .operators.dedup import HASH_P, SIMHASH_BITS, _segment_layout, affine_coeffs
from .operators.similarity import band_planes
from .oracle_minhash import md5_60_sql, minhash_cand_cte
from .queries import ORACLE, _SHINGLE_SQL


def _md5_60(expr: str) -> str:
    return md5_60_sql(expr)


# ---------------------------------------------------------------------------
# dedup_minhash_lsh: k=16, bands=4, md5 mode (mirrors queries.dedup_minhash_lsh)
# ---------------------------------------------------------------------------

def _minhash_cand_cte(k: int = 16, bands: int = 4) -> str:
    """Shared WITH-body (delegates to oracle_minhash.minhash_cand_cte —
    a leaf module, so queries_corpus can reuse it without an import
    cycle)."""
    return minhash_cand_cte(_SHINGLE_SQL, k, bands)


def _minhash_sql(k: int = 16, bands: int = 4) -> str:
    return f"""
    WITH {_minhash_cand_cte(k, bands)}
    SELECT doc_a, doc_b FROM cand
    """


ORACLE["dedup_minhash_lsh"] = _minhash_sql()


def _minhash_verified_sql(threshold: float = 0.1, k: int = 16, bands: int = 4) -> str:
    """Candidates from the banded LSH replay + exact (uncapped) Jaccard
    computed only on candidate pairs — mirrors dedup.minhash_verified_pairs."""
    return f"""
    WITH {_minhash_cand_cte(k, bands)},
    posting AS (SELECT doc, unnest(sh) AS shingle FROM sh),
    nsh AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM sh),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS inter
      FROM cand c
      JOIN posting pa ON pa.doc = c.doc_a
      JOIN posting pb ON pb.doc = c.doc_b AND pb.shingle = pa.shingle
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter), 4) AS jaccard
    FROM inter i
    JOIN nsh na ON na.doc = i.doc_a
    JOIN nsh nb ON nb.doc = i.doc_b
    WHERE round(CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter), 4) >= {threshold}
    """


ORACLE["dedup_minhash_verified"] = _minhash_verified_sql()


# ---------------------------------------------------------------------------
# dedup_simhash: 60-bit md5 simhash + (max_hamming+1)-segment blocking
# (mirrors queries.dedup_simhash at max_hamming=3)
# ---------------------------------------------------------------------------

def _simhash_sql(max_hamming: int = 3) -> str:
    fp_terms = " +\n        ".join(
        f"CASE WHEN list_sum(list_transform(th, h -> "
        f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b}::BIGINT ELSE 0::BIGINT END"
        for b in range(SIMHASH_BITS)
    )
    segs = _segment_layout(max_hamming + 1)
    seg_sel = "\n      UNION ALL ".join(
        f"SELECT doc, simhash, {i} AS q, "
        f"(simhash >> {off}) & {(1 << w) - 1} AS v FROM fp"
        for i, (off, w) in enumerate(segs)
    )
    return f"""
    WITH th AS (
      SELECT doc_id AS doc,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            t -> {_md5_60('t')}) AS th
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    fp AS (
      SELECT doc,
        ({fp_terms}) AS simhash
      FROM th
    ),
    seg AS (
      {seg_sel}
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM seg a JOIN seg b ON a.q = b.q AND a.v = b.v AND a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


ORACLE["dedup_simhash"] = _simhash_sql()


# ---------------------------------------------------------------------------
# hyperplane-LSH oracles: plane literals inlined into generated SQL
# ---------------------------------------------------------------------------

# moved to oracle_ann (leaf module) so queries_audit can reuse it
from .oracle_ann import _ann_lsh_sql, _banded_sql, _plane_lit  # noqa: E402


ORACLE["ann_topk_lsh"] = _ann_lsh_sql()


def _near_dup_sql(threshold: float = 0.95, bands: int = 6, planes_per_band: int = 8,
                  dim: int = 64, seed: int = 42) -> str:
    plane_sets = band_planes(dim, bands, planes_per_band, seed)
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    jit AS (
      -- NB: the jitter must reference the SOURCE vec_id; DuckDB's lateral
      -- column aliases would silently bind a same-named alias instead
      SELECT vec_id + 1000000000 AS jid,
             list_transform(range({dim}),
               i -> v[i + 1] + 0.05 * sin(CAST(vec_id + i AS DOUBLE))) AS jv
      FROM base WHERE vec_id % 10 = 0
    ),
    e AS (SELECT * FROM base UNION ALL SELECT jid AS vec_id, jv AS v FROM jit),
    vb AS (
      {_banded_sql('e', 'v', plane_sets)}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM vb a JOIN vb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             round(list_cosine_similarity(ea.v, eb.v), 4) AS score
      FROM cand c JOIN e ea ON ea.vec_id = c.doc_a JOIN e eb ON eb.vec_id = c.doc_b
    )
    SELECT doc_a, doc_b, score FROM scored WHERE score >= {threshold}
    """


ORACLE["embedding_near_dup"] = _near_dup_sql()


# ---------------------------------------------------------------------------
# ann_topk_ivf: sample-trained centroids inlined as literals (data-dependent
# oracle — the SQL is (re)generated per sf_dir via register_ivf_oracle)
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_ITERS = 8
IVF_SAMPLE = 2048
IVF_SEED = 42

_ivf_cache: dict[str, list[list[float]]] = {}


def ivf_centroids_for(sf_dir: str) -> list[list[float]]:
    """Centroids for ``{sf_dir}/embeddings.parquet`` — pyarrow load of the
    first IVF_SAMPLE rows by vec_id through the same seeded numpy k-means
    as the Spark trainer, so the Spark query and the generated SQL inline
    bit-identical literals."""
    if sf_dir not in _ivf_cache:
        import numpy as np
        import pyarrow.parquet as pq

        from .operators.similarity import kmeans_centroids

        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        order = np.argsort(t["vec_id"].to_numpy(), kind="stable")[:IVF_SAMPLE]
        X = np.array(
            [t["embedding"][int(i)].as_py() for i in order], dtype=np.float64
        )
        _ivf_cache[sf_dir] = kmeans_centroids(X, IVF_CENTROIDS, IVF_ITERS, IVF_SEED)
    return _ivf_cache[sf_dir]


def _dists_cte(src: str, centroids: list[list[float]], name: str = "dists") -> str:
    """The ONE definition of per-vector centroid distances: the rounded
    |c|^2 - 2*v.c rank with its (d, cell) tie-break lives here so every
    assignment-consuming oracle (IVF, IVF-PQ coarse, k-means stats,
    SemDeDup) replays bit-identical cells by construction."""
    return f"""{name} AS (
      SELECT vec_id, v, u.cell AS cell, u.d AS d
      FROM {src}, UNNEST({_centroid_structs('v', centroids)}) AS t(u)
    )"""


def _centroid_structs(vec: str, centroids: list[list[float]]) -> str:
    """UNNEST-able list of {cell, dist} structs; dist is the rank-equivalent
    |c|^2 - 2*v.c rounded like the engine's _cell_dist."""
    items = []
    for j, c in enumerate(centroids):
        c2 = repr(sum(x * x for x in c))
        items.append(
            f"struct_pack(cell := {j}, d := round({c2} - "
            f"2.0 * list_dot_product({vec}, {_plane_lit(c)}), 6))"
        )
    return "[" + ",\n        ".join(items) + "]"


def _ivf_sql(sf_dir: str, k: int = 5) -> str:
    centroids = ivf_centroids_for(sf_dir)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {_dists_cte('e', centroids)},
    assigned AS (
      SELECT vec_id AS nb_id, v AS nb_vec, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT vec_id AS q_id, v AS q_vec, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists WHERE vec_id % 40 = 0
      ) WHERE rn <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT q.q_id, a.nb_id,
             round(list_cosine_similarity(q.q_vec, a.nb_vec), 4) AS score
      FROM probed q JOIN assigned a USING (cell)
      WHERE q.q_id <> a.nb_id
    ),
    ranked AS (
      SELECT q_id, nb_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, nb_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, nb_id, score, rank FROM ranked WHERE rank <= {k}
    """


def register_ivf_oracle(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """(Re)generate the data-dependent IVF oracle for ``sf_dir``. Called at
    import with the driver's correctness scale (sf0.01); tools/driver_sim.py
    re-calls it when pointed at another sf_dir. If the parquet is absent the
    entry is dropped and the query degrades to the driver's rows-only check."""
    try:
        ORACLE["ann_topk_ivf"] = _ivf_sql(sf_dir)
    except Exception:
        ORACLE.pop("ann_topk_ivf", None)
    try:
        ORACLE["embedding_kmeans_stats"] = _kmeans_stats_sql(sf_dir)
    except Exception:
        ORACLE.pop("embedding_kmeans_stats", None)
    try:
        # defined below the module-load call site — present on re-calls
        # (driver_sim per-sf_dir regeneration); the first registration
        # happens in _register_ivfpq() at the bottom of this module
        ORACLE["ann_topk_ivfpq"] = _ivfpq_sql(sf_dir)
    except Exception:
        ORACLE.pop("ann_topk_ivfpq", None)
    try:
        ORACLE["dedup_semantic_prune"] = _sem_prune_sql(sf_dir)
    except Exception:
        ORACLE.pop("dedup_semantic_prune", None)


# ---------------------------------------------------------------------------
# embedding_kmeans_stats: cluster sizes + inertia for the trained centroids
# ---------------------------------------------------------------------------


def _kmeans_stats_sql(sf_dir: str) -> str:
    centroids = ivf_centroids_for(sf_dir)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {_dists_cte('e', centroids)},
    assigned AS (
      SELECT cell,
             CAST(floor(round(list_dot_product(v, v) + d, 4) * 10000)
                  AS BIGINT) AS d2_e4
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cell) AS rn
            FROM dists)
      WHERE rn = 1
    )
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(d2_e4) AS BIGINT) AS inertia_e4
    FROM assigned GROUP BY cell
    """


def _embedding_kmeans_stats(spark, sf_dir):
    """K-means diagnostics over the IVF centroids: per-cluster size and
    inertia (sum of squared L2 distance to the assigned centroid).

    Assignment is the same narrow per-row ``array_min(struct(d, cell))``
    scan as IVF — 1e9 vectors assign without a shuffle; the only exchange
    is the 16-row cluster aggregate. Inertia sums in exact integer 1e-4
    units: |v|^2 comes from the same ordered fold both engines replay, the
    centroid terms are rounded literals, so the per-row value is one
    identical double -> floor, and the BIGINT sum is order-free.
    """
    from pyspark.sql import functions as F

    from .operators.similarity import _cell_structs_sql, _dot
    from .queries import _t

    centroids = ivf_centroids_for(sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    st = F.expr(f"array_min({_cell_structs_sql('v', centroids)})")
    assigned = e.select("v", st.alias("st")).select(
        F.col("st.cell").alias("cell"),
        F.floor(F.round(_dot(F.col("v"), F.col("v")) + F.col("st.d"), 4) * 10000)
        .cast("bigint")
        .alias("d2_e4"),
    )
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("d2_e4").cast("bigint").alias("inertia_e4"),
    )


def _register_kmeans_query() -> None:
    from .queries import Q

    Q["embedding_kmeans_stats"] = _embedding_kmeans_stats


_register_kmeans_query()
register_ivf_oracle()


# ---------------------------------------------------------------------------
# ann_topk_ivfpq: IVF coarse pruning + product-quantization ADC ranking
# (FAISS's IVFADC layout). Codebooks train per 16-dim subspace through the
# same seeded numpy k-means as IVF, so the generated SQL inlines
# bit-identical literals: DuckDB replays coarse assignment, PQ encoding,
# the per-query ADC lookup tables, and the ranked join end-to-end.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codebook entries per subspace
PQ_ITERS = 8
PQ_SEED = 77

_pq_cache: dict[str, list[list[list[float]]]] = {}


def pq_codebooks_for(sf_dir: str) -> list[list[list[float]]]:
    """Per-subspace codebooks for ``{sf_dir}/embeddings.parquet`` — the
    same IVF_SAMPLE sample as the coarse trainer, split into PQ_M
    contiguous slices, each through the shared seeded k-means."""
    if sf_dir not in _pq_cache:
        import numpy as np
        import pyarrow.parquet as pq

        from .operators.similarity import kmeans_centroids

        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        order = np.argsort(t["vec_id"].to_numpy(), kind="stable")[:IVF_SAMPLE]
        X = np.array(
            [t["embedding"][int(i)].as_py() for i in order], dtype=np.float64
        )
        d = X.shape[1] // PQ_M
        _pq_cache[sf_dir] = [
            kmeans_centroids(X[:, m * d : (m + 1) * d], PQ_K, PQ_ITERS, PQ_SEED + m)
            for m in range(PQ_M)
        ]
    return _pq_cache[sf_dir]


def _pq_sub(vec: str, m: int, sub_dim: int) -> str:
    return f"{vec}[{m * sub_dim + 1}:{(m + 1) * sub_dim}]"


def _pq_code_expr(vec: str, book: list[list[float]], m: int, sub_dim: int) -> str:
    """argmin over the codebook as list_sort([{d, j}, ...])[1].j — the same
    rounded distance + index tie-break as the engine's pq_code."""
    items = []
    for j, c in enumerate(book):
        c2 = repr(sum(x * x for x in c))
        items.append(
            f"struct_pack(d := round({c2} - 2.0 * "
            f"list_dot_product({_pq_sub(vec, m, sub_dim)}, {_plane_lit(c)}), 6), "
            f"j := {j})"
        )
    return "(list_sort([" + ",\n          ".join(items) + "])[1]).j"


def _pq_lut_expr(vec: str, book: list[list[float]], m: int, sub_dim: int) -> str:
    items = []
    for c in book:
        c2 = repr(sum(x * x for x in c))
        items.append(
            f"round({c2} - 2.0 * "
            f"list_dot_product({_pq_sub(vec, m, sub_dim)}, {_plane_lit(c)}), 6)"
        )
    return "[" + ",\n          ".join(items) + "]"


def _ivfpq_sql(sf_dir: str, k: int = 5) -> str:
    centroids = ivf_centroids_for(sf_dir)
    books = pq_codebooks_for(sf_dir)
    sub_dim = len(books[0][0])
    code_cols = ",\n             ".join(
        f"{_pq_code_expr('v', books[m], m, sub_dim)} AS code_{m}"
        for m in range(PQ_M)
    )
    lut_cols = ",\n             ".join(
        f"{_pq_lut_expr('v', books[m], m, sub_dim)} AS lut_{m}"
        for m in range(PQ_M)
    )
    adc = " + ".join(f"q.lut_{m}[c.code_{m} + 1]" for m in range(PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {_dists_cte('e', centroids, name='cdists')},
    coded AS (
      SELECT vec_id AS nb_id, cell,
             {code_cols}
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM cdists
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT vec_id AS q_id, cell,
             {lut_cols}
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM cdists WHERE vec_id % 40 = 0
      ) WHERE rn <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT q.q_id, c.nb_id, round({adc}, 4) AS adc
      FROM probed q JOIN coded c USING (cell)
      WHERE q.q_id <> c.nb_id
    ),
    ranked AS (
      SELECT q_id, nb_id, adc,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY adc ASC, nb_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, nb_id, adc, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _ann_topk_ivfpq(spark, sf_dir):
    """IVF+PQ ANN (IVFADC): coarse cells prune candidates, PQ codes rank
    them — the database side carries 4 small code ints per vector instead
    of the 64-double embedding (see operators/similarity.ivfpq_topk for
    the scale story)."""
    from pyspark.sql import functions as F

    from .operators.similarity import ivfpq_topk
    from .queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") % 40 == 0),
        ivf_centroids_for(sf_dir),
        pq_codebooks_for(sf_dir),
        k=5,
        nprobe=IVF_NPROBE,
    )


def _register_ivfpq() -> None:
    from .queries import Q

    Q["ann_topk_ivfpq"] = _ann_topk_ivfpq
    try:
        ORACLE["ann_topk_ivfpq"] = _ivfpq_sql("/root/testdata/sf0.01")
    except Exception:
        ORACLE.pop("ann_topk_ivfpq", None)


_register_ivfpq()


# ---------------------------------------------------------------------------
# dedup_semantic_prune: SemDeDup (Abbas et al. 2023, public paper) — k-means
# cells as blocking, within-cell cosine, prune every vector that has a
# senior near-twin. The centroid literals make the oracle data-dependent,
# so the SQL regenerates per sf_dir alongside the IVF family.
# ---------------------------------------------------------------------------

SEM_THRESHOLD = 0.95


def _sem_prune_sql(sf_dir: str, dim: int = 64) -> str:
    centroids = ivf_centroids_for(sf_dir)
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    jit AS (
      SELECT vec_id + 1000000000 AS jid,
             list_transform(range({dim}),
               i -> v[i + 1] + 0.05 * sin(CAST(vec_id + i AS DOUBLE))) AS jv
      FROM base WHERE vec_id % 10 = 0
    ),
    e AS (SELECT * FROM base UNION ALL SELECT jid AS vec_id, jv AS v FROM jit),
    {_dists_cte('e', centroids)},
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT b.vec_id AS vec_id, a.vec_id AS keeper, a.cell AS cell,
             round(list_cosine_similarity(a.v, b.v), 4) AS score
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {SEM_THRESHOLD}
    )
    SELECT vec_id, cell, keeper, score FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, keeper ASC) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


def _dedup_semantic_prune(spark, sf_dir):
    """SemDeDup: prune list over the jittered embedding corpus (the same
    planted-near-dup union as embedding_near_dup, so the operator runs at
    its designed >=0.95-cosine operating point on real sf data).

    Every vector assigns to its nearest trained centroid with the same
    narrow ``array_min(struct(d, cell))`` scan as IVF (no shuffle); the
    only exchange is the within-cell self-join, whose blocks are bounded
    by cell population — the SemDeDup recipe's point is that exact
    O(block^2) cosine is affordable once k-means has shattered the corpus
    (at 100 TB you raise the centroid count so blocks stay ~1e4 vectors;
    the candidate volume is sum of block^2, never corpus^2). A vector is
    pruned when a senior same-cell partner (smaller vec_id) matches at
    cosine >= SEM_THRESHOLD; the reported keeper is the best such partner
    (max rounded score, tie -> smallest id), matching the oracle's
    window ordering.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .operators.scratch import scratch_persist
    from .operators.similarity import _cell_structs_sql, cosine
    from .queries import _jittered_embeddings

    centroids = ivf_centroids_for(sf_dir)
    e = _jittered_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    st = F.expr(f"array_min({_cell_structs_sql('v', centroids)})")
    # both sides of the cell self-join read this — persist so the jittered
    # union scan + 16-struct assignment runs once (house pattern: the
    # banded-LSH operator persists its exploded bands the same way)
    assigned = scratch_persist(
        e.select("vec_id", "v", st.alias("st")).select(
            "vec_id", "v", F.col("st.cell").alias("cell")
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.vec_id").alias("keeper"),
            F.col("a.cell").alias("cell"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("score"),
        )
        .filter(F.col("score") >= SEM_THRESHOLD)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("keeper"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "keeper", "score")
    )


def _register_sem_prune() -> None:
    from .queries import Q

    Q["dedup_semantic_prune"] = _dedup_semantic_prune
    try:
        ORACLE["dedup_semantic_prune"] = _sem_prune_sql("/root/testdata/sf0.01")
    except Exception:
        ORACLE.pop("dedup_semantic_prune", None)


_register_sem_prune()
