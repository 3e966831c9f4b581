"""Leaf generator for the hyperplane-LSH ANN DuckDB oracle SQL.

Lives below queries.py / queries_hash.py / queries_audit.py in the import
graph (depends only on operators.similarity) so both the standing ANN
oracle (queries_hash) and the recall audit (queries_audit) can build the
same generated SQL without a circular import — the same layering as
oracle_minhash.
"""

from __future__ import annotations

from .operators.similarity import band_planes


def _plane_lit(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


def _bucket_expr(vec: str, planes: list[list[float]]) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec}, {_plane_lit(p)}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )


def _banded_sql(src: str, vec: str, plane_sets: list[list[list[float]]]) -> str:
    return "\n      UNION ALL ".join(
        f"SELECT *, {b} AS band, ({_bucket_expr(vec, planes)}) AS bucket FROM {src}"
        for b, planes in enumerate(plane_sets)
    )


def _ann_lsh_sql(k: int = 5, bands: int = 8, planes_per_band: int = 4,
                 dim: int = 64, seed: int = 42) -> str:
    plane_sets = band_planes(dim, bands, planes_per_band, seed)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    vb AS (
      {_banded_sql('e', 'v', plane_sets)}
    ),
    qb AS (SELECT * FROM vb WHERE vec_id % 40 = 0),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS nb_id
      FROM qb q JOIN vb n
        ON q.band = n.band AND q.bucket = n.bucket AND q.vec_id <> n.vec_id
    ),
    scored AS (
      SELECT c.q_id, c.nb_id,
             round(list_cosine_similarity(eq.v, en.v), 4) AS score
      FROM cand c JOIN e eq ON eq.vec_id = c.q_id JOIN e en ON en.vec_id = c.nb_id
    ),
    ranked AS (
      SELECT q_id, nb_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, nb_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, nb_id, score, rank FROM ranked WHERE rank <= {k}
    """
