"""Leaf generator for the MinHash-LSH DuckDB oracle CTE.

Lives below queries.py / queries_hash.py / queries_corpus.py in the import
graph (depends only on operators.dedup) so every oracle module can build
the candidate CTE without a circular import.
"""

from __future__ import annotations

from .operators.dedup import HASH_P, affine_coeffs


def md5_60_sql(expr: str) -> str:
    """DuckDB replay of dedup.md5_60 (bit-identical 60-bit md5 bigint)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_cand_cte(shingle_sql: str, k: int = 16, bands: int = 4) -> str:
    """Shared WITH-body: shingles -> md5 hashes -> affine signatures ->
    banded buckets -> distinct candidate pairs (``cand``)."""
    r = k // bands
    perms = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {HASH_P}))"
        for a, b in affine_coeffs(k)
    )
    banded = "\n      UNION ALL ".join(
        f"SELECT doc, {b} AS band, "
        f"array_to_string(sig[{b * r + 1}:{b * r + r}], ',') AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""sh AS MATERIALIZED ({shingle_sql}),
    hsh AS (SELECT doc, list_transform(sh, s -> {md5_60_sql('s')} % {HASH_P}) AS hs
            FROM sh),
    sig AS (SELECT doc, [{perms}] AS sig FROM hsh),
    banded AS (
      {banded}
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )"""
