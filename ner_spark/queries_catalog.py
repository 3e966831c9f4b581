"""Driver queries for the snapshot-versioned catalog (time travel /
rollback). Reference analogue: the archive/prepare folder lifecycle
(A8, dossier archiving in the reference pipeline) generalised to Iceberg's
snapshot model — see sources/snapshots.py for the layout.

``catalog_time_travel`` exercises the full commit -> overwrite -> rollback
lifecycle against a scratch table and returns per-(snapshot, bucket) row
counts. Every bucket assignment is the md5-based hash DuckDB replays, and
the v2 overwrite keeps only even doc_ids in buckets 0-2, so all three
snapshots' counts are plain SQL over the documents table — the oracle
reconstructs history that, engine-side, comes from actually reading three
different snapshots of one table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.scratch import session_scratch_dir
from .queries import _t, query

_TT_BUCKETS = 8
_TT_OVERWRITE = (0, 1, 2)

_TT_SQL = f"""
    WITH b AS (
      SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_TT_BUCKETS}) AS bucket,
             doc_id
      FROM documents
    ),
    v1 AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
    v2 AS (SELECT bucket, count(*) AS n FROM b
           WHERE bucket NOT IN {_TT_OVERWRITE} OR doc_id % 2 = 0
           GROUP BY bucket)
    SELECT CAST(1 AS BIGINT) AS snapshot_id, bucket, CAST(n AS BIGINT) AS n_rows
    FROM v1
    UNION ALL
    SELECT CAST(2 AS BIGINT), bucket, CAST(n AS BIGINT) FROM v2
    UNION ALL
    SELECT CAST(3 AS BIGINT), bucket, CAST(n AS BIGINT) FROM v1
"""


@query("catalog_time_travel", _TT_SQL)
def catalog_time_travel(spark, sf_dir):
    """Commit v1 (all docs), overwrite buckets 0-2 with only even doc_ids
    (v2), roll back to v1 (v3) — then read ALL THREE snapshots of the same
    table and report per-bucket counts. v3 == v1 proves rollback restores
    the exact pre-overwrite file set."""
    from .sources.catalog import BUCKET_COL, with_bucket
    from .sources.snapshots import SnapshotCatalog

    docs = with_bucket(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        _TT_BUCKETS,
    )
    cat = SnapshotCatalog(session_scratch_dir(spark, prefix="kg_snapshots"))
    cat.commit(docs, "docs")
    cat.commit(
        docs.filter(
            F.col(BUCKET_COL).isin(*_TT_OVERWRITE) & (F.col("doc_id") % 2 == 0)
        ),
        "docs",
    )
    cat.rollback("docs", 1)
    per_snap = []
    for sid in (1, 2, 3):
        per_snap.append(
            cat.read(spark, "docs", snapshot_id=sid)
            .groupBy(F.col(BUCKET_COL).cast("bigint").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(sid).cast("bigint").alias("snapshot_id"), "bucket", "n_rows")
        )
    out = per_snap[0]
    for df in per_snap[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# catalog_schema_evolution: add-column evolution + time travel through
# the table schema vs the snapshot's own schema
# ---------------------------------------------------------------------------

_SE_SQL = f"""
    WITH b AS (
      SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_TT_BUCKETS}) AS bucket,
             doc_id
      FROM documents
    ),
    n AS (SELECT count(*) AS n_all FROM b),
    e AS (SELECT count(*) AS n_ev FROM b
          WHERE bucket IN {_TT_OVERWRITE} AND doc_id % 2 = 0)
    SELECT 'current' AS view, CAST(n_all + n_ev AS BIGINT) AS n_rows,
           CAST(n_ev AS BIGINT) AS n_lang_set, TRUE AS has_lang_col
    FROM n, e
    UNION ALL
    SELECT 'v1_table_schema', CAST(n_all AS BIGINT), 0, TRUE FROM n
    UNION ALL
    SELECT 'v1_own_schema', CAST(n_all AS BIGINT), 0, FALSE FROM n
"""


@query("catalog_schema_evolution", _SE_SQL)
def catalog_schema_evolution(spark, sf_dir):
    """Commit v1 as (doc_id, text); append v2 carrying a NEW ``lang``
    column (even doc_ids of buckets 0-2). Reading the head surfaces lang
    NULL-backfilled on v1 rows; time-traveling to snapshot 1 through the
    TABLE schema shows lang all-NULL; through its OWN schema the column
    does not exist — no data file was rewritten at any point."""
    from .sources.catalog import BUCKET_COL, with_bucket
    from .sources.snapshots import SnapshotCatalog

    docs = with_bucket(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "lang"),
        "doc_id",
        _TT_BUCKETS,
    )
    cat = SnapshotCatalog(session_scratch_dir(spark, prefix="kg_snapshots_se"))
    cat.commit(docs.select("doc_id", "text", BUCKET_COL), "docs")
    cat.commit(
        docs.filter(
            F.col(BUCKET_COL).isin(*_TT_OVERWRITE) & (F.col("doc_id") % 2 == 0)
        ),
        "docs",
        mode="append",
    )
    views = [
        ("current", cat.read(spark, "docs")),
        ("v1_table_schema", cat.read(spark, "docs", snapshot_id=1)),
        (
            "v1_own_schema",
            cat.read(spark, "docs", snapshot_id=1, use_schema="snapshot"),
        ),
    ]
    parts = []
    for name, df in views:
        has_lang = "lang" in df.columns
        n_lang = (
            F.sum(F.col("lang").isNotNull().cast("long"))
            if has_lang
            else F.lit(0).cast("long")
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"), n_lang.alias("n_lang_set")
            ).select(
                F.lit(name).alias("view"),
                "n_rows",
                "n_lang_set",
                F.lit(has_lang).alias("has_lang_col"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# table_zorder_stats: Morton-curve clustering quality, SQL-replayed
# ---------------------------------------------------------------------------

_Z_BITS = 8
_Z_FILES = 16
_Z_SEG = (4**_Z_BITS + _Z_FILES - 1) // _Z_FILES


def _z_terms_sql(a: str, b: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_SQL = f"""
    WITH g AS (
      SELECT (o_custkey % 256) AS a,
             (date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
              % 256) AS b
      FROM orders
    ),
    z AS (
      SELECT a, b, ({_z_terms_sql('a', 'b')}) // {_Z_SEG} AS zfile FROM g
    )
    SELECT CAST(zfile AS BIGINT) AS zfile,
           count(*) AS n_rows,
           CAST(min(a) AS BIGINT) AS min_a, CAST(max(a) AS BIGINT) AS max_a,
           CAST(min(b) AS BIGINT) AS min_b, CAST(max(b) AS BIGINT) AS max_b
    FROM z GROUP BY 1
"""


@query("table_zorder_stats", _ZORDER_SQL)
def table_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering of orders on (customer, order-day):
    per-curve-segment row counts and min/max of BOTH keys — the zone-map
    stats a reader skips files with. Fixed-width curve segments (z div
    seg), so the file assignment is deterministic and the oracle replays
    the full bit-interleave in SQL. Each segment covers a compact region
    of BOTH dimensions — the property 1-D range clustering cannot give
    the second key (see sources/catalog.write_zorder_clustered; clustering
    quality pinned in tests/test_zorder.py)."""
    from .sources.catalog import z_value

    o = _t(spark, sf_dir, "orders")
    g = o.select(
        (F.col("o_custkey") % 256).alias("a"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
            % 256
        ).alias("b"),
    )
    z = g.select(
        "a", "b",
        (z_value(F.col("a"), F.col("b"), _Z_BITS) / _Z_SEG).cast("long").alias("zfile"),
    )
    return z.groupBy("zfile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )


# ---------------------------------------------------------------------------
# catalog_cdc_diff: row-level change-data-capture between two snapshots
# ---------------------------------------------------------------------------

_CDC_NEW_OFFSET = 10_000_000

_CDC_SQL = f"""
    WITH b AS (
      SELECT doc_id, text,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_TT_BUCKETS}) AS bucket
      FROM documents WHERE text IS NOT NULL
    ),
    aff AS (SELECT * FROM b WHERE bucket IN {_TT_OVERWRITE}),
    newr AS (
      SELECT doc_id + {_CDC_NEW_OFFSET} AS doc_id, 'new doc' AS text
      FROM aff
      WHERE doc_id % 4 = 0
        AND (('0x' || substr(md5(CAST(doc_id + {_CDC_NEW_OFFSET} AS VARCHAR)),
                             1, 15))::BIGINT % {_TT_BUCKETS}) IN {_TT_OVERWRITE}
    )
    SELECT doc_id, 'D' AS _change_type, text FROM aff WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id, 'U_before', text FROM aff WHERE doc_id % 4 = 2
    UNION ALL
    SELECT doc_id, 'U_after', text || '~v2' FROM aff WHERE doc_id % 4 = 2
    UNION ALL
    SELECT doc_id, 'I', text FROM newr
"""


@query("catalog_cdc_diff", _CDC_SQL)
def catalog_cdc_diff(spark, sf_dir):
    """Row-level CDC between snapshot 1 (all docs) and snapshot 2
    (buckets 0-2 overwritten: doc_id%4==0 kept verbatim, %4==2 text
    updated, odd rows dropped, brand-new ids inserted): the changelog
    classifies D / U_before / U_after / I and rows kept verbatim emit
    NOTHING — all computed by reading only the changed buckets
    (sources/snapshots.cdc_diff)."""
    from .sources.catalog import BUCKET_COL, with_bucket
    from .sources.snapshots import SnapshotCatalog, cdc_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    bucketed = with_bucket(docs, "doc_id", _TT_BUCKETS)
    cat = SnapshotCatalog(session_scratch_dir(spark, prefix="kg_snapshots_cdc"))
    cat.commit(bucketed, "docs")
    aff = bucketed.filter(F.col(BUCKET_COL).isin(*_TT_OVERWRITE))
    keep = aff.filter(F.col("doc_id") % 4 == 0)
    upd = aff.filter(F.col("doc_id") % 4 == 2).withColumn(
        "text", F.concat(F.col("text"), F.lit("~v2"))
    )
    new = with_bucket(
        aff.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + _CDC_NEW_OFFSET).alias("doc_id"),
            F.lit("new doc").alias("text"),
        ),
        "doc_id",
        _TT_BUCKETS,
    ).filter(F.col(BUCKET_COL).isin(*_TT_OVERWRITE))
    cat.commit(keep.unionByName(upd).unionByName(new), "docs")
    return cdc_diff(cat, spark, "docs", 1, 2, "doc_id").select(
        "doc_id", "_change_type", "text"
    )
