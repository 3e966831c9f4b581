"""Driver-facing query registry.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle for DuckDB over the same parquet tables
(``None`` for UDF-backed queries the driver checks rows-only). Column names
and types are aligned on both sides — aggregates are aliased identically and
counts/positions cast to bigint so the value-hash comparison is exact.

The registry grows with SURVEY.md §2 coverage; keys are stable identifiers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, sql: str | None = None):
    def deco(fn):
        Q[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# KG / reference operators over the documents table
# ---------------------------------------------------------------------------

@query(
    "kg_clean_dedup",
    """
    SELECT min(doc_id) AS doc_uid,
           text,
           array_to_string(list_sort(list(doc_id)), ',') AS files_id,
           count(*) AS n_src
    FROM documents WHERE text IS NOT NULL AND length(text) > 0
    GROUP BY text
    """,
)
def kg_clean_dedup(spark, sf_dir):
    """D1/B1: dedup-groupby with ordered id collect (epg_cleaner analogue)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_uid"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("files_id"),
            F.count(F.lit(1)).alias("n_src"),
        )
        .select("doc_uid", "text", "files_id", "n_src")
    )


_SURFACES = ["spark", "customer", "window", "stream", "filter"]
_SURF_SQL = ",".join(f"('{s}')" for s in _SURFACES)


def _mention_systems(spark, sf_dir):
    """First-occurrence mentions found by three pseudo-systems (C1 fixture)."""
    docs = _t(spark, sf_dir, "documents")
    m = (
        docs.select("doc_id", "text", F.explode(F.array(*[F.lit(s) for s in _SURFACES])).alias("NE"))
        .withColumn("pos", F.expr("instr(text, NE)").cast("long"))
        .filter(F.col("pos") > 0)
        .select("doc_id", "NE", "pos")
    )
    sys1 = m.select("doc_id", "NE", "pos", F.lit(0).alias("rank"), F.lit("casEN").alias("src"))
    sys2 = m.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "NE", "pos", F.lit(1).alias("rank"), F.lit("spaCy").alias("src")
    )
    sys3 = m.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", "NE", "pos", F.lit(2).alias("rank"), F.lit("stanza").alias("src")
    )
    return sys1.unionByName(sys2).unionByName(sys3)


_CONSENSUS_SQL_BODY = f"""
    WITH surf(NE) AS (VALUES {_SURF_SQL}),
    m AS (
      SELECT d.doc_id, surf.NE, instr(d.text, surf.NE) AS pos
      FROM documents d CROSS JOIN surf
      WHERE instr(d.text, surf.NE) > 0
    ),
    sys AS (
      SELECT doc_id, NE, pos, 0 AS rank, 'casEN' AS src FROM m
      UNION ALL
      SELECT doc_id, NE, pos, 1, 'spaCy' FROM m WHERE doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, NE, pos, 2, 'stanza' FROM m WHERE doc_id % 7 <> 0
    )
    SELECT doc_id, NE, pos,
           string_agg(src, '_' ORDER BY rank) AS method,
           count(*) AS n_sys
    FROM sys GROUP BY doc_id, NE, pos
"""


@query("kg_consensus_fusion", _CONSENSUS_SQL_BODY)
def kg_consensus_fusion(spark, sf_dir):
    """C1/F4: union + groupBy provenance fusion — the engine's one-shuffle
    reformulation of the reference's iterated full-outer join fold
    (reference: ner_config.py:57-117), oracle-checked against plain SQL."""
    sys = _mention_systems(spark, sf_dir)
    return (
        sys.repartition("doc_id")
        .groupBy("doc_id", "NE", "pos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rank").alias("r"), F.col("src").alias("s")))
                    ),
                    lambda x: x["s"],
                ),
                "_",
            ).alias("method"),
            F.count(F.lit(1)).alias("n_sys"),
        )
    )


@query(
    "kg_priority_vote",
    f"""
    WITH cons AS ({_CONSENSUS_SQL_BODY}),
    w1 AS (
      SELECT doc_id, NE, pos, method, n_sys,
             count(*) OVER (PARTITION BY doc_id, NE) AS grp,
             max(n_sys) OVER (PARTITION BY doc_id, NE) AS maxw
      FROM cons
    ),
    w2 AS (
      SELECT *, sum(CASE WHEN n_sys = maxw THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id, NE) AS winners
      FROM w1
    )
    SELECT doc_id, NE, pos,
           CASE WHEN grp > 1 AND n_sys = maxw AND winners = 1
                THEN method || '_priority' ELSE method END AS method
    FROM w2
    """,
)
def kg_priority_vote(spark, sf_dir):
    """W1/D2-D4: strict-majority vote via window functions
    (reference: ner_config.py:120-156) over the fused mentions."""
    from pyspark.sql import Window

    cons = kg_consensus_fusion(spark, sf_dir)
    w = Window.partitionBy("doc_id", "NE")
    maxw = F.max("n_sys").over(w)
    mask = (
        (F.count(F.lit(1)).over(w) > 1)
        & (F.col("n_sys") == maxw)
        & (F.sum((F.col("n_sys") == maxw).cast("int")).over(w) == 1)
    )
    return cons.select(
        "doc_id",
        "NE",
        "pos",
        F.when(mask, F.concat("method", F.lit("_priority"))).otherwise(F.col("method")).alias("method"),
    )


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------

@query(
    "doc_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           length(text) AS n_chars_obs
    FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    """,
)
def doc_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_obs"),
    )


@query(
    "doc_quality_score",
    """
    SELECT doc_id,
           round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      t -> t IN ('the', 'a'))) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS stopword_ratio,
           round(CAST(length(text) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS chars_per_token
    FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    """,
)
def doc_quality_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    return docs.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).select(
        "doc_id",
        F.round(stop.cast("double") / F.size(toks), 4).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / F.size(toks), 4).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Relational coverage (joins / aggs / windows) on the TPC-H-ish tables
# ---------------------------------------------------------------------------

@query(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_priority_revenue",
    """
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def tpch_priority_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        )
    )


@query(
    "events_user_stats",
    """
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def events_user_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )
