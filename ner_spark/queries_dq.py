"""Data-quality constraint engine (Deequ-style) — declarative rule list
evaluated as column-pruned aggregate scans, one report row per rule.

At 100 TB each rule is a single-pass partial/final aggregate over only the
columns it names (the scans are column-pruned and combinable); the
referential-integrity rule is a broadcast anti-join when the referenced
dimension is small. The report is the gate a production ingest would run
before promoting a snapshot: n_checked / n_violations per rule, so a
downstream job can fail the partition when a violation budget is exceeded.

Reference analogue: the type/shape guards scattered through the reference's
loaders (src/utils/ner_config.py input validation), generalized into an
auditable rule table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_DQ_SQL = """
SELECT * FROM (
  SELECT 'documents.doc_id unique' AS rule,
         count(*) AS n_checked,
         count(*) - count(DISTINCT doc_id) AS n_violations
  FROM documents
  UNION ALL
  SELECT 'documents.text not_null', count(*),
         count(*) FILTER (WHERE text IS NULL)
  FROM documents
  UNION ALL
  SELECT 'documents.n_chars consistent', count(*),
         count(*) FILTER (WHERE n_chars <> length(text))
  FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT 'documents.n_chars >= 50', count(*),
         count(*) FILTER (WHERE n_chars < 50)
  FROM documents
  UNION ALL
  SELECT 'orders.o_custkey references customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'events.value >= 0', count(*),
         count(*) FILTER (WHERE value < 0)
  FROM events WHERE value IS NOT NULL
  UNION ALL
  SELECT 'lineitem.l_discount in [0,1]', count(*),
         count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
  FROM lineitem
)
"""


def _rule(df: DataFrame, rule: str, violation, n_expr=None) -> DataFrame:
    """One aggregate scan -> one (rule, n_checked, n_violations) row."""
    return df.agg(
        (n_expr if n_expr is not None else F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_checked"),
        violation.cast("bigint").alias("n_violations"),
    ).select(F.lit(rule).alias("rule"), "n_checked", "n_violations")


@query("dq_constraint_report", _DQ_SQL)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over four tables: uniqueness, completeness,
    consistency, threshold, referential integrity, and range rules — each a
    column-pruned single-pass aggregate; the FK rule is a broadcast
    anti-join."""
    docs = _t(spark, sf_dir, "documents")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    events = _t(spark, sf_dir, "events")
    lineitem = _t(spark, sf_dir, "lineitem")

    cnt = F.count(F.lit(1))
    rules = [
        _rule(
            docs.select("doc_id"),
            "documents.doc_id unique",
            cnt - F.countDistinct("doc_id"),
        ),
        _rule(
            docs.select("text"),
            "documents.text not_null",
            F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)),
        ),
        _rule(
            docs.filter(F.col("text").isNotNull()).select("text", "n_chars"),
            "documents.n_chars consistent",
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ),
        ),
        _rule(
            docs.select("n_chars"),
            "documents.n_chars >= 50",
            F.sum(F.when(F.col("n_chars") < 50, 1).otherwise(0)),
        ),
        # referential integrity: orphan count via broadcast anti-join,
        # n_checked from the same scan pre-join (count of all orders)
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
        .select(
            F.lit("orders.o_custkey references customer").alias("rule"),
            "n_checked",
            "n_violations",
        ),
        _rule(
            events.filter(F.col("value").isNotNull()).select("value"),
            "events.value >= 0",
            F.sum(F.when(F.col("value") < 0, 1).otherwise(0)),
        ),
        _rule(
            lineitem.select("l_discount"),
            "lineitem.l_discount in [0,1]",
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                ).otherwise(0)
            ),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out
