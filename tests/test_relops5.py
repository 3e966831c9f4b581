"""Semantics for relational-operator batch 5 (queries_relops5): the Q21
aggregate rewrite equals the literal EXISTS/NOT-EXISTS double self-join,
Q4's semi join matches the join+distinct formulation, Q20's dominance
predicate holds row-wise, and Q2's join-back returns exactly the per-part
minima (with ties kept)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.queries import _t
from ner_spark.queries_relops5 import (
    _Q21_CUTOFF,
    tpch_q2,
    tpch_q4,
    tpch_q20,
    tpch_q21,
)

SF = "/root/testdata/sf0.001"


def _same(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_q21_rewrite_equals_double_self_join(spark):
    """The one-aggregation engine form must equal the textbook EXISTS +
    NOT EXISTS double self-join written literally in Spark."""
    li = _t(spark, SF, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = li.filter(F.col("l_shipdate") >= _Q21_CUTOFF)
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_shipdate") >= _Q21_CUTOFF).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sup = _t(spark, SF, "supplier").select("s_suppkey", "s_name")
    literal = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3) & (F.col("l_suppkey") != l3.s3),
            "left_anti",
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    assert _same(tpch_q21(spark, SF), literal)


def test_q4_semi_join_equals_join_distinct(spark):
    out = tpch_q4(spark, SF)
    o = _t(spark, SF, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    literal = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    assert _same(out, literal)


def test_q20_dominance_holds_rowwise(spark):
    """Recompute each reported supplier's per-part shares from scratch: a
    supplier appears with n_dominant_parts = the number of family parts
    where 2*supp_qty > part_qty, and only when that count is positive."""
    li = _t(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty")
    )
    t = q.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    fam = _t(spark, SF, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    sup = _t(spark, SF, "supplier").select("s_suppkey", "s_name")
    expected = (
        q.join(t, "l_partkey")
        .join(fam, F.col("l_partkey") == F.col("p_partkey"))
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_dominant_parts"),
            F.sum("supp_qty").alias("total_qty"),
        )
    )
    out = tpch_q20(spark, SF)
    assert _same(out, expected)
    assert out.filter(F.col("n_dominant_parts") < 1).isEmpty()


def test_q2_returns_exact_minima_with_ties(spark):
    rows = tpch_q2(spark, SF).collect()
    assert rows, "qualifying small parts must exist at sf0.001"
    li = _t(spark, SF, "lineitem")
    p = _t(spark, SF, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "SMALL")
    )
    true_min = {
        r["l_partkey"]: r["m"]
        for r in li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,6)")).alias("m"))
        .collect()
    }
    for r in rows:
        assert float(true_min[r["p_partkey"]]) == r["best_price"]
    # every part with at least one offer is represented
    assert {r["p_partkey"] for r in rows} == set(true_min)
