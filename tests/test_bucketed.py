"""Bucketed co-located join: identical results, ZERO exchanges in the plan."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from ner_spark.sources.bucketed import write_bucketed
from tests.test_plans import n_exchanges


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    base = spark.range(500)
    left = base.select(F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = base.filter(F.col("id") % 3 == 0).select(
        F.col("id").alias("k"), F.lit(1).alias("b")
    )
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    write_bucketed(left, "t_bleft", 4, ["k"], sort_cols=["k"], path=d1)
    write_bucketed(right, "t_bright", 4, ["k"], sort_cols=["k"], path=d2)
    yield left, right
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")


def test_bucketed_join_is_exchange_free_and_correct(spark, bucketed_pair):
    left, right = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bj = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        assert n_exchanges(bj) == 0, "bucketed join must not shuffle"
        plain = left.join(right, "k")
        assert bj.exceptAll(plain).count() == 0
        assert plain.exceptAll(bj).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_reuses_bucketing(spark, bucketed_pair):
    """Aggregation on the bucket key also needs no exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table("t_bleft").groupBy("k").agg(F.sum("a").alias("s"))
        assert n_exchanges(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_query_plan_single_exchange(spark):
    """The driver query's join is exchange-free; the only shuffle left is
    the final (non-bucket-key) aggregation."""
    from ner_spark.queries_analytic import tpch_bucketed_join

    df = tpch_bucketed_join(spark, "/root/testdata/sf0.001")
    assert n_exchanges(df) == 1
    spark.sql("DROP TABLE IF EXISTS bq_orders")
    spark.sql("DROP TABLE IF EXISTS bq_customer")
