"""Relational-operator coverage, batch 3: scalar-subquery decorrelation
(TPC-H Q17), HAVING join-back (TPC-H Q18), and an explicitly salted skew
join.

Scale notes per query:

- ``tpch_q17``: the classic correlated scalar subquery ("below 20% of this
  part's average quantity") decorrelated into a per-part aggregate that is
  then BROADCAST back onto the fact table — the pattern Catalyst itself
  uses for decorrelation, written out so the plan is pinned: the brand
  filter broadcasts onto lineitem FIRST (so the per-part average only
  aggregates the ~1% of lineitems that can qualify), and the avg relation
  (one row per part of the brand) broadcasts back. Two scans of the pruned
  fact slice, zero fact-side shuffles. Cross-engine exactness: quantities
  are integer-valued doubles (exact sums at any order), the average is ONE
  exact-rounded IEEE division and the 0.2x threshold ONE multiply; revenue
  is summed as DECIMAL, never as reordering doubles.
- ``tpch_q18``: groupBy-HAVING over the fact table to find large-volume
  orders, then the (tiny) qualifying set broadcasts back through
  orders -> customer. The big side is aggregated BEFORE any join — the
  join-back touches 46 keys, not 60k rows. o_totalprice passes through
  unrounded (same binary double both engines).
- ``skew_salted_join``: the salting recipe for joining a big fact against
  a LOW-CARDINALITY dimension when broadcast is off the table (huge dim or
  disabled): the dim row for each key is replicated SALTS ways, the fact
  side computes salt = hash(row) % SALTS, and the join key becomes
  (key, salt) — a hot key's rows now spread over SALTS reducers instead of
  one. ``hint("shuffle_hash")`` pins the non-broadcast strategy so the
  salting is actually exercised. Salting is result-invariant, so the
  oracle is the PLAIN unsalted join — the hash never appears in the
  output. Money compares in exact integer cents (floor(value*100): one
  exact-rounded IEEE multiply, identical floor both engines) so the
  above-average predicate is pure BIGINT arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, query

# ---------------------------------------------------------------------------
# tpch_q17: small-quantity-order revenue per part (decorrelated)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#2"

_Q17_SQL = f"""
    WITH li_b AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = '{_Q17_BRAND}'
    ),
    pavg AS (
      SELECT l_partkey,
             sum(l_quantity) / count(*) AS avg_qty
      FROM li_b GROUP BY l_partkey
    )
    SELECT li_b.l_partkey AS p_partkey,
           round(pavg.avg_qty, 4) AS avg_qty,
           CAST(count(*) AS BIGINT) AS n_small,
           CAST(round(sum(CAST(li_b.l_extendedprice AS DECIMAL(18, 2))), 2)
                AS DOUBLE) AS small_revenue
    FROM li_b JOIN pavg ON li_b.l_partkey = pavg.l_partkey
    WHERE li_b.l_quantity < 0.2 * pavg.avg_qty
    GROUP BY li_b.l_partkey, pavg.avg_qty
"""


@query("tpch_q17", _Q17_SQL)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (per-part form): for each part of the brand, revenue from
    lineitems below 20% of that part's average quantity. The correlated
    scalar subquery is decorrelated into a broadcast per-part aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part_b = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li_b = li.join(F.broadcast(part_b), li.l_partkey == part_b.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = li_b.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    pavg_r = pavg.select(F.col("l_partkey").alias("pk"), "avg_qty")
    return (
        li_b.join(F.broadcast(pavg_r), li_b.l_partkey == pavg_r.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy(F.col("l_partkey").alias("p_partkey"), F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("small_revenue"),
        )
        .select(
            "p_partkey",
            F.round("avg_qty", 4).alias("avg_qty"),
            "n_small",
            "small_revenue",
        )
    )


# ---------------------------------------------------------------------------
# tpch_q18: large-volume customers (HAVING join-back)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 300

_Q18_SQL = f"""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
"""


@query("tpch_q18", _Q18_SQL)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18: customers whose orders total more than 300 units. The
    fact table is aggregated FIRST; the 46-key qualifying set broadcasts
    back through orders and customer — the join never moves the fact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > _Q18_MIN_QTY)
        .select("l_orderkey", F.col("_tq").cast("long").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# skew_salted_join: salt-replicated dim join, result-identical to the
# plain join (the oracle)
# ---------------------------------------------------------------------------

_SALTS = 8

_SALTED_SQL = """
    WITH dim AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_type,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, d.n_type,
           CAST(floor(e.value * 100) AS BIGINT) * d.n_type > d.total_cents
             AS above_avg
    FROM events e JOIN dim d ON e.event_type = d.event_type
"""


@query("skew_salted_join", _SALTED_SQL)
def skew_salted_join(spark, sf_dir):
    """Fact-to-low-cardinality-dim join with explicit salting: the dim is
    exploded SALTS ways, the fact side salts on hash(event_id), and the
    shuffle-hash join runs on (event_type, salt) so no reducer owns a
    whole event type. The salt is internal — output equals the plain join,
    which is exactly what the oracle runs."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1)))
    )
    fact = ev.select(
        "event_id", "event_type", cents.alias("cents")
    ).withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALTS)).cast("int"))
    return (
        fact.join(dim_salted.hint("shuffle_hash"), ["event_type", "salt"])
        .select(
            "event_id",
            "event_type",
            "n_type",
            (F.col("cents") * F.col("n_type") > F.col("total_cents")).alias(
                "above_avg"
            ),
        )
    )
