"""Relational-operator coverage, batch 5: the last TPC-H plan shapes not
yet in the registry, each adapted to this synthetic schema (no partsupp
table, no commit/receipt dates — lateness is derived from
l_shipdate vs o_orderdate, and per-(part,supplier) lineitem aggregates
stand in for partsupp).

Scale notes per query:

- ``tpch_q4``: EXISTS with a correlated non-equi predicate that spans both
  tables (l_shipdate > o_orderdate + 60 days). Planned as ONE left-semi
  hash join on the equi key with the lateness residual evaluated inside the
  join — never a distinct-then-join materialization of the matching pairs,
  so a popular order with 7 late lines costs 7 probe hits, not 7 carried
  rows.
- ``tpch_q21``: the classic double self-join (EXISTS other-supplier +
  NOT EXISTS other-late-supplier) is deliberately NOT built as two
  shuffles over the fact table. Both correlated subqueries collapse into
  ONE per-order aggregate (distinct suppliers, distinct late suppliers);
  a late line qualifies iff its order has >= 2 suppliers and exactly 1
  late one (which is then necessarily this line's). One groupBy + one
  co-partitioned join-back replaces two fact-fact semi/anti joins — at
  100 TB that's one shuffle of (orderkey, 2 counts) instead of three
  passes over lineitem.
- ``tpch_q9``: profit by supplier nation x order year. Part/supplier/
  nation broadcast; orders is the single fact-fact exchange. The profit
  expression stays DECIMAL end-to-end (price x discount minus a 6% cost
  proxy on retailprice x quantity) so the engine/oracle hash comparison
  is exact — precision peaks at (35,12), under Spark's 38 cap, so no
  engine rounds before the final round(., 2).
- ``tpch_q20``: two-level aggregation (per (part, supplier) quantity,
  re-aggregated per part) + a co-partitioned join-back, with the share
  predicate in overflow-safe integer arithmetic (2*supp_qty > part_qty;
  quantities are integral so BIGINT casts are exact). The second
  aggregate reuses the first's hash partitioning prefix — AQE plans it
  without a fresh wide exchange of the fact table.
- ``tpch_q2``: min-per-group join-back (the decorrelated form of Q2's
  correlated MIN subquery): per-part best offer, equi-join offers back on
  (partkey, best_price). DECIMAL min so the join key is bit-identical on
  both engines; ties keep ALL achieving suppliers (deterministic, no
  arbitrary row_number pick).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, query

# ---------------------------------------------------------------------------
# tpch_q4: order-priority checking via EXISTS (late line)
# ---------------------------------------------------------------------------

_Q4_SQL = """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
"""


@query("tpch_q4", _Q4_SQL)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 (adapted: late = shipped >60 days after ordering): count of
    orders per priority having at least one late line. One left-semi hash
    join on o_orderkey with the cross-table lateness residual."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# tpch_q21: suppliers who kept multi-supplier orders waiting (sole late)
# ---------------------------------------------------------------------------

_Q21_CUTOFF = "1997-07-01"

_Q21_SQL = f"""
    SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate >= TIMESTAMP '{_Q21_CUTOFF}'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= TIMESTAMP '{_Q21_CUTOFF}')
    GROUP BY s.s_name
"""


@query("tpch_q21", _Q21_SQL)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 (adapted: late = shipped on/after the cutoff): suppliers
    who were the ONLY late supplier on a multi-supplier order.

    The oracle states it as EXISTS + NOT EXISTS self-joins; the engine
    computes the equivalent per-order profile in ONE aggregation —
    (distinct suppliers, distinct late suppliers) per order — and joins the
    late lines back. A late line satisfies both subqueries iff its order
    has >= 2 suppliers and exactly 1 late supplier (itself). One shuffle of
    per-order counts replaces two extra passes over the fact table."""
    cutoff = _Q21_CUTOFF
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", (F.col("l_shipdate") >= cutoff).alias("is_late")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.filter(F.col("is_late"))
        .join(qualifying, "l_orderkey")  # co-partitioned with the agg above
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# tpch_q9: product-type profit by nation and order year
# ---------------------------------------------------------------------------

_Q9_TOKEN = "red"

_Q9_SQL = f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                            * CAST(1 - l.l_discount AS DECIMAL(9, 6))
                          - CAST(p.p_retailprice AS DECIMAL(18, 6))
                            * CAST(l.l_quantity AS DECIMAL(9, 2))
                            * CAST(0.06 AS DECIMAL(6, 4))), 2)
                AS DOUBLE) AS profit,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%{_Q9_TOKEN}%'
    GROUP BY n.n_name, year(o.o_orderdate)
"""


@query("tpch_q9", _Q9_SQL)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 (adapted: cost proxy = 6% of retailprice per unit, standing
    in for the absent ps_supplycost): profit by supplier nation and order
    year over parts matching a name token. Part/supplier/nation broadcast;
    ONE fact-fact exchange (orders)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{_Q9_TOKEN}%"))
        .select("p_partkey", "p_retailprice")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(9,6)") - F.col("p_retailprice").cast("decimal(18,6)") * F.col(
        "l_quantity"
    ).cast("decimal(9,2)") * F.expr("CAST(0.06 AS DECIMAL(6,4))")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)  # the one fact-fact shuffle
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(profit), 2).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q20: dominant suppliers of a part family (nested agg + join-back)
# ---------------------------------------------------------------------------

_Q20_PREFIX = "red"

_Q20_SQL = f"""
    WITH q AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    t AS (
      SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      FROM q GROUP BY l_partkey
    )
    SELECT s.s_name,
           count(*) AS n_dominant_parts,
           CAST(sum(q.supp_qty) AS BIGINT) AS total_qty
    FROM q
    JOIN t ON t.l_partkey = q.l_partkey
    JOIN part p ON p.p_partkey = q.l_partkey AND p.p_name LIKE '{_Q20_PREFIX}%'
    JOIN supplier s ON s.s_suppkey = q.l_suppkey
    WHERE 2 * q.supp_qty > t.part_qty
    GROUP BY s.s_name
"""


@query("tpch_q20", _Q20_SQL)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 (adapted: 'availqty > half the demand' becomes 'this
    supplier shipped more than half the part's 1997 volume'): per-part
    dominant suppliers of a part-name family. Two-level aggregation where
    the re-aggregate and the join-back stay on the first shuffle's key
    prefix; integer share test (2*supp > total) — no division, no floats."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty")
    )
    t = q.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{_Q20_PREFIX}%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        q.join(t, "l_partkey")  # co-partitioned: both sides hashed on l_partkey
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_dominant_parts"),
            F.sum("supp_qty").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q2: best-offer supplier per part (decorrelated MIN join-back)
# ---------------------------------------------------------------------------

_Q2_TYPE = "SMALL"
_Q2_MAX_SIZE = 10

_Q2_SQL = f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18, 6))) AS best
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    pm AS (
      SELECT l_partkey, min(best) AS part_min FROM offers GROUP BY l_partkey
    )
    SELECT p.p_partkey, s.s_name, n.n_name AS nation,
           CAST(o.best AS DOUBLE) AS best_price
    FROM offers o
    JOIN pm ON pm.l_partkey = o.l_partkey AND o.best = pm.part_min
    JOIN part p ON p.p_partkey = o.l_partkey
              AND p.p_size <= {_Q2_MAX_SIZE} AND p.p_type = '{_Q2_TYPE}'
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
"""


@query("tpch_q2", _Q2_SQL)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 (adapted: the correlated min-supplycost subquery becomes
    the min offered price in lineitem, partsupp being absent): for each
    small part, every supplier achieving the minimum price. Decorrelated as
    agg + co-partitioned equi-join-back on (partkey, price); the join key
    is DECIMAL so min-equality is bit-identical across engines. Ties keep
    all achieving suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,6)")).alias("best")
    )
    pm = offers.groupBy("l_partkey").agg(F.min("best").alias("part_min"))
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= _Q2_MAX_SIZE) & (F.col("p_type") == _Q2_TYPE))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        offers.join(
            pm,
            (offers.l_partkey == pm.l_partkey) & (offers.best == pm.part_min),
        )
        .drop(pm.l_partkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("best").cast("double").alias("best_price"),
        )
    )
