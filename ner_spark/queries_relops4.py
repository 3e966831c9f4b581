"""Relational-operator coverage, batch 4: the remaining TPC-H queries
expressible on this synthetic schema (no partsupp table, no
commit/receipt dates), each picked for a distinct plan shape.

Scale notes per query:

- ``tpch_q5``: the classic multiway star-plus-fact-fact join (customer ->
  orders -> lineitem -> supplier with the c_nationkey = s_nationkey
  residual). The two genuinely large relations (orders, lineitem) meet in
  ONE shuffle on l_orderkey; supplier/nation are broadcast dims, and the
  region restriction prunes the nation broadcast BEFORE it fans out. At
  100 TB the plan is the same: one fact-fact exchange, everything else
  map-side.
- ``tpch_q6``: the pushdown showcase — every predicate (ship-date range,
  discount band, quantity cap) lands in PushedFilters on the parquet scan
  and only three columns are read; the single-row global aggregate is the
  legitimate SinglePartition case (GLOBAL_AGG_OK) because the map-side
  partial reduces each task to one row first.
- ``tpch_q8``: market-share via conditional aggregation — numerator and
  denominator in ONE pass (sum(CASE WHEN supplier-nation THEN rev END) /
  sum(rev)), never two scans joined back. The share is reported in exact
  integer parts-per-million: both cent sums are exact DECIMAL, the scale-up
  multiply stays under 2^53, and the single IEEE divide + floor is
  bit-identical on both engines (libm-free).
- ``tpch_q14``: same one-pass conditional-aggregation shape on the
  part-type axis (PROMO share per ship month), same exact ppm arithmetic.
- ``tpch_q16_suppliers``: count(DISTINCT supplier) per part attribute
  triple with a NOT-IN brand exclusion. Spark plans distinct-aggregate as
  the two-phase expand (partial distinct on (group, supp), then count) —
  no row ever carries a set, so a hot (brand,type,size) cell cannot OOM a
  reducer at scale.
- ``tpch_q19_disjunct``: disjunctive (OR-of-conjunctions) predicate
  spanning both join sides. The part-side union bound (brand IN ... AND
  size <= 15) is applied to the part scan BEFORE the broadcast so pruning
  survives the OR; the full disjunction then evaluates post-join. Checks
  that OR predicates don't silently defeat pushdown.
- ``tpch_q22_dormant``: global scalar aggregate (average positive balance)
  consumed by every row — attached as a single-row broadcast join on a
  constant key (Catalyst folds it to a trivially-true 1-row broadcast
  nested loop: O(rows) at any scale since the build side is one
  pre-aggregated row), then an anti join against orders. The
  above-average predicate is pure BIGINT (cents * n_customers >
  total_cents): no division anywhere, so no float drift between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, query

# ---------------------------------------------------------------------------
# tpch_q5: local-supplier volume within a region
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"

_Q5_SQL = f"""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                          * CAST(1 - l.l_discount AS DECIMAL(9, 6))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""


@query("tpch_q5", _Q5_SQL)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5: revenue by nation where the supplier serves a customer of
    its own nation, restricted to one region and one order year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n_region = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)  # the one fact-fact shuffle
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n_region), F.col("s_nationkey") == n_region.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q6: forecast revenue change (pure pushdown + global aggregate)
# ---------------------------------------------------------------------------

_Q6_SQL = """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18, 6))
                          * CAST(l_discount AS DECIMAL(9, 6))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
"""


@query("tpch_q6", _Q6_SQL)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6: revenue that would be gained by eliminating mid-band
    discounts on small orders. Every predicate pushes to the parquet scan
    (date range, discount band, quantity cap); the 0.04/0.06 literals are
    the same nearest-binary doubles the generator wrote, so the band
    selects identical rows in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * F.col("l_discount").cast("decimal(9,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q8: national market share within a customer region
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_3"
_Q8_REGION = "AMERICA"
_Q8_TYPE = "ECONOMY"

# Cents are exact DECIMAL sums cast to BIGINT; the ppm share does one
# in-range multiply (< 2^53) and one IEEE divide — identical both engines.
_Q8_SQL = f"""
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18, 2)) * 100 AS BIGINT)
               AS cents,
             (sn.n_name = '{_Q8_NATION}') AS is_target
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{_Q8_TYPE}'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      WHERE r.r_name = '{_Q8_REGION}'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END) AS BIGINT)
             AS target_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(floor(sum(CASE WHEN is_target THEN cents ELSE 0 END)
                      * 1000000.0 / sum(cents)) AS BIGINT) AS share_ppm
    FROM flat
    GROUP BY o_year
"""


@query("tpch_q8", _Q8_SQL)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8: the target nation's share of ECONOMY-part revenue sold
    into one customer region, per order year. Numerator and denominator
    come from ONE conditional aggregation pass — never two scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        (F.col("n_name") == _Q8_NATION).alias("is_target"),
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    cn_region = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    cents = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == sn.sn_key)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn_region), F.col("c_nationkey") == cn_region.cn_key)
        .select(F.year("o_orderdate").alias("o_year"), cents, "is_target")
    )
    target = F.sum(F.when(F.col("is_target"), F.col("cents")).otherwise(0))
    total = F.sum("cents")
    return flat.groupBy("o_year").agg(
        target.cast("bigint").alias("target_cents"),
        total.cast("bigint").alias("total_cents"),
        F.floor(target * 1000000.0 / total).cast("bigint").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# tpch_q14: promotion-revenue share per ship month
# ---------------------------------------------------------------------------

_Q14_SQL = """
    WITH flat AS (
      SELECT date_trunc('month', l.l_shipdate) AS ship_month,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18, 2)) * 100 AS BIGINT)
               AS cents,
             (p.p_type = 'PROMO') AS is_promo
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    )
    SELECT ship_month,
           CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT)
             AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(floor(sum(CASE WHEN is_promo THEN cents ELSE 0 END)
                      * 1000000.0 / sum(cents)) AS BIGINT) AS promo_ppm
    FROM flat
    GROUP BY ship_month
"""


@query("tpch_q14", _Q14_SQL)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14: PROMO parts' share of monthly revenue — one conditional
    aggregation pass, share in exact integer ppm."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    cents = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    flat = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.date_trunc("month", "l_shipdate").alias("ship_month"), cents, "is_promo"
    )
    promo = F.sum(F.when(F.col("is_promo"), F.col("cents")).otherwise(0))
    total = F.sum("cents")
    return flat.groupBy("ship_month").agg(
        promo.cast("bigint").alias("promo_cents"),
        total.cast("bigint").alias("total_cents"),
        F.floor(promo * 1000000.0 / total).cast("bigint").alias("promo_ppm"),
    )


# ---------------------------------------------------------------------------
# tpch_q16_suppliers: distinct-supplier counts per part attribute triple
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)

_Q16_SQL = f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN {_Q16_SIZES}
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("tpch_q16_suppliers", _Q16_SQL)
def tpch_q16_suppliers(spark, sf_dir):
    """TPC-H Q16 (partsupp-free form): how many distinct suppliers shipped
    each surviving (brand, type, size) triple. count(DISTINCT) plans as
    the two-phase expand — partial distinct before the count — so no
    reducer ever holds a supplier set in memory."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# tpch_q19_disjunct: OR-of-conjunctions spanning both join sides
# ---------------------------------------------------------------------------

_Q19_SQL = """
    SELECT p.p_brand,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                          * CAST(1 - l.l_discount AS DECIMAL(9, 6))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    GROUP BY p.p_brand
"""


@query("tpch_q19_disjunct", _Q19_SQL)
def tpch_q19_disjunct(spark, sf_dir):
    """TPC-H Q19 (container-free form): disjunctive predicate across both
    sides of the join. The part-side union bound (brand IN the three
    brands AND size <= 15) prunes the broadcast build side up front; the
    full OR evaluates post-join. This is the manual form of the
    constraint-propagation Catalyst can't do through an OR."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    disjunct = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(disjunct)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q22_dormant: above-average-balance customers who never ordered
# ---------------------------------------------------------------------------

_Q22_SQL = """
    WITH pos AS (
      SELECT c_custkey, c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(18, 2)) * 100 AS BIGINT) AS cents
      FROM customer WHERE c_acctbal > 0.0
    ),
    stats AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
             count(*) AS n_pos
      FROM pos
    )
    SELECT n.n_name,
           count(*) AS numcust,
           CAST(sum(pos.cents) AS BIGINT) AS totacctbal_cents
    FROM pos, stats
    JOIN nation n ON n.n_nationkey = pos.c_nationkey
    WHERE pos.cents * stats.n_pos > stats.total_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pos.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
"""


@query("tpch_q22_dormant", _Q22_SQL)
def tpch_q22_dormant(spark, sf_dir):
    """TPC-H Q22 (phone-free form): customers with an above-average
    positive balance and no order since 2000 (dormant), per nation. The global
    average attaches as a broadcast single-row join on a constant key
    (folds to a 1-row NLJ, O(rows)); "above average" is the division-free
    integer form cents * n > total_cents, exact in both engines."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    pos = c.select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    stats = (
        pos.agg(
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).alias("n_pos"),
        )
        .withColumn("k", F.lit(1))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    n = _t(spark, sf_dir, "nation")
    return (
        pos.withColumn("k", F.lit(1))
        .join(F.broadcast(stats), "k")
        .filter(F.col("cents") * F.col("n_pos") > F.col("total_cents"))
        .join(o, pos.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("cents").cast("bigint").alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# tpch_q10: returned-item revenue per customer (big-key aggregate + dims)
# ---------------------------------------------------------------------------

_Q10_SQL = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18, 6))
                          * CAST(1 - l.l_discount AS DECIMAL(9, 6))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
"""


@query("tpch_q10", _Q10_SQL)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10: revenue lost to returns per customer in one quarter.
    The returnflag + date filters prune both fact scans BEFORE the one
    fact-fact exchange; customer/nation broadcast onto the aggregate's
    output side (aggregate first on o_custkey, then decorate with dims —
    the wide c_name column never rides through the big shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_items")
    )


# ---------------------------------------------------------------------------
# orders_grouping_sets: arbitrary grouping-set lists (not a CUBE/ROLLUP)
# ---------------------------------------------------------------------------

_GSETS_SQL = """
    SELECT coalesce(o_orderstatus, '(all)') AS status_g,
           coalesce(o_orderpriority, '(all)') AS prio_g,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18, 4))) AS DOUBLE), 2)
             AS total_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("orders_grouping_sets", _GSETS_SQL)
def orders_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the per-status and per-priority marginals
    plus the grand total WITHOUT the (status, priority) cross cells a CUBE
    would compute: one aggregate pass materialises exactly the sets asked
    for (the expand operator emits 3 rows per input, not 4)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2
            ).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status_g"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("prio_g"),
            "total_price",
            "n_orders",
        )
    )
