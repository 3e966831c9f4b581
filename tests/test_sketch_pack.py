"""Semantic properties of the sketch / packing / cube batch
(queries_sketch.py). Oracle parity is the driver's job; these tests pin the
guarantees the oracle cannot state: estimator accuracy, bloom soundness
(zero false negatives), packing feasibility, and lattice consistency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.queries_sketch import (
    _PACK_BUDGET,
    orders_cube_revenue,
    pack_training_sequences,
    sketch_kmv_distinct,
    tpch_bloom_prefilter,
    tpch_order_distribution,
)

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_estimate_tracks_exact(spark):
    rows = sketch_kmv_distinct(spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.n_exact > 0
        if r.kth_min == -1:
            # fewer than K distinct values: the sketch IS exact
            assert r.est_distinct == float(r.n_exact)
        else:
            # standard KMV error ~ 1/sqrt(K) = 18% at K=32; allow 3 sigma
            assert abs(r.est_distinct - r.n_exact) / r.n_exact < 0.55, (
                f"{r.event_type}: est {r.est_distinct} vs exact {r.n_exact}"
            )


def test_bloom_has_no_false_negatives_and_counts_are_consistent(spark):
    rows = tpch_bloom_prefilter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # every exact match must pass the bloom filter
        assert r.n_bloom_pass >= r.n_exact, f"{r.o_orderpriority}: false negative"
        assert r.n_false_pos == r.n_bloom_pass - r.n_exact


def test_bloom_exact_side_matches_plain_semi_join(spark):
    from ner_spark.queries import _t
    from ner_spark.queries_sketch import _BLOOM_BAL

    got = {
        r.o_orderpriority: r.n_exact
        for r in tpch_bloom_prefilter(spark, SF_DIR).collect()
    }
    o = _t(spark, SF_DIR, "orders")
    c = _t(spark, SF_DIR, "customer").filter(F.col("c_acctbal") > _BLOOM_BAL)
    want = {
        r.o_orderpriority: r.n
        for r in o.join(
            c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for prio, n in want.items():
        assert got[prio] == n


def test_packing_is_feasible_and_greedy(spark):
    rows = pack_training_sequences(spark, SF_DIR).collect()
    assert rows
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        seq, fill = 0, 0
        for r in rs:
            # replay the greedy fold and demand identical assignment
            if fill > 0 and fill + r.n_tokens > _PACK_BUDGET:
                seq, fill = seq + 1, 0
            assert r.seq_id == seq, f"bucket {bucket} doc {r.doc_id}"
            assert r.offset == fill
            fill += r.n_tokens
        # bins never exceed budget unless a single doc overflows alone
        bins: dict[int, list] = {}
        for r in rs:
            bins.setdefault(r.seq_id, []).append(r.n_tokens)
        for toks in bins.values():
            assert sum(toks) <= _PACK_BUDGET or len(toks) == 1


def test_packing_covers_every_nonempty_doc_once(spark):
    from ner_spark.queries import _t

    packed = pack_training_sequences(spark, SF_DIR)
    n_docs = (
        _t(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .count()
    )
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs


def test_cube_lattice_is_consistent(spark):
    rows = orders_cube_revenue(spark, SF_DIR).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].status_g == "(all)"
    total_n = grand[0].n_orders
    # each 1-d slice re-sums to the grand total
    assert sum(r.n_orders for r in rows if r.gid == 1) == total_n
    assert sum(r.n_orders for r in rows if r.gid == 2) == total_n
    assert sum(r.n_orders for r in rows if r.gid == 0) == total_n


def test_q13_distribution_accounts_for_every_customer(spark):
    from ner_spark.queries import _t

    rows = tpch_order_distribution(spark, SF_DIR).collect()
    n_cust = _t(spark, SF_DIR, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    # customers with zero qualifying orders survive (ON-clause filter, not
    # WHERE) — their count must equal the anti-join count
    n_zero = (
        _t(spark, SF_DIR, "customer")
        .join(
            _t(spark, SF_DIR, "orders").filter(
                F.col("o_orderpriority") != "1-URGENT"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .count()
    )
    got_zero = sum(r.custdist for r in rows if r.c_count == 0)
    assert got_zero == n_zero


def test_kmv_setops_estimates_track_exact(spark):
    from ner_spark.queries_sketch import _SETOP_K, sketch_kmv_setops

    r = sketch_kmv_setops(spark, SF_DIR).collect()[0]
    assert r.k == _SETOP_K
    assert r.n_union_exact >= r.n_inter_exact >= 0
    if r.kth_union == -1:
        # sketch saw everything: both estimates are exact
        assert r.est_union == float(r.n_union_exact)
        assert r.est_intersection == float(r.n_inter_exact)
    else:
        assert abs(r.est_union - r.n_union_exact) / r.n_union_exact < 0.3
        # intersection error compounds (union est x fraction): allow wider
        denom = max(r.n_inter_exact, 1)
        assert abs(r.est_intersection - r.n_inter_exact) / denom < 0.6


def test_kmv_setops_one_empty_side_degrades_cleanly(spark, tmp_path):
    """A corpus with NO fr documents must yield the exact small-side
    estimates (empty-sketch coalesce), not NULL/-1 sentinels."""
    import pandas as pd

    from ner_spark.queries_sketch import sketch_kmv_setops

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta gamma delta", "alpha beta gamma epsilon"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [22, 24],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    [row] = sketch_kmv_setops(spark, str(tmp_path)).collect()
    assert row["est_intersection"] == 0.0
    assert row["est_union"] >= 1.0  # the en side's exact small count
