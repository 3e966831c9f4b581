"""Semantics for the KG graph-analytics batch (queries_graphkg): relation
triples actually fire under the vocabulary bank, 2-hop paths are exactly
the composition of the edge set with itself, degrees are consistent with
the edge count, and support sums back to the per-document triple count."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.flagship import VOCAB_PRED_RULES, flagship_triples_vocab
from ner_spark.queries_graphkg import (
    _rel_edges,
    kg_entity_degree,
    kg_triple_support,
    kg_two_hop_paths,
)

SF = "/root/testdata/sf0.001"


def _same(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_vocab_bank_fires(spark):
    """The point of VOCAB_PRED_RULES: a non-empty relation layer on the
    driver corpus (the reference French bank yields zero rows here)."""
    rel = flagship_triples_vocab(spark, SF).filter(
        F.col("pred") != "instance_of"
    )
    preds = {r["pred"] for r in rel.select("pred").distinct().collect()}
    assert preds  # at least one rule fired
    assert preds <= {name for _rx, name in VOCAB_PRED_RULES}


def test_two_hop_equals_literal_composition(spark):
    e = _rel_edges(spark, SF)
    a = e.select("subj", F.col("pred").alias("pred1"), F.col("obj").alias("mid"))
    b = e.select(
        F.col("subj").alias("mid"),
        F.col("pred").alias("pred2"),
        F.col("obj").alias("obj"),
    )
    literal = (
        a.join(b, "mid")
        .filter(F.col("subj") != F.col("obj"))
        .select("subj", "pred1", "mid", "pred2", "obj")
        .distinct()
    )
    out = kg_two_hop_paths(spark, SF)
    assert out.count() > 0
    assert _same(out, literal)


def test_degree_sums_match_edge_count(spark):
    e_cnt = _rel_edges(spark, SF).count()
    deg = kg_entity_degree(spark, SF)
    sums = deg.agg(
        F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i")
    ).first()
    assert sums["o"] == e_cnt and sums["i"] == e_cnt


def test_support_totals_match_triple_table(spark):
    tri = flagship_triples_vocab(spark, SF)
    sup = kg_triple_support(spark, SF)
    # summing support over edges = number of distinct (edge, doc) pairs
    total = sup.agg(F.sum("support")).first()[0]
    distinct_pairs = (
        tri.select("subj", "pred", "obj", "doc_uid").distinct().count()
    )
    assert total == distinct_pairs
    # one row per distinct edge
    assert sup.count() == tri.select("subj", "pred", "obj").distinct().count()


def test_linked_triples_conserves_edges(spark):
    """Every surface edge lands on exactly one linked edge: sum(n_edges)
    equals the surface edge count, and gazetteer aliases never survive as
    surf: ids."""
    from ner_spark.flagship import _GAZ
    from ner_spark.queries_graphkg import kg_linked_triples

    e_cnt = _rel_edges(spark, SF).count()
    out = kg_linked_triples(spark, SF)
    assert out.agg(F.sum("n_edges")).first()[0] == e_cnt
    aliases = {a for _e, a, _l, _w in _GAZ}
    surf = {
        r[0][5:]
        for r in out.select("subj_id").collect()
        if r[0].startswith("surf:")
    } | {
        r[0][5:]
        for r in out.select("obj_id").collect()
        if r[0].startswith("surf:")
    }
    assert not (surf & aliases)


def test_canonical_edges_merge_ambiguous_entities(spark):
    """'spark' bridges E_spark and E_spark_person, so both collapse onto
    one canonical id (the lexicographic min, ent:E_spark) and the
    non-canonical entity id never appears; edge mass is conserved."""
    from ner_spark.queries_graphkg import kg_canonical_edges

    out = kg_canonical_edges(spark, SF)
    ids = {
        r[0] for r in out.select("subj_id").collect()
    } | {r[0] for r in out.select("obj_id").collect()}
    assert "ent:E_spark_person" not in ids
    e_cnt = _rel_edges(spark, SF).count()
    assert out.agg(F.sum("n_edges")).first()[0] == e_cnt


def test_node_table_covers_all_subjects(spark):
    """One node row per distinct triple subject; doc support bounded by
    the corpus; canonical id wins over entity id for ambiguous aliases."""
    from ner_spark.queries_graphkg import kg_node_table

    out = kg_node_table(spark, SF)
    tri = flagship_triples_vocab(spark, SF)
    assert out.count() == tri.select("subj").distinct().count()
    spark_row = out.filter(F.col("subj") == "spark").first()
    assert spark_row is not None and spark_row["node_id"] == "ent:E_spark"


def test_media_edges_fan_through_dedup(spark):
    """Every media edge's support counts original (pre-dedup) docs, and
    every media_ref in the interleaved corpus with a non-empty entity doc
    appears. Media derive from md5_60(doc_id) % 4 == 0 docs only."""
    from ner_spark.operators.dedup import md5_60
    from ner_spark.queries import _t
    from ner_spark.queries_graphkg import kg_media_edges

    out = kg_media_edges(spark, SF)
    assert out.count() > 0
    docs = _t(spark, SF, "documents")
    n_media_docs = docs.filter(
        md5_60(F.col("doc_id").cast("string")) % 4 == 0
    ).count()
    # each media doc contributes to at most (its entity count) edges, and
    # per-media support can never exceed the number of media docs
    assert out.agg(F.max("n_docs")).first()[0] <= n_media_docs
