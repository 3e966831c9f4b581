"""Semantics for the batch-12 audits: recall reconciliation recomputed
from the two engine top-k relations, and the confusion matrix recomputed
from the prediction projection."""

from __future__ import annotations

from collections import Counter, defaultdict

from ner_spark.queries_audit import _AR_K, ann_recall_eval, lang_id_confusion

SF = "/root/testdata/sf0.001"


def test_ann_recall_matches_set_intersection(spark):
    from ner_spark.queries import Q

    bf = defaultdict(set)
    for r in Q["ann_topk_bruteforce"](spark, SF).collect():
        bf[r["q_id"]].add(r["nb_id"])
    lsh = defaultdict(set)
    for r in Q["ann_topk_lsh"](spark, SF).collect():
        lsh[r["q_id"]].add(r["nb_id"])
    rows = {r["q_id"]: r for r in ann_recall_eval(spark, SF).collect()}
    assert set(rows) == set(bf), "one row per brute-force query"
    for q, nbs in bf.items():
        hits = len(nbs & lsh.get(q, set()))
        assert rows[q]["n_hits"] == hits, q
        assert rows[q]["recall"] == round(hits / _AR_K, 6), q
    # sf0.001 has only ~50 vectors, so buckets are sparse; the standing
    # recall >= 0.9 property at sf0.01 lives in test_dedup_similarity —
    # here just require the audit isn't reporting a total collapse
    mean = sum(r["recall"] for r in rows.values()) / len(rows)
    assert mean >= 0.4, f"LSH recall degenerated: {mean}"


def test_lang_confusion_matches_prediction_counts(spark):
    from ner_spark.queries import Q

    pred = Counter(
        (r["true_lang"], r["pred_lang"])
        for r in Q["lang_id_predict"](spark, SF).collect()
    )
    totals = Counter()
    for (t, _), n in pred.items():
        totals[t] += n
    rows = lang_id_confusion(spark, SF).collect()
    assert len(rows) == len(pred)
    for r in rows:
        n = pred[(r["true_lang"], r["pred_lang"])]
        assert r["n_docs"] == n
        assert r["share"] == round(n / totals[r["true_lang"]], 6)
    # the synthetic corpus is English-vocab text under synthetic lang
    # labels, so the HONEST confusion matrix is en-heavy — require only
    # that the matrix is non-trivial (that fact is exactly what the
    # audit exists to reveal)
    assert len({p for _, p in pred}) >= 2
    assert len(pred) > len({t for t, _ in pred})
