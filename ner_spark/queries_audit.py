"""Pipeline-QA audits, batch 12: ANN recall and language-ID confusion.

With ``dedup_blocking_eval`` (batch 11) these complete the
measure-your-pipeline family — the audits a production pipeline runs
whenever an approximate component's configuration changes:

- ``ann_recall_eval``: recall@k of the hyperplane-LSH top-k against the
  exact brute-force top-k, computed IN-ENGINE per query vector. The
  standard vector-search deployment gate ("does recall hold after
  re-banding?"), expressed as a semi-join of two ranked relations — no
  collects, no notebooks. Every query keeps a row even at 0 hits (LEFT
  join), so silent total-recall collapse is visible, not filtered away.
- ``lang_id_confusion``: the language-ID confusion matrix — predicted vs
  actual language with per-true-language share (the synthetic corpus
  carries ground-truth ``lang``). One groupBy over the prediction
  projection + a broadcast per-truth totals attach; the audit that turns
  a classifier query (``lang_id_predict``) into a quality report.

Scale notes: the recall eval's inputs are the two top-k relations
(|queries| x k rows each) — the expensive halves are the standing
queries themselves; the reconciliation is a tiny join keyed (q_id,
nb_id). The confusion matrix is |langs|^2 rows after one
map-side-combinable exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _lang_sql, _t, query
from .oracle_ann import _ann_lsh_sql

_AR_K = 5

_BF_SQL = """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id % 40 = 0),
    v AS (SELECT vec_id AS nb_id, CAST(embedding AS DOUBLE[]) AS nb_vec
          FROM embeddings),
    scored AS (
      SELECT q_id, nb_id,
             round(list_cosine_similarity(q_vec, nb_vec), 4) AS score
      FROM q CROSS JOIN v WHERE q_id <> nb_id
    ),
    ranked AS (
      SELECT q_id, nb_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, nb_id ASC) AS rank
      FROM scored
    )
    SELECT q_id, nb_id FROM ranked WHERE rank <= 5
"""

_AR_SQL = f"""
    WITH bf AS ({_BF_SQL}),
    lsh AS ({_ann_lsh_sql()}),
    hits AS (
      SELECT bf.q_id, count(lsh.nb_id) AS n_hits
      FROM bf LEFT JOIN lsh
        ON lsh.q_id = bf.q_id AND lsh.nb_id = bf.nb_id
      GROUP BY 1
    )
    SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
           round(CAST(n_hits AS DOUBLE) / {_AR_K}, 6) AS recall
    FROM hits
"""


@query("ann_recall_eval", _AR_SQL)
def ann_recall_eval(spark, sf_dir):
    """Per-query recall@{k} of the banded hyperplane-LSH top-k vs the
    exact brute-force top-k (identical parameters to ann_topk_lsh /
    ann_topk_bruteforce): LEFT-joined hit counts so zero-recall queries
    stay visible; one rounded division per row."""
    from .operators.similarity import brute_force_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(emb, queries, k=_AR_K).select("q_id", "nb_id")
    lsh = lsh_topk(emb, queries, k=_AR_K, bands=8, planes_per_band=4).select(
        "q_id", F.col("nb_id").alias("lsh_nb")
    )
    hits = (
        bf.join(
            lsh,
            (bf.q_id == lsh.q_id) & (bf.nb_id == lsh.lsh_nb),
            "left",
        )
        .groupBy(bf.q_id)
        .agg(F.count("lsh_nb").alias("n_hits"))
    )
    return hits.select(
        "q_id",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / _AR_K, 6).alias("recall"),
    )


_LC_SQL = f"""
    WITH p AS ({_lang_sql()}),
    m AS (
      SELECT true_lang, pred_lang, count(*) AS n_docs
      FROM p GROUP BY 1, 2
    ),
    t AS (SELECT true_lang, sum(n_docs) AS n_true FROM m GROUP BY 1)
    SELECT m.true_lang, m.pred_lang,
           CAST(m.n_docs AS BIGINT) AS n_docs,
           round(CAST(m.n_docs AS DOUBLE) / t.n_true, 6) AS share
    FROM m JOIN t USING (true_lang)
"""


@query("lang_id_confusion", _LC_SQL)
def lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix: predicted vs ground-truth language
    with per-truth share — one exchange over the prediction projection,
    totals attached by broadcast; the quality report on top of
    lang_id_predict."""
    from .operators.textstats import predict_lang

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    p = docs.select(
        predict_lang(F.col("text")).alias("pred_lang"),
        F.col("lang").alias("true_lang"),
    )
    m = p.groupBy("true_lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = m.groupBy("true_lang").agg(F.sum("n_docs").alias("n_true"))
    return m.join(F.broadcast(t), "true_lang").select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n_true"), 6).alias("share"),
    )
