"""IR / anomaly / containment coverage batch (round 3, final).

Three standard corpus-and-telemetry constructions the earlier batches did
not cover (reference scope: the NER repo computes per-document mention
statistics, src/utils/ner_config.py; these are the corpus-level and
stream-level siblings a production pipeline runs next to them):

- ``ir_bm25_topk``: Okapi BM25 retrieval — the ranking function behind
  Lucene/Elasticsearch — top-10 documents per query term, with the query
  set itself derived deterministically from the corpus (highest-df terms
  of length >= 4). With k1=12/10 and b=3/4 the length-normalized tf is an
  exact integer rational; ln() is the single transcendental and both
  engines apply it to an identically-rounded double. The ranking key is
  the ROUND-6 score (not the raw double), so the emitted ranking is a
  pure function of the reported values.
- ``events_anomaly_zscore``: per-user 3-sigma outlier flagging in EXACT
  integer arithmetic — the z-score inequality |v-mu| > 3*sigma is
  multiplied out to (n*v - s)^2 > 9*(n*q - s^2) over milli-scaled BIGINT
  sums (DECIMAL(38,0) in Spark, HUGEINT in the oracle), so no float
  enters the decision at all. Plan: one map-side-combinable per-user
  aggregate, broadcast back onto the stream (users ≪ events), pure filter
  — the shape of every production telemetry anomaly pass.
- ``dedup_containment``: Broder's directional containment
  C = |A∩B| / min(|A|,|B|) over the same df-capped shingle blocking join
  as the Jaccard path — catches a short document quoted whole inside a
  long one (C=1.0) that resemblance-threshold dedup never sees. The
  threshold compares in integers (inter*100 >= min*50).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _SHINGLE_SQL, _t, query

# ---------------------------------------------------------------------------
# ir_bm25_topk
# ---------------------------------------------------------------------------

_BM25_K = 10
_BM25_NQ = 8
_BM25_MINLEN = 4

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    flat AS (SELECT doc_id, unnest(tk) AS term FROM toks),
    tfc AS (SELECT doc_id, term, count(*) AS tf FROM flat GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tfc GROUP BY 1),
    corpus AS (SELECT count(*) AS n, sum(dl) AS s FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
    qterms AS (SELECT term, df FROM dfreq WHERE length(term) >= {_BM25_MINLEN}
               ORDER BY df DESC, term ASC LIMIT {_BM25_NQ}),
    scored AS (
      SELECT q.term, t.doc_id, t.tf, q.df, d.dl,
             round( ln( (2.0*(c.n+1)) / (2*q.df+1) )
                  * ( (22.0*t.tf*c.s)
                      / (10.0*t.tf*c.s + 3.0*c.s + 9.0*d.dl*c.n) ), 6) AS score
      FROM tfc t JOIN qterms q USING (term)
                 JOIN dl d USING (doc_id)
                 CROSS JOIN corpus c
    )
    SELECT term, doc_id, tf, df, dl, score,
           row_number() OVER (PARTITION BY term
                              ORDER BY score DESC, doc_id ASC) AS rk
    FROM scored QUALIFY rk <= {_BM25_K}
"""


@query("ir_bm25_topk", _BM25_SQL)
def ir_bm25_topk(spark, sf_dir):
    """BM25 top-10 docs for the corpus's 8 highest-df terms (length>=4).
    See operators/textstats.py:bm25_topk for the exactness and shuffle-plan
    contract (integer-rational tf normalization, ln-only transcendental,
    TakeOrderedAndProject query-term selection, 1-row broadcast totals)."""
    from .operators.textstats import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        k=_BM25_K,
        n_query_terms=_BM25_NQ,
        min_term_len=_BM25_MINLEN,
    )


# ---------------------------------------------------------------------------
# events_anomaly_zscore
# ---------------------------------------------------------------------------

_Z_MIN_N = 20

_ZSCORE_SQL = f"""
    WITH v AS (
      SELECT event_id, user_id, CAST(floor(value*1000) AS BIGINT) AS v_milli
      FROM events WHERE value IS NOT NULL
    ),
    st AS (
      SELECT user_id, count(*) AS n_user,
             sum(CAST(v_milli AS HUGEINT)) AS s,
             sum(CAST(v_milli AS HUGEINT)*v_milli) AS q
      FROM v GROUP BY 1
    )
    SELECT v.event_id, v.user_id, v.v_milli, st.n_user
    FROM v JOIN st USING (user_id)
    WHERE st.n_user >= {_Z_MIN_N}
      AND (st.n_user*CAST(v.v_milli AS HUGEINT) - st.s)
          * (st.n_user*CAST(v.v_milli AS HUGEINT) - st.s)
          > 9*(st.n_user*st.q - st.s*st.s)
"""


@query("events_anomaly_zscore", _ZSCORE_SQL)
def events_anomaly_zscore(spark, sf_dir):
    """Per-user 3-sigma outliers in exact integer arithmetic: the z-score
    test is multiplied out to (n*v - s)^2 > 9*(n*q - s^2) over milli-scaled
    DECIMAL(38,0) sums, so the flag never touches a float (v<=~1e6 milli
    => every intermediate < 1e21 ≪ 1e38). One per-user aggregate
    (map-side combinable), broadcast back onto the event stream, filter."""
    dec = "decimal(38,0)"
    v = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 1000).alias("v_milli"),
        )
    )
    vm = F.col("v_milli").cast(dec)
    st = v.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user"),
        F.sum(vm).alias("s"),
        F.sum(vm * vm).alias("q"),
    )
    j = v.join(F.broadcast(st), "user_id")
    dev = F.col("n_user").cast(dec) * F.col("v_milli").cast(dec) - F.col("s")
    var_n2 = F.col("n_user").cast(dec) * F.col("q") - F.col("s") * F.col("s")
    return (
        j.filter((F.col("n_user") >= _Z_MIN_N) & (dev * dev > F.lit(9).cast(dec) * var_n2))
        .select("event_id", "user_id", "v_milli", "n_user")
    )


# ---------------------------------------------------------------------------
# dedup_containment
# ---------------------------------------------------------------------------

_CONT_MAX_DF = 50
_CONT_PCT = 50

_CONTAIN_SQL = f"""
    WITH sh AS ({_SHINGLE_SQL}),
    posting0 AS (SELECT doc, unnest(sh) AS shingle FROM sh),
    hot AS (SELECT shingle FROM posting0 GROUP BY shingle
            HAVING count(*) > {_CONT_MAX_DF}),
    posting1 AS (SELECT doc, shingle FROM posting0
                 WHERE shingle NOT IN (SELECT shingle FROM hot)),
    nsh AS (SELECT doc, count(*) AS n_sh FROM posting1 GROUP BY doc),
    posting AS (SELECT p.doc, p.shingle, n.n_sh
                FROM posting1 p JOIN nsh n ON p.doc = n.doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
             count(*) AS inter
      FROM posting a JOIN posting b
        ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, n_a, n_b, inter,
           round(CAST(inter AS DOUBLE)/least(n_a, n_b), 4) AS containment
    FROM inter
    WHERE inter*100 >= least(n_a, n_b)*{_CONT_PCT}
"""


@query("dedup_containment", _CONTAIN_SQL)
def dedup_containment(spark, sf_dir):
    """Directional containment pairs at C>=0.5 over df-capped 3-gram
    shingles — the subset-duplication detector (operators/dedup.py:
    containment_pairs); shares the blocking self-join with the Jaccard
    path via shingle_intersections."""
    from .operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"),
        threshold_pct=_CONT_PCT,
        max_df=_CONT_MAX_DF,
    )
