"""TF-IDF top-k, repetition features, PII redaction — semantic unit tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ner_spark.operators.textstats import pii_redact, repetition_features, tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_scores_and_rank(spark):
    df = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
    )
    out = {(r["doc_id"], r["term"]): r for r in tfidf_topk(df, k=3).collect()}
    # df: apple=1, banana=2, cherry=2, date=1; N=3
    assert out[(1, "apple")]["tf"] == 2 and out[(1, "apple")]["df"] == 1
    assert out[(1, "apple")]["score"] == round(2 * math.log(3 / 1), 6)
    assert out[(2, "banana")]["score"] == round(1 * math.log(3 / 2), 6)
    # rank 1 in doc 3 is cherry (tf=3)
    assert out[(3, "cherry")]["rk"] == 1
    # ties (same tf, same df) rank by term asc: doc 2 banana vs cherry
    assert out[(2, "banana")]["rk"] == 1 and out[(2, "cherry")]["rk"] == 2


def test_repetition_features_bruteforce(spark):
    df = _docs(spark, [(1, "a b a b a c"), (2, "x x x x")])
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    r1 = got[1]  # tokens: a b a b a c -> n=6, uniq=3, top word a(3), top bigram: 'a b'(2)/'b a'(2) -> max bg 'b a'
    assert r1["n_tokens"] == 6
    assert r1["uniq_word_frac"] == round(3 / 6, 4)
    assert r1["top_word"] == "a" and r1["top_word_frac"] == 0.5
    assert r1["top_bigram"] == "b a" and r1["top_bigram_frac"] == 0.4
    r2 = got[2]
    assert r2["top_word"] == "x" and r2["top_word_frac"] == 1.0
    assert r2["top_bigram"] == "x x" and r2["top_bigram_frac"] == 1.0


def test_pii_redact_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "write to bob123@mail.example.org or +1-555-0042 now"),
            (2, "no pii here"),
        ],
        "doc_id long, aug_text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    # redaction visible in plain form
    red = df.select(
        F.regexp_replace(
            F.regexp_replace("aug_text", "[a-z0-9]+@[a-z0-9.]+[a-z]", "<EMAIL>"),
            r"\+1-555-[0-9]{4}",
            "<PHONE>",
        ).alias("r")
    ).collect()
    assert red[0]["r"] == "write to <EMAIL> or <PHONE> now"
