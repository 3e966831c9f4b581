"""CasEN-format ingest (U1) — unit + real-fixture regression.

The reference ships a deterministic input/output pair (FIXTURES.md F6):
src/Results/Corpus/corpus.txt and src/Results/CasEN/Res_CasEN/
corpus.result.txt (3,448 docs, ~23,700 inline entity tags). Read-only from
/root/reference; regression tests skip if absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ner_spark.sources import casen_xml as CX

FIXTURE = "/root/reference/src/Results/CasEN/Res_CasEN/corpus.result.txt"


def test_parse_doc_id():
    assert CX.parse_doc_id("(699\\,)") == [699]
    assert CX.parse_doc_id("(1\\, 2\\, 12)") == [1, 2, 12]
    assert CX.parse_doc_id("(5841,)") == [5841]


def test_parse_tagged_text_nested_and_offsets():
    markup = (
        'Hello <persName grf="grfpersGenerique"><surname>Adamo</surname></persName>'
        ' sings in <placeName>Paris</placeName>.'
    )
    text, mentions = CX.parse_tagged_text(markup)
    assert text == "Hello Adamo sings in Paris."
    assert len(mentions) == 2
    adamo, paris = mentions
    assert (adamo["NE"], adamo["label"]) == ("Adamo", "PER")
    assert text[adamo["start"] : adamo["end"]] == "Adamo"
    # nested surname contributes its tag to the outermost mention
    assert adamo["tags"] == ["persName", "surname"]
    assert adamo["grfs"] == ["grfpersGenerique"]
    assert (paris["NE"], paris["label"]) == ("Paris", "LOC")
    assert text[paris["start"] : paris["end"]] == "Paris"


def test_parse_tolerates_stray_sentence_tags():
    markup = "vous pensez ?</s> <s><orgName grf=\"g\">NASA</orgName> continue</s>"
    text, mentions = CX.parse_tagged_text(markup)
    assert "NASA" in text and "</s>" not in text
    [m] = mentions
    assert m["NE"] == "NASA" and m["label"] == "ORG"


def test_parse_result_file_multidoc():
    content = (
        '<root><doc id="(1\\,)">plain text only</doc>\n'
        '<doc id="(2\\, 3)">see <persName><forename>Marie</forename> '
        "<surname>Curie</surname></persName> here</doc></root>"
    )
    docs = CX.parse_result_file(content)
    assert [d["doc_ids"] for d in docs] == [[1], [2, 3]]
    assert docs[0]["mentions"] == []
    [m] = docs[1]["mentions"]
    assert m["NE"] == "Marie Curie"
    assert docs[1]["text"][m["start"] : m["end"]] == "Marie Curie"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture absent")
def test_reference_fixture_regression():
    """Heavy asserts run on the parser directly (the Spark path just wraps
    it in a pandas UDF, covered by the spark test below)."""
    with open(FIXTURE, encoding="utf-8") as f:
        docs = CX.parse_result_file(f.read())
    assert len(docs) == 3448
    n_mentions = sum(len(d["mentions"]) for d in docs)
    assert 10_000 < n_mentions < 30_000  # ~23.7k tags incl. nested
    # offsets are exact for every mention in the corpus
    for d in docs:
        for m in d["mentions"]:
            assert d["text"][m["start"] : m["end"]] == m["NE"]
    # spot-check the Adamo doc (reference corpus.result.txt:2)
    adamo_doc = next(d for d in docs if d["doc_ids"] == [5841])
    adamo = [m for m in adamo_doc["mentions"] if m["NE"] == "Adamo"]
    assert adamo and adamo[0]["label"] == "PER"
    assert "grfpersGenerique" in adamo[0]["grfs"]
    # label distribution sanity: PER dominates this corpus
    dist: dict[str, int] = {}
    for d in docs:
        for m in d["mentions"]:
            dist[m["label"]] = dist.get(m["label"], 0) + 1
    assert dist.get("PER", 0) > dist.get("ORG", 0)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture absent")
def test_reference_fixture_spark_path(spark, tmp_path):
    """The Spark wrapper (wholetext read -> pandas UDF -> explode) yields
    the same doc count and mention total as the direct parse (on a slice of
    the fixture — Arrow-marshalling 3.4k nested docs in one batch is slow
    and adds nothing over the driver-side full regression above)."""
    with open(FIXTURE, encoding="utf-8") as f:
        content = f.read()
    end = content.find("</doc>", 200_000) + len("</doc>")
    slice_path = tmp_path / "slice.result.txt"
    slice_path.write_text(content[:end] + "</root>", encoding="utf-8")

    want_docs = CX.parse_result_file(content[:end] + "</root>")
    docs = CX.scan_casen_results(spark, str(slice_path))
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("mentions")).alias("n_mentions"),
    ).collect()[0]
    assert agg["n_docs"] == len(want_docs) > 100
    assert agg["n_mentions"] == sum(len(d["mentions"]) for d in want_docs)
