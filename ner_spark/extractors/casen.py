"""Rule-based extractor ("casEN" analogue): gazetteer + regex pattern bank.

The reference's CasEN stage shells out to an external Unitex notebook and
parses its XML back (reference: src/utils/casen_config.py:178-182, 226-314).
Per the north_star, the external process is replaced by in-engine matchers:
a broadcast gazetteer (alias dictionary) and a regex rule bank, run together
in ONE pandas-UDF pass per document batch. Rule hits landing on the same
(surface, label, span) merge their rule ids into a sorted ``grfs`` array —
the Spark form of the reference's ``grf_1..grf_n`` wide columns
(reference: casen_config.py:295-304).

Scale note: the alias automaton is compiled once per Python worker from a
broadcast list. For a multi-million-alias gazetteer this compiles to an
Aho-Corasick automaton instead of a regex alternation; the plumbing
(broadcast -> per-worker lazy compile -> Arrow batch scan) is identical.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import MENTION_ARR, explode_mentions

# per-worker compiled matcher cache, keyed by id of the broadcast payload
_COMPILED: dict[int, tuple] = {}


def _compile(gaz_rows: list[tuple], pattern_rows: list[tuple]):
    """gaz_rows: (alias, label); pattern_rows: (pattern_id, regex, label)."""
    # gaz_rows arrive weight-descending: for an ambiguous alias the highest-
    # weight label wins, deterministically
    by_surface: dict[str, str] = {}
    for alias, label in gaz_rows:
        by_surface.setdefault(alias, label)
    # longest-first so the alternation prefers "Marie Curie" over "Curie".
    # An EMPTY gazetteer must compile to a never-matching pattern: the
    # naive r"\b(?:)\b" matches zero-width at every word boundary and the
    # by_surface lookup of '' then raises inside the executor UDF
    surfaces = sorted(by_surface, key=lambda a: (-len(a), a))
    if surfaces:
        gaz_re = re.compile(
            r"\b(?:" + "|".join(re.escape(a) for a in surfaces) + r")\b"
        )
    else:
        gaz_re = re.compile(r"(?!x)x")  # matches nothing
    pats = [(pid, re.compile(rx), label) for pid, rx, label in pattern_rows]
    return gaz_re, by_surface, pats


def _scan_doc(text: str, gaz_re, by_surface, pats, gaz_grf: dict[str, str]):
    """One document -> list of mention dicts with merged sorted grfs."""
    found: dict[tuple, set] = {}
    for m in gaz_re.finditer(text):
        ne = m.group(0)
        label = by_surface[ne]
        found.setdefault((ne, label, m.start(), m.end()), set()).add(gaz_grf[label])
    for pid, rx, label in pats:
        for m in rx.finditer(text):
            grp = 1 if rx.groups else 0
            ne = m.group(grp)
            found.setdefault((ne, label, m.start(grp), m.end(grp)), set()).add(pid)
    return [
        {"NE": ne, "label": label, "start": s, "end": e, "grfs": sorted(grfs)}
        for (ne, label, s, e), grfs in found.items()
    ]


def rule_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    patterns: DataFrame,
    gaz_grf: dict[str, str] | None = None,
    method: str = "casEN",
) -> DataFrame:
    """(doc_uid, text) -> MENTIONS rows for the rule system.

    ``gazetteer``/``patterns`` are small dimension tables: collected once on
    the driver and broadcast to Python workers via the UDF closure (the same
    broadcast-small-dim pattern as SURVEY.md §2 A2).
    """
    if gaz_grf is None:
        from ..synth import GAZ_GRF as gaz_grf  # default rule-id map

    gaz_rows = [
        (r["alias"], r["label"])
        for r in gazetteer.select("alias", "label", "weight")
        .orderBy(F.desc("weight"), "alias", "label")
        .collect()
    ]
    pattern_rows = [
        (r["pattern_id"], r["regex"], r["label"])
        for r in patterns.select("pattern_id", "regex", "label")
        .orderBy("pattern_id")
        .collect()
    ]
    payload = (tuple(gaz_rows), tuple(pattern_rows), tuple(sorted(gaz_grf.items())))

    @F.pandas_udf(MENTION_ARR)
    def extract(texts: pd.Series) -> pd.Series:
        key = hash(payload)
        if key not in _COMPILED:
            _COMPILED[key] = _compile(list(payload[0]), list(payload[1]))
        gaz_re, by_surface, pats = _COMPILED[key]
        grf_map = dict(payload[2])
        return texts.map(
            lambda t: _scan_doc(t, gaz_re, by_surface, pats, grf_map) if t else []
        )

    return explode_mentions(docs, extract(F.col("text")), method)
