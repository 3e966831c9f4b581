"""Deterministic test shim for the spaCy API surface ner_spark uses.

NOT spaCy. This package exists so the REAL ``nlp.pipe`` branch of
``ner_spark.extractors.model_stub`` (per-worker lazy model load, Arrow
batch accounting, offset contract — reference: src/utils/
spacy_config.py:136-167) can execute in a container that has no spaCy
wheels or models (round-5 directive 6). It is only importable when a test
explicitly prepends ``tests/_model_shims`` to PYTHONPATH in a SEPARATE
process — never on the main test session's path, where flipping the
driver probe would reroute the flagship pipeline off its oracle-pinned
stub.

The "model" is a rule-based French NER over a tokenizer: maximal runs of
capitalized words (with particles du/de/la/... allowed inside a run) are
entities; a small lexicon picks LOC/ORG, everything else is PER. Fully
deterministic, so tests can assert exact mentions.

If ``SHIM_LOAD_LOG`` is set, each ``load()`` appends "<pid>" — letting the
host assert the lazy-singleton contract: every worker process loads the
model exactly once.
"""

from __future__ import annotations

import os
import re

__version__ = "0.0-test-shim"

_LOC = {"Paris", "Lyon", "Marseille", "France", "Varsovie"}
_ORG = {"Sorbonne", "La Sorbonne", "CNRS"}
# capitalized word, optionally chained through more capitalized words
_NAME = re.compile(
    r"\b[A-ZÀ-Ý][\wà-ÿ'-]*(?:\s+[A-ZÀ-Ý][\wà-ÿ'-]*)*", re.UNICODE
)


class _Ent:
    __slots__ = ("text", "label_", "start_char", "end_char")

    def __init__(self, text: str, label: str, start: int, end: int):
        self.text = text
        self.label_ = label
        self.start_char = start
        self.end_char = end


class _Doc:
    __slots__ = ("ents",)

    def __init__(self, ents: list[_Ent]):
        self.ents = ents


def _scan(text: str) -> list[_Ent]:
    out = []
    for m in _NAME.finditer(text):
        surface, s = m.group(0), m.start()
        if surface in _LOC:
            label = "LOC"
        elif surface in _ORG:
            label = "ORG"
        else:
            label = "PER"
        out.append(_Ent(surface, label, s, s + len(surface)))
    return out


class _MiniFrNLP:
    def __init__(self, model: str, disable=()):
        self.model = model
        self.disable = tuple(disable)

    def pipe(self, texts, batch_size: int = 64):
        for t in texts:
            yield _Doc(_scan(t or ""))


def load(model: str, disable=(), **_kw) -> _MiniFrNLP:
    log = os.environ.get("SHIM_LOAD_LOG")
    if log:
        with open(log, "a", encoding="utf-8") as f:
            f.write(f"spacy {os.getpid()}\n")
    return _MiniFrNLP(model, disable)
