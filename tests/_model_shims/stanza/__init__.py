"""Deterministic test shim for the Stanza API surface ner_spark uses.

NOT Stanza. Exists so the REAL ``bulk_process`` branch of
``ner_spark.extractors.model_stub`` (reference: src/utils/
stanza_config.py:101-166) executes in CI without Stanza wheels/models
(round-5 directive 6); see the sibling ``spacy`` shim docstring for the
isolation rules. Entity rule: same capitalized-run tokenizer as the spacy
shim but SHIFTED lexicon behavior (ORG set empty — everything non-LOC is
PER) so the two "models" genuinely disagree, like real engines do.

``SHIM_LOAD_LOG`` (if set) records one "stanza <pid>" line per Pipeline
construction, for the lazy-singleton assertion.
"""

from __future__ import annotations

import os
import re

__version__ = "0.0-test-shim"

_LOC = {"Paris", "Lyon", "Marseille", "France", "Varsovie"}
_NAME = re.compile(
    r"\b[A-ZÀ-Ý][\wà-ÿ'-]*(?:\s+[A-ZÀ-Ý][\wà-ÿ'-]*)*", re.UNICODE
)


class _Ent:
    __slots__ = ("text", "type", "start_char", "end_char")

    def __init__(self, text: str, etype: str, start: int, end: int):
        self.text = text
        self.type = etype
        self.start_char = start
        self.end_char = end


class Document:
    """stanza.Document([], text=...) -> processed in place by bulk_process."""

    def __init__(self, sentences, text: str | None = None):
        self.sentences = sentences
        self.text = text
        self.ents: list[_Ent] = []


class Pipeline:
    def __init__(
        self,
        lang: str = "fr",
        processors: str = "",
        download_method=None,
        verbose: bool = False,
        **_kw,
    ):
        self.lang = lang
        self.processors = processors
        log = os.environ.get("SHIM_LOAD_LOG")
        if log:
            with open(log, "a", encoding="utf-8") as f:
                f.write(f"stanza {os.getpid()}\n")

    def bulk_process(self, docs: list[Document]) -> list[Document]:
        for d in docs:
            t = d.text or ""
            ents = []
            for m in _NAME.finditer(t):
                surface, s = m.group(0), m.start()
                etype = "LOC" if surface in _LOC else "PER"
                ents.append(_Ent(surface, etype, s, s + len(surface)))
            d.ents = ents
        return docs
