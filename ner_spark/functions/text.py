"""String/scalar column functions (SURVEY.md §2 G*) — all JVM-side, no UDFs.

Every one of these stays inside whole-stage codegen; the reference implements
the same logic with per-row Python (citations inline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(col: Column) -> Column:
    """Collapse runs of whitespace and trim.

    The single normalization stage shared by every matcher so that mention
    offsets agree across systems — the reference's taggers disagree on
    whitespace space (CasEN normalizes, spaCy/stanza don't; SURVEY.md §2 G9),
    which we fix by normalizing once, up front.
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_tags(col: Column) -> Column:
    """Remove ``<s>``/``</s>`` sentence tags (reference: casen_config.py:184-189)."""
    return F.regexp_replace(col, r"</?s\b[^>]*>", "")


def normalize_surface(col: Column) -> Column:
    """Blocking key for entity linking: lowercase + whitespace-collapse."""
    return F.lower(normalize_ws(col))


def method_weight(method: Column) -> Column:
    """#agreeing systems = underscore count + 1 (reference: ner_config.py:133)."""
    return F.size(F.split(method, "_"))


def context_window(text: Column, start: Column, end: Column, window: int = 30) -> Column:
    """±window chars around a mention (reference: casen_config.py:276-279).

    ``start``/``end`` are 0-based char offsets; substring() is 1-based.
    """
    lo = F.greatest(F.lit(1), start - F.lit(window) + F.lit(1))
    ln = end + F.lit(window) - (lo - F.lit(1))
    return F.substring(text, lo.cast("int"), ln.cast("int"))


def label_from_map(col: Column, mapping: dict[str, str], default: str = "Undefined") -> Column:
    """Chained-when lookup (reference label maps, casen_config.py:210-222)."""
    expr = F.lit(default)
    for k, v in reversed(list(mapping.items())):
        expr = F.when(col == F.lit(k), F.lit(v)).otherwise(expr)
    return expr
