"""Shared ambiguous-alias gazetteer fixture (leaf module, no intra-package
imports).

Both ``queries_kg`` and ``queries_graphkg`` need these rows at module-import
time (the oracle SQL strings embed them as VALUES literals). Keeping them in
a leaf module breaks the import cycle queries_kg -> queries (registry tail)
-> queries_graphkg -> queries_kg, which raised ImportError whenever
queries_kg was the first registry module imported.
"""

from __future__ import annotations

# (entity_id, alias, alias_norm, label, weight) — the 'spark' surface is
# deliberately ambiguous (ORG vs PER) so S6 canonicalization is non-trivial.
GAZ_ROWS = [
    ("E_spark", "spark", "spark", "ORG", 1.0),
    ("E_spark_person", "spark", "spark", "PER", 0.4),
    ("E_customer", "customer", "customer", "PER", 0.8),
    ("E_window", "window", "window", "LOC", 0.7),
    ("E_stream", "stream", "stream", "PER", 0.3),  # label mismatch vs ORG
]
