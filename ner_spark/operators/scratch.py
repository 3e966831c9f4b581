"""Session-scratch persist registry.

Operators persist intermediates (posting lists, candidate sets, fingerprint
tables) as barriers against recomputation; the operator cannot know when its
consumer is done, so it cannot unpersist. Left alone, a long-lived session
running many queries (the 184-query bench, a notebook, a query service)
accumulates every scratch cache until executor storage churns — measured
~2x wall on dedup_ngram_jaccard when it runs late in the registry sweep vs
isolated.

``scratch_persist`` is a drop-in for ``df.persist(level)`` that also records
the DataFrame; the HOST (bench loop, driver, service) calls
``release_scratch()`` at its natural "query is finished" boundary. Stage
outputs meant to outlive a query (the flagship memo in
:mod:`ner_spark.flagship`, pipeline caches in :mod:`ner_spark.plans.pipeline`)
deliberately do NOT register here.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def scratch_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist(level) + register for the next release_scratch()."""
    out = df.persist(level)
    _SCRATCH.append(out)
    return out


def release_scratch() -> int:
    """Unpersist every registered scratch cache; returns how many."""
    n = len(_SCRATCH)
    for df in _SCRATCH:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _SCRATCH.clear()
    return n
