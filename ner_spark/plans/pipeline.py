"""End-to-end stage composition (SURVEY.md §7 target architecture).

Pure DataFrame composition — no I/O here. Checkpointed, resumable execution
of the same stages lives in ner_spark.plans.runner.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractors.casen import rule_mentions
from ..extractors.combined import combined_mentions
from ..extractors.model_stub import model_mentions
from ..operators import consensus as C
from ..operators import relations as R
from ..operators.clean import clean
from ..operators.corrections import apply_corrections


@dataclass
class KGPipeline:
    """Configured stage chain; each method returns a lazy DataFrame."""

    gazetteer: DataFrame
    patterns: DataFrame
    trusted_combos: list[list[str]]
    corrections: DataFrame | None = None
    labels_priority: tuple[str, ...] = ("PER",)
    num_partitions: int | None = None
    extra_sources: dict = field(default_factory=dict)
    _cached: list = field(default_factory=list, repr=False)

    def clean_docs(self, docs: DataFrame) -> DataFrame:
        return clean(docs)

    def mentions_by_source(self, clean_docs: DataFrame) -> dict[str, DataFrame]:
        """Per-source mention tables (three separate Arrow passes) — kept for
        operator-level tests; the pipeline hot path uses the fused one-pass
        extractor below."""
        return {
            "casEN": rule_mentions(clean_docs, self.gazetteer, self.patterns),
            "spaCy": model_mentions(clean_docs, self.gazetteer, method="spaCy"),
            "stanza": model_mentions(clean_docs, self.gazetteer, method="stanza"),
            **self.extra_sources,
        }

    def ranked_mentions(self, clean_docs: DataFrame) -> DataFrame:
        return combined_mentions(clean_docs, self.gazetteer, self.patterns)

    def consensus(self, clean_docs: DataFrame) -> DataFrame:
        if self.extra_sources:
            # extend the fold order with the extra sources (registration
            # order = rank order after the built-ins): fuse() iterates its
            # source_order, so extras absent from it would silently never
            # enter the union
            by_source = self.mentions_by_source(clean_docs)
            order = C.SOURCE_ORDER + tuple(
                k for k in self.extra_sources if k not in C.SOURCE_ORDER
            )
            fused = C.fuse(
                by_source, source_order=order, num_partitions=self.num_partitions
            )
        else:
            fused = C.fuse_ranked(
                self.ranked_mentions(clean_docs), num_partitions=self.num_partitions
            )
        voted = C.priority_vote(fused, self.labels_priority)
        promoted = C.promote_trusted(voted, self.trusted_combos)
        with_ids = promoted.join(
            clean_docs.select("doc_uid", "files_id"), "doc_uid", "left"
        )
        if self.corrections is not None:
            with_ids = apply_corrections(with_ids, self.corrections)
        return with_ids

    def triples(self, clean_docs: DataFrame, mentions: DataFrame) -> DataFrame:
        return R.extract_triples(mentions, clean_docs)

    def run(self, docs: DataFrame) -> dict[str, DataFrame]:
        # clean + mentions are each consumed by 2+ branches (instance and
        # relation triples); caching mirrors the checkpointed execution in
        # plans.runner, where stage outputs are materialized tables
        cd = self.clean_docs(docs).cache()
        mentions = self.consensus(cd).cache()
        # populate both caches eagerly before handing out the triples plan:
        # triples fans out into three consumers of `mentions` (instance +
        # both self-join branches), and when one action forces them against
        # a cold cache the scheduler runs the whole extraction subtree once
        # per branch concurrently — none of them hits the still-materializing
        # cache (measured 3x the chain cost at 200k docs). One count() here
        # is one pass over the cached plan (cd materializes beneath it) and
        # turns every downstream consumer into a cache read.
        mentions.count()
        self._cached.extend([cd, mentions])
        return {
            "clean": cd,
            "mentions": mentions,
            "triples": self.triples(cd, mentions),
        }

    def unpersist(self) -> None:
        """Release the stage caches ``run`` created. Call after the outputs
        are materialized — in a long-running application the caches would
        otherwise pin executor storage for the life of the session."""
        for df in self._cached:
            df.unpersist()
        self._cached.clear()


def ordered_mentions(mentions: DataFrame) -> DataFrame:
    """Presentation order (W2) — applied at output time only; keeping the
    pipeline itself order-free avoids a global sort on the hot path."""
    return C.order_mentions(mentions)


def mention_key_cols() -> list[str]:
    return [*C.KEYS, "method"]


def summarize(df: DataFrame, cols: list[str]) -> DataFrame:
    """D6 self-diagnostics: frequency reports per column value."""
    outs = [
        df.groupBy(F.lit(c).alias("column"), F.col(c).cast("string").alias("value"))
        .count()
        for c in cols
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
