"""Parameterized BPE trainer: M merge rounds over a weighted word table.

Round-4 directive 3: generalize the 4-round unrolled ``bpe_train_merges``
query into a reusable operator. Algorithm: byte-pair encoding subword
training (Sennrich et al., ACL 2016) — repeatedly count adjacent symbol
pairs over the vocabulary (weighted by corpus word frequency), merge the
most frequent pair everywhere, emit the merge-rule sequence as the trained
artifact.

Scale shape (the 100 TB story):

- Training runs at VOCABULARY grain: the corpus is scanned exactly once to
  build the weighted word table (map-side-combined groupBy); every round
  after that is O(vocab x word_len) regardless of corpus size. A 100 TB
  corpus has a vocab of maybe 10^7-10^8 distinct words — executor-sized,
  not corpus-sized.
- Per round: one window pass (pair extraction), one map-side-combinable
  groupBy sum, a 1-row struct-min argmax, and one window pass to apply the
  merge. The argmax row is collected to the driver — ONE row per round,
  bounded by ``n_merges``, never by data — so the next round's plan embeds
  the winning pair as literals (no crossJoin, no broadcast churn) and the
  merge table accumulates driver-side exactly like a real tokenizer
  trainer's rule list.
- Lineage: each round's symbolized vocab builds ~4 window/agg operators on
  top of the last, so an M=30k-round plan would grow unboundedly. Every
  ``scratch_every`` rounds the state is written to parquet under the
  cluster-visible ``session_scratch_dir`` and re-read — same
  fault-tolerant barrier as ``connected_components``' rounds (shared
  storage, recomputable partition-by-partition; never ``localCheckpoint``,
  never driver-local tempfiles). Between barriers the state is persisted
  and the previous round's persist is dropped as soon as the new round is
  materialized by its argmax collect.

Greedy left-to-right non-overlap semantics ("aa" in "aaa" consumes
positions 1-2, not 2-3) use the island-parity trick over ONE (w, pos)
window partitioning: a matching pair-start is kept iff the run of
consecutive matches before it has even length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERGES_SCHEMA = "merge_round int, a string, b string, cnt bigint"


def _apply_merge(rows: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) greedily left-to-right, non-overlapping.

    All window functions share the ONE (w, pos) partitioning (a single
    exchange per round): mark matching pair starts, recover each start's
    island parity from the running max of the last non-matching position,
    drop the consumed right symbol, renumber.
    """
    wq = Window.partitionBy("w").orderBy("pos")
    wrun = wq.rowsBetween(Window.unboundedPreceding, -1)
    m = (
        rows.withColumn("nxt", F.lead("sym").over(wq))
        .withColumn(
            "mt",
            ((F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))).cast("int"),
        )
        .withColumn(
            "sel",
            F.when(
                (F.col("mt") == 1)
                & (
                    (
                        F.col("pos")
                        - 1
                        - F.coalesce(
                            F.max(F.when(F.col("mt") == 0, F.col("pos"))).over(wrun),
                            F.lit(0),
                        )
                    )
                    % 2
                    == 0
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("psel", F.lag("sel").over(wq))
    )
    kept = m.filter(F.coalesce(F.col("psel"), F.lit(0)) == 0).withColumn(
        "osym",
        F.when(F.col("sel") == 1, F.concat("sym", "nxt")).otherwise(F.col("sym")),
    )
    return kept.select(
        "w",
        "wc",
        F.row_number().over(wq).cast("bigint").alias("pos"),
        F.col("osym").alias("sym"),
    )


def symbolize(vocab: DataFrame) -> DataFrame:
    """(w, wc) weighted word table -> (w, wc, pos, sym) single-character
    symbol rows, the round-0 training state."""
    return (
        vocab.select(
            "w",
            "wc",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("pos"),
        )
        .withColumn("sym", F.col("w").substr(F.col("pos"), F.lit(1)))
        .withColumn("pos", F.col("pos").cast("bigint"))
    )


def bpe_train(
    vocab: DataFrame, n_merges: int, scratch_every: int = 8
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules over a weighted word table.

    ``vocab``: (w string, wc long) — distinct words with corpus counts.
    Returns the merge-rule artifact ``(merge_round, a, b, cnt)``, ordered
    by round; ties on count break to the lexicographically smallest
    (a, b), matching the SQL oracle's ``ORDER BY cnt DESC, a, b LIMIT 1``.
    Stops early (fewer than ``n_merges`` rows) when no adjacent pair
    remains in the vocabulary.
    """
    from .scratch import session_scratch_dir

    spark = vocab.sparkSession
    rows = symbolize(vocab)
    wq = Window.partitionBy("w").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    scratch: str | None = None
    prev_persisted: DataFrame | None = None
    # try/finally: an exception mid-round (failed barrier write, killed
    # collect) must not leave the round's MEMORY_AND_DISK persist pinned
    # for the rest of the session (round-5 ADVICE) — both the previous and
    # the current round's persist are released on the way out
    try:
        for r in range(n_merges):
            if r > 0 and r % scratch_every == 0:
                # fault-tolerant lineage barrier on shared storage
                # (alternating subdirs: round r only ever reads the
                # previous barrier)
                if scratch is None:
                    scratch = session_scratch_dir(spark, prefix="bpe_rounds")
                out_dir = f"{scratch}/r{(r // scratch_every) % 2}"
                rows.write.mode("overwrite").parquet(out_dir)
                if prev_persisted is not None:
                    prev_persisted.unpersist()
                    prev_persisted = None
                rows = spark.read.parquet(out_dir)
            else:
                rows = rows.persist()
            pairs = (
                rows.withColumn("nxt", F.lead("sym").over(wq))
                .filter(F.col("nxt").isNotNull())
                .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
                .agg(F.sum("wc").alias("cnt"))
            )
            # 1-row argmax to the driver: bounded by n_merges rounds,
            # never by data (the aggregate is a map-side-partial
            # struct-min)
            win = pairs.agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("a"), F.col("b"))
                ).alias("m")
            ).collect()[0]["m"]
            if prev_persisted is not None:
                prev_persisted.unpersist()
            prev_persisted = rows if rows.is_cached else None
            if win is None or win["a"] is None:
                break  # vocabulary exhausted — every word is one symbol
            merges.append((r, win["a"], win["b"], int(-win["nc"])))
            rows = _apply_merge(rows, win["a"], win["b"])
    finally:
        if prev_persisted is not None:
            prev_persisted.unpersist()
        if rows.is_cached:
            rows.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_segment(words: DataFrame, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Apply a trained merge sequence to a (w, wc) word table; returns the
    final (w, wc, pos, sym) segmentation. Rule application replays the
    training order — the standard BPE tokenizer semantics."""
    rows = symbolize(words)
    for _, a, b, _cnt in merges:
        rows = _apply_merge(rows, a, b)
    return rows
