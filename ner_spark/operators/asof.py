"""As-of and range (interval) joins — time-series operators Spark lacks.

Both are built shuffle-minimal, the way they survive 100 TB:

- ``asof_join``: the classic distributed as-of technique — union the two
  sides tagged, ONE hash shuffle on the join keys, per-key time sort, and a
  running ``last(ignorenulls)`` forward-fill of the right side's payload.
  No join blow-up, no per-row probe; cost is one Exchange + one in-partition
  sort regardless of how many right rows precede each left row. (A naive
  ``l JOIN r ON key AND r.ts <= l.ts`` + row_number explodes as
  O(|l_key|x|r_key|) per key — that shape is reserved for the DuckDB oracle
  where it defines the semantics.)
- ``range_join_binned``: interval-overlap join via time-bucket binning.
  Intervals explode over the fixed-width buckets they cover (bounded-length
  intervals => bounded fan-out, here <= 2), probes map to exactly ONE
  bucket, and the join becomes a plain equi-join on (key, bucket) with an
  exact range re-check. Each (interval, probe) pair meets in the probe's
  single bucket, so no post-join dedup is needed.

Reference analogue: the reference engine has no time-series joins; these
extend the events coverage the way a training-data pipeline needs
(sessionize -> attribute -> window aggregate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: payload struct carried through the forward-fill (atomic: all right-side
#: columns come from the SAME matched row, never mixed across rows)
_VALS = "__asof_vals"
_SIDE = "__asof_side"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    values: Sequence[str] = (),
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for every left row, attach ``values`` from the right
    row with the greatest ``right_ts <= left_ts`` within the same ``keys``.

    Inclusive match (a right row at exactly ``left_ts`` matches). Among right
    rows tied on ``right_ts``, the one with the greatest ``tie_col`` wins
    (pass a unique id for determinism). Left rows with no prior right row
    keep NULL payloads (left-join semantics).

    One shuffle (hash by ``keys``), one per-partition sort — the scale-safe
    formulation of ``ASOF JOIN``.
    """
    keys = list(keys)
    out_cols = list(left.columns)
    # keep the tie column's OWN type: casting to long would silently NULL
    # non-numeric ids (e.g. string doc ids) and destroy the documented
    # deterministic tie-break
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)

    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    # equal-timestamp right row is visible to the left row — inclusive match
    r = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        tie.alias(_TIE),
        F.struct(*[F.col(v) for v in values]).alias(_VALS),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        # left rows never compete on the tie key; NULL of the right's type
        # keeps the union schema aligned for any tie column type
        F.lit(None).cast(r.schema[_TIE].dataType).alias(_TIE),
        F.lit(None).cast(r.schema[_VALS].dataType).alias(_VALS),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", _SIDE, _TIE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn(_VALS, F.last(_VALS, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )
    return filled.select(
        *out_cols,
        *[F.col(f"{_VALS}.{v}").alias(f"{v}{suffix}") for v in values],
    )


def range_join_binned(
    intervals: DataFrame,
    probe: DataFrame,
    keys: Sequence[str],
    start: str,
    end: str,
    probe_ts: str = "ts",
    bucket_micros: int = 600_000_000,
) -> DataFrame:
    """Join ``probe`` rows into every interval ``[start, end)`` that covers
    them (same ``keys``), without a range-predicate nested-loop join.

    ``bucket_micros`` should be >= the maximum interval length so every
    interval covers at most 2 buckets (fan-out bound). Returns the joined
    rows (interval columns + probe columns); aggregate downstream.
    """
    keys = list(keys)
    b = F.lit(bucket_micros)

    def us(c: str):
        # NTZ-tolerant: the cast shifts all timestamps by the same session-tz
        # offset, so bucket co-location is unaffected
        return F.unix_micros(F.col(c).cast("timestamp"))

    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(us(start) / b), F.floor((us(end) - 1) / b))),
    )
    pr = probe.withColumn("__bucket", F.floor(us(probe_ts) / b))
    return (
        pr.join(iv, [*keys, "__bucket"])
        .filter((F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) < F.col(end)))
        .drop("__bucket")
    )
