"""Tolerant CSV scan with corrupt-record quarantine.

Reference analogue: the Excel/CSV sinks and scans of SURVEY.md §2 A1/A6 —
at ingestion scale a malformed row must not fail a 100 TB job, and it must
not silently vanish either. PERMISSIVE mode parses what it can and lands
the raw text of every unparseable line in ``_corrupt_record``; the split
below turns that into (clean rows, quarantine rows with the full original
line) so the quarantine can be reprocessed or audited.

The schema must be explicit: schema inference triggers an extra full scan
of the input (a second pass over 100 TB) and infers from a sample, so a
late malformed row would fail the job instead of quarantining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_tolerant(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read CSV at ``path`` -> (clean, quarantine).

    ``schema`` is the DDL of the EXPECTED columns; a ``_corrupt_record``
    string column is appended automatically. Clean rows have every column
    parsed; quarantine rows carry the raw line for audit/replay.

    NB: Spark populates ``_corrupt_record`` lazily — a filter directly on
    the parsed stream raises AnalysisException ("referencing internal
    corrupt record column"), so the split goes through one narrow
    projection boundary (``select`` of all columns) first, as the Spark
    docs prescribe. Both halves stay partition-parallel scans.

    LIFETIME: both returned frames lean on a session-scratch persist.
    Consume them (collect / write) BEFORE the host's next
    ``release_scratch()`` boundary — after release, a re-used frame
    recomputes the scan uncached, and filtering on the corrupt-record
    column without a cache can silently return wrong rows (SPARK-21610).
    For cross-boundary use, write the frames out first.
    """
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    from ..operators.scratch import scratch_persist

    # Spark requires materializing before filtering on the corrupt column
    # (SPARK-21610). Registered as session scratch — a bare .cache() here
    # would pin a full copy of every scanned CSV for the session lifetime
    # with no handle for the caller to release (the host's
    # release_scratch() at its query boundary drops it)
    df = scratch_persist(
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
