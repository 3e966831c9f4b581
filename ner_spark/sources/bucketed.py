"""Bucketed parquet tables: co-located joins with zero shuffle.

At 100 TB the fact-fact joins (orders x lineitem, mentions x corrections
history, posting lists) dominate shuffle volume. Pre-bucketing both sides
on the join key at write time moves that shuffle offline: every subsequent
join on the bucket key is exchange-free (each task zips bucket i with
bucket i), and ``sortBy`` additionally removes the sort under a
sort-merge join. This is the parquet-table analogue of the Iceberg
``bucket(N, key)`` partition transform the north-star materialize stage
targets (sources/catalog.py documents the Iceberg swap).

Spark requires bucketed writes to go through the session catalog
(``saveAsTable``); with an explicit ``path`` the table is external, so the
data lives where the caller puts it and only metadata sits in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) external parquet table."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
