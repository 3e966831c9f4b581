"""Z-order clustering: both dimensions' per-file ranges must be compact.

The point of zorder(a, b) over sort/range-cluster on ``a`` alone is that
footer min/max stats skip files for predicates on EITHER key. This pins
it quantitatively: on a uniform (a, b) grid, Z-order files cover small
ranges of BOTH keys, while 1-D range clustering leaves the second key's
per-file range at essentially the full domain.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ner_spark.sources.catalog import (
    write_range_clustered,
    write_zorder_clustered,
    z_value,
)


def _grid(spark, n=20000):
    return spark.range(n).select(
        ((F.col("id") * 131) % 256).alias("a"),
        ((F.col("id") * 89) % 256).alias("b"),
    )


def _widths(df, file_col):
    rows = (
        df.groupBy(file_col)
        .agg(
            (F.max("a") - F.min("a")).alias("wa"),
            (F.max("b") - F.min("b")).alias("wb"),
        )
        .collect()
    )
    wa = sum(r["wa"] for r in rows) / len(rows)
    wb = sum(r["wb"] for r in rows) / len(rows)
    return wa, wb, len(rows)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    write_zorder_clustered(df, zpath, "a", "b", bits=8, n_files=16)
    back = spark.read.parquet(zpath)
    wa, wb, nf = _widths(back, "_zfile")
    assert nf == 16
    # a 16-segment Morton curve over a 256x256 grid covers ~64x64 regions
    assert wa <= 100 and wb <= 100, (wa, wb)
    # exactly one data file per curve segment (no small-file storm)
    for d in glob.glob(f"{zpath}/_zfile=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1

    # the 1-D comparator: range clustering on `a` leaves `b` unclustered
    rpath = str(tmp_path / "r")
    write_range_clustered(df.withColumn("f", (F.col("a") / 16).cast("long")), rpath, "a", 16)
    rback = spark.read.parquet(rpath).withColumn(
        "f", (F.col("a") / 16).cast("long")
    )
    rwa, rwb, _ = _widths(rback, "f")
    assert rwa <= 32  # a is tightly clustered...
    assert rwb >= 200  # ...but b spans nearly the whole domain
    assert wb < rwb / 2  # Z-order at least halves the second key's spread


def test_z_value_is_morton_interleave(spark):
    got = (
        spark.range(1)
        .select(
            z_value(F.lit(0b1010), F.lit(0b0110), bits=4).alias("z")
        )
        .collect()[0]["z"]
    )
    # a=1010 -> bits at even positions, b=0110 -> odd: z = 0b01101100
    assert got == 0b01101100
