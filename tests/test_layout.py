"""Z-order layout: interleave correctness + measured min/max locality."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (255, 1), (1023, 511)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a, b)


def _avg_span(files: list[str], col: str) -> float:
    """Mean (max-min) of a column across files' parquet stats — the size
    of the bounding box file-skipping prunes against."""
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(hi - lo)
    return sum(spans) / len(spans)


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Against a 64x64 uniform grid: sorting by x alone leaves every file
    spanning the FULL y range; the z-order layout must tighten the y span
    per file substantially while keeping x spans bounded."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    by_x = str(tmp_path / "by_x")
    (
        grid.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(by_x)
    )
    by_z = str(tmp_path / "by_z")
    write_zordered(grid, by_z, F.col("x"), F.col("y"), n_files=8, bits=6)

    x_files = glob.glob(f"{by_x}/*.parquet")
    z_files = glob.glob(f"{by_z}/*.parquet")
    assert len(z_files) >= 4
    # single-column sort: y unconstrained (span ~63 per file)
    assert _avg_span(x_files, "y") >= 60
    # z-order: each file is a curve-segment rectangle (~32x16 at this
    # granularity) — BOTH spans well under the full 63 range
    assert _avg_span(z_files, "y") <= 40
    assert _avg_span(z_files, "x") <= 40
    # and the data survives the round trip
    assert spark.read.parquet(by_z).count() == 64 * 64
