"""Cascading time-resolution rollups (hypertable-style continuous
aggregates).

At 100 TB you never compute daily stats from raw events: you maintain an
hourly pre-aggregate and compose coarser resolutions FROM the finer ones.
That only works for aggregates that compose (sum, count, min, max —
re-aggregable from partials); averages decompose into sum+count and are
finalized at read time; medians/distincts do NOT compose exactly and need
sketches (t-digest / HLL) — this module enforces the distinction by only
offering the composable set.

``cascade`` produces each resolution from the previous one; correctness
contract (tested + oracle-checked): any level equals the same aggregation
computed directly from raw.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported truncation levels, finest-to-coarsest
LEVELS = ("minute", "hour", "day", "week", "month")


def rollup_level(
    events: DataFrame,
    level: str,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """One resolution directly from raw: (bucket, keys) -> composable
    partials (n, sum in exact decimal, min, max)."""
    return (
        events.groupBy(
            F.date_trunc(level, F.col(ts_col)).alias("bucket"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(30,2)")).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def compose_up(finer: DataFrame, level: str, keys: Sequence[str]) -> DataFrame:
    """Coarser resolution FROM a finer pre-aggregate — partials re-aggregate
    without touching raw data (the incremental-maintenance property)."""
    return (
        finer.groupBy(
            F.date_trunc(level, F.col("bucket")).alias("bucket"), *keys
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def cascade(
    events: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    levels: Sequence[str] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Build the rollup cascade: levels[0] from raw, each subsequent level
    from the previous one. Returns {level: frame}."""
    out: dict[str, DataFrame] = {}
    current = rollup_level(events, levels[0], ts_col, keys, value_col)
    out[levels[0]] = current
    for level in levels[1:]:
        current = compose_up(current, level, keys)
        out[level] = current
    return out


def finalize(rollup: DataFrame) -> DataFrame:
    """Read-time finalization: emit avg from the (sum, n) partials, sum as
    double."""
    return rollup.select(
        "bucket",
        *[c for c in rollup.columns if c not in ("bucket", "n", "sum_v", "min_v", "max_v")],
        F.col("n"),
        F.col("sum_v").cast("double").alias("total"),
        (F.col("sum_v").cast("double") / F.col("n")).cast("double").alias("avg_v"),
        F.col("min_v"),
        F.col("max_v"),
    )
