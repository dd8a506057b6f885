"""Time-series gap filling: dense date scaffold + forward fill (LOCF).

Spark has no native gap-fill: a per-entity daily series with missing days
stays missing through any aggregation. The operator pair here is the
standard composition:

- ``date_scaffold`` — the dense (entity x day) frame: global [min, max]
  date bounds (one tiny aggregate), ``sequence()`` + ``explode`` per
  entity. Row count = |entities| x days — the caller bounds the date
  range at scale (a year of days x 10^9 entities is intentional, not
  accidental).
- ``forward_fill`` — last-observation-carried-forward per entity:
  ``last(value, ignorenulls=True)`` over the running window. One shuffle
  on the entity key; within-key skew is irrelevant at daily grain.

Composed in ``gap_fill``: scaffold LEFT JOIN observations, then carry
forward, with an ``observed`` flag so downstream can distinguish real
from filled values. Verified against DuckDB's ``last_value(x IGNORE
NULLS)`` (catalog ``daily_user_value_gapfill``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def date_scaffold(
    df: DataFrame,
    entity_cols: Sequence[str],
    date_col: Column,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Dense (entity, day) frame covering [start, end] (defaults: the
    data's global min/max of ``date_col``) for every distinct entity."""
    entity_cols = list(entity_cols)
    if start is None or end is None:
        lo, hi = df.select(F.min(date_col), F.max(date_col)).first()
        start = start or str(lo)
        end = end or str(hi)
    entities = df.select(*entity_cols).distinct()
    days = F.explode(
        F.sequence(
            F.lit(start).cast("date"), F.lit(end).cast("date"),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("d")
    return entities.select("*", days)


def forward_fill(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    suffix: str = "_ff",
) -> DataFrame:
    """Per-entity LOCF: each ``value_col`` carried forward over NULL rows
    in ``order_col`` order (appended as ``{col}{suffix}``). Leading NULLs
    (no prior observation) stay NULL — no fabricated values."""
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def gap_fill(
    observations: DataFrame,
    entity_cols: Sequence[str],
    date_col: str,
    value_cols: Sequence[str],
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Dense daily series per entity with values carried forward.

    ``observations`` must hold at most one row per (entity, day) — use
    ``dedup_keep_last`` upstream to pick the day's final observation.
    Output: entity cols, ``d`` (day), ``{value}_ff`` columns, and
    ``observed`` (False on scaffold-only rows)."""
    entity_cols = list(entity_cols)
    scaffold = date_scaffold(observations, entity_cols, F.col(date_col), start, end)
    obs = observations.select(
        *entity_cols, F.col(date_col).alias("d"), *value_cols
    )
    joined = scaffold.join(obs, [*entity_cols, "d"], "left").withColumn(
        "observed", F.col(value_cols[0]).isNotNull()
    )
    filled = forward_fill(joined, entity_cols, "d", value_cols)
    return filled.drop(*value_cols)
