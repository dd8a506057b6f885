"""Reshaping operators (SURVEY §2.7 U1-U2, §2.9 M8).

``pivot_agg`` requires an explicit value list: without it Spark runs an extra
distinct job to discover the columns, and at 100 TB an unbounded pivot width
is a driver OOM — the explicit list is both faster and safer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def pivot_agg(
    df: DataFrame,
    index: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    fill: float | int | None = 0,
) -> DataFrame:
    """Long->wide pivot (pandas ``pivot(...).fillna(0)``,
    /root/reference/scripts/05_ml_model.py:444-448)."""
    out = df.groupBy(*index).pivot(pivot_col, list(values)).agg(agg)
    if fill is not None:
        out = out.na.fill(fill)
    return out


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """Vertical union by column NAME (pandas ``pd.concat``,
    /root/reference/scripts/05_ml_model.py:414; multi-file CSV implicit union,
    /root/reference/scripts/02_bronze.py:95-97)."""
    it = iter(frames)
    out = next(it)
    for df in it:
        out = out.unionByName(df)
    return out
