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


def unpivot_melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "measure",
    value_name: str = "val",
) -> DataFrame:
    """Wide->long melt, the inverse of ``pivot_agg`` (pandas ``melt``).

    Wraps the built-in ``DataFrame.unpivot``: Catalyst plans it as a single
    Expand node — each input row fans to len(values) rows in the SAME task,
    no shuffle, no self-union (the UNION-ALL-per-measure formulation scans
    the table once per measure; Expand scans it once, period). Value
    columns must share a least-common type; cast upstream if mixing."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """Vertical union by column NAME (pandas ``pd.concat``,
    /root/reference/scripts/05_ml_model.py:414; multi-file CSV implicit union,
    /root/reference/scripts/02_bronze.py:95-97)."""
    it = iter(frames)
    out = next(it)
    for df in it:
        out = out.unionByName(df)
    return out
