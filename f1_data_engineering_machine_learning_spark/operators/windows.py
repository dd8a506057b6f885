"""Window-function operators (SURVEY §2.5 W1, §2.6 O4, §2.9 M9).

``top1_per_group`` is the champions idiom
(/root/reference/sql/champions.sql:17,25). The reference's ROW_NUMBER tie
break is nondeterministic; here a deterministic tie-break column list is
required so results are stable across partitionings (a hard requirement for
oracle checks and for reproducibility at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    rn_col: str = "rn",
    keep_rn: bool = False,
) -> DataFrame:
    """``ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...)`` + ``rn = 1``
    (/root/reference/sql/champions.sql:17,25). ``order_by`` should include a
    unique tie-break key — see module docstring."""
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    out = df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) == 1)
    return out if keep_rn else out.drop(rn_col)


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Generalized per-group top-k (rank column retained)."""
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) <= k)


def topk(df: DataFrame, order_by: Sequence[str | Column], k: int) -> DataFrame:
    """Global top-k — ``ORDER BY ... LIMIT k``
    (/root/reference/scripts/05_ml_model.py:260-266 done driver-side in
    pandas; here it stays distributed: Spark plans TakeOrderedAndProject,
    per-partition heaps + a k-row merge, no full sort)."""
    return df.orderBy(*_cols(order_by)).limit(k)


def dedup_keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep the LAST row per key under ``order_by``
    (pandas ``drop_duplicates(keep='last')``,
    /root/reference/scripts/05_ml_model.py:441). Spark's ``dropDuplicates``
    gives no ordering guarantee, so this is row_number over the reversed
    order — ``order_by`` must totally order rows within a key."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in _cols(order_by)])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value: Column,
    out_col: str,
) -> DataFrame:
    """Cumulative aggregate over an ordered frame (rowsBetween unbounded
    preceding .. current). No reference counterpart (the reference's
    'rolling' features are re-aggregation per snapshot, SURVEY §2.5) —
    provided as the window-native alternative."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value).over(w))
