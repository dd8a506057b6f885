"""Temporal predicates (SURVEY §2.2 P3-P5).

The reference achieves point-in-time ("as-of") semantics not with an as-of
join but with a cutoff filter evaluated per snapshot date
(/root/reference/sql/feature_store_drivers.sql:16,27,118). These predicates
are plain Catalyst filters — they push down to the parquet/Delta scan
(min/max row-group pruning + partition pruning when the table is partitioned
by a date-derived column), which is exactly what makes the per-snapshot
recompute viable at scale.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.functions import years_back

DateLike = "str | _dt.date"


def _date_lit(date) -> Column:
    if isinstance(date, Column):
        return date
    return F.lit(str(date)).cast("date")


def asof_filter(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Keep rows at/before the cutoff date —
    ``TO_DATE(TO_TIMESTAMP(ts)) <= cutoff``
    (/root/reference/sql/feature_store_drivers.sql:16)."""
    return df.filter(F.to_date(F.to_timestamp(F.col(ts_col))) <= _date_lit(cutoff))


def trailing_window_filter(
    df: DataFrame, date_col: str, cutoff, years: int = 1
) -> DataFrame:
    """Trailing calendar-window rows: ``date >= cutoff - INTERVAL n YEARS``
    AND ``date <= cutoff`` (/root/reference/sql/feature_store_drivers.sql:27,88).

    The reference applies the lower bound on data already as-of-filtered; the
    upper bound is included here so the operator is self-contained.
    """
    cut = _date_lit(cutoff)
    d = F.to_date(F.col(date_col))
    return df.filter((d >= years_back(cut, years)) & (d <= cut))


def current_period_filter(df: DataFrame, date_col: str, cutoff) -> DataFrame:
    """Current-season rows: ``YEAR(date) >= YEAR(cutoff)`` and
    ``date <= cutoff`` (/root/reference/sql/feature_store_drivers.sql:118)."""
    cut = _date_lit(cutoff)
    d = F.to_date(F.col(date_col))
    return df.filter((F.year(d) >= F.year(cut)) & (d <= cut))
