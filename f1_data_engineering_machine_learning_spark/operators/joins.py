"""Join operators (SURVEY §2.3).

Join strategy stays Catalyst's (AQE picks broadcast vs shuffled hash vs
sort-merge at runtime); these helpers encode the reference's *logical* join
semantics and add explicit broadcast hints where one side is known-small —
at 100 TB a dimension-side broadcast is the difference between a map-side
join and a full shuffle of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.functions import existence_flag


def semi_join(
    df: DataFrame,
    keep: DataFrame,
    on: str | Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """``x IN (SELECT key FROM keep)`` — restrict to a membership set
    (/root/reference/sql/feature_store_drivers.sql:59,87,117; Catalyst
    rewrites the IN-subquery to exactly this left-semi join)."""
    right = F.broadcast(keep) if broadcast_right else keep
    return df.join(right, on, "left_semi")


def anti_join(
    df: DataFrame,
    exclude: DataFrame,
    on: str | Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """``NOT IN`` / NOT EXISTS complement of :func:`semi_join` (no reference
    counterpart — completes the membership-join family)."""
    right = F.broadcast(exclude) if broadcast_right else exclude
    return df.join(right, on, "left_anti")


def label_join(
    df: DataFrame,
    labels: DataFrame,
    on: str | Sequence[str] | Column,
    flag_col: str,
    probe_col: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Left join + existence flag: ``CASE WHEN hit THEN 1 ELSE 0 END`` — the
    binary-label decoration of /root/reference/sql/abt_champions.sql:16-21.

    ``probe_col`` must be a column of ``labels`` that is non-null on hit
    (typically its join key). The label side is broadcast by default — it is
    a per-group top-1 set, small by construction.
    """
    right = F.broadcast(labels) if broadcast_right else labels
    joined = df.join(right, on, "left")
    return joined.withColumn(flag_col, existence_flag(F.col(probe_col)))
