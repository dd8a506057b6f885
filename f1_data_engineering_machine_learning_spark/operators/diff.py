"""Dataset diff / reconciliation: what changed between two versions.

The everyday data-engineering question ("did the backfill change
anything?", "what did this pipeline run touch?") as ONE full-outer join:

    status = added    key only in right (new rows)
             removed  key only in left (dropped rows)
             changed  key in both, any compared column differs
             identical otherwise

Scale: one shuffle per side on the key columns (the join), column
comparison is a null-safe JVM expression — no Python, no collect. At
100 TB both sides are huge, so this is the sort-merge-join shape;
restricting ``compare_cols`` prunes the scan to key + compared columns
only. NULL-safe equality (``eqNullSafe``) so NULL -> value and
value -> NULL both count as changes, and NULL == NULL does not.

The reference has no diff operator; this is infrastructure its
full-overwrite pipeline (SURVEY §2.1 S8) needs the moment anyone asks
"what did the rewrite change?" — and the verification step of the
staged compliance delete (`dataops/governance.py`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer reconciliation of two versions of a keyed table.

    Returns one row per key in either side: the key columns, ``status``
    (added/removed/changed/identical), and for every compared column its
    ``{col}_left`` / ``{col}_right`` pair (NULL on the missing side).
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    missing = [c for c in compare_cols if c not in right.columns]
    if missing:
        raise ValueError(f"compare_cols absent from right side: {missing}")

    lsel = left.select(
        *keys,
        F.lit(True).alias("__in_left"),
        *[F.col(c).alias(f"{c}_left") for c in compare_cols],
    )
    rsel = right.select(
        *keys,
        F.lit(True).alias("__in_right"),
        *[F.col(c).alias(f"{c}_right") for c in compare_cols],
    )
    j = lsel.join(rsel, keys, "full_outer")

    same: Column = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_left").eqNullSafe(F.col(f"{c}_right"))
    status = (
        F.when(F.col("__in_left").isNull(), F.lit("added"))
        .when(F.col("__in_right").isNull(), F.lit("removed"))
        .when(same, F.lit("identical"))
        .otherwise(F.lit("changed"))
    )
    pairs = [c for cc in compare_cols for c in (f"{cc}_left", f"{cc}_right")]
    return j.select(*keys, status.alias("status"), *pairs)
