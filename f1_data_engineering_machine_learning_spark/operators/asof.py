"""As-of (point-in-time) join — an operator Spark has no native form of.

``asof_join(left, right, key, ts)``: every left row is matched to the
LATEST right row with the same key whose timestamp is <= the left row's
(the feature-store lookup: "the newest fact known at decision time"). The
reference approximates this per snapshot date with a global cutoff filter
(/root/reference/sql/feature_store_drivers.sql:16 — SURVEY §2.3 notes no
as-of join exists there); this is the general row-level operator.

Implementation is the union-and-carry idiom, NOT a range join:

1. tag left and right rows and union them on (key, ts) — one dataset,
2. sort within key by (ts, tag) — right rows order before left rows on
   timestamp ties so an equal-timestamp fact is visible (>= semantics),
3. ``last(struct(values), ignorenulls=True)`` over the running window
   carries the most recent right-side ROW forward onto every subsequent
   left row — a single struct, not per-column carries, so (a) a NULL in
   the matched row is preserved rather than papered over by an older
   non-null value and (b) all carried values come from the same right
   row, matching DuckDB ASOF JOIN row-level semantics exactly,
4. keep the left rows.

Cost: ONE shuffle of |left| + |right| rows on the key (the window sort).
The naive formulation — inequality join then per-left-row max — explodes
to O(|left| x |right per key|) intermediate rows; this stays linear, and
at 100 TB that difference is the job finishing or not. Skewed keys
(many rows for one entity) are AQE-splittable since the window partitions
by key only.

Verified row-for-row against DuckDB's native ASOF JOIN (catalog
``purchase_asof_click``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: latest right values at-or-before each left row.

    Parameters
    ----------
    on         : equality key columns (present in both sides).
    ts_col     : ordering timestamp column (present in both sides).
    value_cols : right-side columns to carry onto left rows (emitted as
                 ``{col}{suffix}``; NULL when no prior right row exists).
    strict     : True => strictly-before semantics (<); default at-or-
                 before (<=), matching DuckDB ASOF JOIN.
    """
    on = list(on)
    for c in [*on, ts_col]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols missing from right side: {missing}")
    # tag order decides timestamp ties: right first (0) => <= semantics,
    # left first => right rows at the same ts are not yet visible (<)
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    left_cols = [c for c in left.columns]
    # one struct per right row: the carry is atomic, so NULL fields inside
    # the matched row survive and no output row mixes two right rows
    rvals_type = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("__rvals")
    ).schema["__rvals"].dataType
    tagged_left = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*left_cols).alias("__left"),
        F.lit(None).cast(rvals_type).alias("__rvals"),
    )
    tagged_right = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(tagged_left.schema["__left"].dataType).alias("__left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rvals"),
    )

    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__tag",
        "__left",
        F.last("__rvals", ignorenulls=True).over(w).alias("__carried"),
    )
    out = carried.filter(F.col("__tag") == left_tag).select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
