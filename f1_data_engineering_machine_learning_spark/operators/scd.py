"""SCD Type-2 dimension build: collapse a change-event stream into
validity intervals.

The reference's domain versions slowly-changing facts (a driver's team
changes across seasons; SURVEY §2 snapshot/as-of family) by re-deriving
state per reference date. The warehouse-standard alternative is an SCD2
dimension — one row per (key, state) EPISODE with [valid_from, valid_to)
bounds — built once, then joined by interval containment (operators/
range_join.py) or as-of (operators/asof.py).

Scale shape: ONE shuffle. Both window passes (change detection, interval
close) partition by the same key and sort by the same ordering, so
Catalyst plans a single exchange + sort and runs both windows over it.
State never accumulates beyond a partition sort — no driver involvement,
no iterative logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse per-key change events into SCD2 episodes.

    Consecutive rows (per key, ordered by ``ts_col`` then ``order_cols``)
    with unchanged ``attr_cols`` merge into one episode; every change opens
    a new one. Change detection is null-safe over a single struct of the
    attributes (NULL -> NULL is "no change", NULL -> value is a change).
    Returns key + attr columns plus ``valid_from`` (episode's first ts),
    ``valid_to`` (next episode's start, NULL while current) and
    ``is_current`` — the half-open [valid_from, valid_to) convention, so
    an as-of lookup at time t matches exactly one episode per key."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    is_change = (F.row_number().over(w) == 1) | ~F.lag(attrs).over(w).eqNullSafe(
        attrs
    )
    episodes = df.withColumn("__chg", is_change).filter(F.col("__chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        episodes.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
