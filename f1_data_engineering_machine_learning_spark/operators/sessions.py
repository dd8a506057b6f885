"""Sessionization and path analytics over event streams (batch form;
the streaming twin is streaming/jobs.py::session_stats_stream).

Path analysis — "what sequences do users actually walk?" — is the
batch workhorse behind funnel design: instead of testing one
hypothesized A->B->C, extract EVERY session's ordered event path and
count them. The expensive part is ordering events within a session;
everything here keeps that ordering inside per-entity window sorts
(one exchange on the entity key) and never self-joins events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def assign_sessions(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap_minutes: float = 30.0,
    tiebreak: Sequence[str] = (),
    out_col: str = "session_id",
) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Appends an integer
    ``session_id`` (1-based per entity, cumulative-sum-of-flags — the
    standard lag+cumsum form). One exchange + sort on the entity key;
    pass ``tiebreak`` (e.g. the event id) to make simultaneous events a
    total order."""
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*[F.col(c) for c in entity_cols]).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # INTERVAL arithmetic, not epoch-double subtraction: timestamps carry
    # microseconds, and a double holds ~5e-7 s resolution at 2024 epoch
    # magnitudes — a boundary gap could flip vs an engine comparing
    # native microsecond integers. Interval comparison is exact in both.
    gap_seconds = int(round(gap_minutes * 60))
    is_new = (
        prev.isNull()
        | (
            F.col(ts_col) - prev
            > F.expr(f"INTERVAL '{gap_seconds}' SECOND")
        )
    ).cast("long")
    return df.withColumn(
        out_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_paths(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    step_col: str,
    gap_minutes: float = 30.0,
    tiebreak: Sequence[str] = (),
    sep: str = ">",
    min_count: int = 1,
) -> DataFrame:
    """Ordered per-session event paths, counted across the corpus:
    ``(path, n_sessions, n_steps)`` — e.g. ``view>click>purchase`` with
    how many sessions walked exactly that sequence.

    Ordering is deterministic: steps collect as structs of
    ``(ts, tiebreak..., step)`` and ``array_sort`` orders them by the
    full key before the path string is assembled — partition-layout
    invariant, and exactly reproducible by a ``string_agg ... ORDER BY``
    oracle. Two shuffles total: the entity-key window (sessionize) and
    the path-count aggregate (map-side combinable). Path strings are
    bounded by session length — watch pathological never-idle entities
    via the same gap parameter that bounds streaming session state."""
    sessions = assign_sessions(
        df, entity_cols, ts_col, gap_minutes, tiebreak, out_col="__sid"
    )
    item = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(f"__t{i}") for i, c in enumerate(tiebreak)],
        F.col(step_col).cast("string").alias("__step"),
    )
    per_session = sessions.groupBy(
        *[F.col(c) for c in entity_cols], F.col("__sid")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(item)), lambda x: x["__step"]
            ),
            sep,
        ).alias("path"),
        F.count(F.lit(1)).alias("__len"),
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.max("__len").cast("long").alias("n_steps"),
        )
        .filter(F.col("n_sessions") >= min_count)
    )
