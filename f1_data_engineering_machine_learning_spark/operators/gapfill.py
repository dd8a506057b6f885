"""Time-series gap filling: dense daily series + forward fill (LOCF).

Spark has no native gap-fill: a per-entity daily series with missing days
stays missing through any aggregation. Two composition strategies live
here:

- ``date_scaffold`` + ``forward_fill`` — the textbook dense frame:
  (entity x day) scaffold LEFT JOIN observations, then
  ``last(value, ignorenulls=True)`` over the running window. Simple, but
  at scale it shuffles the DENSE frame twice (once for the join keyed on
  (entity, day), once re-keyed on entity for the window).
- ``gap_fill`` — the span-explode plan used by the catalog: LOCF is
  computed on the SPARSE observation frame first (one window over
  O(observations) rows), then each observation is exploded across the
  days it covers (``sequence(d, next_d - 1)`` via ``lead``). The dense
  row count materializes only map-side, AFTER every shuffle — the
  shuffled data is O(observations), not O(entities x days). Leading days
  before an entity's first observation are emitted from the first row
  (value NULL — no fabricated values), so output is identical to the
  scaffold plan.

Verified against DuckDB's ``last_value(x IGNORE NULLS)`` (catalog
``daily_user_value_gapfill``) and an in-suite equivalence test between
the two strategies.
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
    ``observed`` (False on filled-in rows or NULL-valued observations).

    Span-explode plan (see module docstring): all shuffles move only the
    sparse observation rows; the dense expansion is a map-side
    ``explode(sequence(...))`` after the single per-entity window.
    Observations outside an explicit [start, end] are excluded, and
    entities whose observations all fall outside the range are omitted.
    """
    entity_cols = list(entity_cols)
    if start is None or end is None:
        lo, hi = observations.select(
            F.min(F.col(date_col)), F.max(F.col(date_col))
        ).first()
        start = start or str(lo)
        end = end or str(hi)
    start_c = F.lit(start).cast("date")
    end_c = F.lit(end).cast("date")

    obs = observations.filter(F.col(date_col).between(start_c, end_c))
    ordered = Window.partitionBy(*entity_cols).orderBy(date_col)
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # LOCF over the SPARSE frame — one window, O(observations) rows.
    for c in value_cols:
        obs = obs.withColumn(f"{c}_ff", F.last(c, ignorenulls=True).over(running))
    obs = obs.withColumn(
        "__span_end",
        F.coalesce(F.date_sub(F.lead(date_col).over(ordered), 1), end_c),
    ).withColumn("__rn", F.row_number().over(ordered))

    ff_cols = [f"{c}_ff" for c in value_cols]
    ff_types = dict(obs.dtypes)

    # Each observation covers [d, next_d - 1]; observed only on its own day
    # (and only if the day's raw value is non-NULL). date_col is renamed
    # first so the exploded day can be emitted as ``d`` without colliding.
    renamed = obs.withColumnRenamed(date_col, "__obs_d")
    spans = (
        renamed.select(
            *entity_cols,
            "__obs_d",
            F.col(value_cols[0]).alias("__raw0"),
            *ff_cols,
            F.explode(
                F.sequence(
                    F.col("__obs_d"), F.col("__span_end"), F.expr("INTERVAL 1 DAY")
                )
            ).alias("d"),
        )
        .withColumn(
            "observed",
            (F.col("__obs_d") == F.col("d")) & F.col("__raw0").isNotNull(),
        )
        .select(*entity_cols, "d", *ff_cols, "observed")
    )

    # Leading days before the entity's first observation: NULL values.
    leading = (
        renamed.filter((F.col("__rn") == 1) & (F.col("__obs_d") > start_c))
        .select(
            *entity_cols,
            F.explode(
                F.sequence(
                    start_c,
                    F.date_sub(F.col("__obs_d"), 1),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d"),
            *[
                F.lit(None).cast(ff_types[f"{c}_ff"]).alias(f"{c}_ff")
                for c in value_cols
            ],
            F.lit(False).alias("observed"),
        )
    )
    return spans.unionByName(leading)


def interpolate_linear(
    observations: DataFrame,
    entity_cols: Sequence[str],
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily series per entity with LINEAR interpolation between
    consecutive observations (vs ``gap_fill``'s step-function LOCF).

    Same span-explode plan as ``gap_fill``: one window over the SPARSE
    observation frame pairs each row with its successor (``lead``), then
    each span [d, next_d - 1] explodes map-side and the interpolated
    value is ``v + (next_v - v) * days_into_span / span_days`` — shuffled
    data stays O(observations); the dense frame never crosses an
    exchange. The last observation per entity emits only its own day
    (nothing to interpolate toward; no extrapolation — fabricating a
    trend past the data would be the dishonest default).

    Determinism: day offsets are exact ints; one IEEE divide + multiply +
    add per output row, bit-identical across engines and partitionings.
    Output: entity cols, ``d``, ``{value_col}_lerp``, ``observed``.

    Duplicate (entity, date) observations are collapsed to ONE row first
    — the greatest non-null value wins (deterministic) — because a
    duplicate would otherwise make ``next_d == d`` and the span bound
    ``date_sub(next_d, 1) < d`` is an illegal ``sequence()`` at runtime
    (and which duplicate feeds each interpolation would be partition-
    order luck). The dedup rides the SAME entity-partitioned exchange as
    the lead window — an extra per-partition sort, no extra shuffle.
    """
    entity_cols = list(entity_cols)
    ordered = Window.partitionBy(*entity_cols).orderBy(date_col)
    # keep-greatest-per-date: first row of each date group under
    # (date ASC, value DESC NULLS LAST) — detected via lag, not a
    # groupBy, so it reuses the window exchange
    pick = Window.partitionBy(*entity_cols).orderBy(
        F.col(date_col), F.col(value_col).desc()
    )
    deduped = (
        observations.withColumn("__prev_d", F.lag(date_col).over(pick))
        .filter(
            F.col("__prev_d").isNull() | (F.col("__prev_d") != F.col(date_col))
        )
        .drop("__prev_d")
    )
    obs = deduped.withColumn(
        "__next_d", F.lead(date_col).over(ordered)
    ).withColumn("__next_v", F.lead(value_col).over(ordered))
    spans = obs.select(
        *entity_cols,
        F.col(date_col).alias("__obs_d"),
        F.col(value_col).cast("double").alias("__v"),
        "__next_d",
        F.col("__next_v").cast("double").alias("__nv"),
        F.explode(
            F.sequence(
                F.col(date_col),
                F.coalesce(
                    F.date_sub(F.col("__next_d"), 1), F.col(date_col)
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d"),
    )
    frac = F.datediff(F.col("d"), F.col("__obs_d")) / F.datediff(
        F.col("__next_d"), F.col("__obs_d")
    )
    lerp = F.when(F.col("d") == F.col("__obs_d"), F.col("__v")).otherwise(
        F.col("__v") + (F.col("__nv") - F.col("__v")) * frac
    )
    return spans.select(
        *entity_cols,
        "d",
        lerp.alias(f"{value_col}_lerp"),
        (F.col("d") == F.col("__obs_d")).alias("observed"),
    )


def time_weighted_avg(
    observations: DataFrame,
    entity_cols: Sequence[str],
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per entity: each observation's value counts
    for the number of DAYS it remained current (until the next
    observation; the last one counts 1 day) — the correct mean for
    irregularly sampled state (account balances, sensor readings,
    prices), where the arithmetic mean over-weights busy periods.

    Exactness: weights are integer day counts, values go through
    DECIMAL, so ``sum(value*days)`` and ``sum(days)`` are exact and the
    single final division is the only float op — bitwise reproducible
    across engines/partitionings (the catalog value-oracles it). Plan:
    one entity-partitioned window (lead) + one aggregation on the same
    key — the aggregation reuses the window's exchange.

    Output: entity cols, ``twa`` (double), ``n_obs``, ``days_covered``.
    """
    entity_cols = list(entity_cols)
    w = Window.partitionBy(*entity_cols).orderBy(date_col)
    spans = observations.withColumn(
        "__days",
        F.coalesce(
            F.datediff(F.lead(date_col).over(w), F.col(date_col)), F.lit(1)
        ).cast("long"),
    )
    v = F.col(value_col).cast("decimal(30,6)")
    return (
        spans.groupBy(*entity_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("__days").cast("bigint").alias("days_covered"),
            F.sum(v * F.col("__days")).alias("__wsum"),
        )
        .select(
            *entity_cols,
            (F.col("__wsum").cast("double") / F.col("days_covered")).alias("twa"),
            "n_obs",
            "days_covered",
        )
    )
