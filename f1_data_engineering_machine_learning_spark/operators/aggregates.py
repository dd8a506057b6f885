"""Aggregation operators (SURVEY §2.4).

All map-side-combinable built-ins — a single shuffle per groupBy, partial
aggregation before the exchange. The one sort-based exception is
``exact_median`` (Spark's ``percentile`` buffers group values), kept because
the reference's contract is EXACT interpolated medians
(/root/reference/sql/feature_store_drivers.sql:46-54), matching DuckDB
``quantile_cont``. At 100 TB prefer ``approx_median`` unless exactness is
contractual.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_count(cond: Column) -> Column:
    """``SUM(CASE WHEN cond THEN 1 ELSE 0 END)``
    (/root/reference/sql/feature_store_drivers.sql:35-36) — emitted as
    ``count_if``-equivalent but returning bigint 0 (not NULL) for empty."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def conditional_avg(cond: Column, value: Column) -> Column:
    """``AVG(CASE WHEN cond THEN value END)`` — no ELSE, so non-matching rows
    become NULL and are skipped by AVG. This NULL-skipping is the contract
    (/root/reference/sql/feature_store_drivers.sql:38-45)."""
    return F.avg(F.when(cond, value))


def exact_median(value: Column | str) -> Column:
    """Exact interpolated median — ``percentile(x, 0.5)``
    (/root/reference/sql/feature_store_drivers.sql:46-54). NOT
    ``percentile_approx``: oracle equality (DuckDB ``quantile_cont``)
    requires the exact sort-based aggregate."""
    c = F.col(value) if isinstance(value, str) else value
    return F.percentile(c, F.lit(0.5))


def conditional_median(cond: Column, value: Column) -> Column:
    """``PERCENTILE(CASE WHEN cond THEN value END, 0.5)``
    (/root/reference/sql/feature_store_drivers.sql:48-54)."""
    return F.percentile(F.when(cond, value), F.lit(0.5))


def scoped_agg_fanout(
    df: DataFrame,
    keys: Sequence[str],
    scopes: Mapping[str, Column],
    aggs: Mapping[str, "callable"],
) -> DataFrame:
    """Multi-scope aggregate fan-out in ONE pass (SURVEY §2.4 A10).

    The reference computes ~20 aggregates over 3 time scopes as three separate
    GROUP BYs re-joined on the key
    (/root/reference/sql/feature_store_drivers.sql:30-120,168-170) — three
    shuffles of the same fact table plus two joins. Scale mode: a single
    groupBy where each scope becomes a ``CASE WHEN in_scope`` guard inside the
    aggregate, i.e. ``F.avg(F.when(scope_cond, x))`` — one shuffle, no joins,
    identical NULL semantics (a key with no rows in a scope yields NULL,
    exactly like the reference's left join miss).

    Parameters
    ----------
    keys    : grouping columns.
    scopes  : scope name -> boolean Column (e.g. lifetime/trailing/current).
    aggs    : output-suffix -> fn(cond: Column) -> Column aggregate builder.

    Output columns: ``{agg_name}{scope_name}`` for each (agg, scope).
    """
    exprs = []
    for scope_name, scope_cond in scopes.items():
        for agg_name, builder in aggs.items():
            exprs.append(builder(scope_cond).alias(f"{agg_name}{scope_name}"))
    return df.groupBy(*keys).agg(*exprs)


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str],
    out_col: str = "weighted_median",
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total weight — e.g. "the
    token-count-weighted median quality score of a corpus", where a
    10k-token document should pull the median 100x harder than a 100-token
    one. Plain median is the ``weight = 1`` special case (then this is the
    lower median, no interpolation — use ``exact_median`` for the
    interpolated one).

    Exactness: weights are summed as decimals (order-independent), and the
    half-total comparison is ``2 * cumw >= total`` — all integer/decimal
    arithmetic, no division, so the pick is engine-exact even for odd
    totals. Rows with NULL value or NULL/non-positive weight are excluded.

    Plan: one window cumsum over (group, value-ordered) rows + a min
    aggregate over the qualifying suffix — two exchanges on the group key.
    The window partitions by GROUP (many groups = parallel); for the
    single-group case at extreme scale, rank with
    ``range_partitioned_rank`` and reproduce the cumsum the same two-pass
    way."""
    from pyspark.sql import Window

    group_cols = list(group_cols)
    w = F.col(weight_col).cast("decimal(30,6)")
    rows = df.filter(
        F.col(value_col).isNotNull() & w.isNotNull() & (w > 0)
    )
    win = Window.partitionBy(*group_cols).orderBy(F.col(value_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_win = Window.partitionBy(*group_cols)
    cum = rows.withColumn("__cumw", F.sum(w).over(win)).withColumn(
        "__totw", F.sum(w).over(tot_win)
    )
    qualifying = cum.filter(F.col("__cumw") * 2 >= F.col("__totw"))
    return qualifying.groupBy(*group_cols).agg(
        F.min(F.col(value_col)).alias(out_col)
    )
