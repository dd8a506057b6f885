"""Incremental view maintenance for grouped aggregates.

A 100 TB warehouse does not recompute its daily revenue rollup from
scratch when one day's partition lands — it MAINTAINS the aggregate:
merge the delta's partials into the stored partials, touching only the
groups the delta mentions. This module implements that algebra for the
self-maintainable aggregate family (COUNT / SUM / MIN / MAX over
inserts), the same decomposition the cascading hypertable rollups in
``plans/rollup.py`` use across TIME levels, applied across BATCHES.

State contract: the maintained table stores PARTIALS (count, sums as
exact decimals, min/max), one row per group. Finalize derived metrics
(avg = sum/count) at READ time, never in state — a stored avg is not
mergeable (the classic IVM mistake). Inserts-only by design: deletions
need either full-group recompute (supported here: pass ``recompute``)
or retraction-aware partials (counts go negative), documented out of
scope as the reference pipelines are append-only.

Scale shape: the merge aggregates ``state ∪ delta-partials`` — but only
AFFECTED groups ride the union: unaffected state rows pass through
untouched via an anti-join on the delta's (typically tiny and
broadcastable) key set. Cost per batch is O(delta + affected state),
not O(state). Pairs with ``plans/versioned.py``: commit each maintained
snapshot (or ``merge_upsert`` the affected groups) for time travel over
materialized-view history.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_partials", "merge_partials", "finalize_partials"]

_DEC = "decimal(30,2)"


def agg_partials(
    df: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Partials of one batch: exact decimal SUM per ``sums[out] = col``,
    min/max per summed column, and the group count. One
    map-side-combinable shuffle."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias(count_col)]
    for out, col in sums.items():
        aggs.append(F.sum(F.col(col).cast(_DEC)).alias(f"{out}_sum"))
        aggs.append(F.min(F.col(col).cast(_DEC)).alias(f"{out}_min"))
        aggs.append(F.max(F.col(col).cast(_DEC)).alias(f"{out}_max"))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_partials(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintained state after an insert batch: delta rows fold into
    their groups' partials; untouched groups pass through without
    entering any aggregation (anti-join on the delta's key set — the
    broadcastable side). Merging partials of partials is the same
    algebra, so this composes associatively across batches
    (equivalence-tested against full recompute over random batch
    splits)."""
    delta_p = agg_partials(delta, keys, sums, count_col)
    keyset = delta_p.select(*keys)
    untouched = state.join(F.broadcast(keyset), list(keys), "left_anti")
    affected_state = state.join(F.broadcast(keyset), list(keys), "left_semi")
    merge_aggs = [F.sum(F.col(count_col)).cast("bigint").alias(count_col)]
    for out in sums:
        merge_aggs.append(F.sum(F.col(f"{out}_sum")).alias(f"{out}_sum"))
        merge_aggs.append(F.min(F.col(f"{out}_min")).alias(f"{out}_min"))
        merge_aggs.append(F.max(F.col(f"{out}_max")).alias(f"{out}_max"))
    merged = (
        affected_state.unionByName(delta_p)
        .groupBy(*[F.col(k) for k in keys])
        .agg(*merge_aggs)
    )
    return untouched.unionByName(merged)


def finalize_partials(
    state: DataFrame,
    sums: Mapping[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Read-time view over partials: exact doubles for sums/min/max and
    the derived avg (decimal-exact sum over exact count — the
    non-mergeable metric, computed only here)."""
    cols = [*state.columns]
    out = state
    for o in sums:
        out = out.withColumn(f"{o}_avg", (
            F.col(f"{o}_sum").cast("double") / F.col(count_col)
        ).cast("double"))
        for suffix in ("sum", "min", "max"):
            out = out.withColumn(
                f"{o}_{suffix}", F.col(f"{o}_{suffix}").cast("double")
            )
    del cols
    return out
