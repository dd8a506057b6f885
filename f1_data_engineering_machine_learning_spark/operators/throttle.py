"""Event throttling (debounce): keep an entity's event only if at least
``min_gap`` has elapsed since the last KEPT event.

This is inherently SEQUENTIAL per entity — whether event i survives
depends on which earlier events survived (t=0,4,5,9 with gap 5 keeps
{0,5}: 4 is too close to 0, but 5 is exactly 5 from the last KEPT, and 9
is then too close to 5). No composition of lag/window/sessionize computes
it: a plain ``lag >= gap`` filter checks distance to the previous RAW
event (would keep {0,9}), and gap-sessionization groups by raw-gap breaks
(would keep {0}). It is the textbook case for Spark's custom-operator
tier — but NOT for grouped-map: ``applyInPandas`` pays a pandas
frame-construction + sort per GROUP (~2.5 ms each, measured), which at
1,500 entities was 90% of the query's runtime. Instead: one shuffle
co-locates and orders each entity's events (``repartition`` +
``sortWithinPartitions`` — a JVM sort, not 1,500 Python sorts), then a
single ``mapInPandas`` pass walks each partition's Arrow batches
carrying a ``{entity: last_kept_ns}`` dict across batch boundaries.
Per-partition Python work is one C-speed int loop over raw epoch-ns;
per-entity state is one integer. Entities are hash-partitioned and
independent, so skewed entity history is the only hazard (same as any
groupBy; an entity's history must fit a worker, true of every
per-entity sequential semantic) — and unlike grouped-map, a partition's
MEMORY need is one Arrow batch, not the largest group.

Verified against a DuckDB RECURSIVE CTE replay of the same walk
(catalog ``throttled_user_events``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def throttle_events(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    min_gap_seconds: float,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep rows spaced >= ``min_gap_seconds`` apart per entity (first
    event always kept; ordering is ``(ts_col, *tiebreak_cols)`` — pass a
    unique id for determinism under timestamp ties). Output schema ==
    input schema, kept rows only.

    Entity-key contract: entity columns must be DISCRETE scalar types
    (string / integer / date / boolean...). The per-partition walk keys
    a Python dict on the raw values, so floating-point entities are
    rejected up front — a NaN key never equals itself, which would make
    every NaN-entity event its own "first event" where a groupBy would
    form one NaN group — as are array/map/struct entities (unhashable).
    Rejecting at plan time beats silently diverging on degenerate keys."""
    entity_cols = list(entity_cols)
    tiebreak_cols = list(tiebreak_cols)
    for c in [*entity_cols, ts_col, *tiebreak_cols]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    dtypes = dict(df.dtypes)
    for c in entity_cols:
        t = dtypes[c]
        if t in ("float", "double") or t.startswith(("array", "map", "struct")):
            raise ValueError(
                f"entity column {c!r} has type {t}: throttle entity keys "
                "must be discrete hashable scalars (see docstring)"
            )
    if min_gap_seconds <= 0:
        raise ValueError("min_gap_seconds must be positive")
    order = [ts_col, *tiebreak_cols]

    gap_ns = int(round(min_gap_seconds * 1_000_000_000))
    n_entity = len(entity_cols)

    def _scan(batches):
        import numpy as np

        # per-entity walk state survives Arrow batch boundaries: the
        # partition iterator yields batches in the partition's sorted
        # order, so an entity split across batches resumes from its
        # recorded last-kept timestamp
        last: dict = {}
        get = last.get
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # raw epoch-ns ints (.tolist() converts in one C pass):
            # exactness unchanged vs Timestamp arithmetic, each step an
            # integer subtract/compare — no pandas object materialization
            ts_ns = (
                pdf[ts_col].to_numpy(dtype="datetime64[ns]").view("int64").tolist()
            )
            if n_entity == 1:
                keys = pdf[entity_cols[0]].tolist()
            else:
                keys = list(zip(*(pdf[c].tolist() for c in entity_cols)))
            keep = np.zeros(n, dtype=bool)
            for i in range(n):
                t = ts_ns[i]
                k = keys[i]
                lk = get(k)
                if lk is None or t - lk >= gap_ns:
                    keep[i] = True
                    last[k] = t
            yield pdf[keep]

    ordered = df.repartition(*entity_cols).sortWithinPartitions(
        *entity_cols, *order
    )
    return ordered.mapInPandas(_scan, df.schema)
