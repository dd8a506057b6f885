"""Change-data-capture apply: advance a snapshot by a batch of keyed
changes — the MERGE INTO / Delta upsert semantic as a pure DataFrame
composition, for engines running on plain parquet.

Semantics (per key, per batch):

1. only the LATEST change for a key wins (ordered by ``seq_col``, then
   ``tiebreak_cols`` — a full CDC feed can carry many ops per key);
2. if that change is a DELETE, the key disappears from the output;
3. otherwise (insert/update) the change row replaces the snapshot row —
   inserts and updates are the same operation on a keyed snapshot
   ("upsert");
4. snapshot keys untouched by the batch pass through unchanged.

Plan: latest-change selection is a ``max(struct(seq, tiebreaks, row))``
aggregation — partial-aggregating, so the shuffle carries one candidate
per (partition, key), never the full change multiplicity (same trick as
dataops/dedup.py::dedup_by_preference, mirrored for keep-LATEST). The
apply is then one left-anti (drop replaced/deleted keys) + one union:
two shuffles total on the key, each moving ~|snapshot| + |latest|
rows. The reference's ingestion loop rewrites whole date slices
(/root/reference/scripts/spark_ops.py:169-175 replaceWhere); this is the
row-granular sibling used when changes aren't partition-aligned.

Oracle-verified end-to-end (catalog ``user_state_cdc``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per key: the change with the greatest
    ``(seq_col, *tiebreak_cols)`` — partial-aggregating struct-max, no
    window sort.

    NULL handling: a NULL sequence value means "ordering unknown" and
    always LOSES to any non-null sequence (explicitly encoded as
    ``(col IS NOT NULL, col)`` inside the max-struct — ``desc_nulls_last``
    semantics, matching ``row_number() OVER (ORDER BY seq DESC NULLS
    LAST)`` = 1 rather than relying on implicit struct-NULL ordering)."""
    key_cols = list(key_cols)
    order = [seq_col, *tiebreak_cols]
    encoded = [
        part
        for i, c in enumerate(order)
        for part in (
            F.col(c).isNotNull().alias(f"__n{i}"),  # max: non-null (true) wins
            F.col(c).alias(f"__o{i}"),
        )
    ]
    picked = changes.groupBy(*key_cols).agg(
        F.max(
            F.struct(*encoded, F.struct(*changes.columns).alias("__row"))
        ).alias("__best")
    )
    return picked.select(
        *[F.col(f"__best.__row.{c}").alias(c) for c in changes.columns]
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_value: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Next snapshot state after applying ``changes`` (see module
    docstring). ``changes`` must contain every snapshot column plus
    ``seq_col`` and ``op_col`` (both dropped from the output)."""
    key_cols = list(key_cols)
    missing = [c for c in snapshot.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing snapshot columns: {missing}")
    latest = latest_change_per_key(changes, key_cols, seq_col, tiebreak_cols)
    untouched = snapshot.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    upserts = latest.filter(F.col(op_col) != delete_value).select(
        *snapshot.columns
    )
    return untouched.unionByName(upserts)
