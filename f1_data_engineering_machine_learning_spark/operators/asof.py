"""As-of (point-in-time) join — an operator Spark has no native form of.

``asof_join(left, right, key, ts)``: every left row is matched to the
LATEST right row with the same key whose timestamp is <= the left row's
(the feature-store lookup: "the newest fact known at decision time"). The
reference approximates this per snapshot date with a global cutoff filter
(/root/reference/sql/feature_store_drivers.sql:16 — SURVEY §2.3 notes no
as-of join exists there); this is the general row-level operator, with
the full pandas ``merge_asof`` direction surface: ``backward`` (default),
``forward`` (earliest right at-or-after), and ``nearest`` (closer of the
two, ties to backward).

Implementation is the union-and-carry idiom, NOT a range join:

1. tag left and right rows and union them on (key, ts) — one dataset,
2. sort within key by (ts, tag) — tag placement on timestamp ties
   encodes inclusive/strict semantics per direction,
3. ``last(struct, ignorenulls)`` over the RUNNING window carries the most
   recent right ROW onto later left rows (backward);
   ``first(struct, ignorenulls)`` over the FOLLOWING window carries the
   next right row (forward). ``nearest`` evaluates BOTH frames over the
   same sorted window — still one shuffle — and picks per row by exact
   microsecond distance. The carry is a single struct, so (a) a NULL in
   the matched row is preserved rather than papered over by an older
   non-null value and (b) all carried values come from the same right
   row, matching DuckDB ASOF JOIN row-level semantics exactly,
4. keep the left rows.

Cost: ONE shuffle of |left| + |right| rows on the key (the window sort),
for every direction. The naive formulation — inequality join then
per-left-row extremum — explodes to O(|left| x |right per key|)
intermediate rows; this stays linear, and at 100 TB that difference is
the job finishing or not. Skewed keys (many rows for one entity) are
AQE-splittable since the window partitions by key only.

Verified row-for-row against DuckDB's native ASOF JOIN (catalog
``purchase_asof_click`` backward, ``click_next_purchase`` forward via
negated-epoch ASOF, ``click_nearest_purchase`` nearest via a two-sided
ASOF combine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


_NUMERIC_BASES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
}


def _exact_ts(col: Column, dtype: str) -> Column:
    """Exact comparable time value for ``nearest`` distance arithmetic:
    long microseconds for timestamps (a double cast would round the
    epoch and can flip exact-tie decisions), long days-since-epoch for
    dates (DATE has no double cast in Spark), plain double for numeric
    order columns. Anything else (string, boolean, ...) has no defined
    distance — raise instead of silently yielding NULLs that would
    corrupt the nearest pick."""
    if dtype.startswith("timestamp"):
        # NTZ -> LTZ reinterpretation is stable (session tz pinned UTC);
        # unix_micros accepts only TIMESTAMP proper
        return F.unix_micros(col.cast("timestamp"))
    if dtype == "date":
        return F.unix_date(col).cast("long")
    if dtype.split("(", 1)[0] in _NUMERIC_BASES:
        return col.cast("double")
    raise TypeError(
        "direction='nearest' and tolerance require a temporal or numeric "
        f"ordering column for distance arithmetic; got ts_col of type "
        f"{dtype!r}. Directions 'backward'/'forward' without tolerance "
        "accept any orderable type."
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    strict: bool = False,
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """Left as-of join: nearest right values per ``direction``.

    Parameters
    ----------
    on         : equality key columns (present in both sides).
    ts_col     : ordering timestamp column (present in both sides).
    value_cols : right-side columns to carry onto left rows (emitted as
                 ``{col}{suffix}``; NULL when no matching right row).
    strict     : True => exclude equal-timestamp matches (< / >). Not
                 supported with ``nearest`` (no tag placement satisfies
                 both frames; raise rather than silently approximate).
    direction  : 'backward' (latest at-or-before, DuckDB ASOF), 'forward'
                 (earliest at-or-after), 'nearest' (closer of the two,
                 exact-microsecond distance, ties to backward).
    tolerance  : maximum |distance| between left and matched right, in
                 the ordering column's exact units (MICROSECONDS for
                 timestamps, DAYS for dates, the raw value for numerics
                 — the units of ``_exact_ts``); a match farther away
                 NULLs out, the pandas ``merge_asof(tolerance=...)``
                 semantic. The filter runs post-carry on the already
                 matched row — same single shuffle, and the match does
                 NOT fall back to an older row inside tolerance (pandas
                 parity: the as-of pick happens first, tolerance only
                 vetoes it).
    """
    on = list(on)
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    if direction == "nearest" and strict:
        raise ValueError("strict=True is not supported with direction='nearest'")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    for c in [*on, ts_col]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols missing from right side: {missing}")

    # Tag placement on (ts, tag) ASC decides tie visibility:
    #   backward: preceding frame sees smaller tags first -> inclusive
    #     needs right(0) < left(1); strict flips.
    #   forward: the following frame starts AT the left row -> inclusive
    #     needs right AFTER left (left 0, right 1); strict flips.
    #   nearest: right(0) < left(1) -> equal-ts rights land in the
    #     backward frame with distance 0 (ties to backward, by design).
    if direction == "forward":
        right_tag, left_tag = (1, 0) if not strict else (0, 1)
    else:
        right_tag, left_tag = (0, 1) if not strict else (1, 0)

    left_cols = [c for c in left.columns]
    ts_dtype = dict(right.dtypes)[ts_col]
    # one struct per right row (payload + matched ts for 'nearest'): the
    # carry is atomic, so NULL fields inside the matched row survive and
    # no output row mixes two right rows. __mts (the exact comparable
    # time for distance arithmetic) exists ONLY for 'nearest' —
    # backward/forward order purely through the window sort, so they
    # keep working on any orderable ts_col type (e.g. string).
    need_mts = direction == "nearest" or tolerance is not None

    def _rvals_struct() -> Column:
        fields = []
        if need_mts:
            fields.append(_exact_ts(F.col(ts_col), ts_dtype).alias("__mts"))
        fields.append(F.struct(*[F.col(c) for c in value_cols]).alias("__v"))
        return F.struct(*fields).alias("__rvals")

    rvals_type = right.select(_rvals_struct()).schema["__rvals"].dataType
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
        _rvals_struct(),
    )

    unioned = tagged_left.unionByName(tagged_right)
    ordered = Window.partitionBy(*on).orderBy("__ts", "__tag")
    back_w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd_w = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    cols = ["__tag", "__left", "__ts"]
    if direction == "backward":
        carried = unioned.select(
            *cols, F.last("__rvals", ignorenulls=True).over(back_w).alias("__c")
        )
        chosen = F.col("__c")
    elif direction == "forward":
        carried = unioned.select(
            *cols, F.first("__rvals", ignorenulls=True).over(fwd_w).alias("__c")
        )
        chosen = F.col("__c")
    else:  # nearest: both frames over the SAME sorted window — one shuffle
        carried = unioned.select(
            *cols,
            F.last("__rvals", ignorenulls=True).over(back_w).alias("__b"),
            F.first("__rvals", ignorenulls=True).over(fwd_w).alias("__f"),
        )
        here = _exact_ts(F.col("__ts"), ts_dtype)
        back_d = here - F.col("__b.__mts")
        fwd_d = F.col("__f.__mts") - here
        chosen = (
            F.when(F.col("__f").isNull(), F.col("__b"))
            .when(F.col("__b").isNull(), F.col("__f"))
            .when(back_d <= fwd_d, F.col("__b"))
            .otherwise(F.col("__f"))
        )

    if tolerance is not None:
        here_t = _exact_ts(F.col("__ts"), ts_dtype)
        chosen = F.when(
            F.abs(here_t - chosen["__mts"]) <= F.lit(tolerance), chosen
        )
    out = carried.withColumn("__chosen", chosen).filter(
        F.col("__tag") == left_tag
    ).select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        *[F.col(f"__chosen.__v.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
