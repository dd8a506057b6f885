"""Deterministic mergeable quantile summaries (MRL collapse ladder).

The summary family's quantile member: CMS / Misra-Gries answer counts,
KMV / HLL / bitmaps answer distincts, bottom-k / A-ES answer samples,
equi-width histograms answer quantiles WHEN A RANGE IS KNOWN — this
module answers rank/quantile queries over an UNKNOWN, drifting value
domain with bounded state, the Manku-Rajagopalan-Lindsay buffer-collapse
scheme (SIGMOD'98 "Approximate Medians and other Quantiles in One Pass
and with Limited Memory"), deterministic variant:

- State per group: a binary-counter ladder of full k-value buffers, at
  most ONE buffer per level; a level-``L`` buffer summarizes ``k * 2^L``
  ingested values (each stored value stands for ``2^L`` of them), plus
  an exact carry of ``< k`` raw values. Total state per group is
  ``k * (levels + 1)`` values — levels grow as ``log2(n / k)``, so ~11
  buffers cover a trillion rows at k = 4096.
- COLLAPSE of two same-level buffers: merge-sort their ``2k`` values and
  keep every second position, alternating the kept parity by
  ``(level + pair) % 2`` — the MRL offset alternation, made
  deterministic (same bits on any partitioning / engine replay) instead
  of randomized. Each collapse displaces a value's rank by at most the
  buffer weight, giving the classical guarantee below.
- MERGEABLE: two ladders union into one ladder of the combined stream
  (collapse resolves duplicate levels binary-counter style) — slices
  and micro-batches maintain the summary with no history rescan
  (``streaming/jobs.py::quantile_ingest_stream``).

GUARANTEE (pinned by tests/test_quantiles.py against exact history):
for every stored value, the read-off rank estimate is within
``max_level * W / (2k) + k`` of its true rank, where ``W`` is the total
ingested weight — the MRL error telescoped over the ladder: collapses
at level ``L`` number at most ``W / (k * 2^(L+1))`` and each displaces
ranks by at most ``2^L``, so the sum over levels is ``<= levels * W /
(2k)``; the carry adds ``< k``. Choose ``k ~ (levels / (2 * eps))`` for
an ``eps``-approximate summary.

Read-off (:func:`mrl_quantiles`) is one window pass over the summary:
sort stored values, cumulative weight, report the first value whose
cumulative weight reaches ``q * W``.

Everything is pure DataFrame ops (sort/window/filter — no UDFs); the
collapse loop iterates ``O(log)`` rounds driver-side, each round a
summary-sized job. Scale: the per-group ladder is tiny; the build cost
is dominated by the first chunking pass over the data (one shuffle on
the group keys), after which every round halves the surviving rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Carry level: raw values, weight 1 each, fewer than k of them.
CARRY_LEVEL = -1


def _summary_cols(group_cols: list[str]) -> list[str]:
    return [*group_cols, "level", "buf", "slot", "value"]


def _collapse_to_ladder(
    rows: DataFrame,
    k: int,
    group_cols: list[str],
    assume_crowded: bool = False,
) -> DataFrame:
    """Collapse (group, level, buf, slot, value) rows until every
    (group, level >= 0) holds at most one full buffer. ``buf`` ids need
    only be distinct within (group, level); each round pairs buffers in
    ``buf`` order, merges each pair into one level+1 buffer, and passes
    odd leftovers through. Carry rows (level = CARRY_LEVEL) are
    untouched. Loops ``O(log(buffers))`` rounds driver-side; each round
    is one summary-sized window job."""
    g = [F.col(c) for c in group_cols]
    # Buffer-id discipline (identity is the (group, level, buf) key, so
    # two distinct buffers must never share it): callers hand in ids in
    # {-1, 0, 1..chunks}; each round mints merged ids at round * MINT —
    # strictly above every id from entry or earlier rounds — and the
    # final ladder is NORMALIZED to buf = 0 (at most one buffer per
    # level survives, which is exactly the termination condition).
    mint = 1 << 40
    rnd = 0
    while True:
        rnd += 1
        # assume_crowded skips the FIRST probe only: the probe on round
        # 1 would execute the entire (un-materialized) entry DAG once
        # just to answer yes — a merge caller already knows both ladders
        # populate overlapping levels. A wrongly-assumed round is
        # harmless: every buffer ranks as an unpaired single and passes
        # through unchanged.
        if assume_crowded:
            assume_crowded = False
            crowded = 1
        else:
            crowded = (
                rows.filter(F.col("level") >= 0)
                .select(*group_cols, "level", "buf")
                .distinct()
                .groupBy(*group_cols, "level")
                .agg(F.count(F.lit(1)).alias("nb"))
                .filter(F.col("nb") >= 2)
                .limit(1)
                .count()
            )
        if crowded == 0:
            return rows.select(
                *g,
                "level",
                F.when(F.col("level") >= 0, F.lit(0).cast("long"))
                .otherwise(F.col("buf").cast("long"))
                .alias("buf"),
                "slot",
                "value",
            )
        # number buffers within (group, level) -> pair_id, position
        bufs = (
            rows.filter(F.col("level") >= 0)
            .select(*group_cols, "level", "buf")
            .distinct()
            .withColumn(
                "brank",
                F.row_number().over(
                    Window.partitionBy(*group_cols, "level").orderBy("buf")
                )
                - 1,
            )
            .withColumn("pair", (F.col("brank") / 2).cast("int"))
            .withColumn("pos", F.col("brank") % 2)
            .withColumn(
                "nb",
                F.count(F.lit(1)).over(
                    Window.partitionBy(*group_cols, "level")
                ),
            )
        )
        tagged = rows.filter(F.col("level") >= 0).join(
            bufs, [*group_cols, "level", "buf"]
        )
        # an odd trailing buffer has no partner: passes through unchanged
        single = (
            (F.col("pos") == 0)
            & (F.col("brank") == F.col("nb") - 1)
            & (F.col("nb") % 2 == 1)
        )
        keep = tagged.filter(single).select(*_summary_cols(group_cols))
        # merge each pair: 2k values sorted, keep alternating positions;
        # the kept parity alternates by (level + pair) % 2 — the MRL
        # debiasing offset, made deterministic
        merged = (
            tagged.filter(~single)
            .withColumn(
                "mrn",
                F.row_number().over(
                    Window.partitionBy(*group_cols, "level", "pair").orderBy(
                        "value", "pos", "slot"
                    )
                )
                - 1,
            )
            .filter(
                F.col("mrn") % 2
                == F.pmod(F.col("level") + F.col("pair"), F.lit(2))
            )
            .select(
                *g,
                (F.col("level") + 1).alias("level"),
                (F.col("pair") + F.lit(rnd * mint)).alias("buf"),
                ((F.col("mrn") / 2).cast("int")).alias("slot"),
                "value",
            )
        )
        rows = (
            rows.filter(F.col("level") == CARRY_LEVEL)
            .select(*_summary_cols(group_cols))
            .unionByName(keep)
            .unionByName(merged)
            .localCheckpoint(eager=True)  # cut the growing lineage per round
        )


def _ingest(
    summary: DataFrame | None,
    values: DataFrame,
    k: int,
    group_cols: list[str],
    unkeyed: bool = False,
) -> DataFrame:
    """Add raw (group..., value) rows to a ladder summary (or build one
    from scratch when ``summary`` is None). Chunk carry+new values into
    weight-1 buffers of exactly k, leave the remainder as the new
    carry, then collapse.

    ``unkeyed``: the caller's group column is the module's constant
    ``__g`` marker — ONE logical group holding everything, where a
    per-group window would funnel the whole dataset through a single
    task. The global sorted rank is computed with
    ``operators/windows.py::range_partitioned_rank`` instead (range
    exchange + per-partition sorts + lazy offset join — the largest
    task holds ~N/partitions rows). Keyed summaries keep the per-group
    window: a group is a language/source/day slice sized for one
    task's spillable sort, the same contract as every grouped summary
    sibling (grouped bottom-k, keyed histogram); for a single giant
    group, build unkeyed."""
    g = [F.col(c) for c in group_cols]
    carry = (
        summary.filter(F.col("level") == CARRY_LEVEL)
        if summary is not None
        else None
    )
    ladder = (
        summary.filter(F.col("level") >= 0) if summary is not None else None
    )
    raw = values.select(*g, F.col("value").cast("double").alias("value")).filter(
        F.col("value").isNotNull()
    )
    if carry is not None:
        raw = raw.unionByName(carry.select(*group_cols, "value"))
    if unkeyed:
        from f1_data_engineering_machine_learning_spark.operators.windows import (
            range_partitioned_rank,
        )

        # vn rides out of the rank operator's own offsets plan
        # (total_col) — the previous separate raw.agg(count) was a
        # SECOND full scan of the input per unkeyed ingest, plus a
        # broadcast exchange, for a number the rank pass already had
        ranked = range_partitioned_rank(
            raw, ["value"], row_number_col="__vrn1", total_col="vn"
        ).select(
            *group_cols,
            "value",
            (F.col("__vrn1") - 1).cast("long").alias("vrn"),
            "vn",
        )
    else:
        ranked = raw.withColumn(
            "vrn",
            (
                F.row_number().over(
                    Window.partitionBy(*group_cols).orderBy("value")
                )
                - 1
            ).cast("long"),
        ).withColumn(
            "vn",
            F.count(F.lit(1))
            .over(Window.partitionBy(*group_cols))
            .cast("long"),
        )
    # CLOSED-FORM ladder construction — one pass, branch-free:
    # write n = k * m + r and decompose m in binary; the sorted order is
    # cut into one contiguous slice per set bit (descending level, slice
    # L spans k * 2^L values starting at k * ((m >> (L+1)) << (L+1))),
    # and slice L keeps the MIDDLE element of each 2^L-stride
    # (per-element rank displacement <= 2^(L-1), tighter than a
    # pairwise-collapse cascade would leave). The trailing r values are
    # the exact carry. The slice of chunk c = vrn div k < m is found
    # WITHOUT a per-level case chain: the highest bit where c differs
    # from m is exactly the slice level (c < m means m has 1 and c has 0
    # there, with equal bits above — so c lies in that bit's slice), so
    # L = floor(log2(m XOR c)). log2 is exact on powers of two and its
    # ~1-ulp error is orders below the distance to the next integer for
    # inputs < 2^52; divisions by 2^(L+1) only shift the exponent, so
    # the prefix arithmetic is error-free.
    m = F.floor(F.col("vn") / k).cast("long")
    c = F.floor(F.col("vrn") / k).cast("long")
    is_carry = F.col("vrn") >= m * k
    # greatest(..., 1): carry rows have c == m (xor 0); columnar eval
    # computes the otherwise-branch for them too, and log2 must never
    # see 0
    lvl = F.when(is_carry, F.lit(CARRY_LEVEL)).otherwise(
        F.floor(
            F.log2(
                F.greatest(
                    m.bitwiseXOR(c), F.lit(1).cast("long")
                ).cast("double")
            )
        ).cast("int")
    )
    placed = ranked.withColumn("level", lvl).withColumn(
        "idx",
        F.when(is_carry, F.col("vrn") - m * k).otherwise(
            F.col("vrn")
            - F.floor(
                m / F.pow(F.lit(2.0), (F.col("level") + 1).cast("double"))
            ).cast("long")
            * F.pow(F.lit(2.0), (F.col("level") + 1).cast("double")).cast(
                "long"
            )
            * k
        ),
    ).select(*g, "level", "idx", "value")
    # w = 1 for the carry too: pmod's divisor must never be 0 (ANSI
    # sessions raise on it even when the filter's first disjunct already
    # admitted the row — columnar eval computes both branches)
    w = (
        F.when(F.col("level") == CARRY_LEVEL, F.lit(1.0))
        .otherwise(F.pow(F.lit(2.0), F.col("level")))
        .cast("long")
    )
    off = (
        F.when(F.col("level") <= 0, F.lit(0.0))
        .otherwise(F.pow(F.lit(2.0), F.col("level") - 1))
        .cast("long")
    )
    rows = placed.filter(
        (F.col("level") == CARRY_LEVEL) | (F.pmod(F.col("idx"), w) == off)
    ).select(
        *g,
        "level",
        # one buffer per level by construction: id 1 — disjoint from the
        # normalized ladder id 0 and the merge tag -1 (see
        # _collapse_to_ladder id discipline)
        F.when(F.col("level") == CARRY_LEVEL, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("buf"),
        F.when(F.col("level") == CARRY_LEVEL, F.col("idx"))
        .otherwise((F.col("idx") / w).cast("long"))
        .cast("int")
        .alias("slot"),
        "value",
    )
    if ladder is None:
        # fresh build: the closed form already yields <= 1 buffer per
        # level — normalize ids and skip the collapse probe entirely
        return rows.select(
            *g,
            "level",
            F.when(F.col("level") >= 0, F.lit(0).cast("long"))
            .otherwise(F.col("buf").cast("long"))
            .alias("buf"),
            "slot",
            "value",
        )
    rows = rows.unionByName(
        ladder.select(
            *g,
            "level",
            F.col("buf").cast("long").alias("buf"),
            "slot",
            "value",
        )
    )
    return _collapse_to_ladder(rows, k, group_cols, assume_crowded=True)


def mrl_build(
    df: DataFrame,
    value_col: Column | str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build a ladder summary of ``value_col`` (per group if
    ``group_cols``): rows ``(group..., level, buf, slot, value)`` —
    ``k`` values per full buffer, each standing for ``2^level`` inputs;
    ``level = -1`` is the exact sub-k carry. NULL values are excluded
    (they have no rank)."""
    gc = list(group_cols or [])
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    vals = df.select(*gc, c.alias("value"))
    if not gc:
        vals = vals.withColumn("__g", F.lit(0))
        out = _ingest(None, vals, k, ["__g"], unkeyed=True)
        return out.drop("__g")
    return _ingest(None, vals, k, gc)


def mrl_merge(
    s1: DataFrame, s2: DataFrame, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Union two ladders into the ladder of the combined stream: carries
    concatenate (re-chunked into full buffers where they overflow k),
    same-level buffers collapse binary-counter style. Both summaries
    must share ``k`` and ``group_cols``."""
    gc = list(group_cols or [])
    tmp = not gc
    if tmp:
        gc = ["__g"]
        s1 = s1.withColumn("__g", F.lit(0))
        s2 = s2.withColumn("__g", F.lit(0))
    # carries merge as raw values; the two ladders union with disjoint
    # buf ids (summaries exit _collapse_to_ladder normalized to buf = 0,
    # so tagging s2's buffers -1 guarantees distinctness; new chunks
    # formed from the combined carries use ids >= 1)
    carries = (
        s1.filter(F.col("level") == CARRY_LEVEL)
        .select(*gc, "value")
        .unionByName(
            s2.filter(F.col("level") == CARRY_LEVEL).select(*gc, "value")
        )
    )
    base = (
        s1.filter(F.col("level") >= 0)
        .select(
            *gc,
            "level",
            F.col("buf").cast("long").alias("buf"),
            "slot",
            "value",
        )
        .unionByName(
            s2.filter(F.col("level") >= 0).select(
                *gc,
                "level",
                F.lit(-1).cast("long").alias("buf"),
                "slot",
                "value",
            )
        )
    )
    out = _ingest(base, carries, k, gc, unkeyed=tmp)
    return out.drop("__g") if tmp else out


def mrl_quantiles(
    summary: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Read quantile estimates off a ladder summary: one row per
    (group..., q) with ``est`` = the smallest stored value whose
    cumulative weight reaches ``q * W`` (W = total ingested weight) —
    a REAL ingested value, not an interpolation. One window pass over
    the summary plus a broadcast literal join of the q list."""
    gc = list(group_cols or [])
    tmp = not gc
    if tmp:
        gc = ["__g"]
        summary = summary.withColumn("__g", F.lit(0))
    w = F.when(
        F.col("level") == CARRY_LEVEL, F.lit(1.0)
    ).otherwise(F.pow(F.lit(2.0), F.col("level")))
    weighted = summary.select(*gc, "value", w.alias("w"))
    cum = weighted.withColumn(
        "cw",
        F.sum("w").over(
            Window.partitionBy(*gc)
            .orderBy("value", "w")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("W", F.sum("w").over(Window.partitionBy(*gc)))
    qdf = F.array(*[F.lit(float(q)) for q in quantiles])
    hits = (
        cum.withColumn("q", F.explode(qdf))
        .filter(F.col("cw") >= F.col("q") * F.col("W"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*gc, "q").orderBy("value", "cw")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(*gc, "q", F.col("value").alias("est"))
    )
    return hits.drop("__g") if tmp else hits


def mrl_state_bound(k: int, max_level: int) -> int:
    """Maximum stored values per group for a ladder with levels up to
    ``max_level``: one k-buffer per level plus the sub-k carry."""
    return k * (max_level + 2)


def mrl_rank_error_bound(k: int, max_level: int, total_weight: float) -> float:
    """The classical MRL guarantee for this ladder (see module
    docstring): rank error <= max_level * W / (2k) + k."""
    return max_level * total_weight / (2.0 * k) + k
