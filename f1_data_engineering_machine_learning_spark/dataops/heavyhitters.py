"""Exact phi-heavy-hitters in two bounded-memory passes (Misra-Gries).

The problem at 100 TB: "which tokens make up more than phi of the corpus?"
A full ``groupBy(token).count()`` shuffles the ENTIRE token multiset —
trillions of rows — to answer a question whose output is at most ``1/phi``
rows. The sketch route bounds that:

Pass 1 (candidates): each partition runs a Misra-Gries summary with
``capacity = ceil(1/phi)`` counters — O(capacity) memory regardless of
partition size. Pigeonhole guarantee: any item with global frequency
``> phi * n`` has frequency ``> phi * n_p`` in at least one partition, and
an MG summary of capacity ``ceil(1/phi)`` retains every item with local
share above ``phi`` — so the union of per-partition candidates is a
SUPERSET of the true heavy hitters (with false positives, never false
negatives). Only the tiny candidate sets cross the network.

Pass 2 (exact refine): re-scan with the candidate set as a broadcast hash
semi-filter (map-side, no shuffle of non-candidates), exact-count the
survivors, and keep those with ``count > phi * n``. The result is EXACT —
bit-identical to the full groupBy — which is what lets a plain SQL
``HAVING count > phi * n`` serve as the oracle.

Two scans of the source vs one full-multiset shuffle: at scale the scan is
cheap (columnar, pushed-down projection of one column) and the shuffle is
the bottleneck, so this trades the expensive resource for the cheap one.

The MG loop is per-partition sequential state — the sanctioned
``mapInPandas`` tier (Arrow-batched, bounded dict, no Python in the
refine pass).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["misra_gries_candidates", "heavy_hitters", "grouped_heavy_hitters"]


def _mg_merge(counters: dict, batch_counts: dict, capacity: int) -> dict:
    """Merge exact batch counts into an MG summary (Agarwal et al.'s
    mergeable-summaries rule): add, then if over capacity subtract the
    (capacity+1)-th largest count from everything and drop non-positives.
    Total decrement stays <= n_p/(capacity+1), the MG error bound."""
    for k, c in batch_counts.items():
        counters[k] = counters.get(k, 0) + int(c)
    if len(counters) > capacity:
        offset = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: c - offset for k, c in counters.items() if c > offset}
    return counters


def misra_gries_candidates(
    items: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: ``(item, mg_count)``.

    ``mg_count`` underestimates the partition-local count by at most
    ``n_p / (capacity + 1)``; items absent from every summary are
    guaranteed to have local share ``< 1/(capacity+1)`` everywhere.
    Each Arrow batch is counted exactly with vectorized ``value_counts``
    (C speed, no per-row Python) and folded into the bounded summary —
    the summary dict, not the batch, is the only sequential state.
    """

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            counters = _mg_merge(counters, vc.to_dict(), capacity)
        yield pd.DataFrame(
            {col: list(counters.keys()), "mg_count": list(counters.values())}
        )

    src = items.select(col).filter(F.col(col).isNotNull())
    schema_type = dict(src.dtypes)[col]
    return src.mapInPandas(_summarize, schema=f"{col} {schema_type}, mg_count long")


def heavy_hitters(
    items: DataFrame, col: str, phi: float, count_expr: Column | None = None
) -> DataFrame:
    """All items with frequency ``> phi * n`` and their EXACT counts.

    Strictly greater: the Misra-Gries superset guarantee covers items
    with share strictly above ``phi`` (an item at exactly ``phi * n``
    can evade every partition summary), so the refine filter is ``>``
    on both the operator and any oracle. Returns
    ``(item, item_count, total_count)`` — exact, two passes, bounded
    executor memory; candidate state per task is ``ceil(1/phi)``
    counters.
    """
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    capacity = math.ceil(1.0 / phi)
    src = items.select(col).filter(F.col(col).isNotNull())
    candidates = (
        misra_gries_candidates(src, col, capacity).select(col).distinct()
    )
    total = src.agg(F.count(F.lit(1)).alias("total_count"))
    exact = (
        src.join(F.broadcast(candidates), col)  # map-side hash semi-filter
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("item_count"))
    )
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("item_count") > F.lit(phi) * F.col("total_count"))
        .select(col, "item_count", "total_count")
    )


def grouped_heavy_hitters(
    items: DataFrame,
    group_col: str,
    col: str,
    phi: float,
) -> DataFrame:
    """Per-GROUP exact phi-heavy-hitters: items with frequency
    ``> phi * group_total`` within each group — "the tokens above 0.5%
    of EACH language's sub-corpus", where a global pass would only
    surface the dominant language's vocabulary.

    Same two-pass shape as :func:`heavy_hitters`, with the Misra-Gries
    state keyed per group inside each partition: memory per task is
    ``|groups seen| x ceil(1/phi)`` counters, so this targets the
    FEW-GROUPS regime (languages, domains, sources — the cases that
    matter; per-group capacity is the pigeonhole that keeps the
    candidate union a SUPERSET of every group's true heavy hitters,
    false positives only). Refine joins the broadcast (group, item)
    candidate set map-side and exact-counts survivors against exact
    group totals — result bit-identical to the full per-group groupBy,
    which is what the SQL oracle replays. Strictly ``>`` on both sides,
    same evasion argument as the global operator."""
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    capacity = math.ceil(1.0 / phi)
    src = items.select(group_col, col).filter(
        F.col(col).isNotNull() & F.col(group_col).isNotNull()
    )

    g_name, i_name = group_col, col

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(g_name, sort=False):
                states[g] = _mg_merge(
                    states.get(g, {}),
                    sub[i_name].value_counts().to_dict(),
                    capacity,
                )
        rows = [
            (g, item, int(c))
            for g, counters in states.items()
            for item, c in counters.items()
        ]
        yield pd.DataFrame(rows, columns=[g_name, i_name, "mg_count"])

    schema_i = dict(src.dtypes)[i_name]
    schema_g = dict(src.dtypes)[g_name]
    candidates = (
        src.mapInPandas(
            _summarize, f"{g_name} {schema_g}, {i_name} {schema_i}, mg_count long"
        )
        .select(g_name, i_name)
        .distinct()
    )
    totals = src.groupBy(g_name).agg(F.count(F.lit(1)).alias("group_total"))
    exact = (
        src.join(F.broadcast(candidates), [g_name, i_name])
        .groupBy(g_name, i_name)
        .agg(F.count(F.lit(1)).alias("item_count"))
    )
    return (
        exact.join(F.broadcast(totals), g_name)
        .filter(F.col("item_count") > F.lit(phi) * F.col("group_total"))
        .select(g_name, i_name, "item_count", "group_total")
    )


# -- count-min sketch -------------------------------------------------------

#: portable 60-bit item hash: first 15 hex chars of md5, the SimHash trick
#: (dataops/dedup.py) — any engine re-derives it from the same bytes
def _portable_h60(col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("bigint")


def _cms_bucket(h: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket: one LCG round over (h + odd*row), mod width —
    pure non-overflowing integer arithmetic every engine replays (the
    contrastive-sampling mix family)."""
    return (
        ((h % 999999937 + 389 * row) * 2654435761 + 97531) % 4294967296
    ) % width


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch of an item stream: ``depth x width`` exact
    BIGINT cells — ``(row, bucket, cnt)``. The sketch is MERGEABLE
    (cells add), the property that makes frequency estimation shippable
    across partitions/days/streams: partials combine map-side, the
    shuffle carries at most depth*width rows per partition, and daily
    sketches union+re-aggregate into weekly ones exactly like the
    bitmap/HLL rollups. Deterministic by construction (portable md5-60
    item hash + LCG row mixes), so a second engine rebuilds the
    identical sketch — unlike library sketches, this one is fully
    value-oracled.

    Error contract (CM standard): estimate >= true count always
    (inserts-only), and P[over-estimate > eps*N] <= delta with
    eps = e/width, delta = e^-depth.

    ``key_cols``: one independent sketch PER KEY GROUP (per language,
    per day) in one aggregation — the sketch twin of
    ``grouped_heavy_hitters`` for when per-group vocabularies are
    unbounded; rows become (keys..., row, bucket, cnt), still mergeable
    within each key group, state = groups x depth x width."""
    h = _portable_h60(F.col(item_col))
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_bucket(h, r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("__rb")
    keys = list(key_cols or [])
    return (
        df.select(*keys, rows)
        .groupBy(
            *keys,
            F.col("__rb.row").alias("row"),
            F.col("__rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Point estimates for ``items`` from a built sketch: min over the
    item's depth cells (absent cell = 0). The probe set is the small
    side — it explodes to depth rows per item and joins the sketch on
    (row, bucket); the sketch itself (<= depth*width rows) broadcasts."""
    h = _portable_h60(F.col(item_col))
    keys = list(key_cols or [])
    probes = items.select(
        *keys,
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(h, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(
        *keys,
        item_col,
        F.col("__rb.row").alias("row"),
        F.col("__rb.bucket").alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), [*keys, "row", "bucket"], "left")
    return joined.groupBy(*keys, item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_estimate")
    )


# -- bloom filter -----------------------------------------------------------


def bloom_build(
    df: DataFrame,
    item_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Deterministic Bloom filter over an item set: the SET-membership
    sibling of the count-min sketch above (same portable md5-60 hash +
    LCG row mixes, so a second engine rebuilds identical bits). Returns
    the SET BITS as rows ``(bit bigint)`` — the sparse representation
    that stays mergeable (union of set-bit rows = filter of the union;
    distinct on insert) and shuffles at most ``n_hashes`` small ints
    per item. Standard contract: probes of inserted items are ALWAYS
    positive; non-members false-positive at ~(1-e^(-kn/m))^k."""
    h = _portable_h60(F.col(item_col))
    bits = F.explode(
        F.array(*[_cms_bucket(h, r, n_bits) for r in range(n_hashes)])
    ).alias("bit")
    return df.select(bits).distinct()


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership probe: an item is (maybe-)present iff ALL its bits are
    set — counted via a left join of the item's bit rows against the
    set-bit table (broadcast — a Bloom filter is small by design).
    Returns ``(item_col, maybe_present boolean)``."""
    h = _portable_h60(F.col(item_col))
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(*[_cms_bucket(h, r, n_bits) for r in range(n_hashes)])
        ).alias("bit"),
    )
    joined = probes.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left"
    )
    return joined.groupBy(item_col).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__set"), F.lit(0))))
        .alias("maybe_present")
    )
