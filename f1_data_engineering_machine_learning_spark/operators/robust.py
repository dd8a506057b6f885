"""Robust statistics for feature preparation and quality monitoring.

Winsorization (percentile clipping) and MAD-based anomaly flags — the
outlier-immune twins of stddev-based clipping/z-scores, which a single
corrupt sensor value can drag arbitrarily. Both follow the same
scale shape as the MAD aggregate (catalog.lineitem_quantity_mad): one
shuffle per percentile pass on the group key, the tiny per-group stats
frame broadcast back, per-row arithmetic JVM-side. Exactness contract:
feed integral (or pre-quantized) value columns so the cross-engine
percentile interpolation stays on exact binary fractions — the catalog
rule that keeps oracles bitwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winsorize", "mad_anomalies", "zscore_normalize"]


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower, upper] exact
    percentiles (appended as ``{value_col}_wins`` by default, plus the
    ``__p_lo``/``__p_hi`` bounds for auditability)."""
    out_col = out_col or f"{value_col}_wins"
    group_cols = list(group_cols)
    # one array-fraction percentile per group: both bounds read off a
    # single value->count map instead of building the map twice
    # (bitwise-same values; dataops/quality.py::exact_percentiles has
    # the measured multi-fraction numbers)
    bounds = (
        df.groupBy(*group_cols)
        .agg(
            F.percentile(
                value_col, F.array(F.lit(float(lower)), F.lit(float(upper)))
            ).alias("__p")
        )
        .select(
            *group_cols,
            F.col("__p")[0].alias("__p_lo"),
            F.col("__p")[1].alias("__p_hi"),
        )
    )
    j = df.join(F.broadcast(bounds), group_cols)
    clipped = F.least(F.greatest(F.col(value_col), F.col("__p_lo")), F.col("__p_hi"))
    return j.withColumn(out_col, clipped)


def mad_anomalies(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Flag rows where ``|value - group_median| > k * group_MAD`` —
    the robust outlier rule (a stddev rule would let one huge outlier
    inflate its own threshold). Appends ``__med``, ``__mad``,
    ``is_anomaly``. Groups with MAD == 0 flag any deviation (strictly
    greater keeps the all-equal group clean). Two percentile passes +
    one broadcast-back, same as the MAD aggregate."""
    group_cols = list(group_cols)
    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    j1 = df.join(F.broadcast(med), group_cols)
    mad = j1.groupBy(*group_cols).agg(
        F.percentile(F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)).alias(
            "__mad"
        )
    )
    j2 = j1.join(F.broadcast(mad), group_cols)
    return j2.withColumn(
        "is_anomaly",
        F.abs(F.col(value_col) - F.col("__med")) > F.lit(k) * F.col("__mad"),
    )


def zscore_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    out_col: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """Per-group z-score standardization ``(x - mean) / std`` — the
    feature-engineering staple (its robust twin is median/MAD in
    :func:`mad_anomalies`; use that when outliers poison the moments).
    Appends ``__mean``, ``__std`` (population, i.e. divide by n) and the
    normalized column (``{value_col}_z`` by default; NULL when the group
    is constant, std == 0).

    Determinism contract (the catalog's cross-engine rule): the two
    sufficient statistics are EXACT decimal sums — sum(x) at the input's
    declared ``scale`` and sum(x^2) at ``2 * scale`` (x held as
    decimal(18, scale): its square stays inside every engine's 38-digit
    decimal cap — a (30,s) square would overflow DuckDB) — so partial
    aggregation is order-independent and bit-reproducible; every
    subsequent op (mean = S1/n, var = S2/n - mean^2, sqrt, the per-row
    z) is a single-rounded IEEE double op any engine replays bitwise.
    One shuffle on the group key (map-side combinable), tiny stats frame
    broadcast back — same scale shape as :func:`winsorize`."""
    out_col = out_col or f"{value_col}_z"
    group_cols = list(group_cols)
    x = F.col(value_col).cast(f"decimal(18,{scale})")
    stats = df.groupBy(*group_cols).agg(
        F.sum(x).cast("double").alias("__s1"),
        F.sum(x * x).cast("double").alias("__s2"),
        F.count(value_col).cast("double").alias("__n"),
    )
    stats = stats.select(
        *group_cols,
        (F.col("__s1") / F.col("__n")).alias("__mean"),
        # greatest(..., 0.0): catastrophic cancellation on a near-constant
        # group can land the variance a few ulps BELOW zero, and sqrt(-eps)
        # is NaN — which Spark's NaN-is-largest comparison semantics would
        # let straight through a `std > 0` guard as a NaN z-score. Clamping
        # is exact for every non-negative variance (greatest(x, 0) == x).
        F.sqrt(
            F.greatest(
                F.col("__s2") / F.col("__n")
                - (F.col("__s1") / F.col("__n")) * (F.col("__s1") / F.col("__n")),
                F.lit(0.0),
            )
        ).alias("__std"),
    )
    j = df.join(F.broadcast(stats), group_cols)
    z = F.when(
        F.col("__std") > 0,
        (F.col(value_col).cast("double") - F.col("__mean")) / F.col("__std"),
    )
    return j.withColumn(out_col, z)
