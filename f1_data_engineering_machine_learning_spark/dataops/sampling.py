"""Reproducible sampling for training-data pipelines.

Sampling at 100 TB must be DETERMINISTIC and RESUMABLE: a re-run (or a
late-arriving partition) must make the same keep/drop decision per row.
Spark's ``df.sample`` is seeded per-partition — repartitioning changes the
sample. The operators here decide from row CONTENT, not partition layout:

- ``hash_sample``   : keep rows where ``xxhash64(key) mod N < k`` — exact
  fraction k/N in expectation, same rows on any cluster shape, and the
  decision is recomputable for audit.
- ``mod_sample``    : ``key mod N == r`` for integer keys — the simplest
  reproducible slice (used for data splits that external systems must be
  able to reproduce without xxhash).
- ``stratified_sample`` : per-class fractions via content hashing — e.g.
  downsample the dominant language while keeping rare classes whole.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column | str, n: int, salt: str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(n))


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    salt: str = "sample",
    resolution: int = 10_000,
) -> DataFrame:
    """Content-hash sampling: keeps ~fraction of rows, decision stable per
    key across runs/partitionings. ``salt`` decorrelates independent
    samples over the same keys."""
    keep_below = int(round(fraction * resolution))
    return df.filter(_bucket(key, resolution, salt) < keep_below)


def mod_sample(df: DataFrame, key: str, n: int, remainder: int = 0) -> DataFrame:
    """Modulo slice over an integer key — externally reproducible without
    any hash implementation (the slice contract: key % n == r)."""
    return df.filter(F.pmod(F.col(key), F.lit(n)) == remainder)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key: Column | str,
    default_fraction: float = 1.0,
    salt: str = "strata",
    resolution: int = 10_000,
) -> DataFrame:
    """Per-stratum content-hash sampling: each class keeps its own
    fraction (unlisted classes keep ``default_fraction``). Deterministic
    twin of ``df.sampleBy`` (whose kept set depends on partition layout)."""
    frac = F.lit(default_fraction)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    keep_below = (frac * resolution).cast("long")
    return df.filter(_bucket(key, resolution, salt) < keep_below)
