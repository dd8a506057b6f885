"""Training-data export: deterministic sharded writes + write-time audit.

The last mile of a 100 TB pipeline is writing shuffled, sharded,
size-bounded files that N training readers can stream independently.
Requirements: membership and order must be reproducible (a re-run or a
backfill must produce the same shard for the same row), shard files must
stay under the reader's memory budget, and the write must be audited
without paying a second full scan.

- ``write_training_shards``: Knuth multiplicative hashing (the same
  engine-portable integer arithmetic as catalog.corpus_shuffle_assignment,
  which value-oracles the assignment rule cross-engine) maps each row to a
  shard and pseudo-random sort key; ONE shuffle co-locates shards,
  ``sortWithinPartitions`` fixes the within-shard order, ``partitionBy``
  lays out ``shard=K/`` directories, ``maxRecordsPerFile`` bounds file
  size. No global sort, no driver state — the plan is identical at any
  scale.
- ``write_with_audit`` (io-level): Spark ``Observation`` metrics ride the
  write job itself — row counts and null-key counts come back to the
  driver from the SAME pass that wrote the data (an extra ``count()``
  would re-scan 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["knuth_shuffle_key", "write_training_shards", "write_with_audit"]

#: Knuth's multiplicative constant (2654435761 = 2^32 * phi) — pure
#: integer arithmetic, reproducible in any engine, unlike xxhash64/rand
_KNUTH_MULT = 2654435761
_KNUTH_ADD = 40503
_MOD = 4294967296  # 2^32


def knuth_shuffle_key(key: Column | str, seed_add: int = _KNUTH_ADD) -> Column:
    """Deterministic pseudo-random BIGINT in [0, 2^32) from an integer
    key; range-reduce first so the multiply never overflows BIGINT.
    Changing ``seed_add`` re-seeds the epoch ordering."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        ((c % F.lit(_MOD)) * F.lit(_KNUTH_MULT) + F.lit(seed_add)) % F.lit(_MOD)
    ).cast("bigint")


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 64,
    seed_add: int = _KNUTH_ADD,
    max_records_per_file: int = 0,
) -> None:
    """Write ``df`` as ``shard=K/`` parquet directories in deterministic
    pseudo-random order: one shuffle on the shard id, per-shard order
    fixed by (hkey, key), files capped at ``max_records_per_file`` rows
    (0 = uncapped). Row -> shard membership depends only on row content,
    so re-runs and late backfills land identically."""
    hkey = knuth_shuffle_key(key, seed_add)
    sharded = df.withColumn("__hkey", hkey).withColumn(
        "shard", (F.col("__hkey") % F.lit(n_shards)).cast("bigint")
    )
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__hkey", key)
        .drop("__hkey")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_with_audit(
    df: DataFrame,
    path: str,
    key_col: str | None = None,
    fmt: str = "parquet",
) -> dict:
    """Overwrite ``path`` and return audit metrics computed DURING the
    write job (Spark Observation API — no second scan): ``n_rows`` and,
    when ``key_col`` is given, ``null_keys``. The caller gates promotion
    on the returned dict (e.g. refuse to swap in an empty rewrite — the
    check ``dataops/governance.py`` performs with an extra job)."""
    from pyspark.sql import Observation

    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        metrics.append(
            F.sum(F.col(key_col).isNull().cast("long")).alias("null_keys")
        )
    df.observe(obs, *metrics).write.mode("overwrite").format(fmt).save(path)
    return dict(obs.get)
