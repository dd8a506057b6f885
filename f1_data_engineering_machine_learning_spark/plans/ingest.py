"""Incremental ingestor: idempotent per-slice materialization.

Reproduces the reference's ``IngestorFS`` contract
(/root/reference/scripts/spark_ops.py:99-207): for each reference date,
build the snapshot frame and overwrite exactly that date's slice of the
target table (Delta ``replaceWhere "dtRef = '{date}'"`` partitioned by
``dtYear``; parquet fallback uses dynamic partition overwrite with
``dtRef`` as a partition column, which gives the same replace-only-what-
you-wrote idempotency). Re-running any date is safe; a failed date reruns
without touching the others.

At scale: partitioning by (dtYear, dtRef) keeps partition pruning effective
for both year-range reads and slice replacement, and slices are independent
writes — a 1000-executor cluster can materialize many dates concurrently.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.io import vacuum, write_partition_slice
from f1_data_engineering_machine_learning_spark.session import delta_enabled


class IncrementalIngestor:
    """Per-date incremental materializer.

    Parameters
    ----------
    builder : fn(date: str) -> DataFrame — the snapshot frame for one date
              (must contain ``dtRef``; ``dtYear`` is derived if absent).
              Mirrors the templated-SQL ``load(date)`` of the reference
              (/root/reference/scripts/spark_ops.py:135-151), as a
              DataFrame-builder function instead of string formatting.
    path    : target table path.
    """

    def __init__(self, builder: Callable[[str], DataFrame], path: str):
        self.builder = builder
        self.path = path

    def load(self, date: str) -> DataFrame:
        df = self.builder(date)
        if "dtYear" not in df.columns:
            df = df.withColumn("dtYear", F.year(F.col("dtRef").cast("date")))
        return df

    def save(self, df: DataFrame, date: str) -> None:
        """Overwrite exactly one date slice
        (/root/reference/scripts/spark_ops.py:153-175)."""
        spark = df.sparkSession
        if delta_enabled(spark):  # pragma: no cover - optional dependency
            write_partition_slice(
                df, self.path, ["dtYear"], replace_where=f"dtRef = '{date}'"
            )
        else:
            # parquet: dtRef itself is a partition column so dynamic
            # overwrite replaces only this slice
            write_partition_slice(df, self.path, ["dtYear", "dtRef"])

    def exec(self, dates: Sequence[str], compact: bool = False) -> None:
        """The per-date loop (/root/reference/scripts/spark_ops.py:177-194)."""
        for date in dates:
            self.save(self.load(str(date)), str(date))
        if compact:
            self.compact()

    def compact(self) -> None:
        """Small-file compaction + vacuum
        (/root/reference/scripts/spark_ops.py:193-207). The reference
        coalesces the whole table to 1 file — fine at its scale, a
        single-task bottleneck at ours; here files merge per partition
        (``repartition`` on the partition columns), written to a temp
        sibling and swapped in (on Delta this would be ``OPTIMIZE``)."""
        import os
        import shutil

        spark = SparkSession.getActiveSession()
        if delta_enabled(spark):  # pragma: no cover - optional dependency
            vacuum(spark, self.path)
            return
        tmp = self.path + ".__compact_tmp"
        (
            spark.read.parquet(self.path)
            .repartition("dtYear", "dtRef")
            .write.mode("overwrite")
            .partitionBy("dtYear", "dtRef")
            .parquet(tmp)
        )
        shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def read(self) -> DataFrame:
        spark = SparkSession.getActiveSession()
        if delta_enabled(spark):  # pragma: no cover
            return spark.read.format("delta").load(self.path)
        return spark.read.parquet(self.path)


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
) -> None:
    """MERGE-style upsert: rows matching ``keys`` are replaced, others
    appended. Delta path uses a real MERGE; parquet path rewrites via
    anti-join + union through a temp sibling (atomic swap) — correct, but
    a full-table rewrite, which is why the partitioned slice overwrite
    (IncrementalIngestor) is the preferred incremental primitive when
    updates align with a partition column. Keys must be unique within
    ``updates`` (last-writer ambiguity otherwise — caller's contract)."""
    import os
    import shutil

    keys = list(keys)
    if delta_enabled(spark):  # pragma: no cover - optional dependency
        from delta.tables import DeltaTable  # type: ignore

        target = DeltaTable.forPath(spark, path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            target.alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    if not os.path.exists(path):
        updates.write.parquet(path)
        return
    current = spark.read.parquet(path)
    kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = kept.unionByName(updates)
    tmp = path + ".__upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
