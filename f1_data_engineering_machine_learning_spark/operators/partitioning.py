"""Partition-layout hygiene for fan-out operators.

A tokenize/explode stage multiplies rows ~100x, but Spark parallelism is
fixed at the SCAN: a small input (one parquet row group, a compacted
file) arrives as 1-2 partitions and the whole explode+hash pipeline runs
on one task while the rest of the cluster idles — observed as a 30 s
single-task stage on a 500-row corpus. AQE cannot help (it only re-plans
*after* a shuffle; the map side of the first shuffle inherits the scan
layout).

``ensure_min_parallelism`` widens the layout ONLY when it is narrower
than the session's parallelism. At real scale (a 100 TB corpus scans as
tens of thousands of splits) the check short-circuits and no shuffle is
added; on small inputs the one narrow-input shuffle it inserts is cheap
by construction (the input is small — that is why it triggered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``defaultParallelism``) iff its current layout is narrower. Results are
    repartition-invariant; only task parallelism changes."""
    try:
        sc = df.sparkSession.sparkContext
        target = min_partitions or sc.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext/rdd — leave layout alone
        return df
    if current < target:
        return df.repartition(target)
    return df
