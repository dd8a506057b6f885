"""Data-governance operators: compliance deletion (right to be
forgotten) with an auditable trail.

Pairs with the other governance surfaces: ``dataops/text.py::redact_pii``
(content-level remediation) and the ``kanonymity_customer_segments``
release screen (catalog). This module is the record-level remediation: a
deletion request arrives as a set of subject keys, and every table keyed
by that subject must drop those rows — verifiably, and without rewriting
unaffected partitions more than the storage layer requires.

Scale shape: the subject set is small (a deletion request batch);
``forget_keys`` is one broadcast LEFT-ANTI join — the fact table never
shuffles. The audit counts come from one extra aggregation over the same
scan. On Delta the rewrite would be ``DELETE WHERE`` (file-level
rewrite); the parquet fallback here rewrites via dynamic partition
overwrite, consistent with io.py's slice-replace story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def forget_keys(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
) -> DataFrame:
    """Rows of ``df`` with every row whose ``key_col`` appears in
    ``keys`` removed — one broadcast left-anti join, fact side never
    shuffled. ``keys`` must have a column named ``key_col``."""
    if key_col not in df.columns or key_col not in keys.columns:
        raise ValueError(f"key column {key_col!r} must exist on both sides")
    return df.join(F.broadcast(keys.select(key_col)), key_col, "left_anti")


def forget_audit(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
) -> DataFrame:
    """One-row audit frame for a deletion request: rows scanned, rows
    dropped, rows kept, and the number of DISTINCT requested subjects
    actually present (requests routinely name subjects a table never
    held — the audit must distinguish "deleted" from "nothing to
    delete")."""
    marked = df.join(
        F.broadcast(keys.select(key_col).withColumn("__req", F.lit(1))),
        key_col,
        "left",
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_scanned"),
        F.count("__req").alias("n_dropped"),
        (F.count(F.lit(1)) - F.count("__req")).alias("n_kept"),
        F.count_distinct(
            F.when(F.col("__req").isNotNull(), F.col(key_col))
        ).alias("n_subjects_found"),
    )


def forget_in_table(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str,
) -> dict[str, int]:
    """Apply a deletion request to a stored parquet table IN PLACE and
    return the audit counts. The read-modify-overwrite is staged through
    a local checkpoint of the filtered frame so the overwrite never
    scans the files it is replacing (the classic self-overwrite trap)."""
    df = spark.read.parquet(path)
    audit = {k: v for k, v in zip(
        ("n_scanned", "n_dropped", "n_kept", "n_subjects_found"),
        forget_audit(df, keys, key_col).first(),
    )}
    kept = forget_keys(df, keys, key_col).localCheckpoint(eager=True)
    kept.write.mode("overwrite").parquet(path)
    return audit
