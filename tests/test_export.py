"""Training-shard export + write-time audit (plans/export.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.plans.export import (
    knuth_shuffle_key,
    write_training_shards,
    write_with_audit,
)

TD = "/root/testdata/sf0.001"


def test_shard_layout_and_determinism(spark, tmp_path):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, key="doc_id", n_shards=8)
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{out}/shard=*"))
    assert len(dirs) == 8

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # membership is content-determined: shard == knuth(doc_id) % 8
    expect = docs.select(
        "doc_id", (knuth_shuffle_key("doc_id") % 8).alias("shard")
    )
    got = {
        (r["doc_id"], r["shard"])
        for r in back.select(
            "doc_id", F.col("shard").cast("bigint").alias("shard")
        ).collect()
    }
    want = {(r["doc_id"], r["shard"]) for r in expect.collect()}
    assert got == want

    # re-run (different partitioning of the input) -> identical membership
    write_training_shards(docs.repartition(13), out, key="doc_id", n_shards=8)
    again = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(out)
        .select("doc_id", F.col("shard").cast("bigint").alias("shard"))
        .collect()
    }
    assert again == got


def test_max_records_per_file_bounds_files(spark, tmp_path):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    out = str(tmp_path / "capped")
    write_training_shards(
        docs, out, key="doc_id", n_shards=4, max_records_per_file=5
    )
    for f in glob.glob(f"{out}/shard=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 5


def test_write_with_audit_metrics_without_second_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "k long, v string"
    )
    out = str(tmp_path / "audited")
    metrics = write_with_audit(df, out, key_col="v")
    assert metrics == {"n_rows": 4, "null_keys": 2}
    assert spark.read.parquet(out).count() == 4
