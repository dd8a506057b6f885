"""Sampling determinism + stratification contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.sampling import (
    hash_sample,
    mod_sample,
    stratified_sample,
)


def test_hash_sample_partition_invariant(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df.repartition(2), "k", 0.3).collect()}
    b = {r.k for r in hash_sample(df.repartition(17), "k", 0.3).collect()}
    assert a == b  # same rows regardless of layout
    assert 0.25 < len(a) / 10_000 < 0.35
    # a different salt decorrelates
    c = {r.k for r in hash_sample(df, "k", 0.3, salt="other").collect()}
    assert c != a


def test_mod_sample_slices_partition_domain(spark):
    df = spark.range(700).withColumnRenamed("id", "k")
    slices = [mod_sample(df, "k", 7, r).count() for r in range(7)]
    assert slices == [100] * 7


def test_stratified_sample_per_class(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(
        docs, "lang", {"en": 0.2}, key="doc_id", default_fraction=1.0
    )
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # non-en strata kept whole; en downsampled well below 1.0
    for lang, n in before.items():
        if lang != "en":
            assert after.get(lang) == n
    assert after.get("en", 0) < before["en"] * 0.6
