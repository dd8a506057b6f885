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


def test_mixture_sample_hits_target_shares(spark):
    import pytest
    from f1_data_engineering_machine_learning_spark.dataops.sampling import (
        mixture_sample,
    )

    # en has 4x the tokens of es: target a 50/50 token mix -> en keeps ~25%
    rows = [(i, "en", 100) for i in range(400)] + [
        (1000 + i, "es", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
    sampled, fractions = mixture_sample(
        df, "lang", F.col("n_tokens"), {"en": 0.5, "es": 0.5}, key="doc_id"
    )
    assert fractions["es"] == 1.0
    assert fractions["en"] == pytest.approx(0.25)
    got = {
        r.lang: r.t
        for r in sampled.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    total = sum(got.values())
    assert got["en"] / total == pytest.approx(0.5, abs=0.02)
    # determinism: same rows on re-run
    again, _ = mixture_sample(
        df, "lang", F.col("n_tokens"), {"en": 0.5, "es": 0.5}, key="doc_id"
    )
    assert sorted(r.doc_id for r in sampled.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    with pytest.raises(ValueError, match="absent"):
        mixture_sample(df, "lang", F.col("n_tokens"), {"zz": 1.0}, key="doc_id")
