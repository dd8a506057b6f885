"""Skew utilities: salt-invariance of results + exchange-free bucketed joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.skew import (
    salted_agg,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "s": (F.sum("v"), "sum"),
                "n": (F.count("v"), "count"),
                "mx": (F.max("v"), "max"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_bad_combiner(skewed):
    with pytest.raises(ValueError, match="unknown combiner"):
        salted_agg(skewed, ["k"], {"s": (F.sum("v"), "avg")})
    with pytest.raises(TypeError, match="phase1_expr, combiner"):
        salted_agg(skewed, ["k"], {"s": F.sum("v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], ["k", "label"]
    )
    plain = sorted(
        (r.k, r.v, r.label) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.label)
        for r in salted_join(skewed, dim, ["k"], n_salts=8).collect()
    )
    assert salted == plain


def test_bucketed_join_no_exchange(spark, skewed):
    from f1_data_engineering_machine_learning_spark.operators.skew import (
        bucketed_join_is_shuffle_free,
    )

    left = skewed.groupBy("k").agg(F.sum("v").alias("s"))
    right = skewed.groupBy("k").agg(F.count("v").alias("n"))
    try:
        write_bucketed(left, "bl", ["k"], n_buckets=8)
        write_bucketed(right, "br", ["k"], n_buckets=8)
        assert bucketed_join_is_shuffle_free(spark, "bl", "br", ["k"])
        # sanity: the join is still correct
        assert spark.table("bl").join(spark.table("br"), "k").count() == 51
    finally:
        spark.sql("DROP TABLE IF EXISTS bl")
        spark.sql("DROP TABLE IF EXISTS br")
