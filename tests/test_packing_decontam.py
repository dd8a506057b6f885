"""Sequence packing, benchmark decontamination, repetition profiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.decontam import (
    benchmark_contamination,
)
from f1_data_engineering_machine_learning_spark.dataops.packing import (
    bin_fill_stats,
    pack_by_token_budget,
)
from f1_data_engineering_machine_learning_spark.dataops.text import (
    repetition_profile,
    token_count,
)


def test_packing_bins_respect_offsets(spark):
    # 6 docs of 100 tokens each, 1 shard, budget 250: starts at 0,100,200,
    # 300,400,500 -> bins 0,0,0,1,1,2
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(6)], ["doc_id", "text"]
    )
    packed = pack_by_token_budget(
        docs, "doc_id", token_count("text"), budget=250, n_shards=1
    )
    got = {r.doc_id: r.bin for r in packed.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}
    fill = {(r.shard, r.bin): r.n_docs for r in bin_fill_stats(packed, 250).collect()}
    assert fill == {(0, 0): 3, (0, 1): 2, (0, 2): 1}


def test_packing_sharding_is_deterministic_and_partitioned(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(100)],
        ["doc_id", "text"],
    )
    a = pack_by_token_budget(docs, "doc_id", token_count("text"), 64, n_shards=4)
    b = pack_by_token_budget(docs, "doc_id", token_count("text"), 64, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select("shard").distinct().count() == 4
    # every doc appears exactly once
    assert a.count() == 100 and a.select("doc_id").distinct().count() == 100
    with pytest.raises(ValueError, match="budget"):
        pack_by_token_budget(docs, "doc_id", token_count("text"), 0)


def test_contamination_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark question about spark adaptive execution plans")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # contains a full benchmark 5-gram -> contaminated
            (1, "leaked copy: the secret benchmark question about spark execution"),
            # no 5-token overlap
            (2, "a completely unrelated document discussing parquet row groups"),
        ],
        ["doc_id", "text"],
    )
    for hashed in (False, True):
        got = {
            r.doc_id: (r.n_shared, r.contamination)
            for r in benchmark_contamination(
                corpus, bench, "doc_id", "text", k=5, hash_shingles=hashed
            ).collect()
        }
        assert got[1][0] > 0 and got[1][1] > 0.0
        assert got[2] == (0, 0.0)  # zero-overlap doc present with 0


def test_repetition_profile_detects_loops(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # one shingle repeated
            (2, "eight totally distinct words appear exactly once here"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_profile(docs, "doc_id", "text").collect()}
    assert got[1].distinct_shingles == 1 and got[1].rep_ratio == 1.0
    assert got[2].top_shingle_count == 1
    assert got[2].rep_ratio == pytest.approx(1 / got[2].total_shingles)
