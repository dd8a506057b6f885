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


def test_chunk_by_tokens_windows_and_tail(spark):
    from f1_data_engineering_machine_learning_spark.dataops.packing import (
        chunk_by_tokens,
    )

    # 11 tokens, chunk 5, stride 3 (overlap 2): starts 1,4,7,9 -> bound
    # greatest(1, 11-2)=9, so 1,4,7 then tail short chunk at 9? starts are
    # 1,4,7 (arithmetic up to 9 inclusive -> 1,4,7) ... sequence hits 9? no:
    # 1,4,7,10>9 stops at 7. Tail tokens 8-11 covered by chunk at 7 (5 toks
    # 7-11). Verify coverage + overlap precisely.
    doc = " ".join(f"t{i}" for i in range(1, 12))
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    out = chunk_by_tokens(
        df, "doc_id", F.split("text", " "), chunk_size=5, stride=3
    ).collect()
    got = {r.start_token: (r.chunk_idx, r.n_tokens, r.chunk_text) for r in out}
    assert set(got) == {1, 4, 7}
    assert got[1] == (0, 5, "t1 t2 t3 t4 t5")
    assert got[4] == (1, 5, "t4 t5 t6 t7 t8")
    assert got[7] == (2, 5, "t7 t8 t9 t10 t11")  # tail fully covered


def test_chunk_by_tokens_short_doc_single_chunk(spark):
    from f1_data_engineering_machine_learning_spark.dataops.packing import (
        chunk_by_tokens,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    out = chunk_by_tokens(
        df, "doc_id", F.split("text", " "), chunk_size=50, stride=40
    ).collect()
    assert len(out) == 1
    assert (out[0].chunk_idx, out[0].n_tokens, out[0].chunk_text) == (0, 2, "a b")


def test_chunk_by_tokens_no_overlap_partitions_exactly(spark):
    from f1_data_engineering_machine_learning_spark.dataops.packing import (
        chunk_by_tokens,
    )

    doc = " ".join(str(i) for i in range(10))
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    out = chunk_by_tokens(
        df, "doc_id", F.split("text", " "), chunk_size=4, stride=4
    ).collect()
    texts = [r.chunk_text for r in sorted(out, key=lambda r: r.start_token)]
    assert texts == ["0 1 2 3", "4 5 6 7", "8 9"]  # disjoint, tail short


def test_chunk_by_tokens_rejects_bad_stride(spark):
    from f1_data_engineering_machine_learning_spark.dataops.packing import (
        chunk_by_tokens,
    )

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "doc_id", F.split("text", " "), 10, 11)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "doc_id", F.split("text", " "), 10, 0)
