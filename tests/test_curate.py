"""Curation pipeline: stage ordering, cluster resolution, survivor rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.curate import (
    curate_documents,
    near_dup_clusters,
)


def test_near_dup_clusters_transitive(spark):
    # chain 1-2, 2-3 and island 7-8: components {1,2,3} and {7,8}
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (7, 8, 0.95)], ["i", "j", "jaccard"]
    )
    labels = {r.node: r.label for r in near_dup_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_near_dup_clusters_local_and_distributed_paths_agree(spark):
    """The adaptive small-graph arm (driver union-find) and the
    distributed min-label loop must produce the identical (node, label)
    frame. Chain + island + a 4-cycle with diameter 2 exercises the
    propagation rounds; local_threshold=0 forces the distributed path."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (7, 8, 0.95), (10, 11, 0.9),
         (11, 12, 0.9), (12, 13, 0.9), (13, 10, 0.9)],
        ["i", "j", "jaccard"],
    )
    local = {(r.node, r.label) for r in near_dup_clusters(pairs).collect()}
    dist = {
        (r.node, r.label)
        for r in near_dup_clusters(pairs, local_threshold=0).collect()
    }
    assert local == dist
    assert local == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7),
                     (10, 10), (11, 10), (12, 10), (13, 10)}


def test_curate_documents_fixture(spark):
    base = "one two three four five six seven eight nine ten " * 8
    rows = [
        (0, base + "alpha beta gamma delta"),
        (1, base + "alpha beta gamma epsilon"),   # near-dup of 0
        (2, base + "totally different tail with many other words here now"),
        (3, base + "alpha beta gamma delta"),     # exact dup of 0
        (4, "short junk"),                         # fails quality (length)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    curated, report = curate_documents(
        docs, min_quality=0.6, near_dup_threshold=0.6
    )
    assert report["input"] == 5
    assert report["after_quality"] == 4           # junk dropped
    assert report["after_exact_dedup"] == 3       # doc 3 dropped (dup of 0)
    assert report["after_near_dedup"] == 2        # doc 1 folded into 0
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    assert kept == {0, 2}
    # profile columns rode along
    assert {"quality", "lang_pred", "fingerprint"} <= set(curated.columns)


def test_curate_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    curated, report = curate_documents(docs, min_quality=0.0)
    assert report["after_near_dedup"] <= report["after_exact_dedup"] <= report["input"]
    assert curated.count() == report["after_near_dedup"]
