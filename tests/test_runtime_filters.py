"""Runtime Bloom-filter injection (InjectRuntimeFilter) evidence.

The engine session enables `spark.sql.optimizer.runtime.bloomFilter.enabled`
(session.py): when a selective dim-side predicate feeds a SHUFFLE join,
Catalyst builds a Bloom filter over the dim's join keys and applies it as a
`might_contain` predicate on the fact side BEFORE the fact shuffle — rows
that cannot match never cross the network. At 100 TB this is the semi-join
reduction that makes selective star joins shuffle-light even when the dim
outgrows the broadcast threshold.

The size thresholds (`creationSideThreshold` 10MB creation side max,
`applicationSideScanSizeThreshold` 10GB fact minimum) are cluster-scale
defaults; test data is far below both, so the test lowers them to force the
optimizer down the same code path a 100 TB fact scan takes by default.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

TD = "/root/testdata/sf0.001"


@pytest.fixture()
def runtime_filter_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # force-create regardless of local data size (cluster defaults
        # gate on 10MB/10GB; the plan shape under test is identical)
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # runtime filters only apply to shuffle joins; keep the dim from
        # broadcasting so the code path is exercised
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _star_join(spark):
    li = spark.read.parquet(f"{TD}/lineitem.parquet")
    p = spark.read.parquet(f"{TD}/part.parquet").filter(F.col("p_size") == 1)
    return li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n")
    )


def test_bloom_filter_injected_into_fact_side(runtime_filter_conf):
    spark = runtime_filter_conf
    j = _star_join(spark)
    optimized = j._jdf.queryExecution().optimizedPlan().toString().lower()
    physical = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "bloomfilter" in optimized, "no BloomFilterAggregate injected"
    assert "might_contain" in physical, "fact scan not filtered by might_contain"


def test_bloom_filtered_join_result_unchanged(runtime_filter_conf):
    spark = runtime_filter_conf
    with_filter = {(r["p_brand"], r["n"]) for r in _star_join(spark).collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = {(r["p_brand"], r["n"]) for r in _star_join(spark).collect()}
    assert with_filter == without and len(with_filter) > 0
