"""Property-based tests (hypothesis): operator semantics vs Python ground
truth on arbitrary inputs — guards the invariants the oracle checks depend
on (exact medians, sentinel casts, decimal-exact aggregation)."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.functions import dsum, sentinel_int
from f1_data_engineering_machine_learning_spark.operators import exact_median

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40))
@_settings
def test_exact_median_matches_statistics(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = df.agg(exact_median("x").alias("m")).collect()[0].m
    assert got == statistics.median(vals)


@given(
    raw=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=500).map(str),
            st.integers(min_value=0, max_value=500).map(lambda v: f"{v}.0"),
            st.sampled_from(["R", "", "DNF", "x1", None]),
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_sentinel_cast_matches_python(spark, raw):
    def expected(s):
        if s is None:
            return 99
        try:
            return int(float(s))
        except ValueError:
            return 99

    df = spark.createDataFrame([(v,) for v in raw], "x string")
    got = [r.v for r in df.select(sentinel_int("x").alias("v")).collect()]
    assert got == [expected(v) for v in raw]


@given(
    cents=st.lists(
        st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50
    ),
    parts=st.integers(min_value=1, max_value=13),
)
@_settings
def test_dsum_partition_invariant_and_exact(spark, cents, parts):
    vals = [c / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(parts)
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    # ground truth via integer cents — exact regardless of float order
    assert got == float(sum(cents)) / 100.0
