"""Unit tests for dedup_by_preference (oracle equivalence is covered by
catalog ``preferred_daily_event``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.dedup import (
    dedup_by_preference,
)


@pytest.fixture()
def dupes(spark):
    return spark.createDataFrame(
        [
            # key "a": tier decides (1 beats 2), id never consulted
            ("a", 2, 10, "late-tier"),
            ("a", 1, 99, "winner-a"),
            # key "b": tier ties, id breaks it
            ("b", 1, 5, "winner-b"),
            ("b", 1, 6, "loser-b"),
            # key "c": singleton passes through
            ("c", 9, 1, "winner-c"),
        ],
        ["k", "tier", "id", "payload"],
    )


def test_picks_by_order_then_tiebreak(dupes):
    out = dedup_by_preference(dupes, ["k"], ["tier", "id"])
    got = {r.k: r.payload for r in out.collect()}
    assert got == {"a": "winner-a", "b": "winner-b", "c": "winner-c"}
    assert out.count() == 3
    assert out.columns == dupes.columns


def test_repartition_invariant(dupes):
    one = dedup_by_preference(dupes.coalesce(1), ["k"], ["tier", "id"])
    many = dedup_by_preference(dupes.repartition(7), ["k"], ["tier", "id"])
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_agrees_with_window_formulation(spark, dupes):
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("tier", "id")
    expected = (
        dupes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    got = dedup_by_preference(dupes, ["k"], ["tier", "id"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_missing_column_raises(dupes):
    with pytest.raises(ValueError, match="nope"):
        dedup_by_preference(dupes, ["k"], ["nope"])


def test_partial_aggregation_no_window(dupes):
    """The whole point: an aggregate with MAP-SIDE PARTIALS (the shuffle
    carries one candidate per partition-key), not a row_number window
    that shuffles every duplicate row. Plan must contain no Window node
    and must show partial_min BEFORE the Exchange."""
    import io
    from contextlib import redirect_stdout

    out = dedup_by_preference(dupes, ["k"], ["tier", "id"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    # partial_min present == map-side combine happens before the shuffle
    assert "partial_min" in plan


def test_null_preference_never_wins(spark):
    """A NULL order value means 'preference unknown' — it must lose to
    any known preference (asc_nulls_last), not win via struct-NULL-first."""
    df = spark.createDataFrame(
        [
            ("a", None, 1, "null-tier"),
            ("a", 5, 2, "known-tier"),
            # key "b": ALL tiers NULL -> fall through to id tiebreak
            ("b", None, 9, "null-id9"),
            ("b", None, 3, "null-id3"),
        ],
        "k string, tier int, id int, payload string",
    )
    got = {r.k: r.payload for r in dedup_by_preference(df, ["k"], ["tier", "id"]).collect()}
    assert got == {"a": "known-tier", "b": "null-id3"}
