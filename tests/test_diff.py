"""table_diff (operators/diff.py): full-outer reconciliation semantics."""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark.operators.diff import table_diff


def test_all_four_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(2, "b", 20.0), (3, "CHANGED", 30.0), (4, None, 40.0), (5, "new", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "identical",
        3: "changed",
        4: "identical",  # NULL == NULL under eqNullSafe
        5: "added",
    }


def test_null_transitions_are_changes(spark):
    left = spark.createDataFrame([(1, "x"), (2, None)], "k long, s string")
    right = spark.createDataFrame([(1, None), (2, "y")], "k long, s string")
    got = table_diff(left, right, ["k"]).collect()
    assert all(r["status"] == "changed" for r in got)
    by_k = {r["k"]: (r["s_left"], r["s_right"]) for r in got}
    assert by_k == {1: ("x", None), 2: (None, "y")}


def test_compare_cols_subset_ignores_other_columns(spark):
    left = spark.createDataFrame([(1, "same", "old")], "k long, a string, b string")
    right = spark.createDataFrame([(1, "same", "new")], "k long, a string, b string")
    only_a = table_diff(left, right, ["k"], compare_cols=["a"]).collect()
    assert only_a[0]["status"] == "identical"
    assert "b_left" not in only_a[0].asDict()
    with pytest.raises(ValueError):
        table_diff(left, right.drop("b"), ["k"], compare_cols=["b"])
