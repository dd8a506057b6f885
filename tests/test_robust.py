"""Robust stats operators (operators/robust.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.robust import (
    mad_anomalies,
    winsorize,
)


def test_winsorize_clips_to_exact_percentiles(spark):
    # group g: 1..100 plus outliers -1000 / +1000
    rows = [("g", float(i)) for i in range(1, 101)] + [
        ("g", -1000.0),
        ("g", 1000.0),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    w = winsorize(df, "v", ["grp"], lower=0.1, upper=0.9)
    got = w.agg(
        F.min("v_wins"), F.max("v_wins"), F.min("__p_lo"), F.max("__p_hi")
    ).collect()[0]
    # clipped range equals the bounds; outliers no longer extreme
    assert got[0] == got[2] and got[1] == got[3]
    assert got[2] > -1000.0 and got[3] < 1000.0
    assert w.count() == df.count()  # winsorize never drops rows


def test_mad_anomalies_flags_only_the_outlier(spark):
    rows = [("u", float(v)) for v in [10, 11, 9, 10, 12, 8, 10, 500]]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_anomalies(df, "v", ["grp"], k=3.0)
    flagged = [r["v"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [500.0]
    # the threshold came from the MEDIAN/MAD, not dragged by the outlier
    row = out.filter("v = 500.0").collect()[0]
    assert row["__med"] == 10.0 and 0 < row["__mad"] <= 2.0


def test_mad_zero_group_flags_any_deviation(spark):
    rows = [("c", 5.0)] * 6 + [("c", 5.001)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_anomalies(df, "v", ["grp"])
    assert out.filter("is_anomaly").count() == 1  # strict > keeps equals clean
    assert out.filter("NOT is_anomaly").count() == 6


def test_zscore_normalize_exact(spark):
    from f1_data_engineering_machine_learning_spark.operators.robust import zscore_normalize

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 5.0), ("h", 5.0)],
        ["k", "v"],
    )
    rows = {(r.k, r.v): r for r in zscore_normalize(df, "v", ["k"]).collect()}
    # group g: mean 2, population std = sqrt(2/3)
    import math
    std = math.sqrt((1 + 4 + 9) / 3 - 4)
    assert abs(rows[("g", 1.0)].v_z - (1 - 2) / std) < 1e-15
    assert abs(rows[("g", 3.0)].v_z - (3 - 2) / std) < 1e-15
    # constant group: std 0 -> NULL z
    assert rows[("h", 5.0)].v_z is None
