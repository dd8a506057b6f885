"""as-of join semantics on constructed timelines."""

from __future__ import annotations

import datetime as dt

from f1_data_engineering_machine_learning_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),  # before any right -> NULL
            (2, "u", _ts("2024-01-01 12:00:00")),  # matches r1 (11:00)
            (3, "u", _ts("2024-01-01 13:00:00")),  # matches r2 exactly (13:00)
            (4, "v", _ts("2024-01-01 12:00:00")),  # other key -> NULL
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 11:00:00"), 100.0),
            ("u", _ts("2024-01-01 13:00:00"), 200.0),
            ("u", _ts("2024-01-01 14:00:00"), 300.0),  # after all lefts
        ],
        ["k", "ts", "val"],
    )

    out = {
        r.id: r.val_asof
        for r in asof_join(left, right, ["k"], "ts", ["val"]).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: None}

    # strict (<) semantics: the equal-timestamp fact is NOT yet visible
    strict = {
        r.id: r.val_asof
        for r in asof_join(left, right, ["k"], "ts", ["val"], strict=True).collect()
    }
    assert strict[3] == 100.0


def test_asof_null_in_matched_row_preserved(spark):
    """A NULL inside the matched (latest) right row must surface as NULL —
    not be papered over by an older non-null value — and with several
    value_cols every carried value must come from the SAME right row
    (DuckDB ASOF JOIN row-level semantics)."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 10:00:00"), 100.0, "old"),
            # latest matching row: val is NULL, tag is new
            ("u", _ts("2024-01-01 11:00:00"), None, "new"),
        ],
        ["k", "ts", "val", "tag"],
    )
    row = asof_join(left, right, ["k"], "ts", ["val", "tag"]).collect()[0]
    assert row.tag_asof == "new"
    assert row.val_asof is None  # NOT 100.0 from the older row


def test_asof_preserves_left_rowcount(spark, sf_dir):
    from f1_data_engineering_machine_learning_spark import catalog
    from pyspark.sql import functions as F

    ev = catalog._events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(purchases, clicks, ["user_id"], "ts", ["click_id"])
    assert joined.count() == purchases.count()  # left join: no loss, no fanout
