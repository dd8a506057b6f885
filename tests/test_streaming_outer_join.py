"""Stream-stream LEFT OUTER join (streaming/jobs.py::unattributed_clicks_stream):
matched rows emit immediately; unmatched clicks emit with NULLs only after
the watermark proves no purchase can still arrive. The two-phase test
drives the watermark forward with a later batch to flush the NULL rows —
the mechanism a production stream relies on for funnel completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.streaming import read_event_stream
from f1_data_engineering_machine_learning_spark.streaming.jobs import (
    unattributed_clicks_stream,
)

SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    ).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt):
    q = (
        unattributed_clicks_stream(
            read_event_stream(spark, src), max_lead="10 minutes",
            watermark="5 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_unmatched_clicks_flush_as_nulls_after_watermark(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # user 1 clicks and converts 5 min later; user 2 clicks, never converts
    _write(spark, src, [
        (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-01 10:05:00", 1, "purchase", 50.0, "{}"),
        (3, "2024-01-01 10:00:00", 2, "click", 0.0, "{}"),
    ])
    first = _drain(spark, src, out, ckpt)
    matched = {r["click_id"]: r["purchase_id"] for r in first.collect()}
    assert matched.get(1) == 2  # conversion emitted without waiting
    assert 3 not in matched  # unconverted click held back by state

    # a much later event drives the watermark past click 3's horizon
    # (10:00 + 10 min lead + 5 min delay); state eviction — and thus the
    # NULL emission — happens in the micro-batch AFTER the advance, so a
    # second late batch flushes it (the documented outer-join latency)
    # BOTH sides need late data: the global watermark is the MIN over the
    # click and purchase watermark operators, so a click-only late batch
    # would pin the purchase side at 10:05 and nothing would ever evict
    _write(spark, src, [
        (99, "2024-01-01 12:00:00", 9, "click", 0.0, "{}"),
        (98, "2024-01-01 12:00:00", 9, "purchase", 1.0, "{}"),
    ])
    _drain(spark, src, out, ckpt)
    _write(spark, src, [
        (100, "2024-01-01 13:00:00", 9, "click", 0.0, "{}"),
        (101, "2024-01-01 13:00:00", 9, "purchase", 1.0, "{}"),
    ])
    second = _drain(spark, src, out, ckpt)
    rows = {r["click_id"]: (r["purchase_id"], r["value"]) for r in second.collect()}
    assert rows[3] == (None, None)  # NULL-padded funnel dropout, exactly once
    assert rows[1] == (2, 50.0)
    assert second.filter(F.col("click_id") == 3).count() == 1
