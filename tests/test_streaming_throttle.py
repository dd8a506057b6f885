"""Streaming throttle: batch-parity and cross-batch state semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.throttle import throttle_events
from f1_data_engineering_machine_learning_spark.streaming import read_event_stream
from f1_data_engineering_machine_learning_spark.streaming.stateful import (
    throttled_events_stream,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(eid, ts, uid, "click", 0.0, "{}") for eid, ts, uid in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, sink, gap):
    def write_batch(bdf, batch_id):
        bdf.write.mode("append").parquet(sink)

    q = (
        throttled_events_stream(read_event_stream(spark, src), gap)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


def test_stream_matches_batch_single_drain(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / p) for p in ("src", "ckpt", "sink"))
    rows = [
        # user 1: the counter-example spacing (gap 5s keeps t=0 and t=5)
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:00:04", 1),
        (2, "2024-01-01 00:00:05", 1),
        (3, "2024-01-01 00:00:09", 1),
        # user 2: all far apart
        (4, "2024-01-01 00:00:00", 2),
        (5, "2024-01-01 01:00:00", 2),
    ]
    _write_events(spark, src, rows)
    got = sorted(r.event_id for r in _drain(spark, src, ckpt, sink, 5.0).collect())
    assert got == [0, 2, 4, 5]

    batch = spark.read.parquet(src).select("user_id", "event_id", "ts")
    expected = sorted(
        r.event_id
        for r in throttle_events(batch, ["user_id"], "ts", 5.0, ["event_id"]).collect()
    )
    assert got == expected


def test_state_throttles_across_restarts(spark, tmp_path):
    """An event early in batch 2 must throttle against the last KEPT
    timestamp persisted from batch 1 — the stateful cross-batch
    semantic, and exact batch parity for time-ordered arrival."""
    src, ckpt, sink = (str(tmp_path / p) for p in ("src", "ckpt", "sink"))
    _write_events(spark, src, [(0, "2024-01-01 00:00:00", 1)])
    first = _drain(spark, src, ckpt, sink, 3600.0)
    assert [r.event_id for r in first.collect()] == [0]

    _write_events(
        spark,
        src,
        [
            (1, "2024-01-01 00:30:00", 1),  # 30 min after kept #0 -> dropped
            (2, "2024-01-01 01:00:00", 1),  # exactly 1h after #0 -> kept
            (3, "2024-01-01 01:30:00", 1),  # 30 min after kept #2 -> dropped
        ],
    )
    allout = _drain(spark, src, ckpt, sink, 3600.0)
    assert sorted(r.event_id for r in allout.collect()) == [0, 2]

    batch = spark.read.parquet(src).select("user_id", "event_id", "ts")
    expected = sorted(
        r.event_id
        for r in throttle_events(
            batch, ["user_id"], "ts", 3600.0, ["event_id"]
        ).collect()
    )
    assert sorted(r.event_id for r in allout.collect()) == expected
