"""dropDuplicatesWithinWatermark: retried-record dedup where the retry
carries a DIFFERENT event time (at-least-once producers re-stamp ts).

Plain `dropDuplicates(key)` over a watermarked stream keeps only the first
row per key too — but its state can only expire if the event-time column is
part of the key, which retried rows defeat. The within-watermark variant is
the operator contract for this case; parity is asserted against the batch
keep-first semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.streaming import read_event_stream
from f1_data_engineering_machine_learning_spark.streaming.jobs import (
    dedup_stream_within_watermark,
    run_available_now,
)


def test_retried_events_collapse_to_one(spark, tmp_path):
    src = str(tmp_path / "src")
    # 20 logical events; every third is "retried" 90 seconds later with a
    # fresh event_id-preserving key but a different ts
    rows = []
    for i in range(20):
        rows.append((i, f"2024-01-01 10:{i:02d}:00", i % 5, "click", float(i), "{}"))
        if i % 3 == 0:
            rows.append((i, f"2024-01-01 10:{i:02d}:30", i % 5, "click", float(i), "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(src)

    deduped = dedup_stream_within_watermark(
        read_event_stream(spark, src), ["event_id"], watermark="10 minutes"
    )
    got = run_available_now(deduped, "dedup_ww_result", output_mode="append")
    assert got.count() == 20  # one row per logical event, retries dropped
    assert got.select("event_id").distinct().count() == 20
