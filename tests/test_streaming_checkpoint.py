"""Streaming checkpoint/restart: incremental file arrival processed exactly
once across a query restart (the durability contract a real deployment
relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.streaming import read_event_stream


def _write_batch(spark, path, ids):
    spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 10}:00:00", i % 3, "click", float(i), "{}") for i in ids],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(path)


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            read_event_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(spark, src, range(0, 50))
    drain()
    assert spark.read.parquet(sink).count() == 50

    # new files arrive; a RESTARTED query must process only the delta
    _write_batch(spark, src, range(50, 80))
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 80  # exactly once: no re-processing of batch 1
    assert out.select("event_id").distinct().count() == 80
