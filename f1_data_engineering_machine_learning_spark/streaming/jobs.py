"""Streaming jobs: windowed aggregation + sessionization over the events
stream, each the streaming twin of a batch catalog query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.functions import dsum


def read_event_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """File-source stream over an events directory (parquet). A directory of
    parquet files is the local stand-in for Kafka: same DataFrame, same
    downstream plan."""
    schema = schema or (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return spark.readStream.schema(schema).parquet(path)


def hourly_event_stats_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows of count + deterministic value sum per
    event_type — streaming twin of catalog.hourly_event_stats. The
    watermark bounds aggregation state: late events beyond it are dropped
    (the late-data contract)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_stats_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows by inactivity gap — the built-in
    ``session_window`` stateful operator (streaming twin of
    catalog.sessionize_events' lag/cumsum idiom)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: keep the first occurrence of each key within
    the watermark horizon (``dropDuplicates`` over a watermarked stream
    bounds the dedup state — without the watermark, state grows forever).
    The streaming twin of dataops.dedup.exact_dedup for the ingest path."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def run_available_now(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain everything currently available through the streaming engine
    into an in-memory table and return it (test/backfill harness; a real
    deployment writes to a sink with a trigger instead). ``complete`` for
    aggregations; ``append`` for row-level operators (dedup, maps)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
