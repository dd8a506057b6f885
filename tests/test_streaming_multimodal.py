"""Streaming parity (batch = oracle) + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark import catalog
from f1_data_engineering_machine_learning_spark.dataops import multimodal
from f1_data_engineering_machine_learning_spark.streaming import (
    hourly_event_stats_stream,
    read_event_stream,
    run_available_now,
    session_stats_stream,
)
from tests.util_compare import assert_frames_equal


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events re-written with a micros timestamp (streaming file source
    can't read the testdata's TIMESTAMP(NANOS) parquet)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    catalog._events(spark, sf_dir).write.parquet(path)
    return path


def test_hourly_stream_matches_batch(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    assert stream.isStreaming
    got = run_available_now(
        hourly_event_stats_stream(stream), "hourly_test"
    ).toPandas()
    want = catalog.hourly_event_stats(spark, sf_dir).toPandas()
    assert_frames_equal(got, want, "stream-vs-batch hourly")


def test_session_stream_session_counts(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_available_now(session_stats_stream(stream), "sessions_test")
    # session_window(30m) merges overlapping gaps exactly like the batch
    # lag/cumsum idiom -> same number of sessions per user
    got_counts = got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))
    want = catalog.sessionize_events(spark, sf_dir)
    diff = got_counts.exceptAll(want).count() + want.exceptAll(got_counts).count()
    assert diff == 0
    # and no session loses events
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == catalog._events(spark, sf_dir).count()


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir):
    """Stream-static join parity: enriching the event stream with the
    customer dim must produce exactly the batch join's rows, and events
    with no matching dim row must survive (left join keeps facts)."""
    from f1_data_engineering_machine_learning_spark.streaming import (
        enrich_stream_with_dim,
    )

    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    stream = read_event_stream(spark, events_dir)
    enriched = enrich_stream_with_dim(stream, dim, "user_id", ["segment"])
    assert enriched.isStreaming
    got = run_available_now(enriched, "enrich_test", output_mode="append").toPandas()
    want = (
        catalog._events(spark, sf_dir)
        .join(F.broadcast(dim), "user_id", "left")
        .toPandas()
    )
    got["ts"] = got["ts"].astype(str)
    want["ts"] = want["ts"].astype(str)
    assert_frames_equal(got, want, "stream-vs-batch enrichment")
    assert len(got) == catalog._events(spark, sf_dir).count()


def test_multimodal_decode_plumbing(spark):
    base = spark.range(8).withColumnRenamed("id", "doc_id")
    media = multimodal.attach_fake_media(base, "doc_id")
    assert dict(media.dtypes)["media"] == "binary"
    decoded = multimodal.decode_media(media, decoder="fake")
    rows = decoded.select("doc_id", F.size("pixels").alias("n")).collect()
    assert all(r.n == 16 for r in rows)  # 4x4 from meta
    # determinism: same id -> same pixels
    a = decoded.filter(F.col("doc_id") == 3).select("pixels").collect()[0][0]
    b = multimodal.decode_media(media, decoder="fake").filter(
        F.col("doc_id") == 3
    ).select("pixels").collect()[0][0]
    assert a == b


def test_multimodal_real_decoder_is_marked_stub(spark):
    media = multimodal.attach_fake_media(
        spark.range(2).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.decode_media(media, decoder="real").collect()


def test_media_features_project_binary_away(spark):
    media = multimodal.attach_fake_media(
        spark.range(4).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    feats = multimodal.media_features(multimodal.decode_media(media, "fake"))
    assert "media" not in feats.columns
    vals = feats.select(F.size("media_features").alias("n")).collect()
    assert all(r.n == multimodal.FEATURE_DIM for r in vals)


def test_frame_sampling_metadata_only(spark):
    media = multimodal.attach_fake_media(
        spark.range(1).withColumnRenamed("id", "doc_id"), "doc_id"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(5000).alias("duration_ms"),
            F.lit(100).alias("n_frames"),
        ),
    )
    frames = multimodal.sample_frames(media, every_n=10)
    assert frames.count() == 10
