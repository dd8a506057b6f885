"""Structured-Streaming surface (SURVEY §2.10 — the reference has none; the
north star's event stream needs it).

Design rule: every streaming aggregation is the SAME logical plan as its
batch twin in catalog.py (``hourly_event_stats``, ``sessionize_events``) —
batch results are the correctness oracle for the stream (tested with an
availableNow trigger). Watermarks bound state; at scale the state store is
RocksDB-backed and the input is a real source (Kafka), but the
transformations are source-agnostic.
"""

from f1_data_engineering_machine_learning_spark.streaming.jobs import (  # noqa: F401
    enrich_stream_with_dim,
    hourly_event_stats_stream,
    read_event_stream,
    run_available_now,
    session_stats_stream,
)
