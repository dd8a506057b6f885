"""Sustained-load soaks for the ingest-maintenance streams (round-9
verdict tasks 2 and 6): 100+ micro-batches through the dedup-on-ingest
sinks and the mergeable-sketch streams at production state size,
asserting per-batch cost stays TREND-FLAT — bounded by batch size plus
summary-sized merges, never by accumulated history.

The trend statistic (tools/soak_streams.py::trend) is
median(last quarter) / median(second quarter) of per-batch trigger
durations; the first quarter absorbs JIT warmup. History-following cost
would put the ratio near batches/4 (the corpus is ~30x larger at the
end than at batch 4); the bound of 2.0 is generous to box noise while
categorically rejecting linear growth.

The heavyweight 120-batch runs with throughput rows live in
tools/soak_streams.py (results recorded in PERF.md "Streaming-ingest
soak"); these tests run the same harness at a CI-bounded batch count,
overridable via SPARK_GRAFT_SOAK_BATCHES.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

import pytest

_TOOLS = Path(__file__).resolve().parent.parent / "tools" / "soak_streams.py"
_spec = importlib.util.spec_from_file_location("soak_streams", _TOOLS)
soak_streams = importlib.util.module_from_spec(_spec)
sys.modules["soak_streams"] = soak_streams
_spec.loader.exec_module(soak_streams)

N_BATCHES = int(os.environ.get("SPARK_GRAFT_SOAK_BATCHES", "100"))
MAX_TREND = 2.0


def _soak(spark, tmp_path, mode: str, docs_per_batch: int) -> dict:
    return soak_streams.run_soak(
        spark, mode, str(tmp_path), N_BATCHES, docs_per_batch
    )


def test_dedup_ingest_soak_trend_flat(spark, tmp_path):
    """100+ micro-batches of exact dedup-on-ingest with periodic
    compaction active (compact_every=10): per-batch wall stays
    trend-flat (corpus touch = key-only fp anti-join; state = the
    stored fp column), every batch actually ingested, and the
    compaction cadence keeps the manifest's file count bounded instead
    of accreting one file set per batch."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    r = _soak(spark, tmp_path, "dedup", docs_per_batch=20)
    assert r["batches"] == N_BATCHES
    assert r["trend_ratio"] < MAX_TREND, r
    t = VersionedTable(spark, str(tmp_path / "store_dedup"))
    m = t._manifest(t._versions()[-1])
    # compact_every=10 with compact_files=8: file count bounded by the
    # post-compaction base plus at most 10 batches of accretion
    assert len(m["files"]) <= 8 + 10 * 2
    assert t.read().count() > 0


def test_near_dup_ingest_soak_trend_flat(spark, tmp_path):
    """100+ micro-batches of the full curation policy (exact + LSH
    near-dedup against the corpus, self-healing index maintenance) with
    periodic compaction of both tables (the harness passes
    compact_every=10): per-batch wall stays trend-flat — the
    corpus-scaled touches are the key-only fp anti-join, the stored
    band-index equi-join, and the key-only orphan sweep, and compaction
    keeps read planning from following accreted file count (the
    uncompacted 120-batch soak measured ~1.4x per-batch drift from file
    accretion alone; PERF.md round 9)."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    r = _soak(spark, tmp_path, "neardup", docs_per_batch=20)
    assert r["batches"] == N_BATCHES
    assert r["trend_ratio"] < MAX_TREND, r
    # index invariant after the whole soak: every stored doc is banded
    corpus = VersionedTable(spark, str(tmp_path / "store_neardup")).read()
    idx = VersionedTable(
        spark, str(tmp_path / "store_neardup") + "__lshidx"
    ).read()
    assert (
        idx.select("id").distinct().count() == corpus.count()
    )


@pytest.mark.parametrize(
    "mode,docs_per_batch",
    [("cms", 200), ("bitmap", 200)],
)
def test_sketch_stream_soak_state_bounded(spark, tmp_path, mode, docs_per_batch):
    """Mergeable-summary streams at realistic state size (CMS 4 x 4096 —
    the store is an order of magnitude larger than one batch's delta;
    bitmap over a growing id range): merge cost tracks SUMMARY size, not
    item history, so per-batch wall stays trend-flat while the store is
    >> one batch."""
    r = _soak(spark, tmp_path, mode, docs_per_batch=docs_per_batch)
    assert r["batches"] == N_BATCHES
    assert r["trend_ratio"] < MAX_TREND, r


def test_sample_stream_soak_state_exactly_k(spark, tmp_path):
    """The bottom-k sample stream's state is EXACTLY k rows no matter how
    much history flows through: per-batch wall trend-flat, and the store
    holds k rows at the end of the soak."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    r = _soak(spark, tmp_path, "sample", docs_per_batch=40)
    assert r["batches"] == N_BATCHES
    assert r["trend_ratio"] < MAX_TREND, r
    store = VersionedTable(spark, str(tmp_path) + "/store_sample").read()
    assert store.count() == 100  # k
