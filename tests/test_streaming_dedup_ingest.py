"""Continuous dedup-on-ingest (streaming/jobs.py::dedup_ingest_stream):
exact dedup within each micro-batch AND against the already-ingested
corpus, with exactly-once appends via the versioned table's txn
protocol. The batch twin (incremental_exact_dedup + exact_dedup) is the
oracle for what must survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.streaming.jobs import (
    dedup_ingest_stream,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "append"
    ).parquet(path)


def _stream(spark, src):
    return (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )


def test_dedup_ingest_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 'aaa' duplicated within the batch (min id 1 must win)
    _write_docs(spark, src, [(1, "aaa"), (2, "aaa"), (3, "bbb")])
    dedup_ingest_stream(_stream(spark, src), table, ckpt)

    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    got1 = {
        (r.doc_id, r.text) for r in VersionedTable(spark, table).read().collect()
    }
    assert got1 == {(1, "aaa"), (3, "bbb")}

    # batch 2: 'bbb' duplicates the CORPUS (dropped), 'ccc' is new
    _write_docs(spark, src, [(4, "bbb"), (5, "ccc")])
    dedup_ingest_stream(_stream(spark, src), table, ckpt)
    got2 = {
        (r.doc_id, r.text) for r in VersionedTable(spark, table).read().collect()
    }
    assert got2 == {(1, "aaa"), (3, "bbb"), (5, "ccc")}

    # stored fp column IS the persistent dedup index (one per distinct text)
    fps = VersionedTable(spark, table).read().select("fp").collect()
    assert len(fps) == len({r.fp for r in fps}) == 3


def test_dedup_ingest_replay_is_exactly_once(spark, tmp_path):
    """Fresh checkpoint = full source replay with the SAME app_id: the
    txn high-water makes every replayed batch a no-op — the corpus is
    byte-identical, no duplicate appends (the crash-replay contract)."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")

    _write_docs(spark, src, [(1, "aaa"), (2, "bbb"), (3, "aaa")])
    dedup_ingest_stream(_stream(spark, src), table, str(tmp_path / "ck1"))

    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    before = {
        (r.doc_id, r.text) for r in VersionedTable(spark, table).read().collect()
    }
    assert before == {(1, "aaa"), (2, "bbb")}

    dedup_ingest_stream(_stream(spark, src), table, str(tmp_path / "ck2"))
    after = {
        (r.doc_id, r.text) for r in VersionedTable(spark, table).read().collect()
    }
    assert after == before
