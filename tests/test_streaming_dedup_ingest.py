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


def test_near_dup_ingest_full_curation_policy(spark, tmp_path):
    """near_dup_ingest_stream: exact + near dedup within the batch and
    against the corpus. base/near pairs share 8 of 9 token 3-shingles
    (Jaccard 0.89 >= 0.8); 'other' shares none."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        near_dup_ingest_stream,
    )

    base = "one two three four five six seven eight nine ten"
    near = base + " eleven"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: exact dup of base (id 2), near-dup of base (id 3): both fold
    _write_docs(spark, src, [(1, base), (2, base), (3, near), (4, other)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)
    got1 = {r.doc_id for r in VersionedTable(spark, table).read().collect()}
    assert got1 == {1, 4}

    # batch 2: near-dup of the CORPUS (dropped), genuinely new (kept)
    fresh = "red orange yellow green blue indigo violet pink brown black"
    _write_docs(spark, src, [(5, base + " twelve"), (6, fresh)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)
    got2 = {r.doc_id for r in VersionedTable(spark, table).read().collect()}
    assert got2 == {1, 4, 6}


def test_near_dup_ingest_maintains_lsh_index(spark, tmp_path):
    """The companion __lshidx table holds exactly the stored corpus's
    band assignments after every batch (the persisted LSH index
    contract), and batch 2+ near-dedup reads it instead of re-MinHashing
    corpus text — values identical to the inline-derivation twin."""
    from f1_data_engineering_machine_learning_spark.dataops.dedup import (
        lsh_band_index,
    )
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        near_dup_ingest_stream,
    )

    base = "one two three four five six seven eight nine ten"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "red orange yellow green blue indigo violet pink brown black"

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [(1, base), (2, other)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)
    # batch 2 exercises the index-read path: a corpus near-dup must still
    # be caught via the STORED bands
    _write_docs(spark, src, [(3, base + " eleven"), (4, fresh)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)

    corpus = VersionedTable(spark, table).read()
    assert {r.doc_id for r in corpus.collect()} == {1, 2, 4}
    idx = VersionedTable(spark, table + "__lshidx").read()
    expected = lsh_band_index(corpus, "doc_id", "text")
    got = {(r.id, r.band, r.bucket) for r in idx.collect()}
    want = {(r.id, r.band, r.bucket) for r in expected.collect()}
    assert got == want


def test_near_dup_ingest_backfills_missing_index(spark, tmp_path):
    """Pre-index deployment upgrade: corpus exists, __lshidx does not.
    The next batch derives corpus bands inline ONCE, still applies the
    near-dedup policy, and commits the full backfilled index."""
    import shutil

    from f1_data_engineering_machine_learning_spark.dataops.dedup import (
        lsh_band_index,
    )
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        near_dup_ingest_stream,
    )

    base = "one two three four five six seven eight nine ten"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [(1, base), (2, other)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)
    shutil.rmtree(table + "__lshidx")  # simulate a pre-index table

    _write_docs(spark, src, [(3, base + " eleven")])  # corpus near-dup
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)

    corpus = VersionedTable(spark, table).read()
    assert {r.doc_id for r in corpus.collect()} == {1, 2}  # 3 dropped
    idx = VersionedTable(spark, table + "__lshidx").read()
    want = {
        (r.id, r.band, r.bucket)
        for r in lsh_band_index(corpus, "doc_id", "text").collect()
    }
    assert {(r.id, r.band, r.bucket) for r in idx.collect()} == want


def test_near_dup_ingest_index_self_heals_after_crash(spark, tmp_path, monkeypatch):
    """Crash BETWEEN the docs commit and the index commit, then a full
    replay (fresh checkpoint, same app_id): the docs commit no-ops via
    txn, and the index commit must still band the batch's docs — the
    rows to index are derived from the committed docs table, never from
    the recomputed (now-empty) survivors. Without the heal, the replayed
    index commit records the batch id with ZERO band rows and future
    near-dups of those docs are permanently undetectable."""
    import f1_data_engineering_machine_learning_spark.plans.versioned as V
    from f1_data_engineering_machine_learning_spark.dataops.dedup import (
        lsh_band_index,
    )
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        near_dup_ingest_stream,
    )

    base = "one two three four five six seven eight nine ten"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")

    _write_docs(spark, src, [(1, base), (2, other)])

    orig = V.VersionedTable.commit
    state = {"armed": True}

    def crash_before_index_commit(self, df, mode="overwrite", **kw):
        if state["armed"] and self.path.endswith("__lshidx"):
            state["armed"] = False
            raise RuntimeError("injected crash between docs and index commit")
        return orig(self, df, mode=mode, **kw)

    monkeypatch.setattr(V.VersionedTable, "commit", crash_before_index_commit)
    try:
        near_dup_ingest_stream(_stream(spark, src), table, str(tmp_path / "ck1"))
    except Exception:
        pass  # the injected crash propagates through awaitTermination
    corpus = V.VersionedTable(spark, table).read()
    assert {r.doc_id for r in corpus.collect()} == {1, 2}  # docs committed
    import os

    assert not os.path.isdir(table + "__lshidx")  # index commit crashed

    # replay from a FRESH checkpoint with the same app_id
    near_dup_ingest_stream(_stream(spark, src), table, str(tmp_path / "ck2"))
    idx = V.VersionedTable(spark, table + "__lshidx").read()
    want = {
        (r.id, r.band, r.bucket)
        for r in lsh_band_index(corpus, "doc_id", "text").collect()
    }
    assert {(r.id, r.band, r.bucket) for r in idx.collect()} == want

    # and the healed index actually catches near-dups of those docs
    _write_docs(spark, src, [(3, base + " eleven")])
    near_dup_ingest_stream(_stream(spark, src), table, str(tmp_path / "ck2"))
    assert {
        r.doc_id for r in V.VersionedTable(spark, table).read().collect()
    } == {1, 2}


def test_near_dup_ingest_index_heals_even_with_stale_index_txn(
    spark, tmp_path
):
    """Orphaned unindexed docs whose batch id is ALREADY recorded in the
    index txns (a legacy table damaged by a pre-heal writer) are swept
    into the NEXT batch's index commit — the heal derives missing rows
    fresh each batch, so the damage lasts at most one batch."""
    from f1_data_engineering_machine_learning_spark.dataops.dedup import (
        lsh_band_index,
    )
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        near_dup_ingest_stream,
    )

    base = "one two three four five six seven eight nine ten"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "red orange yellow green blue indigo violet pink brown black"

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [(1, base), (2, other)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)

    # legacy damage: doc 2's band rows vanish from the index while the
    # txn high-water stays — exactly what the pre-heal bug produced
    ti = VersionedTable(spark, table + "__lshidx")
    damaged = ti.read().filter(F.col("id") != 2)
    ti.commit(damaged, mode="overwrite")

    _write_docs(spark, src, [(3, fresh)])
    near_dup_ingest_stream(_stream(spark, src), table, ckpt)

    corpus = VersionedTable(spark, table).read()
    want = {
        (r.id, r.band, r.bucket)
        for r in lsh_band_index(corpus, "doc_id", "text").collect()
    }
    got = {(r.id, r.band, r.bucket) for r in ti.read().collect()}
    assert got == want  # doc 2's bands are back


def test_dedup_ingest_replay_skips_compaction(spark, tmp_path):
    """A txn-replayed batch (fresh checkpoint, same app_id) changes zero
    rows, so the every-Nth-batch compaction must NOT run: no new version
    is minted for a no-op replay."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")

    _write_docs(spark, src, [(1, "aaa"), (2, "bbb")])
    dedup_ingest_stream(
        _stream(spark, src), table, str(tmp_path / "ck1"), compact_every=1
    )
    t = VersionedTable(spark, table)
    versions_before = t._versions()

    # full-source replay: commit no-ops via txn; compaction must be skipped
    dedup_ingest_stream(
        _stream(spark, src), table, str(tmp_path / "ck2"), compact_every=1
    )
    assert t._versions() == versions_before


def test_dedup_ingest_periodic_compaction(spark, tmp_path):
    """compact_every bounds file accretion across micro-batches without
    changing the corpus: after the compacting batch the snapshot sits in
    compact_files files, rows identical, and later batches still dedup
    against it."""
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [(1, "aaa"), (2, "bbb")])
    dedup_ingest_stream(_stream(spark, src), table, ckpt, compact_every=2)
    _write_docs(spark, src, [(3, "ccc"), (4, "aaa")])  # 4 dups corpus
    dedup_ingest_stream(_stream(spark, src), table, ckpt, compact_every=2)

    t = VersionedTable(spark, table)
    m = t._manifest(t._versions()[-1])
    assert len(m["files"]) <= 8
    got = {(r.doc_id, r.text) for r in t.read().collect()}
    assert got == {(1, "aaa"), (2, "bbb"), (3, "ccc")}
    # post-compaction batch still dedups against the rewritten corpus
    _write_docs(spark, src, [(5, "ccc"), (6, "ddd")])
    dedup_ingest_stream(_stream(spark, src), table, ckpt, compact_every=2)
    got = {(r.doc_id, r.text) for r in t.read().collect()}
    assert got == {(1, "aaa"), (2, "bbb"), (3, "ccc"), (6, "ddd")}
