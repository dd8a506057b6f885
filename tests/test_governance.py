"""Compliance-deletion operators (dataops/governance.py)."""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark.dataops.governance import (
    forget_audit,
    forget_in_table,
    forget_keys,
)


@pytest.fixture()
def frames(spark):
    df = spark.createDataFrame(
        [(u, i, f"p{u}-{i}") for u in range(5) for i in range(3)],
        ["user_id", "seq", "payload"],
    )
    # subject 7 never existed — the audit must say so
    keys = spark.createDataFrame([(1,), (3,), (7,)], ["user_id"])
    return df, keys


def test_forget_keys_drops_exactly_the_subjects(frames):
    df, keys = frames
    kept = forget_keys(df, keys, "user_id")
    assert kept.count() == 9
    assert {r.user_id for r in kept.collect()} == {0, 2, 4}
    # untouched rows pass through intact
    assert sorted(
        (r.user_id, r.seq, r.payload) for r in kept.collect()
    ) == sorted(
        (u, i, f"p{u}-{i}") for u in (0, 2, 4) for i in range(3)
    )


def test_forget_audit_counts(frames):
    df, keys = frames
    row = forget_audit(df, keys, "user_id").first()
    assert (row.n_scanned, row.n_dropped, row.n_kept) == (15, 6, 9)
    assert row.n_subjects_found == 2  # subject 7 was never present


def test_forget_in_table_rewrites_storage(spark, tmp_path, frames):
    df, keys = frames
    path = str(tmp_path / "t")
    df.write.parquet(path)
    audit = forget_in_table(spark, path, keys, "user_id")
    assert audit == {
        "n_scanned": 15,
        "n_dropped": 6,
        "n_kept": 9,
        "n_subjects_found": 2,
    }
    back = spark.read.parquet(path)
    assert back.count() == 9
    assert {r.user_id for r in back.collect()} == {0, 2, 4}
    # idempotent: re-applying the same request deletes nothing further
    audit2 = forget_in_table(spark, path, keys, "user_id")
    assert audit2["n_dropped"] == 0 and audit2["n_kept"] == 9


def test_forget_keys_validates(frames):
    df, keys = frames
    with pytest.raises(ValueError, match="nope"):
        forget_keys(df, keys, "nope")


def test_forget_in_table_preserves_partitioning(spark, tmp_path, frames):
    """The rewrite must keep the table's hive partition layout (a
    compliance delete that silently flattens a partitioned table breaks
    every downstream partition-pruned read)."""
    df, keys = frames
    path = str(tmp_path / "tp")
    df.write.partitionBy("user_id").parquet(path)
    forget_in_table(spark, path, keys, "user_id")
    import os

    part_dirs = sorted(
        d for d in os.listdir(path) if d.startswith("user_id=")
    )
    assert part_dirs == ["user_id=0", "user_id=2", "user_id=4"]
    back = spark.read.parquet(path)
    assert back.count() == 9
    # no staging/backup residue next to the table
    assert not os.path.exists(path + ".__forget_staging")
    assert not os.path.exists(path + ".__forget_old")


def test_forget_in_table_survives_failed_staging(spark, tmp_path, frames, monkeypatch):
    """If verification fails, the ORIGINAL table must be untouched."""
    df, keys = frames
    path = str(tmp_path / "tf")
    df.write.parquet(path)
    import f1_data_engineering_machine_learning_spark.dataops.governance as gov

    real_forget = gov.forget_keys
    # sabotage: staged frame drops one extra row -> count mismatch
    monkeypatch.setattr(
        gov, "forget_keys",
        lambda d, k, c: real_forget(d, k, c).limit(8),
    )
    with pytest.raises(RuntimeError, match="verification failed"):
        gov.forget_in_table(spark, path, keys, "user_id")
    monkeypatch.undo()
    back = spark.read.parquet(path)
    assert back.count() == 15  # original intact
