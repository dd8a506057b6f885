"""Unit tests for apply_cdc / latest_change_per_key (end-to-end oracle:
catalog ``user_state_cdc``)."""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark.operators.cdc import (
    apply_cdc,
    latest_change_per_key,
)


@pytest.fixture()
def state(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "payload"]
    )
    changes = spark.createDataFrame(
        [
            # k=1: update then DELETE — delete wins (latest)
            (1, "a2", 10, 0, "U"),
            (1, "a3", 20, 0, "D"),
            # k=2: two updates — latest (seq 31) wins
            (2, "b2", 30, 0, "U"),
            (2, "b3", 31, 0, "U"),
            # k=4: pure insert of a new key
            (4, "d1", 5, 0, "U"),
            # k=5: insert then delete — never appears
            (5, "e1", 1, 0, "U"),
            (5, "e1", 2, 0, "D"),
        ],
        ["k", "payload", "seq", "tb", "op"],
    )
    return snap, changes


def test_apply_cdc_semantics(state):
    snap, changes = state
    out = apply_cdc(snap, changes, ["k"], "seq", "op", tiebreak_cols=["tb"])
    got = {r.k: r.payload for r in out.collect()}
    # 1 deleted, 2 updated to latest, 3 untouched, 4 inserted, 5 net-deleted
    assert got == {2: "b3", 3: "c", 4: "d1"}
    assert out.columns == snap.columns


def test_latest_change_tiebreak(spark):
    changes = spark.createDataFrame(
        [(1, "x", 5, 1, "U"), (1, "y", 5, 2, "U")],
        ["k", "payload", "seq", "tb", "op"],
    )
    latest = latest_change_per_key(changes, ["k"], "seq", ["tb"])
    assert latest.collect()[0].payload == "y"


def test_apply_cdc_missing_columns_raises(spark):
    snap = spark.createDataFrame([(1, "a", "extra")], ["k", "payload", "more"])
    changes = spark.createDataFrame([(1, "b", 1, "U")], ["k", "payload", "seq", "op"])
    with pytest.raises(ValueError, match="more"):
        apply_cdc(snap, changes, ["k"], "seq", "op")


def test_apply_cdc_idempotent_on_replay(state):
    """Applying the same batch to the already-advanced snapshot changes
    nothing — the property that makes at-least-once CDC delivery safe."""
    snap, changes = state
    once = apply_cdc(snap, changes, ["k"], "seq", "op", tiebreak_cols=["tb"])
    twice = apply_cdc(once, changes, ["k"], "seq", "op", tiebreak_cols=["tb"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_null_seq_always_loses(spark):
    """A NULL sequence value ('ordering unknown') must never be selected
    as the latest change when any non-null sequence exists for the key —
    explicitly desc_nulls_last, not implicit struct-NULL ordering."""
    changes = spark.createDataFrame(
        [(1, "nullseq", None, 0, "U"), (1, "real", 1, 0, "U"),
         # key 2: only NULL seqs -> tiebreak decides deterministically
         (2, "tb-big", None, 9, "U"), (2, "tb-small", None, 1, "U")],
        "k int, payload string, seq int, tb int, op string",
    )
    latest = {r.k: r.payload
              for r in latest_change_per_key(changes, ["k"], "seq", ["tb"]).collect()}
    assert latest == {1: "real", 2: "tb-big"}


def test_fuzz_apply_cdc_matches_python_replay(spark):
    """Seeded random snapshot+changelog vs a pure-Python replay: latest
    change per key by (seq, tiebreak) with NULL seq always losing to
    any non-null, deletes drop, upserts replace, untouched rows carry
    through. Duplicate seqs (tiebroken), keys absent from either side,
    and delete-then-nothing cases are all generated."""
    import random

    rng = random.Random(6464)
    for trial in range(6):
        keys = list(range(rng.randint(2, 8)))
        snap_rows = [(k, f"old{k}") for k in keys if rng.random() < 0.7]
        ch_rows = []
        cid = 0
        for _ in range(rng.randint(1, 25)):
            k = rng.choice(keys + [99])  # 99: key unknown to the snapshot
            seq = rng.choice([None, 1, 2, 3])
            op = rng.choice(["U", "U", "I", "D"])
            ch_rows.append((k, f"v{cid}", seq, op, cid))
            cid += 1
        snapshot = spark.createDataFrame(snap_rows or [(None, None)],
                                         "k long, val string")
        if not snap_rows:
            snapshot = snapshot.filter("k IS NOT NULL")
        changes = spark.createDataFrame(
            ch_rows, "k long, val string, seq long, op string, cid long"
        ).repartition(rng.choice([1, 4]))

        got = sorted(
            (r.k, r.val)
            for r in apply_cdc(
                snapshot, changes, ["k"], "seq", "op", tiebreak_cols=["cid"]
            ).collect()
        )

        latest = {}
        for k, val, seq, op, c in ch_rows:
            cur = latest.get(k)
            cand = ((seq is not None, seq if seq is not None else 0, c), val, op)
            if cur is None or cand[0] > cur[0]:
                latest[k] = cand
        state = {k: v for k, v in snap_rows}
        for k, (_, val, op) in latest.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = val
        assert got == sorted(state.items()), f"trial={trial}"
