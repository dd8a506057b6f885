"""Unit tests for throttle_events (oracle equivalence vs a DuckDB
recursive CTE is covered by catalog ``throttled_user_events``)."""

from __future__ import annotations

import datetime

import pytest

from f1_data_engineering_machine_learning_spark.operators.throttle import throttle_events


def _ts(sec):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


def test_gap_is_relative_to_last_kept_not_last_raw(spark):
    # t = 0, 4, 5, 9 with gap 5: the defining counter-example —
    #   keep 0; 4 too close to 0; 5 is exactly 5 from last KEPT (0) so
    #   kept; 9 is 4 from last kept (5) so dropped.
    # A lag-filter would keep {0, 9}; gap-sessionize-first would keep {0}.
    df = spark.createDataFrame(
        [(1, i, _ts(t)) for i, t in enumerate([0, 4, 5, 9])],
        ["user", "eid", "ts"],
    )
    out = throttle_events(df, ["user"], "ts", 5.0, ["eid"])
    kept = sorted(r.eid for r in out.collect())
    assert kept == [0, 2]


def test_entities_independent_and_first_always_kept(spark):
    df = spark.createDataFrame(
        [(1, 0, _ts(0)), (1, 1, _ts(1)), (2, 2, _ts(1)), (2, 3, _ts(100))],
        ["user", "eid", "ts"],
    )
    out = throttle_events(df, ["user"], "ts", 10.0, ["eid"])
    kept = sorted(r.eid for r in out.collect())
    assert kept == [0, 2, 3]


def test_repartition_invariant(spark):
    rows = [(u, u * 100 + i, _ts(i * 3)) for u in range(5) for i in range(20)]
    df = spark.createDataFrame(rows, ["user", "eid", "ts"])
    a = throttle_events(df.coalesce(1), ["user"], "ts", 7.0, ["eid"])
    b = throttle_events(df.repartition(13), ["user"], "ts", 7.0, ["eid"])
    assert sorted(r.eid for r in a.collect()) == sorted(r.eid for r in b.collect())


def test_validation(spark):
    df = spark.createDataFrame([(1, _ts(0))], ["user", "ts"])
    with pytest.raises(ValueError, match="nope"):
        throttle_events(df, ["nope"], "ts", 5.0)
    with pytest.raises(ValueError, match="positive"):
        throttle_events(df, ["user"], "ts", 0)


def test_entity_key_type_contract_rejects_float_and_nested(spark):
    """NaN float keys never equal themselves in the dict walk and nested
    types are unhashable — both rejected at plan time (docstring
    contract), never silently misgrouped."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1.5, _ts(0))], ["fuser", "ts"])
    with pytest.raises(ValueError, match="discrete hashable"):
        throttle_events(df, ["fuser"], "ts", 5.0)
    arr = df.withColumn("akey", F.array(F.lit(1)))
    with pytest.raises(ValueError, match="discrete hashable"):
        throttle_events(arr, ["akey"], "ts", 5.0)


def test_fuzz_throttle_matches_python_replay(spark):
    """Seeded random event streams vs a pure-Python replay of the exact
    debounce walk: per entity, sort by (ts, id-tiebreak), keep iff
    t - last_KEPT >= gap (first always kept). Varies gap, entity count,
    duplicate timestamps, and input partitioning — pinning the
    cross-Arrow-batch state carry and the partition invariance the
    mapInPandas scan relies on."""
    import random

    rng = random.Random(909)
    for trial in range(5):
        n_entities = rng.randint(1, 6)
        n_events = rng.randint(1, 120)
        gap_s = rng.choice([1, 3, 7])
        rows = []
        for eid in range(n_events):
            ent = rng.randint(0, n_entities - 1)
            # coarse second grid => plenty of exact-tie timestamps
            sec = rng.randint(0, 40)
            rows.append((f"u{ent}", _ts(sec), eid))
        df = spark.createDataFrame(
            rows, "user string, ts timestamp, event_id long"
        ).repartition(rng.choice([1, 3, 8]))

        got = sorted(
            (r.user, r.ts, r.event_id)
            for r in throttle_events(
                df, ["user"], "ts", gap_s, tiebreak_cols=["event_id"]
            ).collect()
        )

        per_entity: dict = {}
        for u, ts, eid in rows:
            per_entity.setdefault(u, []).append((ts, eid))
        want = []
        for u, evs in per_entity.items():
            last_kept = None
            for ts, eid in sorted(evs):
                if last_kept is None or (ts - last_kept).total_seconds() >= gap_s:
                    want.append((u, ts, eid))
                    last_kept = ts
        assert got == sorted(want), f"trial={trial} gap={gap_s}"
