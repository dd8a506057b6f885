"""as-of join semantics on constructed timelines."""

from __future__ import annotations

import datetime as dt

from f1_data_engineering_machine_learning_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),  # before any right -> NULL
            (2, "u", _ts("2024-01-01 12:00:00")),  # matches r1 (11:00)
            (3, "u", _ts("2024-01-01 13:00:00")),  # matches r2 exactly (13:00)
            (4, "v", _ts("2024-01-01 12:00:00")),  # other key -> NULL
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 11:00:00"), 100.0),
            ("u", _ts("2024-01-01 13:00:00"), 200.0),
            ("u", _ts("2024-01-01 14:00:00"), 300.0),  # after all lefts
        ],
        ["k", "ts", "val"],
    )

    out = {
        r.id: r.val_asof
        for r in asof_join(left, right, ["k"], "ts", ["val"]).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: None}

    # strict (<) semantics: the equal-timestamp fact is NOT yet visible
    strict = {
        r.id: r.val_asof
        for r in asof_join(left, right, ["k"], "ts", ["val"], strict=True).collect()
    }
    assert strict[3] == 100.0


def test_asof_null_in_matched_row_preserved(spark):
    """A NULL inside the matched (latest) right row must surface as NULL —
    not be papered over by an older non-null value — and with several
    value_cols every carried value must come from the SAME right row
    (DuckDB ASOF JOIN row-level semantics)."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 10:00:00"), 100.0, "old"),
            # latest matching row: val is NULL, tag is new
            ("u", _ts("2024-01-01 11:00:00"), None, "new"),
        ],
        ["k", "ts", "val", "tag"],
    )
    row = asof_join(left, right, ["k"], "ts", ["val", "tag"]).collect()[0]
    assert row.tag_asof == "new"
    assert row.val_asof is None  # NOT 100.0 from the older row


def test_asof_preserves_left_rowcount(spark, sf_dir):
    from f1_data_engineering_machine_learning_spark import catalog
    from pyspark.sql import functions as F

    ev = catalog._events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(purchases, clicks, ["user_id"], "ts", ["click_id"])
    assert joined.count() == purchases.count()  # left join: no loss, no fanout


def test_asof_forward_and_nearest_directions(spark):
    import datetime

    import pytest

    from f1_data_engineering_machine_learning_spark.operators.asof import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), "L10"), (1, t(20), "L20"), (1, t(35), "L35")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, t(8), "R8"), (1, t(20), "R20"), (1, t(30), "R30")],
        ["k", "ts", "val"],
    )

    fwd = {
        r.tag: r.val_asof
        for r in asof_join(
            left, right, ["k"], "ts", ["val"], direction="forward"
        ).collect()
    }
    # earliest at-or-after: L10 -> R20, L20 -> R20 (inclusive), L35 -> none
    assert fwd == {"L10": "R20", "L20": "R20", "L35": None}

    fwd_strict = {
        r.tag: r.val_asof
        for r in asof_join(
            left, right, ["k"], "ts", ["val"], direction="forward", strict=True
        ).collect()
    }
    assert fwd_strict["L20"] == "R30"  # equal ts excluded under strict

    near = {
        r.tag: r.val_asof
        for r in asof_join(
            left, right, ["k"], "ts", ["val"], direction="nearest"
        ).collect()
    }
    # L10: R8 at d=2 beats R20 at d=10; L20: exact hit; L35: R30 at d=5
    assert near == {"L10": "R8", "L20": "R20", "L35": "R30"}

    # equidistant tie goes backward: left at 25 between R20 and R30
    tie = spark.createDataFrame([(1, t(25), "L25")], ["k", "ts", "tag"])
    got = asof_join(tie, right, ["k"], "ts", ["val"], direction="nearest").collect()
    assert got[0].val_asof == "R20"

    with pytest.raises(ValueError, match="nearest"):
        asof_join(left, right, ["k"], "ts", ["val"], direction="nearest", strict=True)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "ts", ["val"], direction="sideways")


def test_asof_date_typed_ts_col_all_directions(spark):
    """DATE ordering columns must work for every direction (DATE has no
    double cast in Spark — nearest distance goes through days-since-epoch)."""
    d = dt.date
    left = spark.createDataFrame(
        [(1, d(2024, 1, 10), "L10"), (1, d(2024, 1, 21), "L21")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, d(2024, 1, 8), "R08"), (1, d(2024, 1, 20), "R20"),
         (1, d(2024, 1, 25), "R25")],
        ["k", "ts", "val"],
    )
    back = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"]).collect()}
    assert back == {"L10": "R08", "L21": "R20"}
    fwd = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], direction="forward").collect()}
    assert fwd == {"L10": "R20", "L21": "R25"}
    near = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], direction="nearest").collect()}
    # L10: R08 at 2d beats R20 at 10d; L21: R20 at 1d beats R25 at 4d
    assert near == {"L10": "R08", "L21": "R20"}


def test_asof_string_ts_col_orderable_but_no_nearest(spark):
    """Any orderable type works for backward/forward (pure window sort);
    'nearest' needs distance arithmetic and must raise a clear TypeError
    rather than silently compute NULL distances."""
    import pytest

    left = spark.createDataFrame([(1, "2024-01-15", "L")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, "2024-01-10", "R10"), (1, "2024-01-20", "R20")], ["k", "ts", "val"]
    )
    back = asof_join(left, right, ["k"], "ts", ["val"]).collect()
    assert back[0].val_asof == "R10"  # lexicographic == chronological here
    fwd = asof_join(left, right, ["k"], "ts", ["val"], direction="forward").collect()
    assert fwd[0].val_asof == "R20"
    with pytest.raises(TypeError, match="nearest"):
        asof_join(left, right, ["k"], "ts", ["val"], direction="nearest")


def test_asof_tolerance_all_directions(spark):
    """pandas merge_asof(tolerance=...) parity: a match farther than the
    tolerance NULLs out; the as-of pick itself is unchanged (no fallback
    to an older in-tolerance row)."""
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), "L10"), (1, t(40), "L40")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        # for L40 backward: R38 is the as-of pick; R5 is older but would
        # NOT be used even if R38 fell out of tolerance
        [(1, t(5), "R5"), (1, t(38), "R38")], ["k", "ts", "val"]
    )
    # tolerance in MICROSECONDS for timestamps
    sec = 1_000_000
    back = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], tolerance=6 * sec).collect()}
    # L10: pick R5 at d=5s (within 6s); L40: pick R38 at d=2s
    assert back == {"L10": "R5", "L40": "R38"}
    tight = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], tolerance=3 * sec).collect()}
    # L10's pick R5 (5s away) is vetoed -> NULL, no fallback
    assert tight == {"L10": None, "L40": "R38"}

    fwd = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], direction="forward",
        tolerance=10 * sec).collect()}
    # L10 -> R38 is 28s forward: vetoed; L40 -> nothing after
    assert fwd == {"L10": None, "L40": None}

    near = {r.tag: r.val_asof for r in asof_join(
        left, right, ["k"], "ts", ["val"], direction="nearest",
        tolerance=4 * sec).collect()}
    # L10: nearest is R5 at 5s -> vetoed; L40: R38 at 2s -> kept
    assert near == {"L10": None, "L40": "R38"}

    import pytest

    with pytest.raises(ValueError, match="non-negative"):
        asof_join(left, right, ["k"], "ts", ["val"], tolerance=-1)


def test_fuzz_asof_matches_python_replay(spark):
    """Seeded random left/right frames vs a pure-Python merge_asof
    replay across all directions, strict, and tolerance: backward =
    latest at-or-before (strictly-before when strict), forward =
    earliest at-or-after, nearest = closer side with exact-microsecond
    distance and ties to backward; tolerance vetoes (never falls back).
    Right timestamps are unique per key (the tie-among-equal-right-rows
    pick is not part of the contract); left ties, equal-ts matches, and
    keys missing from one side are all generated."""
    import random

    def _sts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rng = random.Random(4242)
    for trial in range(8):
        direction = rng.choice(["backward", "forward", "nearest"])
        strict = rng.choice([False, True]) if direction != "nearest" else False
        tolerance = rng.choice([None, 5_000_000])  # None or 5s in us
        keys = [f"k{i}" for i in range(rng.randint(1, 4))]
        right_rows = []
        for k in keys:
            if rng.random() < 0.2:
                continue  # key with no right rows -> NULL carries
            secs = rng.sample(range(0, 60), rng.randint(1, 8))
            right_rows += [(k, _sts(s), float(s)) for s in secs]
        left_rows = [
            (rng.choice(keys + ["k_missing"]), _sts(rng.randint(0, 60)), i)
            for i in range(rng.randint(1, 40))
        ]
        left = spark.createDataFrame(left_rows, "k string, ts timestamp, lid long")
        right = spark.createDataFrame(right_rows, "k string, ts timestamp, val double")

        got = {
            r.lid: r.val_asof
            for r in asof_join(
                left, right, ["k"], "ts", ["val"],
                strict=strict, direction=direction, tolerance=tolerance,
            ).collect()
        }

        by_key: dict = {}
        for k, ts, v in right_rows:
            by_key.setdefault(k, []).append((ts, v))
        want = {}
        for k, lt, lid in left_rows:
            back = [
                (ts, v) for ts, v in by_key.get(k, [])
                if (ts < lt if strict else ts <= lt)
            ]
            fwd = [
                (ts, v) for ts, v in by_key.get(k, [])
                if (ts > lt if strict else ts >= lt)
            ]
            b = max(back) if back else None
            f = min(fwd) if fwd else None
            if direction == "backward":
                pick = b
            elif direction == "forward":
                pick = f
            else:
                if b and f:
                    pick = b if (lt - b[0]) <= (f[0] - lt) else f
                else:
                    pick = b or f
            if pick is not None and tolerance is not None:
                dist_us = abs(int((pick[0] - lt).total_seconds() * 1_000_000))
                if dist_us > tolerance:
                    pick = None
            want[lid] = pick[1] if pick else None
        assert got == want, (
            f"trial={trial} dir={direction} strict={strict} tol={tolerance}"
        )
