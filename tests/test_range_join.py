"""Range join: strategy equivalence + half-open boundary semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.range_join import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixtures(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == w1 start (inclusive)
            (2, _ts("2024-01-05 12:00:00")),  # inside w1
            (3, _ts("2024-01-10 00:00:00")),  # == w1 end (exclusive) == w2 start
            (4, _ts("2024-02-20 00:00:00")),  # in no window
        ],
        ["id", "ts"],
    )
    windows = spark.createDataFrame(
        [
            ("w1", _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00")),
            ("w2", _ts("2024-01-10 00:00:00"), _ts("2024-01-20 00:00:00")),
        ],
        ["name", "start", "end"],
    )
    return left, windows


def test_half_open_boundaries_broadcast(spark):
    left, windows = _fixtures(spark)
    got = {
        r.id: r.name
        for r in range_join(left, windows, "ts", "start", "end").collect()
    }
    assert got == {1: "w1", 2: "w1", 3: "w2"}  # id 4 dropped (inner)


def test_bucketed_equals_broadcast(spark):
    left, windows = _fixtures(spark)
    a = sorted(
        (r.id, r.name)
        for r in range_join(left, windows, "ts", "start", "end").collect()
    )
    b = sorted(
        (r.id, r.name)
        for r in range_join(
            left, windows, "ts", "start", "end",
            strategy="bucketed", bucket_seconds=86400,
        ).collect()
    )
    assert a == b


def test_left_join_null_extends(spark):
    left, windows = _fixtures(spark)
    got = {
        r.id: r.name
        for r in range_join(
            left, windows, "ts", "start", "end",
            how="left", strategy="bucketed", bucket_seconds=86400,
        ).collect()
    }
    assert got[4] is None and len(got) == 4


def test_left_join_null_payload_not_duplicated(spark):
    """A matched left row carrying a NULL in a payload column must appear
    exactly once — the miss detection is id-based (null-safe), not an
    anti-join over raw columns where NULL != NULL would re-emit it."""
    _, windows = _fixtures(spark)
    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-05 12:00:00")),  # NULL payload, inside w1
            (2, "x", _ts("2024-02-20 00:00:00")),  # miss
        ],
        ["id", "payload", "ts"],
    )
    rows = range_join(
        left, windows, "ts", "start", "end",
        how="left", strategy="bucketed", bucket_seconds=86400,
    ).collect()
    assert len(rows) == 2
    got = {r.id: r.name for r in rows}
    assert got == {1: "w1", 2: None}


def test_events_to_session_windows(spark, sf_dir):
    """Real-data closure: events range-joined to hour windows reproduce the
    hourly counts."""
    from f1_data_engineering_machine_learning_spark import catalog

    ev = catalog._events(spark, sf_dir)
    hours = (
        ev.select(F.date_trunc("hour", "ts").alias("start"))
        .distinct()
        .withColumn("end", F.col("start") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = range_join(ev, hours, "ts", "start", "end", strategy="bucketed",
                        bucket_seconds=3600)
    got = joined.groupBy("start").agg(F.count(F.lit(1)).alias("n"))
    want = ev.groupBy(F.date_trunc("hour", "ts").alias("start")).agg(
        F.count(F.lit(1)).alias("n")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_interval_overlap_join_strategies_agree(spark):
    import datetime

    from f1_data_engineering_machine_learning_spark.operators.range_join import (
        interval_overlap_join,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    left = spark.createDataFrame(
        [
            (1, t(0), t(5)),    # long interval spanning many buckets
            (2, t(6), t(7)),    # overlaps nothing
            (3, t(8, 30), t(9, 30)),
        ],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            (10, t(1), t(2)),     # inside lid=1
            (11, t(4), t(6)),     # tail-overlaps lid=1 (and not lid=2: half-open)
            (12, t(9), t(11)),    # overlaps lid=3
            (13, t(20), t(21)),   # overlaps nothing
        ],
        ["rid", "rs", "re"],
    )
    kw = dict(bucket_seconds=3600)
    for how in ("inner", "left"):
        b = interval_overlap_join(
            left, right, "ls", "le", "rs", "re", how=how, strategy="broadcast"
        )
        k = interval_overlap_join(
            left, right, "ls", "le", "rs", "re", how=how, strategy="bucketed", **kw
        )
        bp = sorted((r.lid, r.rid) for r in b.collect())
        kp = sorted((r.lid, r.rid) for r in k.collect())
        assert bp == kp, how
    # exactly-once emission despite multi-bucket overlaps; half-open ends
    assert sorted((r.lid, r.rid) for r in k.collect() if r.rid is not None) == [
        (1, 10),
        (1, 11),
        (3, 12),
    ]
    # left: no-overlap interval survives NULL-extended
    assert (2, None) in {(r.lid, r.rid) for r in k.collect()}


def test_left_join_duplicate_rows_count_preserved(spark):
    """Content-derived __rid: exact duplicate left rows share an id.
    Matched duplicates must BOTH fan out; missed duplicates must BOTH
    null-extend — left-join row accounting survives duplicates."""
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.operators.range_join import (
        range_join,
    )

    t = lambda h: dt.datetime(2024, 1, 1, h)
    left = spark.createDataFrame(
        [("dup-hit", t(10)), ("dup-hit", t(10)),      # both inside the window
         ("dup-miss", t(20)), ("dup-miss", t(20))],   # both outside
        ["tag", "ts"],
    )
    iv = spark.createDataFrame(
        [("w", t(9), t(11))], ["iv", "start", "end"]
    )
    out = range_join(left, iv, "ts", "start", "end",
                     how="left", strategy="bucketed", bucket_seconds=3600)
    rows = out.collect()
    assert len(rows) == 4
    got = sorted((r.tag, r.iv) for r in rows)
    assert got == [("dup-hit", "w"), ("dup-hit", "w"),
                   ("dup-miss", None), ("dup-miss", None)]


def test_interval_overlap_join_planted_skew(spark):
    """Skew guard: one hot entity with thousands of intervals piled into
    the SAME time bucket on both sides must still complete and produce
    exactly-once pairs (the bucketed join degrades into one big join
    partition — AQE-splittable since the refine is a post-join filter —
    rather than any per-key collect or executor-memory structure).
    Output here is genuinely quadratic (all pairs overlap), so the test
    plants a size where exactness is checkable: 2000 x 60 = 120k pairs,
    all in one bucket."""
    from pyspark.sql import functions as F

    from f1_data_engineering_machine_learning_spark.operators.range_join import (
        interval_overlap_join,
    )

    base = "2024-01-01 12:"
    left = spark.range(2000).select(
        F.col("id").alias("lid"),
        F.to_timestamp(F.lit("2024-01-01 12:00:00")).alias("ls"),
        F.to_timestamp(F.lit("2024-01-01 12:50:00")).alias("le"),
    )
    right = spark.range(60).select(
        F.col("id").alias("rid"),
        F.to_timestamp(F.lit("2024-01-01 12:10:00")).alias("rs"),
        F.to_timestamp(F.lit("2024-01-01 12:20:00")).alias("re"),
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re",
        how="inner", strategy="bucketed", bucket_seconds=3600,
    )
    assert out.count() == 2000 * 60  # exactly once per overlapping pair
    # spot-check no duplicate (lid, rid)
    assert (
        out.groupBy("lid", "rid").count().filter(F.col("count") > 1).count() == 0
    )


def test_interval_overlap_join_keyed_confines_candidates(spark):
    """keys= confines matches to their key group on BOTH strategies:
    same time window on different users must NOT pair; left rows with
    no same-key overlap NULL-extend keeping their key value."""
    import datetime

    from f1_data_engineering_machine_learning_spark.operators.range_join import (
        interval_overlap_join,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    left = spark.createDataFrame(
        [
            ("u1", 1, t(0), t(2)),
            ("u2", 2, t(0), t(2)),   # same window, other user
            ("u1", 3, t(6), t(7)),   # no same-key overlap
        ],
        ["user", "lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, t(1), t(3)),
            ("u2", 11, t(10), t(11)),  # u2 has no overlapping incident
        ],
        ["user", "rid", "rs", "re"],
    )
    for strategy in ("broadcast", "bucketed"):
        out = interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            how="left", strategy=strategy, bucket_seconds=3600, keys=["user"],
        )
        got = sorted((r.user, r.lid, r.rid) for r in out.collect())
        assert got == [
            ("u1", 1, 10),
            ("u1", 3, None),
            ("u2", 2, None),
        ], strategy
        assert out.columns.count("user") == 1
