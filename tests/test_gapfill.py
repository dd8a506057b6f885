"""Gap fill: scaffold density, LOCF semantics, leading-gap behavior."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.gapfill import (
    date_scaffold,
    forward_fill,
    gap_fill,
    interpolate_linear,
)


def _d(s):
    return dt.date.fromisoformat(s)


def test_gap_fill_dense_and_carried(spark):
    obs = spark.createDataFrame(
        [
            ("a", _d("2024-01-01"), 1.0),
            ("a", _d("2024-01-04"), 4.0),  # 2nd/3rd missing -> carry 1.0
            ("b", _d("2024-01-03"), 9.0),  # b starts late -> leading NULLs
        ],
        ["user", "d", "value"],
    )
    out = gap_fill(obs, ["user"], "d", ["value"]).collect()
    assert len(out) == 8  # 2 users x 4 days dense
    got = {(r.user, str(r.d)): (r.value_ff, r.observed) for r in out}
    assert got[("a", "2024-01-02")] == (1.0, False)  # carried, not observed
    assert got[("a", "2024-01-03")] == (1.0, False)
    assert got[("a", "2024-01-04")] == (4.0, True)
    assert got[("b", "2024-01-01")] == (None, False)  # leading gap stays NULL
    assert got[("b", "2024-01-04")] == (9.0, False)


def test_scaffold_respects_explicit_bounds(spark):
    obs = spark.createDataFrame([("a", _d("2024-01-02"), 1.0)], ["user", "d", "v"])
    sc = date_scaffold(obs, ["user"], F.col("d"), "2024-01-01", "2024-01-05")
    assert sc.count() == 5


def test_forward_fill_multiple_columns_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0, None), ("a", 2, None, "x"), ("a", 3, 30.0, None)],
        ["user", "t", "v", "s"],
    )
    out = {r.t: (r.v_ff, r.s_ff) for r in
           forward_fill(df, ["user"], "t", ["v", "s"]).collect()}
    assert out[1] == (10.0, None)
    assert out[2] == (10.0, "x")
    assert out[3] == (30.0, "x")

def test_gap_fill_matches_scaffold_plan(spark):
    """The span-explode gap_fill must be row-identical to the textbook
    scaffold LEFT JOIN + forward_fill composition (including NULL-valued
    observations, which carry the prior value and are not 'observed')."""
    rows = [
        ("a", _d("2024-01-01"), 1.0),
        ("a", _d("2024-01-03"), None),  # NULL obs: carries 1.0, observed False
        ("a", _d("2024-01-06"), 6.0),
        ("b", _d("2024-01-02"), 2.0),
        ("b", _d("2024-01-05"), 5.0),
        ("c", _d("2024-01-04"), 4.0),
    ]
    obs = spark.createDataFrame(rows, ["user", "d", "value"])

    fast = gap_fill(obs, ["user"], "d", ["value"])

    scaffold = date_scaffold(obs, ["user"], F.col("d"))
    joined = scaffold.join(
        obs.select("user", "d", "value"), ["user", "d"], "left"
    ).withColumn("observed", F.col("value").isNotNull())
    slow = forward_fill(joined, ["user"], "d", ["value"]).drop("value")

    key = lambda df: sorted(
        (r.user, str(r.d), r.value_ff, r.observed) for r in df.collect()
    )
    assert key(fast) == key(slow)


def test_interpolate_linear_duplicate_observations(spark):
    """Duplicate (entity, date) rows previously made next_d == d and the
    span sequence() crashed with illegal boundaries. They now collapse
    to one observation (greatest value wins, deterministically)."""
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.operators.gapfill import (
        interpolate_linear,
    )

    d = dt.date
    obs = spark.createDataFrame(
        [("e", d(2024, 1, 1), 10.0),
         ("e", d(2024, 1, 1), 2.0),    # duplicate date — loses (smaller)
         ("e", d(2024, 1, 5), 50.0)],
        ["k", "dt", "v"],
    )
    out = interpolate_linear(obs, ["k"], "dt", "v").orderBy("d").collect()
    assert [r.d for r in out] == [d(2024, 1, 1 + i) for i in range(5)]
    # greatest duplicate (10.0) anchors the interpolation toward 50.0
    assert [r.v_lerp for r in out] == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert [r.observed for r in out] == [True, False, False, False, True]


def test_time_weighted_avg_hand_checked(spark):
    """Each value weighted by days-until-next; last observation counts 1
    day; exact rational result."""
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.operators.gapfill import (
        time_weighted_avg,
    )

    d = dt.date
    obs = spark.createDataFrame(
        # e: 10.0 for 3 days (1st->4th), 40.0 for 1 day (last) => (30+40)/4
        [("e", d(2024, 1, 1), 10.0), ("e", d(2024, 1, 4), 40.0),
         # f: single observation => its own value
         ("f", d(2024, 1, 1), 7.5)],
        ["k", "dt", "v"],
    )
    got = {r.k: (r.twa, r.n_obs, r.days_covered)
           for r in time_weighted_avg(obs, ["k"], "dt", "v").collect()}
    assert got["e"] == ((10.0 * 3 + 40.0 * 1) / 4, 2, 4)
    assert got["f"] == (7.5, 1, 1)


def test_fuzz_gap_fill_matches_python_replay(spark):
    """Seeded random sparse series vs a pure-Python LOCF replay: spans
    run from each observation to the day before the next (last span to
    the global end), fills carry the last NON-NULL value, and observed
    is True only on an observation's own day with a non-NULL raw value.
    Varies entity count, gap structure, NULL observations, and input
    partitioning."""
    import datetime as _dt
    import random

    base = _dt.date(2024, 1, 1)
    rng = random.Random(1313)
    for trial in range(6):
        ents = [f"e{i}" for i in range(rng.randint(1, 4))]
        rows = []
        for e in ents:
            days = sorted(rng.sample(range(0, 25), rng.randint(1, 8)))
            for d in days:
                v = None if rng.random() < 0.25 else float(rng.randint(1, 9))
                rows.append((e, base + _dt.timedelta(days=d), v))
        df = spark.createDataFrame(
            rows, "ent string, d date, v double"
        ).repartition(rng.choice([1, 3, 7]))
        got = {
            (r.ent, r.d): (r.v_ff, r.observed)
            for r in gap_fill(df, ["ent"], "d", ["v"]).collect()
        }

        lo = min(r[1] for r in rows)
        hi = max(r[1] for r in rows)
        per: dict = {}
        for e, d, v in rows:
            per.setdefault(e, []).append((d, v))
        want = {}
        for e, obs in per.items():
            obs.sort()
            # leading scaffold: global start up to the entity's first
            # observation, NULL-filled and unobserved
            day = lo
            while day < obs[0][0]:
                want[(e, day)] = (None, False)
                day += _dt.timedelta(days=1)
            ff = None
            for i, (d, v) in enumerate(obs):
                if v is not None:
                    ff = v
                span_end = (
                    obs[i + 1][0] - _dt.timedelta(days=1)
                    if i + 1 < len(obs) else hi
                )
                day = d
                while day <= span_end:
                    want[(e, day)] = (ff, day == d and v is not None)
                    day += _dt.timedelta(days=1)
        assert got == want, f"trial={trial}"


def test_fuzz_interpolate_linear_matches_python_replay(spark):
    """Seeded random series (duplicate (entity, date) observations
    included) vs a pure-Python replay of interpolate_linear: duplicates
    collapse to the greatest non-NULL value per date, each span lerps
    v + (nv - v) * (k / span) — the operator's exact float order, so
    equality is exact — and the last observation emits only its own
    day (no extrapolation)."""
    import datetime as _dt
    import random

    base = _dt.date(2024, 1, 1)
    rng = random.Random(2424)
    for trial in range(6):
        ents = [f"e{i}" for i in range(rng.randint(1, 3))]
        rows = []
        for e in ents:
            for _ in range(rng.randint(1, 10)):
                d = base + _dt.timedelta(days=rng.randint(0, 20))
                v = None if rng.random() < 0.15 else float(rng.randint(1, 99))
                rows.append((e, d, v))
        df = spark.createDataFrame(
            rows, "ent string, d date, v double"
        ).repartition(rng.choice([1, 4]))
        got = {
            (r.ent, r.d): (r.v_lerp, r.observed)
            for r in interpolate_linear(df, ["ent"], "d", "v").collect()
        }

        per: dict = {}
        for e, d, v in rows:
            per.setdefault(e, {}).setdefault(d, []).append(v)
        want = {}
        for e, by_date in per.items():
            dedup = []
            for d in sorted(by_date):
                nn = [v for v in by_date[d] if v is not None]
                dedup.append((d, max(nn) if nn else None))
            for i, (d, v) in enumerate(dedup):
                if i + 1 < len(dedup):
                    nd, nv = dedup[i + 1]
                    span = (nd - d).days
                    day = d
                    while day < nd:
                        k = (day - d).days
                        if day == d:
                            val = v
                        elif v is None or nv is None:
                            val = None
                        else:
                            val = v + (nv - v) * (k / span)
                        want[(e, day)] = (val, day == d)
                        day += _dt.timedelta(days=1)
                else:
                    want[(e, d)] = (v, True)
        assert got == want, f"trial={trial}"
