"""Property-based tests (hypothesis): operator semantics vs Python ground
truth on arbitrary inputs — guards the invariants the oracle checks depend
on (exact medians, sentinel casts, decimal-exact aggregation)."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.functions import dsum, sentinel_int
from f1_data_engineering_machine_learning_spark.operators import exact_median

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40))
@_settings
def test_exact_median_matches_statistics(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = df.agg(exact_median("x").alias("m")).collect()[0].m
    assert got == statistics.median(vals)


@given(
    raw=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=500).map(str),
            st.integers(min_value=0, max_value=500).map(lambda v: f"{v}.0"),
            st.sampled_from(["R", "", "DNF", "x1", None]),
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_sentinel_cast_matches_python(spark, raw):
    def expected(s):
        if s is None:
            return 99
        try:
            return int(float(s))
        except ValueError:
            return 99

    df = spark.createDataFrame([(v,) for v in raw], "x string")
    got = [r.v for r in df.select(sentinel_int("x").alias("v")).collect()]
    assert got == [expected(v) for v in raw]


@given(
    cents=st.lists(
        st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50
    ),
    parts=st.integers(min_value=1, max_value=13),
)
@_settings
def test_dsum_partition_invariant_and_exact(spark, cents, parts):
    vals = [c / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(parts)
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    # ground truth via integer cents — exact regardless of float order
    assert got == float(sum(cents)) / 100.0


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # key
            st.integers(min_value=0, max_value=50),   # ts offset (days)
            st.sampled_from(["A", "B", "C"]),         # state
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_scd2_episodes_tile_the_timeline(spark, events):
    """SCD2 invariants for ANY event stream: per key, episodes are
    non-overlapping, consecutive, cover first->last event, consecutive
    episodes differ in state, and exactly one episode is current."""
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.operators import scd2_build

    rows = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), s, i)
        for i, (k, d, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "state", "seq"])
    out = scd2_build(df, ["k"], ["state"], "ts", ["seq"]).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, eps in by_key.items():
        eps.sort(key=lambda r: r.valid_from)
        key_events = sorted(
            [(ts, seq, s) for kk, ts, s, seq in rows if kk == k]
        )
        assert eps[0].valid_from == key_events[0][0]       # starts at first event
        assert eps[-1].valid_to is None                    # last episode open
        assert sum(1 for e in eps if e.is_current) == 1    # exactly one current
        for a, b in zip(eps, eps[1:]):
            assert a.valid_to == b.valid_from              # consecutive, no gaps
            assert a.state != b.state                      # real changes only


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    parts=st.integers(min_value=1, max_value=6),
    ntile=st.integers(min_value=1, max_value=9),
)
@_settings
def test_range_partitioned_rank_matches_python(spark, vals, parts, ntile):
    """Distributed two-pass rank == Python ground truth on arbitrary
    multisets (heavy ties included), for every output and any partition
    count."""
    from f1_data_engineering_machine_learning_spark.operators.windows import (
        range_partitioned_rank,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(3)
    got = {
        r.id: (r.rk, r.rn, r.pr, r.cd, r.nt)
        for r in range_partitioned_rank(
            df, ["v"], rank_col="rk", row_number_col="rn",
            percent_rank_col="pr", cume_dist_col="cd",
            ntile=ntile, ntile_col="nt", tiebreak=["id"],
            num_partitions=parts,
        ).collect()
    }
    n = len(vals)
    order = sorted(range(n), key=lambda i: (vals[i], i))
    rn_of = {i: pos + 1 for pos, i in enumerate(order)}
    rank_of = {i: 1 + sum(1 for v in vals if v < vals[i]) for i in range(n)}
    le_of = {i: sum(1 for v in vals if v <= vals[i]) for i in range(n)}
    base, rem = divmod(n, ntile)
    for i in range(n):
        rk, rn, pr, cd, nt = got[i]
        assert rk == rank_of[i]
        assert rn == rn_of[i]
        assert pr == (0.0 if n == 1 else (rank_of[i] - 1) / (n - 1))
        assert cd == le_of[i] / n
        # SQL NTILE: first rem buckets have base+1 rows
        r0 = rn_of[i] - 1
        want_nt = (
            r0 // (base + 1) + 1
            if base == 0 or r0 < rem * (base + 1)
            else rem + (r0 - rem * (base + 1)) // base + 1
        )
        assert nt == want_nt, (vals, i)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=40,
    )
)
@_settings
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from f1_data_engineering_machine_learning_spark.operators.graph import (
        triangle_count,
    )

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = simple
    want: dict[int, int] = {}
    nodes = {n for e in simple for n in e}
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (x, z), (y, z)} <= adj:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    if not simple:
        return
    df = spark.createDataFrame(list(edges), ["src", "dst"]).filter(
        F.col("src") != F.col("dst")
    )
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == want


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=30)
)
@_settings
def test_weighted_median_unit_weights_is_python_lower_median(spark, vals):
    from f1_data_engineering_machine_learning_spark.operators.aggregates import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [("g", float(v), 1) for v in vals], "k string, v double, w int"
    )
    got = weighted_median(df, "v", "w", ["k"]).collect()[0].weighted_median
    want = float(statistics.median_low(vals))
    assert got == want


@given(
    vals=st.lists(st.integers(-100, 100), min_size=2, max_size=30),
    weights=st.lists(st.integers(1, 9), min_size=2, max_size=30),
)
@_settings
def test_weighted_median_equals_expanded_multiset(spark, vals, weights):
    """Integer weight w == the value repeated w times (lower median)."""
    from f1_data_engineering_machine_learning_spark.operators.aggregates import (
        weighted_median,
    )

    n = min(len(vals), len(weights))
    vals, weights = vals[:n], weights[:n]
    df = spark.createDataFrame(
        [("g", float(v), w) for v, w in zip(vals, weights)],
        "k string, v double, w int",
    )
    got = weighted_median(df, "v", "w", ["k"]).collect()[0].weighted_median
    expanded = sorted(v for v, w in zip(vals, weights) for _ in range(w))
    want = float(statistics.median_low(expanded))
    assert got == want


@given(vals=st.lists(st.integers(-1000, 1000), min_size=2, max_size=40))
@_settings
def test_zscore_matches_python_population_moments(spark, vals):
    import math

    from f1_data_engineering_machine_learning_spark.operators.robust import (
        zscore_normalize,
    )

    df = spark.createDataFrame([("g", float(v)) for v in vals], ["k", "v"])
    rows = zscore_normalize(df, "v", ["k"], scale=0).collect()
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    for r in rows:
        if var <= 0:
            assert r.v_z is None
        else:
            assert abs(r.v_z - (r.v - mean) / math.sqrt(var)) < 1e-9


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 5000),       # minute offset
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda e: (e[0], e[1]),
    )
)
@_settings
def test_session_paths_matches_python(spark, events):
    import datetime as dt
    from collections import Counter

    from f1_data_engineering_machine_learning_spark.operators.sessions import (
        session_paths,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, t0 + dt.timedelta(minutes=m), s)
        for i, (u, m, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "et"])
    got = {
        r.path: (r.n_sessions, r.n_steps)
        for r in session_paths(
            df, ["user_id"], "ts", "et", 30.0, tiebreak=["event_id"]
        ).collect()
    }
    # python reference: per-user sort by (ts, id), break at gap > 30 min
    per_user: dict = {}
    for u, i, ts, s in rows:
        per_user.setdefault(u, []).append((ts, i, s))
    paths: Counter = Counter()
    for seq in per_user.values():
        seq.sort()
        cur, prev = [], None
        for ts, i, s in seq:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                paths[">".join(cur)] += 1
                cur = []
            cur.append(s)
            prev = ts
        paths[">".join(cur)] += 1
    want = {p: (n, len(p.split(">"))) for p, n in paths.items()}
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=1,
        max_size=60,
    ),
    width=st.sampled_from([7.0, 100.0, 12345.0]),
    fracs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    split_at=st.integers(min_value=0, max_value=60),
    parts=st.integers(min_value=1, max_value=7),
)
@_settings
def test_histogram_quantiles_bound_and_merge_property(
    spark, vals, width, fracs, split_at, parts
):
    """For ARBITRARY data, widths, and fracs: (1) the read-off quantile is
    within one bucket width of the exact rank-ceil(r) order statistic;
    (2) reading quantiles off merged slice-histograms is BITWISE reading
    them off the full-data histogram, for any split point and any
    partitioning."""
    import math

    from f1_data_engineering_machine_learning_spark.dataops.quality import (
        histogram_quantiles,
        merge_numeric_histograms,
        numeric_histogram,
    )

    fvals = [float(v) for v in vals]
    df = spark.createDataFrame([(v,) for v in fvals], "v double").repartition(parts)
    full = numeric_histogram(df, "v", width)
    got = {r.frac: r.qvalue for r in histogram_quantiles(full, fracs).collect()}
    s = sorted(fvals)
    n = len(s)
    assert set(got) == set(fracs)
    for f in fracs:
        r = 1.0 + f * (n - 1)
        order_stat = s[min(math.ceil(r), n) - 1]
        assert abs(got[f] - order_stat) <= width, (f, got[f], order_stat, width)

    cut = min(split_at, len(fvals))
    a = spark.createDataFrame([(v,) for v in fvals[:cut]] or [(None,)], "v double")
    b = spark.createDataFrame([(v,) for v in fvals[cut:]] or [(None,)], "v double")
    merged = merge_numeric_histograms(
        numeric_histogram(a, "v", width), numeric_histogram(b, "v", width)
    )
    got_m = {r.frac: r.qvalue for r in histogram_quantiles(merged, fracs).collect()}
    assert got_m == got  # bitwise


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=20),
    split_at=st.integers(min_value=0, max_value=60),
    parts=st.integers(min_value=1, max_value=7),
)
@_settings
def test_bottomk_sample_matches_python_md5_and_merges(
    spark, keys, k, split_at, parts
):
    """For ARBITRARY unique keys: membership equals the Python md5
    ground truth (engine-portability), is partition-invariant, and
    bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B) at any split."""
    import hashlib

    from f1_data_engineering_machine_learning_spark.dataops.sampling import (
        bottomk_sample,
    )

    df = spark.createDataFrame([(v,) for v in keys], "id long").repartition(parts)
    got = {r.id for r in bottomk_sample(df, "id", k).collect()}
    want = set(
        sorted(keys, key=lambda v: hashlib.md5(str(v).encode()).hexdigest())[:k]
    )
    assert got == want

    cut = min(split_at, len(keys))
    a = spark.createDataFrame([(v,) for v in keys[:cut]] or [(None,)], "id long")
    b = spark.createDataFrame([(v,) for v in keys[cut:]] or [(None,)], "id long")
    merged = {
        r.id
        for r in bottomk_sample(
            bottomk_sample(a, "id", k).unionByName(bottomk_sample(b, "id", k)),
            "id",
            k,
        ).collect()
    }
    assert merged == want
