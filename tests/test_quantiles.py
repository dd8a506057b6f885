"""MRL mergeable quantile summary (dataops/quantiles.py): exactness
below k, the classical rank-error guarantee against exact history,
bitwise determinism across partitionings, per-group state bounds, and
merge semantics."""

import bisect
import random

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.quantiles import (
    CARRY_LEVEL,
    mrl_build,
    mrl_merge,
    mrl_quantiles,
    mrl_rank_error_bound,
    mrl_state_bound,
)

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_errors(sorted_vals, est_by_q):
    """Distance from the target rank q*n to the NEAREST rank the
    estimated value occupies — a duplicated value holds a whole rank
    interval [bisect_left, bisect_right], and landing anywhere inside
    it is a zero-error answer."""
    n = len(sorted_vals)
    out = {}
    for q, est in est_by_q.items():
        lo = bisect.bisect_left(sorted_vals, est)
        hi = bisect.bisect_right(sorted_vals, est)
        t = q * n
        out[q] = 0.0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t))
    return out


def _check(spark, vals, k, label):
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    s = mrl_build(df, "value", k)
    rows = s.collect()
    max_level = max((r.level for r in rows), default=CARRY_LEVEL)
    assert len(rows) <= mrl_state_bound(k, max(max_level, 0)), label
    bound = mrl_rank_error_bound(k, max(max_level, 0), len(vals))
    est = {r.q: r.est for r in mrl_quantiles(s, QS).collect()}
    sv = sorted(vals)
    errs = _rank_errors(sv, est)
    for q, e in errs.items():
        assert e <= bound, (label, q, e, bound)
    # every estimate is a REAL ingested value, not an interpolation
    vset = set(vals)
    assert all(v in vset for v in est.values()), label
    return s, bound, sv


def test_mrl_exact_below_k(spark):
    """Below k values the ladder is the raw carry and quantile read-off
    is exact rank selection."""
    vals = [float(v) for v in range(97)]
    s, _, _ = _check(spark, vals, 256, "below-k")
    rows = s.collect()
    assert {r.level for r in rows} == {CARRY_LEVEL}
    assert len(rows) == 97
    est = {r.q: r.est for r in mrl_quantiles(s, [0.5, 0.9]).collect()}
    # cw >= q*W with weight 1 each -> ceil(q*n)-th smallest (1-based)
    assert est[0.5] == 48.0  # ceil(48.5) = 49th value = 48.0
    assert est[0.9] == 87.0


def test_mrl_bound_and_determinism_across_distributions(spark):
    """The classical guarantee must hold on gaussian, heavily skewed,
    and duplicate-heavy inputs, and the summary must be bitwise
    identical on any partitioning."""
    rng = random.Random(11)
    gauss = [rng.gauss(0, 1) for _ in range(12_000)]
    skew = [rng.paretovariate(1.2) for _ in range(12_000)]
    dups = [float(rng.randrange(17)) for _ in range(12_000)]
    for label, vals in [("gauss", gauss), ("skew", skew), ("dups", dups)]:
        s, _, _ = _check(spark, vals, 128, label)
        df = spark.createDataFrame([(float(v),) for v in vals], "value double")
        s2 = mrl_build(df.repartition(13), "value", 128)
        assert sorted(map(tuple, s.collect())) == sorted(
            map(tuple, s2.collect())
        ), label


def test_mrl_grouped_per_group_bounds(spark):
    """group_cols: one independent ladder per group; the bound and the
    state formula hold per group."""
    rng = random.Random(5)
    rows = []
    truth = {}
    for g, n in [("a", 5000), ("b", 900), ("c", 40)]:
        vs = [rng.uniform(0, 10) * (1 + (g == "b") * 99) for _ in range(n)]
        truth[g] = sorted(vs)
        rows += [(g, v) for v in vs]
    df = spark.createDataFrame(rows, "g string, value double")
    k = 64
    s = mrl_build(df, "value", k, ["g"])
    per_group = {}
    for r in s.collect():
        per_group.setdefault(r.g, []).append(r)
    assert set(per_group) == {"a", "b", "c"}
    ests = {}
    for r in mrl_quantiles(s, QS, ["g"]).collect():
        ests.setdefault(r.g, {})[r.q] = r.est
    for g, sv in truth.items():
        max_level = max((r.level for r in per_group[g]), default=CARRY_LEVEL)
        assert len(per_group[g]) <= mrl_state_bound(k, max(max_level, 0))
        bound = mrl_rank_error_bound(k, max(max_level, 0), len(sv))
        for q, e in _rank_errors(sv, ests[g]).items():
            assert e <= bound, (g, q, e, bound)
    # group c below k: exact carry
    assert {r.level for r in per_group["c"]} == {CARRY_LEVEL}


def test_mrl_merge_matches_combined_stream_bound(spark):
    """mrl_merge(build(A), build(B)) must satisfy the combined stream's
    guarantee (the ladder union is a ladder of A ++ B), including
    carries that overflow k on concatenation."""
    rng = random.Random(23)
    a = [rng.gauss(50, 5) for _ in range(7000)]
    b = [rng.gauss(80, 5) for _ in range(3100)]
    k = 128
    da = spark.createDataFrame([(v,) for v in a], "value double")
    db = spark.createDataFrame([(v,) for v in b], "value double")
    m = mrl_merge(mrl_build(da, "value", k), mrl_build(db, "value", k), k)
    rows = m.collect()
    max_level = max(r.level for r in rows)
    assert len(rows) <= mrl_state_bound(k, max_level)
    # at most one buffer per level survives (+ the sub-k carry)
    lad = [r for r in rows if r.level >= 0]
    assert len({r.level for r in lad}) == len({(r.level, r.buf) for r in lad})
    assert sum(1 for r in rows if r.level == CARRY_LEVEL) < k
    # total weight is preserved exactly
    w = sum(1.0 if r.level == CARRY_LEVEL else 2.0 ** r.level for r in rows)
    assert w == len(a) + len(b)
    sv = sorted(a + b)
    bound = mrl_rank_error_bound(k, max_level, len(sv))
    est = {r.q: r.est for r in mrl_quantiles(m, QS).collect()}
    for q, e in _rank_errors(sv, est).items():
        assert e <= bound, (q, e, bound)


def test_mrl_null_values_excluded(spark):
    """NULL values have no rank: excluded from the summary and from the
    total weight."""
    df = spark.createDataFrame(
        [(float(v),) for v in range(50)] + [(None,)] * 10, "value double"
    )
    s = mrl_build(df, "value", 64)
    rows = s.collect()
    assert len(rows) == 50
    assert all(r.value is not None for r in rows)


def test_mrl_state_bound_helper():
    assert mrl_state_bound(64, 0) == 128
    assert mrl_state_bound(64, 3) == 64 * 5
    assert mrl_rank_error_bound(100, 4, 10_000) == pytest.approx(
        4 * 10_000 / 200 + 100
    )
