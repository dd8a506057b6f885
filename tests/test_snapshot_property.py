"""Property: snapshot loop == single-pass on randomized fact tables."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.plans.snapshot import (
    SnapshotSpec,
    scoped_avg,
    scoped_count,
    scoped_median,
    scoped_sum,
    snapshot_loop,
    snapshot_single_pass,
)
from tests.util_compare import assert_frames_equal


def _random_facts(spark, rng: random.Random, n: int):
    rows = [
        (
            f"e{rng.randint(0, 8)}",
            f"2023-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} 12:00:00",
            float(rng.randint(0, 100)),
            rng.choice(["a", "b"]),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "k string, d string, v double, kind string")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loop_equals_single_pass_random(spark, seed):
    rng = random.Random(seed)
    facts = _random_facts(spark, rng, 300)
    spec = SnapshotSpec(
        entity_keys=["k"],
        date_col="d",
        scopes={
            "life": lambda ref, d: d <= ref,
            "90d": lambda ref, d: d >= ref - F.expr("INTERVAL 90 DAY"),
        },
        aggs=[
            ("n", "life", scoped_count()),
            ("n_a", "life", scoped_count(F.col("kind") == "a")),
            ("avg_v", "life", scoped_avg("v")),
            ("med_v", "life", scoped_median("v")),
            ("n_90d", "90d", scoped_count()),
            ("sum_v_90d", "90d", scoped_sum("v")),
            ("med_v_90d", "90d", scoped_median("v")),
        ],
        activity_scope="90d",
        extra_cols={"dtYear": lambda ref: F.year(ref)},
    )
    dates = sorted(
        {f"2023-{rng.randint(2, 12):02d}-15" for _ in range(4)}
    )
    a = snapshot_loop(facts, spec, dates).toPandas()
    b = snapshot_single_pass(facts, spec, dates).toPandas()
    a["dtRef"] = a["dtRef"].astype(str)
    b["dtRef"] = b["dtRef"].astype(str)
    assert_frames_equal(a, b, f"snapshot-equivalence seed={seed}")
    assert len(a) > 0


def test_rollup_cascade_equals_direct(spark, sf_dir):
    """Each cascaded level must equal the same aggregation from raw."""
    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.plans.rollup import (
        cascade,
        rollup_level,
    )
    from tests.util_compare import assert_frames_equal

    ev = catalog._events(spark, sf_dir)
    levels = cascade(ev, "ts", ["event_type"], "value", levels=("minute", "hour", "day"))
    for level in ("hour", "day"):
        direct = rollup_level(ev, level, "ts", ["event_type"], "value").toPandas()
        composed = levels[level].toPandas()
        for df in (direct, composed):
            df["bucket"] = df["bucket"].astype(str)
            df["sum_v"] = df["sum_v"].astype(float)
        assert_frames_equal(composed, direct, f"cascade@{level}")
