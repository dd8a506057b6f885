"""Misra-Gries two-pass exact heavy hitters (dataops/heavyhitters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
    heavy_hitters,
    misra_gries_candidates,
)


def _items(spark, values, parts=8):
    return spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(parts)


def test_exactly_matches_full_groupby(spark):
    # Zipf-ish: item i appears 1000 // (i + 1) times
    vals = [f"t{i}" for i in range(60) for _ in range(1000 // (i + 1))]
    df = _items(spark, vals)
    phi = 0.02
    got = {
        (r["item"], r["item_count"], r["total_count"])
        for r in heavy_hitters(df, "item", phi).collect()
    }
    n = len(vals)
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    want = {(k, c, n) for k, c in exact.items() if c > phi * n}
    assert got == want and len(want) > 0


def test_candidates_are_superset_under_adversarial_tail(spark):
    # one true heavy hitter drowned in a sea of distinct singletons — the
    # MG decrement storm's worst case; the hitter must still survive
    vals = ["HOT"] * 300 + [f"u{i}" for i in range(5000)]
    df = _items(spark, vals, parts=16)
    phi = 0.05  # 300 / 5300 ~ 5.7% > phi
    cands = {
        r["item"]
        for r in misra_gries_candidates(df, "item", capacity=20).collect()
    }
    assert "HOT" in cands
    got = heavy_hitters(df, "item", phi).collect()
    assert [(r["item"], r["item_count"]) for r in got] == [("HOT", 300)]


def test_partition_count_does_not_change_result(spark):
    vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(200)]
    for parts in (1, 4, 32):
        got = {
            (r["item"], r["item_count"])
            for r in heavy_hitters(_items(spark, vals, parts), "item", 0.1).collect()
        }
        assert got == {("a", 50), ("b", 30)}


def test_nulls_excluded_and_phi_validated(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "item string")
    got = heavy_hitters(df, "item", 0.5).collect()
    # n = 3 non-null; only 'a' (2/3) exceeds 0.5
    assert [(r["item"], r["item_count"], r["total_count"]) for r in got] == [
        ("a", 2, 3)
    ]
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", 0.0)


def test_grouped_heavy_hitters_matches_full_groupby(spark):
    import random

    from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
        grouped_heavy_hitters,
    )

    rng = random.Random(11)
    rows = []
    # group A: 'hot' dominates; group B: different hot item; zipf tails
    for g, hot in (("A", "x"), ("B", "y")):
        rows += [(g, hot)] * 400
        rows += [(g, f"t{rng.randint(0, 200)}") for _ in range(600)]
    df = spark.createDataFrame(rows, ["g", "item"]).repartition(8)
    phi = 0.05
    got = {
        (r.g, r.item, r.item_count, r.group_total)
        for r in grouped_heavy_hitters(df, "g", "item", phi).collect()
    }
    want = {
        (r.g, r.item, r.cnt, r.tot)
        for r in df.groupBy("g", "item")
        .count()
        .withColumnRenamed("count", "cnt")
        .join(df.groupBy("g").count().withColumnRenamed("count", "tot"), "g")
        .filter("cnt > 0.05 * tot")
        .collect()
    }
    assert got == want and len(got) >= 2


def test_grouped_heavy_hitters_isolates_groups(spark):
    from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
        grouped_heavy_hitters,
    )

    # 'z' is heavy ONLY inside tiny group C; globally negligible
    rows = [("big", f"i{n}") for n in range(900)] + [("C", "z")] * 9 + [("C", "w")]
    df = spark.createDataFrame(rows, ["g", "item"]).repartition(4)
    got = {(r.g, r.item) for r in grouped_heavy_hitters(df, "g", "item", 0.5).collect()}
    assert got == {("C", "z")}


def test_cms_never_underestimates_and_merges(spark):
    """CM contract on a planted Zipf-ish stream: estimate >= exact for
    EVERY item, exact for the unique heavy item in a wide sketch, and
    sketch MERGE (cell addition across two halves) == sketch of the
    whole stream."""
    from pyspark.sql import functions as F

    from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
        cms_build,
        cms_estimate,
    )

    rows = (
        [("hot",)] * 500
        + [(f"mid{i}",) for i in range(20) for _ in range(10)]
        + [(f"tail{i}",) for i in range(300)]
    )
    df = spark.createDataFrame(rows, ["t"])
    sketch = cms_build(df, "t", depth=4, width=256)
    items = df.select("t").distinct()
    exact = {r.t: n for r, n in (
        (r, r.n) for r in df.groupBy("t").agg(F.count("*").alias("n")).collect()
    )}
    est = {
        r.t: r.cms_estimate
        for r in cms_estimate(sketch, items, "t", depth=4, width=256).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)  # never underestimates
    assert est["hot"] >= 500

    # mergeability: cells of half1 + cells of half2 == cells of all
    # (halves split explicitly — df.limit() picks arbitrary rows)
    h1 = cms_build(spark.createDataFrame(rows[:400], ["t"]), "t", depth=4, width=256)
    h2 = cms_build(
        spark.createDataFrame(rows[400:], ["t"]), "t", depth=4, width=256
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, sketch.collect()))
    assert a == b


def test_bloom_no_false_negatives_and_merge(spark):
    from pyspark.sql import functions as F

    from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([(f"m{i}",) for i in range(200)], ["t"])
    others = spark.createDataFrame([(f"x{i}",) for i in range(200)], ["t"])
    bloom = bloom_build(members, "t", n_bits=4096, n_hashes=4)
    got_m = bloom_probe(bloom, members, "t", 4096, 4).collect()
    assert all(r.maybe_present for r in got_m)  # no false negatives, ever
    got_o = {r.t: r.maybe_present for r in bloom_probe(bloom, others, "t", 4096, 4).collect()}
    fpr = sum(got_o.values()) / len(got_o)
    assert fpr < 0.10  # k=4, n=200, m=4096 -> theoretical ~0.0008

    # sparse merge: union of two filters' bit rows == filter of the union
    b1 = bloom_build(members, "t", 4096, 4)
    b2 = bloom_build(others, "t", 4096, 4)
    merged = b1.unionByName(b2).distinct()
    whole = bloom_build(members.unionByName(others), "t", 4096, 4)
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in whole.collect()
    )


def test_keyed_cms_groups_are_independent(spark):
    """key_cols builds one independent sketch per group: per-key
    estimates never underestimate per-key true counts and never absorb
    other groups' mass at matching cells; unkeyed behavior unchanged."""
    from f1_data_engineering_machine_learning_spark.dataops.heavyhitters import (
        cms_build,
        cms_estimate,
    )

    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("fr", "a")] * 3 + [
        ("fr", "c")
    ]
    df = spark.createDataFrame(rows, "lang string, token string")
    sk = cms_build(df, "token", depth=3, width=64, key_cols=["lang"])
    items = spark.createDataFrame(
        [("en", "a"), ("en", "b"), ("fr", "a"), ("fr", "c"), ("fr", "b")],
        "lang string, token string",
    )
    est = {
        (r.lang, r.token): r.cms_estimate
        for r in cms_estimate(
            sk, items, "token", depth=3, width=64, key_cols=["lang"]
        ).collect()
    }
    true = {("en", "a"): 5, ("en", "b"): 2, ("fr", "a"): 3, ("fr", "c"): 1,
            ("fr", "b"): 0}
    for k, t in true.items():
        assert est[k] >= t, k  # CM never underestimates, per group
    # width=64, <=3 distinct tokens per group: no collisions -> exact,
    # proving groups don't bleed into each other ('fr','b') == 0
    assert est == true
    # each group's sketch mass equals its own row count
    mass = {
        r.lang: r.s
        for r in sk.groupBy("lang").agg(
            (F.sum("cnt") / 3).alias("s")
        ).collect()
    }
    assert mass == {"en": 7.0, "fr": 4.0}
