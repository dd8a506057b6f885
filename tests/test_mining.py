"""Frequent-itemset mining: FP-growth vs hand-enumerable baskets."""

from __future__ import annotations

from f1_data_engineering_machine_learning_spark.dataops.mining import (
    frequent_itemsets,
)


def test_frequent_itemsets_known_baskets(spark):
    # baskets: {1,2,3} x3, {1,2} x1, {4} x1
    rows = []
    for b in range(3):
        rows += [(b, 1), (b, 2), (b, 3)]
    rows += [(3, 1), (3, 2), (4, 4)]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.itemset, r.size, r.freq)
        for r in frequent_itemsets(df, "basket", "item", min_count=3).collect()
    }
    assert got == {
        ("1", 1, 4), ("2", 1, 4), ("3", 1, 3),
        ("1,2", 2, 4), ("1,3", 2, 3), ("2,3", 2, 3),
        ("1,2,3", 3, 3),
    }


def test_frequent_itemsets_max_size_and_duplicates(spark):
    # duplicate item lines in one basket must not inflate support
    rows = [(0, 7), (0, 7), (0, 8), (1, 7), (1, 8)]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.itemset, r.freq)
        for r in frequent_itemsets(
            df, "basket", "item", min_count=2, max_size=1
        ).collect()
    }
    assert got == {("7", 2), ("8", 2)}  # pairs excluded by max_size


def test_frequent_itemsets_numeric_canonical_order(spark):
    # items 2 and 10 co-occur: canonical form must be numeric "2,10"
    rows = [(0, 2), (0, 10), (1, 2), (1, 10)]
    df = spark.createDataFrame(rows, ["basket", "item"])
    sets = {
        r.itemset
        for r in frequent_itemsets(df, "basket", "item", min_count=2).collect()
    }
    assert "2,10" in sets and "10,2" not in sets


def test_frequent_itemsets_support_above_basket_count_is_empty(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], ["basket", "item"])
    out = frequent_itemsets(df, "basket", "item", min_count=99)
    assert out.count() == 0
    assert out.columns == ["itemset", "size", "freq"]


def test_frequent_sequences_subsequence_not_substring(spark):
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.dataops.mining import (
        frequent_sequences,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    # sessions: (a,b,c) x2 and (a,c) x1 -> "a>c" freq 3 (non-contiguous!)
    rows = []
    sid = 0
    for seq in (["a", "b", "c"], ["a", "b", "c"], ["a", "c"]):
        for i, s in enumerate(seq):
            rows.append((sid, i, t0 + i * m, s))
        sid += 1
    df = spark.createDataFrame(rows, ["sess", "eid", "ts", "step"])
    got = {
        (r.pattern, r.freq)
        for r in frequent_sequences(
            df, ["sess"], "ts", "step", min_count=3, max_len=2, tiebreak=["eid"]
        ).collect()
    }
    assert got == {("a", 3), ("c", 3), ("a>c", 3)}


def test_frequent_sequences_order_matters(spark):
    import datetime as dt

    from f1_data_engineering_machine_learning_spark.dataops.mining import (
        frequent_sequences,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [(0, 0, t0, "x"), (0, 1, t0 + m, "y"),
            (1, 0, t0, "y"), (1, 1, t0 + m, "x")]
    df = spark.createDataFrame(rows, ["sess", "eid", "ts", "step"])
    got = {
        (r.pattern, r.freq)
        for r in frequent_sequences(
            df, ["sess"], "ts", "step", min_count=1, max_len=2, tiebreak=["eid"]
        ).collect()
    }
    # each direction appears in exactly one session
    assert ("x>y", 1) in got and ("y>x", 1) in got
    assert ("x", 2) in got and ("y", 2) in got


def test_frequent_itemsets_enum_and_pfp_arms_agree(spark):
    """The adaptive arms must be bitwise-identical: the enumeration path
    (default for narrow baskets, max_size <= 3) vs MLlib PFP (forced
    here with enum_max_width=0). Mixed-width baskets incl. a singleton
    and numeric ids whose string sort would differ from numeric."""
    rows = []
    for b in range(4):
        for item in (2, 10, 33, 100)[: 2 + b % 3]:
            rows.append((b, item))
    rows += [(9, 100)]
    df = spark.createDataFrame(rows, ["basket", "item"])
    enum_out = {
        (r.itemset, r.size, r.freq)
        for r in frequent_itemsets(df, "basket", "item", min_count=2).collect()
    }
    pfp_out = {
        (r.itemset, r.size, r.freq)
        for r in frequent_itemsets(
            df, "basket", "item", min_count=2, enum_max_width=0
        ).collect()
    }
    assert enum_out == pfp_out
    assert ("2,10", 2, 4) in enum_out  # numeric canonical order, not "10,2"


def test_frequent_itemsets_wide_basket_falls_back_to_pfp(spark):
    """A basket wider than enum_max_width must route to PFP (enumeration
    fan-out is C(b,3)); result still exact."""
    rows = [(0, i) for i in range(10)] + [(1, 0), (1, 1)]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.itemset, r.size, r.freq)
        for r in frequent_itemsets(
            df, "basket", "item", min_count=2, enum_max_width=8
        ).collect()
    }
    assert got == {("0", 1, 2), ("1", 1, 2), ("0,1", 2, 2)}
