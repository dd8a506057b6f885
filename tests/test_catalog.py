"""Catalog smoke + semantics tests on sf0.001.

The full oracle equivalence check lives in tools/selfcheck.py (and the
driver's own gate); these tests assert structural invariants cheaply.
"""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark import catalog


def test_every_oracle_has_a_query():
    qs, oracles = catalog.queries(), catalog.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(catalog.queries()))
def test_query_runs_nonempty(spark, sf_dir, name):
    df = catalog.queries()[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_flagship_one_row_per_year(spark, sf_dir):
    rows = catalog.top_customer_per_year(spark, sf_dir).collect()
    years = [r.o_year for r in rows]
    assert len(years) == len(set(years))
    assert all(r.revenue > 0 for r in rows)


def test_scope_fanout_nesting(spark, sf_dir):
    """Trailing/current scopes are subsets of lifetime; NULL when empty."""
    for r in catalog.customer_scope_fanout(spark, sf_dir).collect():
        assert r.qtdLife >= r.qtd1y >= 0
        assert r.qtdLife >= r.qtdCur >= 0
        if r.qtd1y == 0:
            assert r.total1y is None and r.avgSpend1y is None
        if r.qtdCur == 0:
            assert r.totalCur is None and r.avgSpendCur is None


def test_semi_anti_partition_customers(spark, sf_dir):
    from f1_data_engineering_machine_learning_spark.io import load_testdata

    n_customers = load_testdata(spark, sf_dir, ("customer",))["customer"].count()
    n_semi = catalog.recent_customer_semi(spark, sf_dir).count()
    n_anti = catalog.lapsed_customer_anti(spark, sf_dir).count()
    assert n_semi + n_anti == n_customers


def test_label_join_flags_are_binary(spark, sf_dir):
    vals = {
        r.fl_top for r in catalog.top_customer_label(spark, sf_dir).collect()
    }
    assert vals <= {0, 1} and 1 in vals


def test_dedup_keep_last_is_max_ts(spark, sf_dir):
    """Keeper must carry the max (ts, event_id) of its group."""
    from pyspark.sql import functions as F

    ev = catalog._events(spark, sf_dir)
    expected = (
        ev.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("ts", "event_id")).alias("m"))
        .select("user_id", "event_type", F.col("m.event_id").alias("event_id"))
    )
    got = catalog.dedup_keep_last_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id"
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_gate_priority_queries_in_first_50():
    """The external correctness gate snapshots the first 50 queries() in
    iteration order. Round 10 rotates by EVIDENCE FRESHNESS per the r9
    verdict's task 1: slots 1-5 are the five full-oracle queries added
    after the r9 gate ran (no driver row yet — the histogram-quantile
    pair, the bottom-k sampling pair, the KMV estimate), slots 6-50 are
    45 of the 46 remaining r6-stale queries taken alphabetically
    (weighted_doc_sample spills to the r11 gate with the round-10
    additions). Every gated entry is value-oracle-paired; the one
    rows-only entry (embedding_lsh_topk) sits past the cutoff.
    Cumulatively, rounds 1-9 hard-verified every catalog query except
    the rows-only entry and the five post-r9-gate additions now in
    slots 1-5."""
    import json
    import os

    from f1_data_engineering_machine_learning_spark import catalog

    names = list(catalog.queries())
    oracles = catalog.oracle_sql()
    for i, n in enumerate(catalog._GATE_PRIORITY):
        assert n in catalog._QUERIES, f"{n} not registered"
        assert names.index(n) == i, f"{n} not at iteration position {i}"
    newest: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5, 6, 7, 8, 9):
        p = f"CORRECTNESS_r0{r}.json"
        if os.path.exists(p):
            for q in json.load(open(p)):
                newest[q] = r
    for n in names[:50]:
        assert n in oracles, f"{n} in the 50-slot gate without a value oracle"
    assert names[:5] == [
        "order_price_histogram_quantiles",
        "priority_price_histogram_quantiles",
        "doc_bottomk_sample",
        "lang_bottomk_sample",
        "doc_kmv_distinct_estimate",
    ]
    for n in names[:5]:
        assert n not in newest, f"{n} in a never-gated slot but has a driver row"
    # slots 6-50: exactly the alphabetical r6-stale tier minus the spill
    r6_tier = sorted(q for q, r in newest.items() if r == 6 and q in catalog._QUERIES)
    assert names[5:50] == [q for q in r6_tier if q != "weighted_doc_sample"]
    assert newest.get("weighted_doc_sample") == 6  # documented spill, r11 queue
    # cumulative hard verification: rounds 1-9 covered everything except
    # the documented rows-only entry, the five post-r9-gate additions
    # now occupying slots 1-5, and the two round-10 additions (NFC
    # fixture, grouped KMV — same-day selfcheck evidence, r11 queue)
    never = set(catalog._QUERIES) - set(newest)
    assert never == {
        "embedding_lsh_topk",
        "order_price_histogram_quantiles",
        "priority_price_histogram_quantiles",
        "doc_bottomk_sample",
        "doc_kmv_distinct_estimate",
        "lang_bottomk_sample",
        "nfc_normalized_fixture",
        "lang_kmv_distinct_estimates",
    }, never
    assert "embedding_lsh_topk" not in names[:50]


def test_variant_nested_typed_extraction(spark):
    """Spark 4 VARIANT surface: one parse, many typed nested probes —
    incl. missing-path NULL semantics and schema introspection."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('{"user": {"id": 7, "tags": ["a", "b"]}, "score": 1.5}',),
            ('{"user": {"id": 9}, "score": null}',),
            ("not json at all",),
        ],
        ["j"],
    )
    v = df.select(F.try_parse_json("j").alias("v")).select(
        F.try_variant_get("v", "$.user.id", "bigint").alias("uid"),
        F.try_variant_get("v", "$.user.tags[1]", "string").alias("tag1"),
        F.try_variant_get("v", "$.score", "double").alias("score"),
        F.try_variant_get("v", "$.missing", "int").alias("absent"),
    )
    rows = v.collect()
    assert (rows[0].uid, rows[0].tag1, rows[0].score) == (7, "b", 1.5)
    assert rows[1].uid == 9 and rows[1].tag1 is None and rows[1].score is None
    # malformed input -> NULL variant -> NULL extractions, no exception
    assert rows[2].uid is None and rows[2].absent is None


def test_all_queries_execute_under_ansi_session(spark, sf_dir):
    """The external correctness gate runs every query with a STOCK
    SparkSession — Spark 4 defaults, so ANSI mode ON — while
    build_session (tests, bench, selfcheck) turns ANSI off for the
    reference's permissive-cast semantics. Any expression that only
    works permissively (runtime divide-by-zero, failing cast, bad array
    index) passes every local check and then throws its first driver
    row. Flip the session to ANSI and execute the ENTIRE catalog, so the
    gap between local evidence and the driver's session stays closed
    (caught live: doc_token_bloom_fpr's fpr division, NULL-divisor under
    non-ANSI, DIVIDE_BY_ZERO under the driver's ANSI)."""
    from f1_data_engineering_machine_learning_spark import catalog

    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        failures = []
        for name, fn in catalog.queries().items():
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{name}: {str(exc).splitlines()[0][:160]}")
        assert not failures, "\n".join(failures)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
