"""Plan audit: writes PLANS.md — formatted physical plans + scale metrics
for the headline queries, so plan regressions (lost pushdown, surprise
shuffles, dropped broadcasts) are reviewable in diffs.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "session_incident_overlaps",
    "click_nearest_purchase",
    "lineitem_correlation_matrix",
    "user_state_cdc",
    "throttled_user_events",
    "copurchased_parts",
    "discounted_revenue_probe",
    "unshipped_order_revenue",
    "returned_revenue_customers",
    "preferred_daily_event",
    "bigram_collocations",
    "order_price_iqr_outliers",
    "orders_price_neighborhood",
    "cheapest_supplier_per_part",
    "nation_year_profit",
    "customer_order_count_distribution",
    "similar_customer_names",
    "order_status_priority_marginals",
    "daily_user_value_interpolated",
    "top_customer_per_year",
    "pricing_summary",
    "customer_scope_fanout",
    "order_snapshot_series",
    "asof_order_snapshot",
    "recent_customer_semi",
    "top_customer_label",
    "regional_supplier_volume",
    "rolling_90d_spend",
    "minhash_dedup_pairs_docs",
    "ngram_jaccard_pairs_docs",
    "embedding_cosine_topk",
    "embedding_rp_lsh_topk",
    "token_budget_packing",
    "benchmark_contamination_docs",
    "hourly_event_stats",
    "daily_user_value_gapfill",
    "doc_chunks_overlap",
    "small_lot_part_revenue",
    "big_quantity_orders",
    "customer_order_gaps",
    "customer_spend_distribution",
    "customer_spend_deciles",
    "embedding_near_dup_pairs",
    "doc_token_familiarity",
    "doc_split_assignment",
    "purchase_click_attribution_window",
    "order_pit_features",
    "copurchase_pagerank",
    "heavy_hitter_tokens",
    "semantic_dedup_embeddings",
    "fk_integrity_audit",
    "key_skew_report",
    "returnflag_top_parts",
    "split_priority_drift",
    "contrastive_negatives_docs",
    "returnflag_quantity_zscore",
    "returnflag_weighted_median_price",
    "user_daily_value_ewma",
    "order_price_equidepth_hist",
    "split_price_drift_ks",
    "lineitem_order_join_fanout",
    "frequent_part_itemsets",
    "copurchase_triangles",
    "event_props_variant",
    "ldiversity_customer_segments",
    "lang_heavy_hitter_tokens",
    "top_session_paths",
    "customer_rfm_segments",
    "part_association_rules",
    "customer_spend_gini",
    "doc_ngram_novelty",
    "corpus_token_budget",
    "weekday_revenue_seasonality",
    "order_lineitem_date_audit",
    "nation_share_of_region_revenue",
    "weekly_distinct_users_bitmap",
    "frequent_session_sequences",
    "embedding_pq_topk",
    "corpus_mixture_sample",
    "temperature_mixture_docs",
    "embedding_kmeans_lloyd",
    "part_price_size_skyline",
    "doc_top_terms_tfidf",
    "doc_pii_scan",
    "session_step_transitions",
    "daily_revenue_cusum",
    "order_price_benford",
    "source_lang_gini_impurity",
    "customer_revenue_pareto",
    "orders_maintained_status_rollup",
    "token_cms_estimates",
    "doc_token_bloom_fpr",
]

#: hard plan invariants, checked on every regeneration: query -> callable
#: over the formatted plan text raising AssertionError on regression
def _no_unpartitioned_window(plan: str) -> None:
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__pid" in line, (
                "unpartitioned global Window regressed into the plan "
                f"(expected every window keyed by __pid): {line.strip()}"
            )


def _no_join_explosion(plan: str) -> None:
    low = plan.lower()
    assert "cartesianproduct" not in low and "broadcastnestedloopjoin" not in low, (
        "as-of/PIT join regressed into an inequality-join explosion"
    )


def _broadcast_refine(plan: str) -> None:
    assert "BroadcastHashJoin" in plan, (
        "heavy-hitter exact recount lost its broadcast candidate filter"
    )


def _checkpointed_graph_plan(plan: str) -> None:
    """The iterative-graph materialization contract (graph.py): the edge
    build is lazily local-checkpointed, so every per-iteration (or
    per-branch) reference reads executor blocks — the plan must contain
    ONLY ExistingRDD scans, zero parquet re-derivations of the edge
    subtree. (Before the triangles checkpoint this plan re-derived the
    fact-table self-join 60x: 104k plan chars; now ~4k.)"""
    assert "Scan ExistingRDD" in plan, "graph plan lost its checkpoint"
    assert "Scan parquet" not in plan, (
        "graph plan re-derives the edge build from the source scan "
        "instead of reading the checkpointed blocks"
    )


def _pq_scoring_shape(plan: str) -> None:
    """PQ contract: codebooks ride broadcasts (ADC lookup is map-side —
    no shuffle keyed on codebook entries), and nothing degenerates into
    a cartesian pair scan. The 1-row codebook frames plan as
    BroadcastNestedLoopJoin over a single row (sanctioned); a
    CartesianProduct or a codebook-side shuffle would mean the scoring
    stopped being map-only."""
    assert "BroadcastExchange" in plan, "PQ codebooks are no longer broadcast"
    assert "CartesianProduct" not in plan


def _semantic_dedup_join_quantizer(plan: str) -> None:
    """Round-4 change: assignment must ride the k-independent broadcast
    carrier (a one-row createDataFrame centroid frame, planned as a
    Scan ExistingRDD under a BroadcastExchange + 1-row
    BroadcastNestedLoopJoin), not a k x dim literal argmax. The
    array_min-over-__cents fold is the join-path marker: the literal
    path has no array_min and no broadcast centroid carrier."""
    assert "array_min" in plan and "BroadcastNestedLoopJoin" in plan, (
        "semantic dedup lost its broadcast-join quantizer (literal-path "
        "regression: plan size would again grow O(k x dim))"
    )


PLAN_ASSERTS = {
    "customer_spend_distribution": _no_unpartitioned_window,
    "customer_spend_deciles": _no_unpartitioned_window,
    "order_pit_features": _no_join_explosion,
    "heavy_hitter_tokens": _broadcast_refine,
    "copurchase_pagerank": _checkpointed_graph_plan,
    "copurchase_triangles": _checkpointed_graph_plan,
    "embedding_pq_topk": _pq_scoring_shape,
    "semantic_dedup_embeddings": _semantic_dedup_join_quantizer,
}

#: measured results appended to every regeneration (tools/skewbench.py)
SKEW_SECTION = """
## Skew-join benchmark (tools/skewbench.py)

Planted hot key: 90% of fact rows on one key, joined to a 1001-row dim
with broadcast disabled so the skew hits a real shuffle. local[32],
measured 2026-08-13:

| n_rows | plain SMJ (skew task) | AQE skew-join | salted_join (32 salts) | salted speedup |
|---|---|---|---|---|
| 5M | 2.82 s | 2.42 s | 1.78 s | 1.58x |
| 20M | 8.35 s | 7.37 s | 3.31 s | 2.52x |

The salted path spreads the hot key over 32 tasks instead of one; the gap
widens with data size (the plain join's wall-clock is the single hot
task). AQE's runtime split helps less here because the hot partition is
split only after the map stage materializes it. At 100 TB the salted form
is the one that keeps 999 executors busy; `salted_agg` applies the same
trick when the skewed side feeds an aggregation AQE cannot split.
"""


#: Queries ALLOWED to plan a global (unpartitioned) Window, each with
#: the row bound that proves the windowed frame is post-aggregate and
#: BOUNDED — not data-volume-scaled. Any catalog plan with a global
#: Window outside this table is a violation: at 100 TB an unpartitioned
#: window sorts its whole input in ONE task. (weighted_doc_sample and
#: sole_returning_supplier used to be here in spirit — both were
#: rewritten to orderBy+limit / TakeOrderedAndProject in round 7.)
BOUNDED_GLOBAL_WINDOWS = {
    # cumulative revenue over the per-DAY series: ≤ ~2.4k rows (TPC-H
    # order-date span), fixed by the calendar regardless of SF
    "daily_revenue_cusum",
    # Benford digit distribution: exactly 9 rows (leading digits 1-9)
    "order_price_benford",
    # chi-square cell table: |mktsegment| x |orderpriority| = 25 cells
    "segment_priority_chisq",
    # per-day HLL sketch rollup series: ≤ events-date-span days
    "rolling_7d_distinct_users",
    # week-over-week series: ≤ ~350 ISO weeks over the TPC-H date span
    "weekly_revenue_growth",
    # cumulative counts over the equi-width histogram frame: ≤
    # price-range / 20k buckets (~30 rows), fixed by the bucket width
    # regardless of SF
    "order_price_histogram_quantiles",
    # MRL ladder read-off: cumulative weight over the SUMMARY frame —
    # k x (levels + 2) rows by construction (k=512: ~3.5k rows even at
    # sf1000, levels grow only as log2(n/k)), never the raw data. The
    # unkeyed read-off partitions by the module's constant __g marker,
    # which Catalyst folds away, leaving a syntactically global window
    # over the provably bounded frame.
    "order_price_mrl_quantiles",
}

_SORT_TOKEN = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)\b")


def _bracket_groups(s: str) -> list[str]:
    """Top-level [...] groups of a plan node line (nesting-aware)."""
    out: list[str] = []
    depth = 0
    cur = ""
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(cur)
                continue
        if depth >= 1:
            cur += ch
    return out


def global_window_lines(plan: str) -> list[str]:
    """Unpartitioned Window nodes in an executedPlan string. Node format
    is ``Window [exprs], [partitionSpec], [orderSpec]`` with empty specs
    omitted, so: 3 groups = partitioned; 2 groups = partitioned-unordered
    (fine, distributed) UNLESS the 2nd group carries sort tokens, which
    makes it an ORDERED GLOBAL window; 1 group = global unordered window
    (whole frame in one task). WindowGroupLimit prints its partition spec
    first — empty means global."""
    bad = []
    for raw in plan.splitlines():
        line = raw.lstrip(" +-:*")
        if line.startswith(("Window ", "WindowInPandas ")):
            g = _bracket_groups(line)
            if len(g) == 1 or (len(g) == 2 and _SORT_TOKEN.search(g[1])):
                bad.append(line.strip()[:160])
        elif line.startswith("WindowGroupLimit "):
            g = _bracket_groups(line)
            if g and g[0].strip() == "":
                bad.append(line.strip()[:160])
    return bad


def _global_invariants(name: str, plan: str) -> list[str]:
    """Mechanical invariants asserted on EVERY catalog plan (the same
    contract tests/test_plans.py sweeps): no cartesian pair explosion,
    no row-at-a-time Python UDF, and no global Window outside the
    bounded-frame whitelist. Returns violations."""
    bad = []
    if "CartesianProduct" in plan:
        bad.append(f"{name}: CartesianProduct in plan")
    if "BatchEvalPython" in plan:
        bad.append(f"{name}: row-wise BatchEvalPython UDF in plan")
    if name not in BOUNDED_GLOBAL_WINDOWS:
        for line in global_window_lines(plan):
            bad.append(
                f"{name}: global Window on a non-whitelisted frame "
                f"(single-task sort at scale): {line}"
            )
    return bad


def _plan_stats(plan: str) -> dict:
    return {
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "ex": len(re.findall(r"\bExchange\b", plan)),
        "pushed": sum(
            1
            for line in plan.splitlines()
            if "PushedFilters" in line and "[]" not in line
        ),
        "arrow": len(re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    spark = build_session(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    plans: dict[str, str] = {}
    violations: list[str] = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        plans[name] = plan
        violations += _global_invariants(name, plan)
        if name in PLAN_ASSERTS:
            PLAN_ASSERTS[name](plan)
    assert not violations, "\n".join(violations)

    out = [
        "# PLANS — physical-plan audit of ALL catalog queries",
        "",
        f"Generated by `tools/plan_audit.py` over `{sf_dir}`:",
        f"**{len(plans)} queries audited** — every plan mechanically",
        "checked for the global invariants (no CartesianProduct, no",
        "row-wise BatchEvalPython UDF) plus the per-query contracts in",
        "`PLAN_ASSERTS` (checkpointed graph reuse, broadcast quantizers,",
        "partitioned windows, PQ broadcast codebooks). Headline queries",
        "get full formatted trees; the full-catalog table summarizes",
        "joins / exchanges / pushdown / Arrow stages per plan.",
        "",
        "## Full-catalog summary",
        "",
        "| query | broadcast | sort-merge | exchanges | scans w/ pushdown | Arrow stages |",
        "|---|---|---|---|---|---|",
    ]
    for name in plans:
        s = _plan_stats(plans[name])
        out.append(
            f"| {name} | {s['bhj']} | {s['smj']} | {s['ex']} | "
            f"{s['pushed']} | {s['arrow']} |"
        )
    out += [
        "",
        "# Headline query trees",
        "",
        "Reviewed properties: minimal ReadSchema (column pruning),",
        "PushedFilters (predicate pushdown to the scan), broadcast vs",
        "sort-merge joins, exchange count (shuffles).",
        "",
    ]
    for name in HEADLINE:
        plan = plans[name]
        s = _plan_stats(plan)
        pushed = [
            line.strip()
            for line in plan.splitlines()
            if "PushedFilters" in line and "[]" not in line
        ]
        schemas = [
            line.strip() for line in plan.splitlines() if "ReadSchema" in line
        ]
        out += [
            f"## {name}",
            "",
            f"- broadcast joins: {s['bhj']}, sort-merge joins: {s['smj']}, "
            f"exchanges: {s['ex']}",
        ]
        out += [f"- `{p}`" for p in pushed[:4]]
        out += [f"- `{sch}`" for sch in schemas[:4]]
        # keep the tree only (first block) to stay reviewable
        tree = plan.split("\n\n")[0]
        out += ["", "```", tree, "```", ""]

    out.append(SKEW_SECTION)
    # hand-measured appendix sections survive regeneration
    for extra in sorted((REPO / "tools" / "plan_notes").glob("*.md")):
        out.append(extra.read_text())
    Path(REPO / "PLANS.md").write_text("\n".join(out))
    print(
        f"wrote PLANS.md ({len(plans)} queries audited, "
        f"{len(HEADLINE)} headline trees)"
    )


if __name__ == "__main__":
    main()
