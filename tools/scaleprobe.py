"""sf1 scale probe (round-4 verdict item 4): run the round-3 heavy-family
queries at sf0.1 and at a derived sf1 (10x rows) and report the wall-time
growth ratio. A linear algorithm should land near 10x (minus fixed
overhead); a hidden quadratic shows up as >>10x — the failure mode the
sf0.1 bench cannot see.

sf1 derivation: 10 disjoint id-shifted copies of the sf0.1 tables the
probed queries read (lineitem / documents / embeddings). Disjoint copies
preserve per-copy structure exactly, so data volume scales 10x while
every distribution stays fixed — the cleanest "would this survive a
scale-up" input. Written once under .scratch/sf1 (gitignored); testdata
itself is never touched.

Usage: python tools/scaleprobe.py [--regen]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / ".scratch" / "sf1")
COPIES = 10
# id shift per copy, far above any real key in the sf0.1 tables
OFFSET = 100_000_000

QUERIES = [
    "frequent_part_itemsets",
    "embedding_pq_topk",
    "bpe_merges_docs",
    "copurchase_triangles",
    "copurchase_pagerank",
    "contrastive_negatives_docs",
    "semantic_dedup_embeddings",
    "curated_docs_survivors",
    # round-4 additions
    "embedding_kmeans_lloyd",
    "part_price_size_skyline",
    "doc_top_terms_tfidf",
    "doc_pii_scan",
    "session_step_transitions",
    "daily_revenue_cusum",
    "order_price_benford",
    "doc_ngram_novelty",
    "customer_rfm_segments",
]

SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    # fact-side dims grow with SF; shifts mirror the fact keys above so
    # every join stays consistent across copies
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
}

#: true dimensions (25 nations / 5 regions) do NOT grow with SF —
#: duplicating them would fan out every join; copied verbatim once
COPY_VERBATIM = ["nation", "region"]


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    # events.parquet carries TIMESTAMP(NANOS); read it the way
    # catalog._events does (as epoch-nanos longs — the copies then carry
    # the bigint form, which _events converts identically)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table, keys in SHIFT_COLS.items():
        out = Path(SF1) / f"{table}.parquet"
        if out.exists():
            continue
        base = spark.read.parquet(f"{SF01}/{table}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(c)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(str(out))
        print(f"generated {out}")
    for table in COPY_VERBATIM:
        out = Path(SF1) / f"{table}.parquet"
        if out.exists():
            continue
        spark.read.parquet(f"{SF01}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(str(out))
        print(f"generated {out} (verbatim dim)")


def main() -> None:
    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    spark = build_session(app_name="scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv:
        import shutil

        shutil.rmtree(SF1, ignore_errors=True)
    Path(SF1).mkdir(parents=True, exist_ok=True)
    _gen(spark)

    qs = catalog.queries()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.time() - t0, 2)

    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = list(qs) if "--all" in sys.argv else (wanted or QUERIES)
    dump = REPO / ".scratch" / (
        "scaleprobe_all.json" if "--all" in sys.argv else "scaleprobe.json"
    )
    results = json.loads(dump.read_text()) if dump.exists() else {}
    for name in names:
        if name in results and "err" not in results[name]:
            continue  # resumable: keep prior successful probes
        try:
            run(name, "/root/testdata/sf0.001")  # codegen warm at tiny sf
            t01 = run(name, SF01)
            t1 = run(name, SF1)
            results[name] = {
                "sf0.1_s": t01,
                "sf1_s": t1,
                "ratio": round(t1 / t01, 1) if t01 else None,
            }
        except Exception as exc:  # noqa: BLE001 - probe all, report errors
            results[name] = {"err": str(exc).split("\n")[0][:200]}
        print(name, json.dumps(results[name]), flush=True)
        dump.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
