"""Benchmark harness: runs the catalog's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...top-10...},
 "n": 174, "sf": ...}

The full 174-entry per-query timing map goes to ``bench_full.json`` next to
this script — rounds 1-3 printed all of them on the single stdout line,
which overflowed the driver's tail capture and left every ``BENCH_r*.json``
with ``"parsed": null``. The final line now stays small enough to parse;
``queries`` carries only the 10 slowest (the ones worth reading inline).

Each query is forced end-to-end with the noop sink (full execution, no
driver collect). A warmup run of the flagship amortizes JVM/codegen start-up
out of individual timings.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Previous committed run (read BEFORE this run overwrites the file):
    # its per-query warm comparator feeds the mover re-time rule below,
    # closing the round-9 blind spot where a query drifting under the
    # absolute re-time threshold (bigram_collocations, 1.08 -> 1.92 s)
    # was never warm-verified.
    prev_warm: dict[str, float] = {}
    try:
        prev = json.loads((REPO / "bench_full.json").read_text())
        prev_r = prev.get("rerun_best", {})
        prev_warm = {
            n: prev_r.get(n, t) for n, t in prev.get("queries", {}).items()
        }
    except Exception:  # noqa: BLE001 - first run / corrupt file: no comparator
        pass

    qs = catalog.queries()
    # Warmup: JVM + whole-stage-codegen compilation is a one-time,
    # data-size-independent cost (generated classes are keyed by plan
    # structure, JIT-compiled once per session) — but it lands on
    # whichever query first exercises a pipeline family, misattributing
    # seconds of compiler time to that query's row-processing cost.
    # Measured on this box: returnflag_quantity_zscore first-touch 6.5 s
    # vs 0.9 s steady-state on IDENTICAL data — 85% of the "query time"
    # was compilation. So every catalog query warms once at the SMALLEST
    # sf first (compiling the same generated classes against negligible
    # data, untimed but reported as warmup_sec in bench_full.json), and
    # the timed loop below measures steady-state query cost at sf_dir —
    # the number that scales to 100 TB, where per-plan compile time is
    # noise against hours of row processing.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    # When sf0.001 is absent the warmup runs at sf_dir itself — the whole
    # catalog executes once UNTIMED at full scale, roughly doubling wall
    # time. warmup_at_full_scale in the output makes that attributable
    # instead of silently inflating warmup_sec.
    warmup_at_full_scale = not os.path.isdir(warm_dir)
    if warmup_at_full_scale:
        warm_dir = sf_dir
    t_warm = time.time()
    for warm_q, warm_fn in qs.items():
        try:
            _force(warm_fn(spark, warm_dir))
        except Exception:  # noqa: BLE001 - warmup must never sink the run
            pass
        spark.catalog.clearCache()
    warmup_sec = round(time.time() - t_warm, 3)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            _force(fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - one bad query must not sink the run
            errors[name] = str(exc).split("\n")[0][:200]
        # isolate queries: drop any cache a query left behind so later
        # timings measure the query, not accumulated heap/GC pressure
        spark.catalog.clearCache()

    # Warm best-of-N re-timing for the slow tail: this box shows random
    # 3-30x single-query JIT/code-cache spikes deep into a session
    # (PERF.md), so a single pass cannot distinguish "regressed" from
    # "spiked once". Queries above the rerun threshold get N extra warm
    # runs; rerun_best records min(first, reruns) and jit_spikes lists
    # queries whose first run was >= 1.5x their warm best — those are
    # spikes, not regressions. The headline total stays the single-pass
    # sum (comparable to every earlier round). MOVERS — queries whose
    # first run is >= 1.5x their previous committed warm comparator —
    # are re-timed too, whatever their absolute time, so sub-threshold
    # drift is always warm-verified (round-10 rule).
    n_reruns = int(os.environ.get("SPARK_GRAFT_BENCH_RERUNS", "2"))
    rerun_threshold = float(
        os.environ.get("SPARK_GRAFT_BENCH_RERUN_THRESHOLD", "2.5")
    )
    movers = sorted(
        n
        for n, first in timings.items()
        if n in prev_warm and first >= 1.5 * prev_warm[n]
    )
    rerun_best: dict[str, float] = {}
    if n_reruns > 0:
        for name, first in sorted(timings.items(), key=lambda kv: -kv[1]):
            if first < rerun_threshold and name not in movers:
                continue
            best = first
            for _ in range(n_reruns):
                t0 = time.time()
                try:
                    _force(qs[name](spark, sf_dir))
                    best = min(best, round(time.time() - t0, 3))
                except Exception:  # noqa: BLE001
                    break
                spark.catalog.clearCache()
            rerun_best[name] = best
    jit_spikes = sorted(
        n for n, b in rerun_best.items() if timings[n] >= 1.5 * b
    )

    total = round(sum(timings.values()), 3)
    # The SPIKE-ROBUST comparator (PERF.md "Bench totals"): per query,
    # the warm best where a re-time ran, else the single first run.
    # Same-code single-pass totals spread up to ±27% on this box (three
    # same-day r8 runs: 175.5 / 215.2 / 239.4 s — all JIT/code-cache
    # spikes, confirmed by rerun_best); warm_total strips exactly that,
    # so it is the round-over-round number. `value` stays the single-pass
    # sum for comparability with rounds 1-8.
    warm_total = round(
        sum(rerun_best.get(n, t) for n, t in timings.items()), 3
    )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    full = {
        "metric": "catalog_total_runtime",
        "value": total,
        "warm_total": warm_total,
        "unit": "sec",
        "queries": timings,
        "n": len(timings),
        "warmup_sec": warmup_sec,
        "sf": sf,
        "rerun_best": rerun_best,
        "jit_spikes": jit_spikes,
        "movers_retimed": movers,
    }
    if warmup_at_full_scale:
        full["warmup_at_full_scale"] = True
    if errors:
        full["errors"] = errors
    (REPO / "bench_full.json").write_text(json.dumps(full, indent=1))
    payload = {
        "metric": "catalog_total_runtime",
        "value": total,
        "warm_total": warm_total,
        "unit": "sec",
        "queries": slowest,
        "n": len(timings),
        "n_errors": len(errors),
        "sf": sf,
        "rerun_best": {n: rerun_best[n] for n in slowest if n in rerun_best},
        "jit_spikes": jit_spikes,
    }
    if warmup_at_full_scale:
        payload["warmup_at_full_scale"] = True
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
