"""In-session inflation probe (round-13, VERDICT item 1).

Round 12 measured every catalog query running ~2-6x its isolated warm
best inside the long bench session, UNIFORMLY, flat across session age,
with GC / code-cache / metaspace ruled out. This tool isolates the
mechanism: it warms one PROBE query in a fresh session, pollutes the
session with N catalog queries (bench-style: noop sink + clearCache),
re-times the probe, then applies an explicit cleanup (Python gc ->
py4j detach flush -> JVM System.gc, which is what lets Spark's
ContextCleaner actually unpersist accumulated localCheckpoint blocks,
broadcasts and accumulators) and re-times again.

  probe_warm   ~= isolated floor
  probe_dirty  >> probe_warm        -> inflation reproduced
  probe_clean  ~= probe_warm        -> accumulated-state mechanism
  probe_clean  ~= probe_dirty       -> JIT/profile-pollution mechanism

Usage:
  python tools/sessionprobe.py [--probe NAME] [--n N] [--runs K]
                               [--conf k=v ...] [--jvm OPTS]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="customer_rfm_segments")
    ap.add_argument("--n", type=int, default=60, help="pollution query count")
    ap.add_argument("--runs", type=int, default=3, help="probe re-times per phase")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    ap.add_argument("--jvm", default=None, help="driver extraJavaOptions override")
    args = ap.parse_args()

    if args.jvm is not None:
        os.environ["SPARK_GRAFT_DRIVER_JVM_OPTS"] = args.jvm

    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = build_session(app_name="sessionprobe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    qs = catalog.queries()
    probe_fn = qs[args.probe]

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def time_probe(tag: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{tag}")
            t0 = time.time()
            force(probe_fn(spark, args.sf))
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return round(best, 3)

    def cleanup() -> None:
        # Python refs -> py4j finalizers -> JVM weak refs -> ContextCleaner
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 - Connect: no _jvm; skip
            pass
        time.sleep(2.0)

    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        force(probe_fn(spark, warm_dir))
    probe_warm = time_probe("warm")

    names = [n for n in qs if n != args.probe][: args.n]
    t0 = time.time()
    for name in names:
        spark.sparkContext.setJobDescription(f"pollute:{name}")
        try:
            force(qs[name](spark, args.sf))
        except Exception:  # noqa: BLE001 - pollution must not sink the probe
            pass
        spark.catalog.clearCache()
    pollute_sec = round(time.time() - t0, 3)

    probe_dirty = time_probe("dirty")
    cleanup()
    probe_clean = time_probe("clean")

    # storage-state telemetry: what the session is still holding
    sc = spark.sparkContext
    try:
        status = sc._jsc.sc().getRDDStorageInfo()
        n_persisted = len(status)
        mem_used = sum(s.memUsed() for s in status)
    except Exception:  # noqa: BLE001
        n_persisted, mem_used = -1, -1

    print(json.dumps({
        "probe": args.probe,
        "n_pollution": len(names),
        "pollute_sec": pollute_sec,
        "probe_warm": probe_warm,
        "probe_dirty": probe_dirty,
        "probe_clean": probe_clean,
        "inflation_dirty": round(probe_dirty / probe_warm, 2) if probe_warm else None,
        "inflation_clean": round(probe_clean / probe_warm, 2) if probe_warm else None,
        "persisted_rdds": n_persisted,
        "persisted_mem_bytes": mem_used,
        "conf": extra,
        "jvm": args.jvm,
    }))


if __name__ == "__main__":
    main()
