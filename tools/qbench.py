"""Per-query warm micro-bench + plan capture for optimization work.

Usage:
    python tools/qbench.py [--sf DIR] [--runs N] [--plan OUTDIR] query [query ...]

For each named catalog query: one untimed sf0.001 codegen warmup, then N
timed noop-sink runs at the target sf (default /root/testdata/sf0.1),
reporting every run plus the warm best. ``--plan OUTDIR`` additionally
writes ``<query>.txt`` with the ``explain("formatted")`` tree (the
pre-execution AQE plan — the artifact committed under plans/r12/).
Jobs are labelled via setJobDescription so the UI attributes stages.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--plan", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    ap.add_argument("--jvm", default=None,
                    help="driver extraJavaOptions override")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    if args.jvm is not None:
        os.environ["SPARK_GRAFT_DRIVER_JVM_OPTS"] = args.jvm
    spark = build_session(
        app_name="qbench",
        extra_conf=dict(kv.split("=", 1) for kv in args.conf),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        print(f"available: {sorted(qs)}")
        sys.exit(2)

    for name in args.queries:
        fn = qs[name]
        if args.plan:
            outdir = Path(args.plan)
            outdir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            try:
                # private API: classic local session only (no Spark Connect)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception:  # noqa: BLE001 - Connect/newer PySpark: public capture
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain(mode="formatted")
                plan = buf.getvalue()
            (outdir / f"{name}.txt").write_text(plan)
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: WARMUP ERROR {exc}")
            spark.catalog.clearCache()
        times = []
        err = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - report, keep sweeping
                err = str(exc).split("\n")[0][:200]
                break
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        if err is not None:
            print(f"{name}: ERROR {err}")
        else:
            print(f"{name}: runs={times} best={min(times)}")


if __name__ == "__main__":
    main()
