"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and exact cell values (order-insensitive). Floats are compared bitwise first
and with a tolerance report on mismatch, so any engine divergence is visible
before the driver sees it.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_key(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--ansi"]
    # --ansi: replicate the DRIVER's session semantics (stock Spark 4 =>
    # ANSI mode ON) instead of build_session's ANSI-off — the value
    # compare then proves every query under the exact error semantics
    # the external gate runs (see COVERAGE.md "Driver-session parity")
    ansi = "--ansi" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from f1_data_engineering_machine_learning_spark.session import build_session

    # maxResultSize is a HARNESS knob, not an engine one: the value
    # compare collects full results to pandas, and derived-sf1 pair
    # queries legitimately return ~100x rows (content-duplicated
    # copies), tripping the 1g default mid-sweep. Must be set at
    # session build (immutable at runtime).
    spark = build_session(
        app_name="selfcheck",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    if ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single file (driver testdata) or a
        # Spark-written DIRECTORY of part files (derived sf1) — glob
        # the directory form for DuckDB; Spark reads either natively
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{src}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (rows-only, no oracle) "
                  f"[spark {spark_s:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
        else:
            dt_mismatch = [
                (c, str(sdf[c].dtype), str(odf[c].dtype))
                for c in sdf.columns
                if str(sdf[c].dtype) != str(odf[c].dtype)
            ]
            if dt_mismatch:
                problems.append(f"dtypes differ: {dt_mismatch}")
        if not problems:
            a, b = _rows_key(sdf), _rows_key(odf)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y)
                problems.append(f"values differ in {n_bad}/{len(a)} rows")
                for x, y in zip(a, b):
                    if x != y:
                        problems.append(f"  spark : {x}")
                        problems.append(f"  oracle: {y}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(sdf)} [spark {spark_s:.1f}s]")

    print()
    total = len(only) if only else len(qs)
    print(f"{total - len(failures)}/{total} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
