"""sf1 VALUE verification for copurchase_triangles (round-11, closing
the one exception in the round-10 sf1 value tier).

The direct DuckDB replay of the triangle oracle at sf1 is temp-disk
bound (>80 GB wedge-join spill — COVERAGE.md round-10). But the sf1
derivation (tools/scaleprobe.py) is 10 DISJOINT id-shifted copies of
the sf0.1 tables: every l_orderkey and l_partkey in copy ``i`` is
shifted by ``i * 100_000_000``, so no co-purchase edge ever crosses
copies and the sf1 co-purchase graph is exactly 10 disconnected
isomorphic copies of the sf0.1 graph. Triangle counts are a
per-connected-component property, therefore:

    triangles(sf1) == UNION over i of shift_i(triangles(sf0.1))

— an EXACT closed form, not a sample. This script verifies the Spark
engine's actual sf1 answer against that closed form, with the DuckDB
oracle run only at sf0.1 (where it fits comfortably). The disjointness
lemma itself is pytest-pinned at small scale in
tests/test_graph.py::test_triangle_count_disjoint_shifted_copies.

Usage: python tools/verify_triangles_sf1.py [sf1_dir] [sf01_dir]
Prints PASS/FAIL plus row counts; exit code 1 on FAIL.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

COPIES = 10
OFFSET = 100_000_000


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".scratch" / "sf1")
    sf01_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from f1_data_engineering_machine_learning_spark import catalog
    from f1_data_engineering_machine_learning_spark.session import build_session

    # oracle at sf0.1 (bounded working set)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf01_dir}/lineitem.parquet')"
    )
    base = con.execute(catalog.oracle_sql()["copurchase_triangles"]).fetchall()
    expected = {
        (node + i * OFFSET, n) for node, n in base for i in range(COPIES)
    }

    # engine at sf1 (the thing under verification)
    spark = build_session(app_name="verify-triangles-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    got_rows = catalog.queries()["copurchase_triangles"](spark, sf1_dir).collect()
    got = {(r[0], r[1]) for r in got_rows}

    ok = got == expected
    print(
        f"{'PASS' if ok else 'FAIL'} copurchase_triangles sf1: "
        f"spark={len(got)} rows, closed-form expected={len(expected)} rows "
        f"(sf0.1 oracle base={len(base)} x {COPIES} disjoint copies)"
    )
    if not ok:
        only_got = sorted(got - expected)[:5]
        only_exp = sorted(expected - got)[:5]
        print(f"  only-in-spark: {only_got}")
        print(f"  only-in-expected: {only_exp}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
