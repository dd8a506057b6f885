"""String z-order sampled-boundary pruning at SCALE (round-11 verdict
task 6): the 70k-distinct pytest (tests/test_versioned.py::
test_compact_zorder_string_high_cardinality_sampled_boundaries) proves
the fallback CORRECT; this probe measures its PRUNING POWER at the
cardinality the fallback actually exists for — a >= 1M-distinct string
column (the url_host / doc-source clustering shape of a 100 TB
training-data lake, far beyond the 65,536-distinct exact-dictionary
arm) — and compares it against plain lexicographic sort on the same
data.

Layout under test: (host string ~1M distinct zipf-ish, day int) rows,
compacted to 64 files three ways:

- ``zorder_by=["host", "day"]`` — sampled lex-quantile boundaries for
  the string (256 equi-depth buckets from a deterministic 64k-row
  hash-ordered sample) interleaved with the day dimension;
- ``sort_by=["host", "day"]`` — lexicographic sort: maximal pruning on
  the leading string, nothing on day (the known trade);
- ``sort_by=["day", "host"]`` — day-led sort: the string column spans
  every file (the shape you get from daily ingest without clustering).

Probes: a narrow contiguous host-prefix slice (one "site family") and
a 2-week day slice, via VersionedTable.pruned_file_count (manifest
min/max skipping — the same stats a 100 TB scan planner reads).

Writes nothing outside .scratch/ (gitignored). Results -> one JSON
line; the measured row is recorded in SCALING.md.

Usage: python tools/zorder_string_probe.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_ROWS = 4_000_000
N_HOSTS = 1_000_000  # distinct strings — 15x past the exact-dict cap
N_FILES = 64


def main() -> None:
    from f1_data_engineering_machine_learning_spark.plans.versioned import (
        VersionedTable,
    )
    from f1_data_engineering_machine_learning_spark.session import (
        build_session,
    )

    spark = build_session(app_name="zorder-string-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = REPO / ".scratch" / "zorder_string_probe"
    shutil.rmtree(scratch, ignore_errors=True)

    # ~1M distinct hosts with a skewed (power-law-ish) visit mix: host id
    # = floor of id**0.85-style fold so low host ids repeat more — the
    # real url_host shape (hot domains + long tail). Deterministic.
    df = spark.range(N_ROWS).selectExpr(
        f"CONCAT('h-', LPAD(CAST(CAST(POW(id % {N_ROWS}, 0.97) AS BIGINT) % "
        f"{N_HOSTS} AS STRING), 7, '0'), '.example.com') AS host",
        "CAST(id % 28 AS INT) AS day",
        "id AS visit_id",
    )

    results: dict[str, object] = {
        "n_rows": N_ROWS,
        "n_files": N_FILES,
    }

    def build(name: str, **compact_kw) -> VersionedTable:
        t = VersionedTable(spark, str(scratch / name))
        t.commit(df, mode="overwrite", stats_cols=["host", "day"])
        t0 = time.time()
        v = t.compact(num_files=N_FILES, stats_cols=["host", "day"], **compact_kw)
        results[f"{name}_compact_sec"] = round(time.time() - t0, 1)
        n_distinct = t.read(version=v).selectExpr(
            "COUNT(DISTINCT host) AS d"
        ).first().d
        results.setdefault("n_distinct_hosts", n_distinct)
        assert t.read(version=v).count() == N_ROWS
        return t

    # a ~0.35% contiguous host-prefix slice (one lexicographic family)
    host_probe = ("host", "h-0200000.example.com", "h-0203499.example.com")
    day_probe = ("day", 7, 20)  # 2 weeks of 28

    for name, kw in [
        # single-column: isolates the sampled-boundary fallback's own
        # pruning power (files = contiguous sampled-lex-rank ranges)
        ("zorder_host_only", {"zorder_by": ["host"]}),
        ("zorder", {"zorder_by": ["host", "day"]}),
        ("sort_host", {"sort_by": ["host", "day"]}),
        ("sort_day", {"sort_by": ["day", "host"]}),
    ]:
        t = build(name, **kw)
        hk, ht = t.pruned_file_count(None, host_probe)
        dk, dt = t.pruned_file_count(None, day_probe)
        assert ht == dt == N_FILES
        results[f"{name}_host_slice_kept"] = hk
        results[f"{name}_day_slice_kept"] = dk

    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
