"""Raw stage: one ;-separated CSV per (year, round, session).

Reproduces the reference's ingestion layout
(/root/reference/scripts/01_raw.py:129-141): filename
``{year}_{gp:02d}_{identifier}.csv``, ``;`` separator, header row, written
driver-side (the reference pulls from the FastF1 API driver-side too — S1;
here the source is the deterministic fixture, or any iterable of row
dicts). The bronze stage then glob-reads these files back through Spark
(02_bronze semantics), closing the raw -> bronze loop.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from collections.abc import Iterable


def write_raw_csvs(rows: Iterable[dict], out_dir: str) -> list[str]:
    """Write one CSV per session; returns the sorted file list. Column
    order follows the reference's frame layout (provenance columns
    appended last — /root/reference/scripts/01_raw.py:97-105)."""
    os.makedirs(out_dir, exist_ok=True)
    by_session: dict[tuple[str, int, str], list[dict]] = defaultdict(list)
    for row in rows:
        key = (row["year"], int(row["RoundNumber"]), row["identifier"])
        by_session[key].append(row)

    paths = []
    for (year, rnd, identifier), session_rows in sorted(by_session.items()):
        path = os.path.join(out_dir, f"{year}_{rnd:02d}_{identifier}.csv")
        cols = list(session_rows[0].keys())
        with open(path, "w", newline="", encoding="utf-8") as fh:
            writer = csv.DictWriter(fh, fieldnames=cols, delimiter=";")
            writer.writeheader()
            writer.writerows(session_rows)
        paths.append(path)
    return sorted(paths)
