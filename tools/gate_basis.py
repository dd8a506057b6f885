"""Regenerate the driver-gate staleness basis (GATE_BASIS_r{N}.json).

The correctness gate (catalog._GATE_PRIORITY) is rotated each round by
EVIDENCE FRESHNESS: the 50 oracled queries whose newest driver
CORRECTNESS row is oldest go first. Since round 11 the rotation is
machine-derived: this script snapshots, for every oracled query in the
current catalog, the newest round with a driver row (0 = never gated),
writes GATE_BASIS_r{N}.json, and prints the intended 50-slot gate —
paste it into catalog._GATE_PRIORITY verbatim.
tests/test_catalog.py::test_gate_priority_queries_in_first_50
re-validates the basis against the committed CORRECTNESS files and
fails if the gate drifts from it.

Usage: python tools/gate_basis.py <round-number> [--write]
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_SLOTS = 50


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: python tools/gate_basis.py <round> [--write]")
    rnd = int(sys.argv[1])
    write = "--write" in sys.argv

    from f1_data_engineering_machine_learning_spark import catalog

    newest: dict[str, int] = {}
    for p in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", Path(p).name).group(1))
        if r >= rnd:
            continue  # evidence from this round or later: not basis input
        for q in json.load(open(p)):
            newest[q] = max(newest.get(q, 0), r)

    names = sorted(catalog.oracle_sql())
    basis = {n: newest.get(n, 0) for n in names}
    gate = sorted(basis, key=lambda n: (basis[n], n))[:N_SLOTS]

    out = REPO / f"GATE_BASIS_r{rnd:02d}.json"
    doc = {"round": rnd, "n_slots": N_SLOTS, "basis": basis}
    if write:
        out.write_text(json.dumps(doc, indent=1, sort_keys=True))
        print(f"wrote {out}")
    for i, n in enumerate(gate, 1):
        print(f"{i:3d}  r{basis[n]}  {n}")


if __name__ == "__main__":
    main()
