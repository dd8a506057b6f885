"""BPE trainer DEPTH microbench: production-scale merge counts.

The round-7 microbench validated the batched trainer shape at 64
merges / M<=16 (2 lineage-cut cycles). The ~126-scans-for-32k-merges
claim rests on per-scan cost staying FLAT across MANY cut cycles and
across very deep in-batch fold chains (M=256 stacks 256 chained
aggregate-HOF projections between consecutive scans). This tool runs
the trainer to ~1k merges at M in {16, 64, 128, 256} and prints the
per-scan wall-time trend, so plan-accretion regressions are measured,
not extrapolated.

Usage: python tools/bpebench.py [--variants V] [sf_dir] [n_merges] [M ...]
Defaults: /root/testdata/sf0.1 1024 16 64 128 256

``--variants V``: the sf0.1 documents corpus saturates at ~113 learnable
merges (its fixture vocabulary fully merges into single symbols), far
short of the scan depths the 126-scans-for-32k claim needs. V > 1 unions
V deterministic alphabet-ROTATION copies of the same testdata text
(translate a->b->c...), each minting a disjoint vocabulary with the same
pair structure — merge capacity scales ~V x with zero synthetic data
generation, so the trainer mechanics (plan accretion across lineage-cut
cycles, deep in-batch fold chains) are measurable at production scan
counts.

Output: one table row per M — scans completed, merges learned (early
stop when the corpus runs out of pairs), total wall, mean of the first
5 scans vs the last 5 scans (flatness), and the max single scan.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_AZ = "abcdefghijklmnopqrstuvwxyz"


def main() -> None:
    args = sys.argv[1:]
    variants = 1
    if "--variants" in args:
        i = args.index("--variants")
        variants = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_merges = int(args[1]) if len(args) > 1 else 1024
    ms = [int(a) for a in args[2:]] or [16, 64, 128, 256]

    from pyspark.sql import functions as F

    from f1_data_engineering_machine_learning_spark.dataops.bpe import train_bpe
    from f1_data_engineering_machine_learning_spark.session import build_session

    spark = build_session(app_name="bpebench")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lower(F.col("text")).alias("text")
    )
    docs = base
    for v in range(1, variants):
        rot = _AZ[v:] + _AZ[:v]
        docs = docs.union(base.select(F.translate("text", _AZ, rot).alias("text")))
    docs = docs.persist()
    n_docs = docs.count()
    print(f"corpus rows: {n_docs} (variants={variants})")

    print(f"sf_dir={sf_dir} n_merges={n_merges}")
    print("M | scans | merges | total_s | first5_mean_s | last5_mean_s | max_scan_s")
    for m in ms:
        times: list[float] = []

        def hook(i: int, w: float, done: int, _times=times) -> None:
            _times.append(w)

        t0 = time.time()
        merges, vocab = train_bpe(
            docs, n_merges=n_merges, batch_size=m, scan_hook=hook
        )
        total = time.time() - t0
        vocab.unpersist()
        first5 = statistics.mean(times[:5]) if times else 0.0
        last5 = statistics.mean(times[-5:]) if times else 0.0
        print(
            f"{m} | {len(times)} | {len(merges)} | {total:.1f} | "
            f"{first5:.2f} | {last5:.2f} | {max(times):.2f}"
            if times
            else f"{m} | 0 | 0 | {total:.1f} | - | - | -"
        )
        # free any persisted intermediates before the next arm
        spark.catalog.clearCache()
        docs.persist().count()


if __name__ == "__main__":
    main()
