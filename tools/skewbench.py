"""Skew-join benchmark: measure the salting win on a planted hot key.

Plants a fact table where one key owns 90% of the rows (the pathological
shuffle layout: one reducer task gets 90% of the data) and times three
equi-join strategies against a small dim:

  plain    — sort-merge join, AQE skew handling OFF (the naive baseline;
             broadcast disabled so the skew actually hits a shuffle)
  aqe      — sort-merge join with AQE skew-join ON (runtime split of the
             oversized partition; Spark's built-in mitigation)
  salted   — operators/skew.py::salted_join (salt the fact side, replicate
             the dim across salts; works even where AQE can't, e.g. when
             the skewed side feeds an aggregation)

Usage: python tools/skewbench.py [n_rows] [n_salts]
Prints one JSON line; results are recorded in PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from f1_data_engineering_machine_learning_spark.operators.skew import salted_join  # noqa: E402
from f1_data_engineering_machine_learning_spark.session import build_session  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = build_session(app_name="skewbench")
    spark.sparkContext.setLogLevel("ERROR")

    # 90% hot key, long tail over 1000 keys; a payload column so the
    # shuffled bytes are non-trivial
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(1001).select(
        F.when(F.col("id") == 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("k"),
        F.col("id").alias("label"),
    )
    fact.persist().count()
    dim.persist().count()

    def timed(fn):
        t0 = time.time()
        n = fn()
        return round(time.time() - t0, 2), n

    def with_conf(skew_enabled: bool, fn):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower()
        )
        try:
            return timed(fn)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    t_plain, n_plain = with_conf(False, lambda: fact.join(dim, "k").count())
    t_aqe, n_aqe = with_conf(True, lambda: fact.join(dim, "k").count())
    t_salted, n_salted = with_conf(
        False, lambda: salted_join(fact, dim, ["k"], n_salts=n_salts).count()
    )
    assert n_plain == n_aqe == n_salted, (n_plain, n_aqe, n_salted)

    print(
        json.dumps(
            {
                "metric": "skew_join_seconds",
                "n_rows": n_rows,
                "n_salts": n_salts,
                "rows_joined": n_plain,
                "plain": t_plain,
                "aqe_skew": t_aqe,
                "salted": t_salted,
                "salted_speedup_vs_plain": round(t_plain / t_salted, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
