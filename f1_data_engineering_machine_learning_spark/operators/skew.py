"""Skew- and layout-aware execution utilities.

At 100 TB the failure mode of a shuffle isn't volume, it's IMBALANCE: one
hot key pins one task while 999 executors idle. Three mitigations, in the
order you should reach for them:

1. **AQE skew-join** (free): the session enables
   ``spark.sql.adaptive.skewJoin.enabled`` — runtime splitting of oversized
   partitions. Covers sort-merge joins automatically.
2. **Salted two-phase aggregation** (``salted_agg``): for aggregations with
   a pathological hot key, aggregate on (key, salt) first — spreading the
   hot key over N partitions — then re-aggregate on the key. Works for any
   algebraic aggregate (sum/count/min/max); averages decompose into
   sum+count.
3. **Salted broadcast-replicated join** (``salted_join``): when the skewed
   side can't be split by AQE (e.g. aggregation feeding a join), salt the
   big side and replicate each small-side row across all salt values.

Plus **bucketed tables** (``write_bucketed``): pre-shuffle the table ONCE
at write time (``bucketBy`` on the join key); subsequent equi-joins between
tables bucketed the same way run with ZERO exchange on either side —
verified by test (no Exchange node in the plan).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — deterministic given Spark's
    per-partition seeding is not required for correctness (the salt only
    routes rows; results are salt-invariant)."""
    return df.withColumn(salt_col, (F.rand(seed=7) * n_salts).cast("int"))


_COMBINERS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(keys + salt) then
    groupBy(keys). ``aggs`` maps output column -> ``(phase1_expr, combiner)``
    where ``combiner`` is one of ``'sum' | 'count' | 'min' | 'max'``
    (count re-combines by summation). The combiner is EXPLICIT — inferring
    it from the expression's string form is unreliable (and impossible
    under Spark Connect), and a silent wrong default corrupts results;
    unrecognized combiners raise instead."""
    parsed: dict[str, tuple[Column, str]] = {}
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise TypeError(
                f"aggs[{name!r}] must be (phase1_expr, combiner) — e.g. "
                f"(F.sum('v'), 'sum'); got {type(spec).__name__}"
            )
        expr, combiner = spec
        if combiner not in _COMBINERS:
            raise ValueError(
                f"aggs[{name!r}]: unknown combiner {combiner!r} "
                f"(expected one of {sorted(_COMBINERS)})"
            )
        parsed[name] = (expr, combiner)

    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in parsed.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_COMBINERS[comb](name).alias(name) for name, (_, comb) in parsed.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    across every salt value (explode), join on keys + salt. The hot key's
    rows spread over ``n_salts`` tasks instead of one."""
    big_salted = with_salt(big, n_salts)
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist with a fixed bucket layout on the join key — the one-time
    shuffle that makes every subsequent equi-join on ``bucket_cols``
    exchange-free (both sides bucketed identically). At scale this is how
    fact-to-fact joins avoid re-shuffling 100 TB per query."""
    import shutil

    spark = df.sparkSession
    # a previously dropped-but-not-cleaned managed location blocks re-create
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> bool:
    """True when the bucketed-table join plans without any SHUFFLE exchange
    — the verification hook for the bucket layout. Broadcast is disabled
    during the probe (on tiny tables Catalyst prefers a broadcast join and
    ignores bucketing entirely, which would mask the layout check)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(left_table).join(spark.table(right_table), list(on))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
