"""2D skyline (Pareto frontier) as a window sweep — no pair join.

A row survives the skyline iff no other row dominates it: better-or-equal
on both criteria and strictly better on at least one (here: minimize one
column, maximize the other — the classic price/quality shape). The naive
formulation is an O(n^2) anti-join; the 2D structure admits the textbook
sort-sweep instead: order by the minimized column ascending, then a row
is dominated exactly when some strictly-cheaper row ties-or-beats its
value, or a same-priced row strictly beats it. Expressed as aggregates:

- per-price-group max of the maximized column (one shuffle on the price
  key, map-side combinable);
- a running "max over strictly-cheaper groups" — computed WITHOUT an
  unpartitioned global window (the single-task scale killer): the group
  table is range-partitioned on price, per-partition maxes fold into
  prefix maxes through a broadcast non-equi self-join over the
  O(num_partitions)-row counts frame (the exact two-pass idiom of
  operators/windows.py::range_partitioned_rank), and the within-
  partition running max is an ordinary partitioned window.

Domination test per row: ``prev_max >= mine`` (a strictly cheaper row at
least ties my value => dominated) OR ``my_group_max > mine`` (a
same-priced row strictly beats my value). Equal (price, value) twins do
NOT dominate each other — both survive, matching the NOT EXISTS oracle
semantics exactly (comparisons only; no new float arithmetic).

At 100 TB: one shuffle to build groups, one range exchange over the
group table (distinct minimize-values — itself potentially large, hence
the partitioned sweep), one broadcast join back. The oracle replays the
NOT EXISTS brute force at sf0.01.

Reference parity: the reference has no skyline operator; this extends
the engine's analytics family (SURVEY §6) the way multi-criteria
curation needs (e.g. keep documents on the quality/length frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.checkpoints import (
    lineage_cut,
)

__all__ = ["pareto_frontier_2d"]


def pareto_frontier_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows on the 2D Pareto frontier (``minimize`` low, ``maximize``
    high). Null criteria rows are dropped (incomparable). Returns the
    input columns unchanged; survivors only."""
    d = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    groups = d.groupBy(F.col(minimize).alias("__price")).agg(
        F.max(F.col(maximize)).alias("__gmax")
    )

    parts = num_partitions or d.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = groups.repartitionByRange(int(parts), F.col("__price"))
    # lazy checkpoint: (row -> __pid) must be IDENTICAL in the pmax
    # branch and the sweep branch — re-executed range exchanges
    # re-sample their boundaries (see the reproduced divergence note in
    # operators/windows.py::range_partitioned_rank)
    tagged = ranged.withColumn("__pid", F.spark_partition_id()).transform(lineage_cut)

    # prefix max over strictly-lower range partitions: O(P)-row lazy
    # subplan (per-partition maxes, broadcast non-equi self-join), no
    # driver collect — same shape as range_partitioned_rank's offsets
    pmax = tagged.groupBy("__pid").agg(F.max("__gmax").alias("__pm"))
    other = pmax.select(F.col("__pid").alias("__q"), F.col("__pm").alias("__qm"))
    prefix = (
        pmax.crossJoin(F.broadcast(other))
        .groupBy("__pid")
        .agg(
            F.max(
                F.when(F.col("__q") < F.col("__pid"), F.col("__qm"))
            ).alias("__prefmax")
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = (
        tagged.join(F.broadcast(prefix), "__pid")
        .withColumn(
            "__prevmax",
            # greatest() skips nulls (both engines): first row of the
            # first partition has neither component -> null -> no
            # cheaper row exists
            F.greatest(F.col("__prefmax"), F.max("__gmax").over(w)),
        )
        .select("__price", "__gmax", "__prevmax")
    )
    return (
        d.join(F.broadcast(swept), d[minimize] == swept["__price"])
        .filter(
            (F.col("__prevmax").isNull() | (F.col("__prevmax") < F.col(maximize)))
            & (F.col("__gmax") <= F.col(maximize))
        )
        .drop("__price", "__gmax", "__prevmax")
    )
