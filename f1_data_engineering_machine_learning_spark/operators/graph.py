"""Iterative graph algorithms as DataFrame loops.

PageRank here complements the distributed connected-components labeler in
``dataops/curate.py``: both are the Pregel shape (join state to edges,
aggregate messages by destination, update state) expressed as plain
DataFrame joins so Catalyst plans them — no GraphX/RDD dependency, and the
same plan runs on a 1000-executor cluster.

Scale design:
- Each iteration is ONE shuffle-join of edges to ranks on ``src`` plus one
  aggregation on ``dst``. Edges dominate ranks by orders of magnitude, so
  the edge frame is hash-partitioned on ``src`` once and cached; every
  iteration's join reuses that partitioning (ReuseExchange) and only the
  small rank frame moves.
- The driver never sees per-node state — only the loop counter. (A
  convergence-based stop would pull one scalar per iteration, like
  ``curate.py``'s label-sum check.)
- Determinism: floating SUM is accumulation-order dependent, which breaks
  cross-engine value hashes. Per-edge contributions are therefore
  quantized to integer nano-units (``floor(pr/outdeg * quantize)``, exact
  in IEEE and identical in any engine) and summed as BIGINT — exact and
  associative — before one final float update per node. The result is
  bit-identical regardless of partitioning, at a bounded 1e-9 relative
  quantization error (far below PageRank's own convergence error).

Reference parity: the reference has no graph operator; this extends the
engine the way SURVEY §6 recommends for training-data pipelines (graph
centrality over co-occurrence graphs, e.g. for corpus influence scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.checkpoints import (
    lineage_cut,
)

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    quantize: float = 1e9,
) -> DataFrame:
    """Unnormalized PageRank (GraphX convention: PR sums to ~N, teleport
    term ``1 - damping``) over an edge list, fixed ``iterations``.

    Every node must appear as a source (symmetric/undirected graphs
    satisfy this by construction); dangling-node mass is dropped, the
    GraphX behavior. Returns ``(node, pr)``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if iterations > 1:
        # every iteration (and the degree count) references the edge
        # frame; without materialization Catalyst re-executes the whole
        # upstream edge-build per reference (measured: zero ReusedExchange
        # across AQE stage boundaries). A LAZY local checkpoint pins the
        # edges to executor blocks on first use — the standard in-job
        # materialization for iterative graph state (lost-executor => job
        # retry, acceptable for derived in-flight state, unlike the
        # table-rewrite case in dataops/governance.py).
        e = e.transform(lineage_cut)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    ew = e.join(deg, "src")  # (src, dst, outdeg)
    if iterations > 1:
        # co-located (edge, outdeg) pairs: one shuffle, then every
        # iteration's join reads these blocks instead of re-deriving them
        ew = ew.transform(lineage_cut)
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                "dst",
                F.floor(F.col("pr") / F.col("outdeg") * F.lit(quantize))
                .cast("long")
                .alias("q"),
            )
            .groupBy("dst")
            .agg(F.sum("q").alias("qsum"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(1.0 - damping) + F.lit(damping) * (F.col("qsum") / F.lit(quantize))).alias("pr"),
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph —
    community-density structure (clustering-coefficient numerator,
    spam/bot-ring signal) from a pure DataFrame plan.

    The scale trick is DEGREE-ORDERED ORIENTATION (the Schank-Wagner
    forward algorithm / Cohen's MapReduce formulation): orient every
    undirected edge from its (degree, id)-smaller endpoint to the larger,
    then count wedge closures x->y, y->z closed by x->z. Each triangle is
    counted EXACTLY once (its vertices totally ordered by (degree, id)),
    and — the actual point — wedge generation fans out on each vertex's
    OUT-degree, which orientation bounds by O(sqrt(m)) even for a
    celebrity vertex with millions of neighbors: the hub's edges point
    INTO it, so the quadratic wedge blow-up at hot vertices never
    happens. A naive all-directions wedge join is O(sum deg^2) and dies
    on exactly the graphs where triangles matter.

    Plan: dedupe to canonical (u < v) edges, one degree aggregate, two
    broadcast-or-shuffle hash joins (wedge build + closure probe), one
    explode + count for attribution. Self-loops dropped; vertices in no
    triangle are absent from the output (left-join a vertex frame for
    zero-filled counts).

    The canonical edge frame and the oriented frame are LAZY
    local-checkpointed (same contract as :func:`pagerank`): the edges
    are referenced four times (two degree unions, the orientation join)
    and the oriented frame three times (wedge x2, closure probe) —
    without materialization Catalyst re-derives the whole upstream
    edge-build per reference (the catalog's co-purchase build replicated
    its fact-table self-join 60x across the plan, 104k chars of plan
    text), and runtime exchange reuse is a best-effort AQE optimization,
    not a contract. With the checkpoints every branch reads executor
    blocks."""
    u, v = F.col(src), F.col(dst)
    e = (
        edges.filter(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
        .transform(lineage_cut)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).transform(lineage_cut)
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    return (
        tris.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
