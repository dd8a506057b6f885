"""PageRank (operators/graph.py): fixed-point, hand-computed, and
partition-invariance checks. The cross-engine loop replay lives in the
catalog oracle (`copurchase_pagerank`); these cover the operator's
algebra directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_regular_graph_is_fixed_point(spark):
    # triangle (3-regular-symmetric): every node has equal in/out mass,
    # so PR stays at its teleport fixed point 1.0 every iteration
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    out = {r["node"]: r["pr"] for r in pagerank(_edges(spark, tri), iterations=4).collect()}
    assert set(out) == {1, 2, 3}
    for v in out.values():
        assert v == pytest.approx(1.0, abs=1e-8)


def test_one_iteration_matches_hand_computation(spark):
    # star: hub 1 <-> leaves 2,3,4 (symmetric). outdeg(1)=3, outdeg(leaf)=1.
    # After 1 iter: pr(1) = 0.15 + 0.85*(1+1+1) = 2.7
    #              pr(leaf) = 0.15 + 0.85*(1/3) ~ 0.43333 (quantized 1e-9)
    star = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1)]
    out = {r["node"]: r["pr"] for r in pagerank(_edges(spark, star), iterations=1).collect()}
    assert out[1] == pytest.approx(2.7, abs=1e-8)
    for leaf in (2, 3, 4):
        assert out[leaf] == pytest.approx(0.15 + 0.85 / 3, abs=1e-6)


def test_mass_conservation_symmetric(spark):
    # symmetric graph, no dangling mass: total PR == n_nodes at every
    # iteration (up to quantization), the unnormalized-PageRank invariant
    pairs = [(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]]
    sym = pairs + [(b, a) for a, b in pairs]
    pr = pagerank(_edges(spark, sym), iterations=3)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(4.0, abs=1e-6)


def test_partition_invariance_bitwise(spark):
    # the quantized-BIGINT formulation makes the result independent of
    # physical partitioning — the property the catalog oracle relies on
    pairs = [(i % 17, (i * 7) % 17) for i in range(200) if i % 17 != (i * 7) % 17]
    sym = pairs + [(b, a) for a, b in pairs]
    e1 = _edges(spark, sym).repartition(1)
    e32 = _edges(spark, sym).repartition(32)
    r1 = {r["node"]: r["pr"] for r in pagerank(e1, iterations=3).collect()}
    r32 = {r["node"]: r["pr"] for r in pagerank(e32, iterations=3).collect()}
    assert r1 == r32  # bit-identical, not approx


def test_triangle_count_known_graph(spark):
    from f1_data_engineering_machine_learning_spark.operators.graph import (
        triangle_count,
    )

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant 5
    # and a duplicate/reversed/self-loop noise set
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),          # pendant: no triangle
        (2, 1), (3, 3),  # reverse dup + self loop: ignored
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(got.values()) // 3 == 4


def test_triangle_count_hub_graph_and_partition_invariance(spark):
    from f1_data_engineering_machine_learning_spark.operators.graph import (
        triangle_count,
    )

    # star hub 0 with 30 spokes + one rim edge (1,2): exactly 1 triangle
    edges = [(0, i) for i in range(1, 31)] + [(1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {(r.node, r.n_triangles) for r in triangle_count(df.repartition(7)).collect()}
    b = {(r.node, r.n_triangles) for r in triangle_count(df.repartition(2)).collect()}
    assert a == b == {(0, 1), (1, 1), (2, 1)}


def test_triangle_count_disjoint_shifted_copies(spark):
    """The lemma behind the sf1 value verification of
    copurchase_triangles (tools/verify_triangles_sf1.py): the sf1
    derivation is disjoint id-SHIFTED copies of the base tables, no
    edge crosses copies, and triangle counting is a per-component
    property — so triangles(union of shifted copies) must equal the
    shifted union of triangles(base), exactly."""
    import random

    from f1_data_engineering_machine_learning_spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(31)
    base = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    base = [(u, v) for u, v in base if u != v]
    df = spark.createDataFrame(base, ["src", "dst"])
    base_counts = {
        (r.node, r.n_triangles) for r in triangle_count(df).collect()
    }
    offset, copies = 1_000, 3
    shifted = [
        (u + i * offset, v + i * offset)
        for i in range(copies)
        for u, v in base
    ]
    got = {
        (r.node, r.n_triangles)
        for r in triangle_count(
            spark.createDataFrame(shifted, ["src", "dst"])
        ).collect()
    }
    expected = {
        (n + i * offset, t) for n, t in base_counts for i in range(copies)
    }
    assert got == expected
