"""Triangle counting on graphs with KNOWN answers — the synthetic fixture
graph verifies cross-engine agreement; these verify the math."""

import pandas as pd
import pytest

from spark_states_spark.operators.graph import triangle_count


def _count(spark, edges):
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    ).repartition(4)
    row = triangle_count(e).collect()[0]
    return row.n_edges, row.n_triangles


@pytest.mark.parametrize(
    "edges,n_tri",
    [
        ([(1, 2), (2, 3), (1, 3)], 1),                       # one triangle
        ([(1, 2), (2, 3), (3, 4)], 0),                       # path
        ([(1, 2), (1, 3), (1, 4), (1, 5)], 0),               # star (hub)
        # K4: 4 triangles
        ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], 4),
        # bowtie: two triangles sharing vertex 3
        ([(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)], 2),
    ],
)
def test_triangle_count_known_graphs(spark, edges, n_tri):
    n_e, n_t = _count(spark, edges)
    assert n_e == len(edges)
    assert n_t == n_tri


def test_triangle_count_hub_graph_matches_brute_force(spark):
    """Hub-heavy random graph (the shape orientation exists for) vs an
    O(n^3) brute force."""
    import itertools
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    edges = {(0, v) for v in nodes[1:]}  # hub at 0
    for _ in range(150):
        a, b = sorted(rng.sample(nodes, 2))
        if a != b:
            edges.add((a, b))
    eset = set(edges)
    brute = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in eset and (y, z) in eset and (x, z) in eset
    )
    n_e, n_t = _count(spark, sorted(edges))
    assert n_e == len(eset)
    assert n_t == brute


def _py_pagerank_fp(edges, iters=None, scale=10**12):
    """Pure-python mirror of the fixed-point spec (integer floor ops);
    iteration count follows _PR_ITERS so bumping the constant cannot
    desync this mirror from the engine and the generated oracle."""
    from spark_states_spark.operators.graph import _PR_ITERS

    if iters is None:
        iters = _PR_ITERS
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    n = len(nbrs)
    r = {v: scale // n for v in nbrs}
    tele = (15 * (scale // n)) // 100
    for _ in range(iters):
        contrib = {v: r[v] // len(nbrs[v]) for v in nbrs}
        r = {
            v: tele + (85 * sum(contrib[u] for u in nbrs[v])) // 100
            for v in nbrs
        }
    return r


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3)],  # path: middle node ranks highest
        [(0, v) for v in range(1, 6)],  # star: hub dominates
        [(1, 2), (2, 3), (1, 3), (3, 4)],  # triangle + pendant
    ],
)
def test_pagerank_fixedpoint_known_graphs(spark, edges):
    """The Spark iteration must reproduce the pure-python integer spec
    bit-for-bit — that is the entire point of fixed-point PageRank."""
    from spark_states_spark.operators.graph import pagerank_fixedpoint

    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    ).repartition(3)
    got = {r.v: r.r for r in pagerank_fixedpoint(e).collect()}
    assert got == _py_pagerank_fp(edges)


def test_pagerank_fixedpoint_star_hub_ranks_highest(spark):
    from spark_states_spark.operators.graph import pagerank_fixedpoint

    edges = [(0, v) for v in range(1, 9)]
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    )
    got = {r.v: r.r for r in pagerank_fixedpoint(e).collect()}
    leaves = {got[v] for v in range(1, 9)}
    assert len(leaves) == 1  # symmetric leaves tie exactly
    assert got[0] > max(leaves)


from hypothesis import given, settings
from hypothesis import strategies as st


# Random undirected simple graphs: node ids from a small pool so components
# merge often; dedup to canonical (a < b) edges.
_edge_strategy = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 19)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=40,
).map(lambda ps: sorted({(min(a, b), max(a, b)) for a, b in ps}))


@given(edges=_edge_strategy)
@settings(max_examples=25, deadline=None)
def test_pagerank_fixedpoint_property_differential(spark, edges):
    """Hypothesis differential: on ANY simple undirected graph, the Spark
    fixed-point iteration equals the pure-python integer spec exactly —
    including rank conservation up to the floor-division losses (every
    floor discards < 1 unit per divisor share, so total drift over 2
    iterations is bounded by a few units per node and per edge end —
    thousands of units against a 1e12 scale)."""
    from spark_states_spark.operators.graph import (
        _PR_SCALE,
        pagerank_fixedpoint,
    )

    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
    ).repartition(3)
    got = {r.v: r.r for r in pagerank_fixedpoint(e).collect()}
    ref = _py_pagerank_fp(edges)
    assert got == ref
    # conservation: floors only ever discard mass, never create it; the
    # discard is O(nodes + edge-ends) units against the 1e12 scale
    assert sum(ref.values()) <= _PR_SCALE
    assert sum(ref.values()) >= _PR_SCALE - 10_000
