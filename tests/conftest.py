"""Shared fixtures (FIXTURES.md §2): toy and p2p_like deterministic
graphs, one SparkSession per test session."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark import LinkGraph, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphscope-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


# toy graph (FIXTURES.md): 2 components, a dangling page, a triangle
# cluster, and a hub. Vertices 0..11.
TOY_EDGES = [
    # component A: triangle 0-1-2 (directed cycle + extra), hub 3
    (0, 1), (1, 2), (2, 0), (0, 2),
    (3, 0), (3, 1), (3, 2), (3, 4),
    (4, 3),
    # 5 is dangling (no out-links), receives from hub
    (3, 5), (1, 5),
    # component B: chain 6→7→8, triangle 9-10-11
    (6, 7), (7, 8),
    (9, 10), (10, 11), (11, 9),
]
TOY_VERTICES = list(range(12))


def p2p_like_edges(n: int = 300, seed: int = 42) -> list[tuple[int, int]]:
    """Directed preferential-attachment-ish graph (FIXTURES.md p2p_like,
    shrunk to keep pytest fast). Deterministic via default_rng(seed)."""
    rng = np.random.default_rng(seed)
    edges = set()
    for k in range(1, n):
        m = min(6, k)
        targets = rng.integers(0, k, size=m)
        for t in targets:
            if int(t) != k:
                edges.add((k, int(t)))
    return sorted(edges)


@pytest.fixture(scope="session")
def toy_graph(spark):
    e = spark.createDataFrame(TOY_EDGES, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in TOY_VERTICES], "id long")
    return LinkGraph.from_edges(e, vertices=v).build(4)


@pytest.fixture(scope="session")
def p2p_graph(spark):
    edges = p2p_like_edges()
    e = spark.createDataFrame(edges, "src long, dst long")
    return LinkGraph.from_edges(e).build(4)


@pytest.fixture(scope="session")
def p2p_edges():
    return p2p_like_edges()
