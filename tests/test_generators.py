"""RMAT generator (generators.py): deterministic across partitioning
and engine (DuckDB twin), Graph500 shape properties."""

from __future__ import annotations

import duckdb
import pytest

from graphscope_spark.generators import rmat_edges, rmat_sql


def _edges(spark, **kw):
    return sorted(
        (r["src"], r["dst"]) for r in rmat_edges(spark, **kw).collect()
    )


def test_partitioning_invariance(spark):
    a = _edges(spark, scale=7, edge_factor=4, num_partitions=1)
    b = _edges(spark, scale=7, edge_factor=4, num_partitions=13)
    assert a == b
    assert len(a) == 4 << 7


def test_matches_duckdb_twin(spark):
    got = _edges(spark, scale=6, edge_factor=4)
    want = sorted(
        (int(s), int(d))
        for s, d in duckdb.sql(rmat_sql(6, 4)).fetchall()
    )
    assert got == want


def test_seed_changes_graph(spark):
    a = _edges(spark, scale=6, edge_factor=2, seed=1)
    b = _edges(spark, scale=6, edge_factor=2, seed=2)
    assert a != b


def test_shape_properties(spark):
    edges = _edges(spark, scale=8, edge_factor=8)
    n = 1 << 8
    assert len(edges) == 8 << 8
    assert all(0 <= s < n and 0 <= d < n for s, d in edges)
    # heavy skew toward low ids (a=0.57 quadrant): vertex 0's degree
    # far exceeds the mean of 8
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    assert deg.get(0, 0) > 40


def test_bad_params(spark):
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=0)
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=4, a=0.5, b=0.3, c=0.2)
