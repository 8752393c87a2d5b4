"""dfs() vs an independent recursive-Python twin (reference
apps/dfs/dfs.h:30-228 — per-vertex visitation rank + DFS-tree parent
(ctx.rank / ctx.parent), deterministic min-id child order)."""

from __future__ import annotations

import sys

import pytest

from graphscope_spark.algorithms import dfs
from tests.conftest import TOY_EDGES, p2p_like_edges


def _twin(edges, source, directed):
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append(d)
            if not directed:
                adj.setdefault(d, []).append(s)
    rank: dict[int, int] = {}
    parent: dict[int, int | None] = {}
    sys.setrecursionlimit(100_000)

    def visit(v, p):
        rank[v] = len(rank)
        parent[v] = p
        for u in sorted(set(adj.get(v, ()))):
            if u not in rank:
                visit(u, v)

    visit(source, None)
    return rank, parent


def _got(graph, source, directed=True):
    rows = dfs(graph, source, directed=directed).collect()
    return ({r["id"]: r["rank"] for r in rows},
            {r["id"]: r["pred"] for r in rows})


def test_dfs_toy_directed(toy_graph):
    assert _got(toy_graph, 3) == _twin(TOY_EDGES, 3, directed=True)


def test_dfs_toy_undirected(toy_graph):
    assert _got(toy_graph, 6, directed=False) == \
        _twin(TOY_EDGES, 6, directed=False)


def test_dfs_p2p(p2p_graph, p2p_edges):
    assert _got(p2p_graph, 1, directed=False) == \
        _twin(p2p_edges, 1, directed=False)


def test_dfs_size_guard(toy_graph):
    with pytest.raises(ValueError, match="bfs"):
        dfs(toy_graph, 3, max_edges=2)
