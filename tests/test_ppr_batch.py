"""Batched multi-seed personalized PageRank (ppr.py) — each packed
rank column must equal the single-seed personalized run and a dense
NumPy power-iteration oracle (networkx's own pagerank needs scipy,
absent in this sandbox)."""

from __future__ import annotations

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import pagerank, ppr_batch

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _graph(spark):
    v = spark.createDataFrame([(i,) for i in TOY_VERTICES], ["id"])
    return LinkGraph.from_edges(
        spark.createDataFrame(TOY_EDGES, ["src", "dst"]),
        vertices=v,
        directed=True,
    )


def test_columns_match_single_seed_runs(spark):
    g = _graph(spark)
    seeds = [0, 3, 9]
    batch = {
        r["id"]: r for r in ppr_batch(g, seeds, fixed_rounds=8).collect()
    }
    for k, s in enumerate(seeds):
        single = {
            r["id"]: r["rank"]
            for r in pagerank(
                g, fixed_rounds=8, personalization={s: 1.0}
            ).collect()
        }
        for v in TOY_VERTICES:
            assert batch[v][f"r{k}"] == pytest.approx(single[v], abs=1e-12)


def _numpy_ppr(edges, vertices, seed, alpha=0.85, iters=300):
    """Dense power-iteration oracle, NX personalized semantics
    (p = d = e_seed, uniform init)."""
    import numpy as np

    idx = {v: i for i, v in enumerate(sorted(vertices))}
    n = len(idx)
    out = np.zeros(n)
    for u, v in set(edges):
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    p = np.zeros(n)
    p[idx[seed]] = 1.0
    for _ in range(iters):
        nxt = np.zeros(n)
        for u, v in set(edges):
            nxt[idx[v]] += r[idx[u]] / out[idx[u]]
        ds = r[out == 0].sum()
        r = (1 - alpha) * p + alpha * (nxt + ds * p)
    return {v: r[i] for v, i in idx.items()}


def test_converged_matches_numpy_oracle(spark):
    g = _graph(spark)
    seeds = [0, 6]
    got = {r["id"]: r for r in ppr_batch(g, seeds, tol=1e-10).collect()}
    for k, s in enumerate(seeds):
        want = _numpy_ppr(TOY_EDGES, TOY_VERTICES, s)
        for v in TOY_VERTICES:
            assert got[v][f"r{k}"] == pytest.approx(want[v], abs=1e-6)


def test_melt_shape(spark):
    g = _graph(spark)
    tall = ppr_batch(g, [0, 3], fixed_rounds=3, melt=True)
    assert tall.columns == ["seed", "id", "rank"]
    rows = tall.collect()
    assert len(rows) == 2 * len(TOY_VERTICES)
    assert {r["seed"] for r in rows} == {0, 3}


def test_empty_and_no_seeds(spark):
    empty = LinkGraph.from_edges(
        spark.createDataFrame([], "src long, dst long")
    )
    assert ppr_batch(empty, [1, 2], fixed_rounds=2).count() == 0
    with pytest.raises(ValueError):
        ppr_batch(_graph(spark), [])


def test_undirected_matches_single_seed(spark):
    from graphscope_spark import LinkGraph

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    batch = {
        r["id"]: r for r in ppr_batch(g, [0, 4], fixed_rounds=6).collect()
    }
    for k, s in enumerate([0, 4]):
        single = {
            r["id"]: r["rank"]
            for r in pagerank(
                g, fixed_rounds=6, personalization={s: 1.0}
            ).collect()
        }
        for v in single:
            assert batch[v][f"r{k}"] == pytest.approx(single[v], abs=1e-12)
