"""Large/small-star connected components (cc_twophase.py) vs the
hash-min wcc and real networkx — the two algorithms must agree
exactly (comp = min id in the component)."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import cc_two_phase, wcc

from tests.conftest import TOY_EDGES, TOY_VERTICES, p2p_like_edges


def _nx_comps(edges, vertices):
    G = nx.Graph()
    G.add_nodes_from(vertices)
    G.add_edges_from(edges)
    return {
        v: min(c) for c in nx.connected_components(G) for v in c
    }


def _run(spark, edges, vertices=None, **kw):
    v_df = (
        spark.createDataFrame([(v,) for v in vertices], ["id"])
        if vertices is not None
        else None
    )
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]),
        vertices=v_df,
        directed=True,
    )
    return {
        r["id"]: r["comp"] for r in cc_two_phase(g, **kw).collect()
    }


def test_toy_matches_networkx(spark):
    got = _run(spark, TOY_EDGES, TOY_VERTICES)
    assert got == _nx_comps(TOY_EDGES, TOY_VERTICES)


def test_p2p_matches_wcc_and_networkx(spark):
    edges = p2p_like_edges(200, seed=7)
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=True
    )
    got = {r["id"]: r["comp"] for r in cc_two_phase(g).collect()}
    ref = {r["id"]: r["comp"] for r in wcc(g).collect()}
    verts = {u for e in edges for u in e}
    assert got == ref == _nx_comps(edges, verts)


def test_long_chain_converges_fast(spark):
    # a 64-vertex path: hash-min needs ~diameter rounds; the star
    # rewriting must finish well under that (O(log^2 n)).
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges, max_iter=12)
    assert got == {v: 0 for v in range(64)}


def test_self_loops_and_parallel_edges(spark):
    edges = [(1, 1), (1, 2), (2, 1), (2, 3), (5, 5)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 5}


def test_fixed_rounds_reaches_fixpoint_on_toy(spark):
    # enough fixed rounds on the toy graph == converged answer
    got = _run(spark, TOY_EDGES, TOY_VERTICES, fixed_rounds=6)
    assert got == _nx_comps(TOY_EDGES, TOY_VERTICES)


def test_component_stats(spark):
    from graphscope_spark.algorithms.cc_twophase import component_stats

    g = LinkGraph.from_edges(
        spark.createDataFrame(TOY_EDGES, ["src", "dst"]),
        vertices=spark.createDataFrame(
            [(v,) for v in TOY_VERTICES], ["id"]
        ),
        directed=True,
    )
    stats = {
        r["size"]: r for r in component_stats(cc_two_phase(g)).collect()
    }
    # toy graph: comp A = {0..5} (6), chain {6,7,8} (3), triangle
    # {9,10,11} (3)
    assert stats[6]["n_components"] == 1
    assert stats[3]["n_components"] == 2
    assert stats[3]["n_vertices"] == 6
    assert stats[6]["frac_vertices"] == pytest.approx(0.5)


def test_checkpointed_run_resumable(spark, tmp_path):
    # durable checkpoints: a fresh cc run with checkpoint_dir leaves a
    # manifest whose last complete iteration re-loads as valid state
    import json
    import os

    from graphscope_spark.algorithms.cc_twophase import cc_two_phase

    ckpt = str(tmp_path / "cc_ckpt")
    g = LinkGraph.from_edges(
        spark.createDataFrame(TOY_EDGES, ["src", "dst"]),
        vertices=spark.createDataFrame(
            [(v,) for v in TOY_VERTICES], ["id"]
        ),
        directed=True,
    )
    got = {
        r["id"]: r["comp"]
        for r in cc_two_phase(
            g, checkpoint_every=1, checkpoint_dir=ckpt
        ).collect()
    }
    assert got == _nx_comps(TOY_EDGES, TOY_VERTICES)
    manifest = [
        json.loads(l)
        for l in open(os.path.join(ckpt, "manifest.jsonl"))
        if l.strip()
    ]
    complete = [m for m in manifest if m.get("complete")]
    assert complete, "expected durable per-iteration checkpoints"
    # per-partition lineage recorded for each durable checkpoint
    assert all(m.get("partitions") for m in complete)
    # the last checkpointed edge state re-loads and yields the same
    # components when the label extraction is replayed on it
    last = complete[-1]["path"]
    stars = spark.read.parquet(last)
    roots = {
        r["src"]: r["dst"]
        for r in stars.groupBy("src").agg(F.min("dst").alias("dst")).collect()
    }
    replay = {v: roots.get(v, v) for v in TOY_VERTICES}
    assert replay == got
