"""Bow-tie decomposition (algorithms/bowtie.py) vs a networkx-based
Python twin (Broder et al. region definitions)."""

from __future__ import annotations

import networkx as realnx
import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import bowtie


def _py_bowtie(nxg):
    if nxg.number_of_nodes() == 0:
        return {}
    sccs = list(realnx.strongly_connected_components(nxg))
    core = max(sccs, key=lambda c: (len(c), -min(c)))
    anyc = next(iter(core))
    fwd = realnx.descendants(nxg, anyc) | core
    bwd = realnx.ancestors(nxg, anyc) | core
    in_set, out_set = bwd - core, fwd - core
    from_in, to_out = set(), set()
    for v in in_set:
        from_in |= realnx.descendants(nxg, v) | {v}
    for v in out_set:
        to_out |= realnx.ancestors(nxg, v) | {v}
    lab = {}
    for v in nxg.nodes:
        if v in core:
            lab[v] = "CORE"
        elif v in in_set:
            lab[v] = "IN"
        elif v in out_set:
            lab[v] = "OUT"
        elif v in from_in and v in to_out:
            lab[v] = "TUBE"
        elif v in from_in or v in to_out:
            lab[v] = "TENDRIL"
        else:
            lab[v] = "DISCONNECTED"
    return lab


def _got(spark, edges, vertices=None):
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=(
            spark.createDataFrame([(v,) for v in vertices], "id long")
            if vertices is not None else None
        ),
        directed=True,
    ).build()
    return {r["id"]: r["region"] for r in bowtie(g).collect()}


# hand-built graph covering every region:
# core = {0,1} (2-cycle); IN: 10 -> 0; OUT: 0 -> 20;
# tube: 10 -> 30 -> 20 (30 avoids core);
# tendril-in: 10 -> 40 (dead end); tendril-out: 50 -> 20;
# disconnected: 60 <-> 61 cycle off to the side.
HAND = [
    (0, 1), (1, 0),
    (10, 0), (0, 20),
    (10, 30), (30, 20),
    (10, 40),
    (50, 20),
    (60, 61), (61, 60),
]


def test_hand_graph_all_regions(spark):
    nxg = realnx.DiGraph(HAND)
    want = _py_bowtie(nxg)
    got = _got(spark, HAND)
    assert got == want
    assert set(got.values()) == {
        "CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISCONNECTED"
    }
    assert got[30] == "TUBE" and got[40] == "TENDRIL" and got[50] == "TENDRIL"


def test_random_digraphs_match_twin(spark):
    for seed, p in [(11, 0.04), (12, 0.06), (13, 0.08)]:
        nxg = realnx.gnp_random_graph(35, p, seed=seed, directed=True)
        if nxg.number_of_edges() == 0:
            continue
        want = _py_bowtie(nxg)
        got = _got(spark, list(nxg.edges), list(nxg.nodes))
        assert got == want, seed


def test_edgeless_and_empty(spark):
    got = _got(spark, [(1, 2)], [1, 2, 3])
    # core = {1} (singleton min-id SCC of max size 1), 2 = OUT, 3 disc.
    assert got == {1: "CORE", 2: "OUT", 3: "DISCONNECTED"}
    g = LinkGraph.from_edges(
        spark.createDataFrame([], "src long, dst long"), directed=True
    ).build()
    assert bowtie(g).count() == 0


def test_undirected_rejected(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2)], "src long, dst long"), directed=False
    ).build()
    with pytest.raises(ValueError):
        bowtie(g)
