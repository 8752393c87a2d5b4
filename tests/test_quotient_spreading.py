"""quotient_graph (quotient.py) and label_spreading (spreading.py)
vs pure-Python twins."""

from __future__ import annotations

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.quotient import quotient_graph
from graphscope_spark.algorithms.spreading import label_spreading

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _graph(spark, directed=True):
    v = spark.createDataFrame([(i,) for i in TOY_VERTICES], ["id"])
    return LinkGraph.from_edges(
        spark.createDataFrame(TOY_EDGES, ["src", "dst"]),
        vertices=v,
        directed=directed,
    )


def test_quotient_rollup_matches_python(spark):
    g = _graph(spark)
    assign = spark.createDataFrame(
        [(v, v % 3) for v in TOY_VERTICES], ["id", "label"]
    )
    q = quotient_graph(g, assign)
    got = {
        (r["src"], r["dst"]): r["n_edges"] for r in q.edges.collect()
    }
    want = {}
    for s, d in TOY_EDGES:
        ls, ld = s % 3, d % 3
        if ls != ld:
            want[(ls, ld)] = want.get((ls, ld), 0) + 1
    assert got == want
    sizes = {r["id"]: r["size"] for r in q.vertices.collect()}
    assert sizes == {
        c: sum(1 for v in TOY_VERTICES if v % 3 == c) for c in (0, 1, 2)
    }


def test_quotient_self_loops_and_weights(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 0, 3.0), (0, 2, 1.0)], ["src", "dst", "w"]
    )
    g = LinkGraph.from_edges(e, directed=True)
    assign = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20)], ["id", "label"]
    )
    q = quotient_graph(g, assign, self_loops=True, weight_col="w")
    got = {
        (r["src"], r["dst"]): (r["n_edges"], r["w"]) for r in q.edges.collect()
    }
    assert got == {(10, 10): (2, 5.0), (10, 20): (1, 1.0)}


def _py_spread(edges, vertices, seeds, rounds):
    sym = set()
    for u, v in edges:
        sym.add((u, v))
        sym.add((v, u))
    nbrs = {}
    for u, v in sym:
        nbrs.setdefault(u, []).append(v)
    classes = sorted(set(seeds.values()))
    f = {
        v: [
            1.0 if seeds.get(v) == c else 0.0 for c in classes
        ]
        for v in vertices
    }
    for _ in range(rounds):
        nf = {}
        for v in vertices:
            if v in seeds:
                nf[v] = [1.0 if seeds[v] == c else 0.0 for c in classes]
            elif nbrs.get(v):
                d = float(len(nbrs[v]))
                nf[v] = [
                    sum(f[u][k] for u in nbrs[v]) / d
                    for k in range(len(classes))
                ]
            else:
                nf[v] = [0.0] * len(classes)
        f = nf
    out = {}
    for v in vertices:
        best = max(f[v])
        if best > 0:
            out[v] = (classes[f[v].index(best)], best)
        else:
            out[v] = (None, 0.0)
    return out


def test_spreading_matches_python_twin(spark):
    g = _graph(spark)
    seeds = {0: 0, 9: 1}
    seed_df = spark.createDataFrame(
        list(seeds.items()), "id long, class long"
    )
    got = {
        r["id"]: (r["label"], r["score"])
        for r in label_spreading(g, seed_df, fixed_rounds=4).collect()
    }
    want = _py_spread(TOY_EDGES, TOY_VERTICES, seeds, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0], v
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_spreading_component_separation(spark):
    # seeds in different components: every vertex labeled by its own
    # component's seed once converged; isolated-from-seeds comp -> NULL
    g = _graph(spark)
    seed_df = spark.createDataFrame(
        [(0, 0), (9, 1)], "id long, class long"
    )
    got = {
        r["id"]: r["label"]
        for r in label_spreading(g, seed_df, max_iter=60).collect()
    }
    # component A = 0..5 (seed 0), triangle 9-10-11 (seed 1),
    # chain 6-7-8 has no seed
    for v in (0, 1, 2, 3, 4, 5):
        assert got[v] == 0
    for v in (9, 10, 11):
        assert got[v] == 1
    for v in (6, 7, 8):
        assert got[v] is None


def test_spreading_scores_shape_and_errors(spark):
    g = _graph(spark)
    seed_df = spark.createDataFrame([(0, 0), (9, 1)], "id long, class long")
    wide = label_spreading(g, seed_df, fixed_rounds=2, scores=True)
    assert wide.columns == ["id", "s_0", "s_1"]
    with pytest.raises(ValueError):
        label_spreading(
            g, spark.createDataFrame([], "id long, class long"),
            fixed_rounds=1,
        )
