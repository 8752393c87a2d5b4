"""sampling_path (deterministic random walks) vs a pure-Python twin of
the hash-draw semantics on the toy graph."""

from __future__ import annotations

import hashlib

from graphscope_spark.algorithms import sampling_path
from tests.conftest import TOY_EDGES


def _draw(seed: int, walk: int, t: int, v: int) -> str:
    return hashlib.md5(f"{seed}|{walk}|{t}|{v}".encode()).hexdigest()


def _py_walks(edges, srcs, path_len, seed):
    out_adj = {}
    for s, d in edges:
        out_adj.setdefault(s, set()).add(d)
    rows = set()
    for w in srcs:
        cur = w
        rows.add((w, 0, w))
        for t in range(1, path_len + 1):
            nbrs = out_adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v: _draw(seed, w, t, v))
            rows.add((w, t, cur))
    return rows


def test_sampling_path_vs_python_twin(toy_graph):
    got = {
        (r["walk"], r["pos"], r["id"])
        for r in sampling_path(toy_graph, [0, 3, 6, 9], path_len=5, seed=7).collect()
    }
    assert got == _py_walks(TOY_EDGES, [0, 3, 6, 9], 5, 7)


def test_sampling_path_dead_end_and_missing_src(toy_graph):
    # 5 and 8 are sinks: walk stops at pos 0; 999 not in graph: no walk
    rows = sampling_path(toy_graph, [5, 8, 999], path_len=3, seed=1).collect()
    got = {(r["walk"], r["pos"], r["id"]) for r in rows}
    assert got == {(5, 0, 5), (8, 0, 8)}


def test_sampling_path_seed_sensitivity(toy_graph):
    a = {(r["walk"], r["pos"], r["id"])
         for r in sampling_path(toy_graph, [3], path_len=4, seed=1).collect()}
    b = {(r["walk"], r["pos"], r["id"])
         for r in sampling_path(toy_graph, [3], path_len=4, seed=2).collect()}
    # identical seeds reproduce, different seeds generally differ
    a2 = {(r["walk"], r["pos"], r["id"])
          for r in sampling_path(toy_graph, [3], path_len=4, seed=1).collect()}
    assert a == a2
    assert a == _py_walks(TOY_EDGES, [3], 4, 1)
    assert b == _py_walks(TOY_EDGES, [3], 4, 2)


# ----------------------------------------------------------------------
# node2vec_path: biased walks, integer-ticket weighted draws
# ----------------------------------------------------------------------
def _py_node2vec(edges, srcs, path_len, p, q, seed, directed=True):
    from graphscope_spark.algorithms.walks import _node2vec_weights

    w_ret, w_one, w_q = _node2vec_weights(p, q)
    adj = {}
    fabric = set(edges) if directed else \
        set(edges) | {(d, s) for s, d in edges}
    for s, d in fabric:
        adj.setdefault(s, set()).add(d)
    rows = set()
    for w in srcs:
        cur, prev = w, None
        rows.add((w, 0, w))
        for t in range(1, path_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            best = None
            for v in sorted(nbrs):
                wt = 1 if prev is None else (
                    w_ret if v == prev else
                    (w_one if v in adj.get(prev, ()) else w_q))
                for tick in range(wt):
                    h = hashlib.md5(
                        f"{seed}|{w}|{t}|{v}|{tick}".encode()).hexdigest()
                    if best is None or h < best[0]:
                        best = (h, v)
            prev, cur = cur, best[1]
            rows.add((w, t, cur))
    return rows


def test_node2vec_vs_python_twin(toy_graph):
    from graphscope_spark.algorithms import node2vec_path

    for p, q in [(1.0, 1.0), (4.0, 0.25), (0.5, 2.0)]:
        got = {
            (r["walk"], r["pos"], r["id"])
            for r in node2vec_path(
                toy_graph, [0, 3, 9], path_len=5, p=p, q=q, seed=11
            ).collect()
        }
        assert got == _py_node2vec(TOY_EDGES, [0, 3, 9], 5, p, q, 11), (p, q)


def test_node2vec_undirected_twin(spark, toy_graph):
    from graphscope_spark.graph import LinkGraph
    from graphscope_spark.algorithms import node2vec_path

    und = LinkGraph.from_edges(toy_graph.edges, directed=False).build()
    got = {
        (r["walk"], r["pos"], r["id"])
        for r in node2vec_path(und, [5, 8], path_len=4,
                               p=2.0, q=0.5, seed=3).collect()
    }
    assert got == _py_node2vec(TOY_EDGES, [5, 8], 4, 2.0, 0.5, 3,
                               directed=False)


def test_node2vec_return_bias_direction():
    """Statistical sanity on a fixed star graph: with p tiny (return
    weight huge) the 2nd hop goes back to the hub far more often than
    with p huge, across many walk seeds — checked on the Python twin
    (the Spark path is pinned exactly to it above)."""
    edges = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)] \
        + [(i, i % 8 + 1) for i in range(1, 9)]
    def returns(p):
        n = 0
        for seed in range(60):
            rows = _py_node2vec(edges, [0], 2, p, 1.0, seed)
            step2 = {r[2] for r in rows if r[1] == 2}
            n += (0 in step2)
        return n
    assert returns(0.1) > returns(10.0) + 10


def test_node2vec_dead_end(spark):
    from graphscope_spark.graph import LinkGraph
    from graphscope_spark.algorithms import node2vec_path

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    lg = LinkGraph.from_edges(e).build()
    rows = sorted(
        (r["walk"], r["pos"], r["id"])
        for r in node2vec_path(lg, [1], path_len=3, seed=1).collect())
    assert rows == [(1, 0, 1), (1, 1, 2)]  # stops at the dead end


def test_skipgram_pairs(toy_graph, spark):
    from graphscope_spark.algorithms import sampling_path
    from graphscope_spark.algorithms.walks import skipgram_pairs

    walks = sampling_path(toy_graph, [0, 3], path_len=4, seed=7)
    wrows = sorted((r["walk"], r["pos"], r["id"]) for r in walks.collect())
    got = sorted(
        (r["walk"], r["center"], r["context"], r["off"])
        for r in skipgram_pairs(walks, window=2).collect())
    want = sorted(
        (wa, ia, ib, pb - pa)
        for wa, pa, ia in wrows for wb, pb, ib in wrows
        if wa == wb and pa != pb and abs(pa - pb) <= 2)
    assert got == want
    assert all(o != 0 for *_, o in got)


# ---------------------------------------------------------------------
# neighbor_sample (GraphSAGE-style fanout expansion)
# ---------------------------------------------------------------------
def _py_neighbor_sample(edges, roots, fanouts, seed=42, directed=True,
                        weights=None, strategy="random"):
    import hashlib

    adj = {}
    pairs = list(edges) + ([] if directed else [(d, s) for s, d in edges])
    wmap = dict(weights or {})
    if not directed and weights:
        wmap.update({(d, s): w for (s, d), w in weights.items()})
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    rows = set()
    for root in roots:
        frontier = {root}
        for hop, k in enumerate(fanouts):
            nxt = set()
            for u in sorted(frontier):
                nbrs = adj.get(u, [])
                if strategy == "random":
                    key = lambda v: hashlib.md5(  # noqa: E731
                        f"{seed}:{root}:{hop}:{u}:{v}".encode()).hexdigest()
                    picked = sorted(nbrs, key=key)[:k]
                else:
                    picked = sorted(nbrs, key=lambda v: (-wmap[(u, v)], v))[:k]
                for v in picked:
                    rows.add((root, hop, u, v))
                    nxt.add(v)
            frontier = nxt
    return rows


def test_neighbor_sample_matches_python_twin(spark, toy_graph):
    from graphscope_spark.algorithms.walks import neighbor_sample
    from tests.conftest import TOY_EDGES

    got = {
        (r["root"], r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(toy_graph, [3, 9], [2, 2]).collect()
    }
    want = _py_neighbor_sample(TOY_EDGES, [3, 9], [2, 2])
    assert got == want and len(got) > 0


def test_neighbor_sample_fanout_caps_degree(spark, toy_graph):
    from graphscope_spark.algorithms.walks import neighbor_sample

    out = neighbor_sample(toy_graph, [3], [2]).collect()
    # vertex 3 has out-degree 5; fanout 2 keeps exactly 2
    assert len([r for r in out if r["src"] == 3]) == 2
    big = neighbor_sample(toy_graph, [3], [100]).collect()
    assert len([r for r in big if r["src"] == 3]) == 5  # whole neighborhood


def test_neighbor_sample_deterministic(spark, toy_graph):
    from graphscope_spark.algorithms.walks import neighbor_sample

    a = sorted(map(tuple, neighbor_sample(toy_graph, [0, 3], [2, 1]).collect()))
    b = sorted(map(tuple, neighbor_sample(toy_graph, [0, 3], [2, 1]).collect()))
    assert a == b
    c = sorted(map(tuple, neighbor_sample(toy_graph, [0, 3], [2, 1], seed=7).collect()))
    assert a != c  # different seed, different draw


def test_neighbor_sample_topk_weight(spark):
    from graphscope_spark import LinkGraph
    from graphscope_spark.algorithms.walks import neighbor_sample

    edges = [(1, 2, 5.0), (1, 3, 9.0), (1, 4, 9.0), (2, 5, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    g = LinkGraph.from_edges(e).build(2)
    got = {
        (r["root"], r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(g, [1], [2, 1],
                                 strategy="topk_weight").collect()
    }
    want = _py_neighbor_sample(
        [(s, d) for s, d, _ in edges], [1], [2, 1],
        weights={(s, d): w for s, d, w in edges}, strategy="topk_weight",
    )
    # hop 0 from 1: weights 9.0/9.0/5.0 → ties on 9.0 break to min dst: {3, 4}
    assert got == want
    assert (1, 0, 1, 3) in got and (1, 0, 1, 4) in got


def test_sage_features_mean_matches_python(spark, toy_graph):
    """sage_features = neighbor_sample + per-hop feature pooling; the
    Python twin recomputes the pools from the (already twin-verified)
    sample rows and a driver-side feature dict."""
    from graphscope_spark.algorithms.walks import (
        neighbor_sample, sage_features,
    )
    from pyspark.sql import functions as F

    feats = {i: (float(i % 3 + 1), float(i % 5)) for i in range(12)}
    fdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in feats.items()], "id long, fa double, fb double")
    got = {
        r["root"]: r.asDict()
        for r in sage_features(
            toy_graph, fdf, [0, 3, 6], [2, 2], agg="mean").collect()
    }
    samp = neighbor_sample(toy_graph, [0, 3, 6], [2, 2]).collect()
    for root in (0, 3, 6):
        row = got[root]
        assert row["self_fa"] == feats[root][0]
        assert row["self_fb"] == feats[root][1]
        for hop in (0, 1):
            dsts = [r["dst"] for r in samp
                    if r["root"] == root and r["hop"] == hop]
            for ci, cname in enumerate(("fa", "fb")):
                want = (sum(feats[d][ci] for d in dsts) / len(dsts)
                        if dsts else 0.0)
                key = f"h{hop + 1}_mean_{cname}"
                assert row[key] == want, (root, key, row[key], want)


def test_sage_features_max_and_empty_hop(spark):
    """max pooling; a root whose hop-2 frontier is empty pools 0.0."""
    from graphscope_spark import LinkGraph
    from graphscope_spark.algorithms.walks import sage_features

    e = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    g = LinkGraph.from_edges(e).build(2)  # directed; 2,3 are sinks
    fdf = spark.createDataFrame(
        [(1, 10.0), (2, 7.0), (3, 9.0)], "id long, f double")
    rows = {r["root"]: r.asDict()
            for r in sage_features(g, fdf, [1], [2, 2], agg="max").collect()}
    assert rows[1]["self_f"] == 10.0
    assert rows[1]["h1_max_f"] == 9.0
    assert rows[1]["h2_max_f"] == 0.0  # sinks: empty hop-2 sample
