"""TrustRank / spam mass (algorithms/trustrank.py) vs a dense NumPy
power-iteration oracle with an arbitrary reset vector."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import pagerank, spam_mass, trustrank

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _np_personalized_pr(nodes, edges, p_vec, rounds, alpha=0.85):
    """NX-semantics fixed-round personalized PageRank: init 1/N,
    dangling vector = p."""
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, v in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    p = np.asarray(p_vec, dtype=float)
    p = p / p.sum()
    for _ in range(rounds):
        ds = alpha * r[out == 0].sum()
        nxt = (1 - alpha) * p + ds * p
        for u, v in edges:
            if out[idx[u]] > 0:
                nxt[idx[v]] += alpha * r[idx[u]] / out[idx[u]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def toy(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame(TOY_EDGES, "src long, dst long"),
        vertices=spark.createDataFrame([(v,) for v in TOY_VERTICES], "id long"),
        directed=True,
    ).build()
    return g


def test_trustrank_matches_numpy(toy, spark):
    seeds = [0, 9]
    p = np.zeros(len(TOY_VERTICES))
    for s in seeds:
        p[s] = 1.0
    want = _np_personalized_pr(TOY_VERTICES, TOY_EDGES, p, rounds=7)
    got = {r["id"]: r["trust"] for r in trustrank(toy, seeds, fixed_rounds=7).collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_trustrank_seed_df_equals_list(toy, spark):
    seeds_df = spark.createDataFrame([(0,), (9,)], "id long")
    a = {r["id"]: r["trust"] for r in trustrank(toy, [0, 9], fixed_rounds=4).collect()}
    b = {r["id"]: r["trust"] for r in trustrank(toy, seeds_df, fixed_rounds=4).collect()}
    assert a == b


def test_trustrank_all_seeds_is_uniform_pagerank(toy):
    """Seeding every vertex uniformly == plain PageRank (p = 1/N)."""
    tr = {r["id"]: r["trust"]
          for r in trustrank(toy, TOY_VERTICES, fixed_rounds=6).collect()}
    pr = {r["id"]: r["rank"]
          for r in pagerank(toy, fixed_rounds=6).collect()}
    for v in pr:
        assert tr[v] == pytest.approx(pr[v], abs=1e-12), v


def test_trustrank_unreachable_decay(toy):
    """Component B is unreachable from component-A seeds. With the
    uniform 1/N rank init, the chain 6→7→8 drains to EXACT zero within
    3 rounds (no reset mass, upstream zeros propagate), while the
    9-10-11 cycle retains exactly alpha^r / N of circulating init mass
    after r fixed rounds (→ 0 only at convergence)."""
    got = {r["id"]: r["trust"] for r in trustrank(toy, [3], fixed_rounds=5).collect()}
    for v in (6, 7, 8):
        assert got[v] == 0.0, v
    for v in (9, 10, 11):
        assert got[v] == pytest.approx(0.85**5 / 12, rel=1e-12), v
    assert got[3] > 0 and got[0] > 0


def test_spam_mass_formula_and_sign(toy):
    sm = {r["id"]: r for r in spam_mass(toy, [3], fixed_rounds=5).collect()}
    pr = {r["id"]: r["rank"] for r in pagerank(toy, fixed_rounds=5).collect()}
    tr = {r["id"]: r["trust"] for r in trustrank(toy, [3], fixed_rounds=5).collect()}
    for v, row in sm.items():
        assert row["rank"] == pytest.approx(pr[v], abs=1e-15)
        assert row["trust"] == pytest.approx(tr[v], abs=1e-15)
        assert row["spam_mass"] == pytest.approx(
            (pr[v] - tr[v]) / pr[v], abs=1e-12
        )
    # nodes with exactly-zero trust (drained chain) have spam mass 1
    for v in (6, 7, 8):
        assert sm[v]["spam_mass"] == pytest.approx(1.0, abs=1e-12)


def test_trustrank_empty_seed_raises(toy, spark):
    with pytest.raises(ValueError):
        trustrank(toy, spark.createDataFrame([], "id long"), fixed_rounds=2)
