"""crawl_schedule (web.py) and partition_quality (partitioning.py)
vs pure-Python twins."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark import web as W
from graphscope_spark.algorithms.partitioning import partition_quality

URLS = [
    f"http://site{i % 3}.com/page/{i}" for i in range(30)
] + ["no-scheme-url", "https://solo.org/x"]


def _py_schedule(urls, delay=1.0, cap=None):
    import re

    rows = []
    for u in urls:
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)", u)
        if not m:
            continue
        host = re.sub(r":[0-9]+$", "", m.group(2).lower())
        pri = int(
            hashlib.md5(f"crawl|{u}".encode()).hexdigest()[:15], 16
        )
        rows.append((host, pri, u))
    out = {}
    by_host = {}
    for host, pri, u in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        slot = by_host.get(host, 0)
        by_host[host] = slot + 1
        if cap is None or slot < cap:
            out[u] = (host, slot, slot * delay)
    return out


def test_crawl_schedule_matches_python_twin(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {
        r["url"]: (r["host"], r["slot"], r["fetch_at"])
        for r in W.crawl_schedule(df, delay_sec=2.0).collect()
    }
    assert got == _py_schedule(URLS, delay=2.0)


def test_crawl_schedule_cap(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = W.crawl_schedule(df, max_per_host=3).collect()
    per_host = {}
    for r in got:
        per_host.setdefault(r["host"], []).append(r["slot"])
    for host, slots in per_host.items():
        assert sorted(slots) == list(range(len(slots)))
        assert max(slots) <= 2


EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (5, 6), (6, 5)]


def test_partition_quality_known_values(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame(EDGES, ["src", "dst"]), directed=True
    )
    row = partition_quality(g, num_parts=2).collect()[0]
    # part = id % 2: cut edges are those with differing parity
    cut = sum(1 for s, d in EDGES if s % 2 != d % 2)
    assert row["num_edges"] == len(EDGES)
    assert row["cut_edges"] == cut
    assert row["edge_cut_frac"] == pytest.approx(cut / len(EDGES), abs=1e-9)
    loads = {}
    verts = {u for e in EDGES for u in e}
    for v in verts:
        loads[v % 2] = loads.get(v % 2, 0) + 1
    assert row["balance"] == pytest.approx(
        max(loads.values()) / (len(verts) / 2), abs=1e-6
    )
    ghosts = len({(s, d % 2) for s, d in EDGES if s % 2 != d % 2})
    assert row["ghost_vertices"] == ghosts


def test_partition_quality_custom_assign(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame(EDGES, ["src", "dst"]), directed=True
    )
    # everything in one part: zero cut, balance = num_parts's max/avg
    assign = spark.createDataFrame(
        [(v, 0) for v in {u for e in EDGES for u in e}], ["id", "part"]
    )
    row = partition_quality(g, assign=assign).collect()[0]
    assert row["cut_edges"] == 0
    assert row["edge_cut_frac"] == 0.0
    assert row["balance"] == 1.0
    assert row["ghost_vertices"] == 0


def test_partition_quality_needs_input(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame(EDGES, ["src", "dst"]), directed=True
    )
    with pytest.raises(ValueError):
        partition_quality(g)
