"""Gremlin-lite traversal layer vs hand-computed truths on the toy
graph (FIXTURES.md) — mirrors the reference's GIE step inventory
(docs/interactive_engine.rst:184-369).

Toy edges (conftest.TOY_EDGES):
  (0,1)(1,2)(2,0)(0,2) (3,0)(3,1)(3,2)(3,4)(4,3) (3,5)(1,5)
  (6,7)(7,8) (9,10)(10,11)(11,9)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.traversal import P, Text, __, traversal
from tests.conftest import TOY_EDGES


@pytest.fixture(scope="module")
def g(toy_graph):
    return traversal(toy_graph)


OUT = {}
IN = {}
for s, d in TOY_EDGES:
    OUT.setdefault(s, set()).add(d)
    IN.setdefault(d, set()).add(s)


def test_V_E_sources(g):
    assert sorted(g.V().toList()) == list(range(12))
    assert sorted(g.V().id_().toList()) == list(range(12))
    assert g.V(3, 4).id_().toList() == [3, 4]
    assert g.E().n() == len(TOY_EDGES)


def test_out_in_both(g):
    assert g.V(3).out().id_().toList() == sorted(OUT[3])
    assert g.V(5).in_().id_().toList() == sorted(IN[5])
    assert g.V(0).both().dedup().id_().toList() == sorted(OUT[0] | IN[0])
    # multiplicity: both() without dedup keeps one row per edge
    assert g.V(0).both().n() == len(OUT[0]) + len(IN[0])


def test_edge_steps(g):
    assert sorted(g.V(3).outE().toList()) == sorted((3, d) for d in OUT[3])
    assert g.V(5).inE().outV().id_().toList() == sorted(IN[5])
    assert g.V(3).outE().inV().id_().toList() == sorted(OUT[3])
    # otherV from inE = the source side
    assert g.V(2).inE().otherV().id_().toList() == sorted(IN[2])


def test_filters(g):
    assert g.V().hasId(1, 9, 11).id_().toList() == [1, 9, 11]
    two_hop = g.V(3).out().out().dedup().id_().toList()
    expect = sorted({x for d in OUT[3] for x in OUT.get(d, ())})
    assert two_hop == expect
    # correlated where: vertices with >= 3 out-edges
    hubs = g.V().where(__.out().count().is_(P.gte(3))).id_().toList()
    assert hubs == sorted(v for v, ds in OUT.items() if len(ds) >= 3)
    # where with zero-count semantics: out-degree < 1 == sinks
    sinks = g.V().where(__.out().count().is_(P.lt(1))).id_().toList()
    assert sinks == sorted(set(range(12)) - set(OUT))
    # not_: vertices with NO incoming edge
    no_in = g.V().not_(__.in_()).id_().toList()
    assert no_in == sorted(set(range(12)) - set(IN))


def test_values_aggregates(g):
    assert g.V().count().toList() == [12]
    assert g.V(9, 10, 11).out().count().toList() == [3]
    assert g.V(3).out().id_().sum_().toList() == [sum(OUT[3])]
    assert g.V(3).out().id_().max_().toList() == [max(OUT[3])]
    assert g.V(3).out().id_().fold().toList() == [sorted(OUT[3])]
    gc = dict(g.V().out().groupCount().toList())
    assert gc == {d: len(ss) for d, ss in IN.items()}


def test_order_limit_range(g):
    top3 = g.V().order(desc=True).limit(3).id_().toList()
    assert top3 == [9, 10, 11]
    page = g.V().order().range_(2, 5).id_().toList()
    assert page == [2, 3, 4]


def test_as_select(g):
    pairs = g.V(3).as_("a").out().as_("b").select("a", "b").toList()
    assert sorted(pairs) == sorted((3, d) for d in OUT[3])


def test_repeat_emit(g):
    frontier = g.V(6).repeat(__.out()).times(2).id_().toList()
    assert frontier == [8]
    emitted = g.V(6).repeat(__.out()).emit().times(2).id_().toList()
    assert emitted == [7, 8]


def test_path_simplepath(g, toy_graph):
    gp = traversal(toy_graph).with_path()
    paths = gp.V(9).out().out().out().path().toList()
    assert paths == [[9, 10, 11, 9]]  # the triangle cycles back
    assert gp.V(9).out().out().out().simplePath().n() == 0
    assert gp.V(3).out().simplePath().n() == len(OUT[3])


def test_has_on_properties(g, spark, toy_graph):
    from graphscope_spark.graph import LinkGraph
    v = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(12)],
        "id long, parity string, score double")
    e = toy_graph.edges
    lg = LinkGraph(vertices=v, edges=e, directed=True)
    t = traversal(lg)
    assert t.V().has("parity", "even").id_().toList() == [0, 2, 4, 6, 8, 10]
    assert t.V().has("score", P.gt(9.0)).id_().toList() == [10, 11]
    assert t.V().has("parity", Text.startingWith("od")).count().toList() == [6]
    assert t.V(4).out().values("parity").toList() == ["odd"]
    # whole chain stays one plan: hub's even 2-hop neighbors
    got = t.V(3).out().out().dedup().has("parity", "even").id_().toList()
    expect = sorted({x for d in OUT[3] for x in OUT.get(d, ())} & {0, 2, 4, 6, 8, 10})
    assert got == expect


def test_empty_graph(spark):
    from graphscope_spark.graph import LinkGraph
    t = traversal(LinkGraph.empty(spark))
    assert t.V().id_().toList() == []
    assert t.V().out().count().toList() == [0]
    assert t.V().where(__.out()).n() == 0
    assert t.V().out().groupCount().toList() == []
    assert t.E().n() == 0


def test_errors(g):
    with pytest.raises(TypeError):
        g.V().inV()
    with pytest.raises(TypeError):
        g.E().out()
    with pytest.raises(KeyError):
        g.V().has("nope", 1)
    with pytest.raises(TypeError):
        g.V().out().path()  # path tracking not enabled


# ----------------------------------------------------------------------
# round-3 steps: group().by().by(), valueMap, unfold, branch().option(),
# local-scope steps, repeat().until() (GIE rst:270-358)
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def gp(spark, toy_graph):
    from graphscope_spark.graph import LinkGraph
    v = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(12)],
        "id long, parity string, score double")
    lg = LinkGraph(vertices=v, edges=toy_graph.edges, directed=True)
    return traversal(lg)


def test_group_by_element_fold(g):
    # per-vertex sorted out-neighbor lists; sinks keep []
    rows = {r["key"]: r["val"]
            for r in g.V().group().by().by(__.out().id_().fold()).toDF().collect()}
    assert rows[3] == sorted(OUT[3])
    assert rows[5] == []
    assert set(rows) == set(range(12))


def test_group_by_property_count(gp):
    # group().by('parity').by(count()) == per-parity vertex count
    rows = {r["key"]: r["val"]
            for r in gp.V().group().by("parity").by(__.count()).toDF().collect()}
    assert rows == {"even": 6, "odd": 6}
    # stream semantics: count of OUT-EDGES per parity of the source
    rows = {r["key"]: r["val"]
            for r in gp.V().group().by("parity").by(__.out().count()).toDF().collect()}
    even = sum(len(OUT.get(i, ())) for i in range(0, 12, 2))
    odd = sum(len(OUT.get(i, ())) for i in range(1, 12, 2))
    assert rows == {"even": even, "odd": odd}


def test_group_by_property_fold_values(gp):
    # second by() as a property name folds that property per key
    rows = {r["key"]: r["val"]
            for r in gp.V().group().by("parity").by("score").toDF().collect()}
    assert rows["even"] == [float(i) for i in range(0, 12, 2)]


def test_groupcount_by(gp):
    rows = {r["key"]: r["cnt"]
            for r in gp.V().groupCount("parity").toDF().collect()}
    assert rows == {"even": 6, "odd": 6}


def test_valuemap(gp):
    rows = gp.V(3, 4).valueMap("parity", "score").toDF().collect()
    m = {r["id"]: (r["parity"], r["score"]) for r in rows}
    assert m == {3: ("odd", 3.0), 4: ("even", 4.0)}
    # no keys -> all property columns
    cols = set(gp.V(3).valueMap().toDF().columns)
    assert cols == {"id", "parity", "score"}


def test_unfold(g):
    vals = g.V(3).out().id_().fold().unfold().toList()
    assert sorted(vals) == sorted(OUT[3])


def test_local_scope_steps(g):
    folded = g.V(3).out().id_().fold()
    assert folded.count_local().toList() == [len(OUT[3])]
    assert folded.order_local(desc=True).toList() == [sorted(OUT[3], reverse=True)]
    assert folded.range_local(1, 3).toList() == [sorted(OUT[3])[1:3]]
    assert folded.sum_local().toList() == [float(sum(OUT[3]))]
    assert folded.min_local().toList() == [min(OUT[3])]
    assert folded.max_local().toList() == [max(OUT[3])]
    assert folded.mean_local().toList() == [sum(OUT[3]) / len(OUT[3])]
    # dedup_local keeps first occurrence
    two = g.V(0, 3).out().id_().fold().dedup_local()
    assert two.count_local().toList() == [len(set(OUT[0]) | set(OUT[3]))]


def test_branch_option(gp):
    # route evens to out(), odds to in_(): same as manual union
    got = sorted(gp.V(0, 3).branch("parity")
                 .option("even", __.out())
                 .option("odd", __.in_()).id_().toList())
    assert got == sorted(list(OUT[0]) + list(IN[3]))
    # unmatched selector values are dropped
    got = gp.V(0, 1).branch("parity").option("even", __.out()).id_().toList()
    assert sorted(got) == sorted(OUT[0])


def test_repeat_until(g):
    # walk forward until a vertex with no outgoing edges: from 6 the
    # chain 6->7->8 exits at 8 (the only sink on that path)
    got = g.V(6).repeat(__.out().dedup()).until(__.not_(__.out())).toList()
    assert got == [8]
    # with emit(): every intermediate frontier element is output
    got = sorted(g.V(6).repeat(__.out().dedup())
                 .until(__.not_(__.out())).emit().toList())
    assert got == [7, 8]
    # never-true condition terminates via max_rounds (triangle cycle)
    got = g.V(9).repeat(__.out().dedup()).until(
        __.not_(__.both()), max_rounds=3).toList()
    assert got == []


def test_range_pretrim_correct_paging(g):
    # range_ pages the global order correctly on multi-partition input
    ids = g.V().order().range_(2, 7).id_().toList()
    assert ids == [2, 3, 4, 5, 6]


def test_filter_step(gp):
    # GIE: g.V().filter(values("score").is(gt(3.0)))
    ids = {r["id"] for r in
           gp.V().filter_(__.values("score").is_(P.gt(3.0))).toDF().collect()}
    assert ids == {i for i in range(12) if i > 3}


def test_label_step(spark, toy_graph):
    from graphscope_spark.graph import LinkGraph
    from pyspark.sql import functions as F
    v = toy_graph.vertices.withColumn(
        "label", F.when(F.col("id") < 6, "page").otherwise("site"))
    e = toy_graph.edges.withColumn(
        "label", F.when(F.col("src") < F.col("dst"), "fwd").otherwise("back"))
    lg = LinkGraph(vertices=v, edges=e, directed=True)
    t = traversal(lg)
    vl = {r["val"] for r in t.V().label().toDF().collect()}
    assert vl == {"page", "site"}
    el = t.E().label().groupCount().toDF().collect()
    got = {r["key"]: r["cnt"] for r in el}
    want = {"fwd": sum(1 for s, d in TOY_EDGES if s < d),
            "back": sum(1 for s, d in TOY_EDGES if s > d)}
    assert got == want


def test_label_errors(g):
    import pytest as _pt
    with _pt.raises(KeyError):
        g.V().label().toDF()


# -- sack / aggregate / cap -------------------------------------------
def test_sack_vertex_property(g):
    # sum the visited vertex's own id into the sack: one hop from 3 →
    # sack = dst id
    vals = g.with_sack(0).V(3).out().sack("sum").by("id").sack().toList()
    assert sorted(vals) == sorted(OUT[3])


def test_sack_edge_weight_paths(spark):
    from graphscope_spark.graph import LinkGraph
    from graphscope_spark.traversal import traversal as trav

    e = spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 1.0), (2, 4, 5.0), (3, 4, 100.0)],
        "src long, dst long, w double",
    )
    gg = trav(LinkGraph.from_edges(e))
    sums = (
        gg.with_sack(0.0).V(1)
        .outE().sack("sum").by("w").inV()
        .outE().sack("sum").by("w").inV()
        .sack().toList()
    )
    # paths 1→2→4 (15) and 1→3→4 (101)
    assert sorted(sums) == [15.0, 101.0]
    # mult over the same paths
    prods = (
        gg.with_sack(1.0).V(1)
        .outE().sack("mult").by("w").inV()
        .outE().sack("mult").by("w").inV()
        .sack().toList()
    )
    assert sorted(prods) == [50.0, 100.0]
    # min keeps the bottleneck weight
    mins = (
        gg.with_sack(1e18).V(1)
        .outE().sack("min").by("w").inV()
        .outE().sack("min").by("w").inV()
        .sack().toList()
    )
    assert sorted(mins) == [1.0, 5.0]


def test_sack_requires_with_sack(g):
    with pytest.raises(TypeError):
        g.V(3).out().sack()


def test_aggregate_cap(g):
    # collect the mid-stream frontier, keep traversing, retrieve at end
    got = g.V(3).out().aggregate("x").out().cap("x").toList()
    assert got == [sorted(OUT[3])]
    # cap without aggregate raises
    with pytest.raises(KeyError):
        g.V(3).out().cap("nope")


def test_sack_with_value_traverser(g):
    # sack(op).by() on a value traverser folds the value itself
    vals = (
        g.with_sack(0).V(3).out().values("id")
        .sack("sum").by().sack().toList()
    )
    assert sorted(vals) == sorted(OUT[3])


def test_bothV(g):
    # bothV on inE(2): one traverser per endpoint of each in-edge
    got = sorted(g.V(2).inE().bothV().id_().toList())
    expect = sorted([x for s in IN[2] for x in (s, 2)])
    assert got == expect


def test_properties_key_value(gp):
    # single key keeps the native type
    assert gp.V(3).properties("score").value().toList() == [3.0]
    assert gp.V(3).properties("parity").key().toList() == ["parity"]
    # multi-key: one traverser per (element, key), values cast to
    # string so the union arms share one type
    vals = gp.V(4).properties("parity", "score").value().toList()
    assert sorted(vals) == sorted(["even", "4.0"])
    # no keys -> all property columns; count() works on prop kind
    assert gp.V(3, 4).properties().count().toList() == [4]
    with pytest.raises(KeyError):
        gp.V(3).properties("nope").toDF()


def test_select_keys_values_over_group(g):
    # GIE rst:310-311: group().by().by(...).select(values).unfold()
    vals = (g.V(3).out().group().by().by(__.in_().count())
            .select("values").toList())
    expect = sorted(len(IN[d]) for d in OUT[3])
    assert sorted(vals) == expect
    keys = (g.V(3).out().group().by().by(__.in_().count())
            .select("keys").toList())
    assert sorted(keys) == sorted(OUT[3])
    unfolded = (g.V(3).out().id_().groupCount()
                .toDF().columns)
    assert unfolded == ["key", "cnt"]


def test_subgraph_cap(g, toy_graph):
    # GIE's simplified Subgraph (rst:365): extract the traversed edges
    # into a new graph; cap(key) yields the LinkGraph
    sg = g.V(3).outE().subgraph("sg").cap("sg")
    got = sorted(tuple(r) for r in sg.edges.select("src", "dst").collect())
    assert got == sorted((3, d) for d in OUT[3])
    # induced vertex set = endpoints only
    vids = sorted(r[0] for r in sg.vertices.collect())
    assert vids == sorted({3} | OUT[3])
    # the traversal continues unchanged past subgraph()
    assert g.V(3).outE().subgraph("x").inV().id_().toList() == sorted(OUT[3])
    with pytest.raises(KeyError):
        g.V(3).outE().cap("nope")


def test_local_by_modulators(gp):
    # GIE rst:255-278: g.V().out().fold().dedup(local).by('parity') /
    # .order(local).by('parity') — property-modulated local steps
    folded = gp.V(3).out().id_().fold()          # OUT[3] = {0,1,2,4,5}
    # dedup by parity keeps the first element of each parity in fold
    # (= sorted) order: 0 (even), 1 (odd)
    assert folded.dedup_local(by="parity").toList() == [[0, 1]]
    # order by parity: evens ('even' < 'odd') before odds, id tiebreak
    assert folded.order_local(by="parity").toList() == [[0, 2, 4, 1, 5]]
    assert folded.order_local(by="parity", desc=True).toList() == [[5, 1, 4, 2, 0]]
    with pytest.raises(KeyError):
        folded.dedup_local(by="nope").toDF()


def test_union_coalesce_optional(g):
    # union: concatenated streams, duplicates preserved
    got = sorted(g.V(3).union(__.out(), __.in_()).id_().toList())
    assert got == sorted(list(OUT[3]) + list(IN[3]))
    # coalesce: per-element first non-empty arm — sinks (no out) fall
    # through to their in-neighbors
    # vertex 5 has no out-edges; 0 does
    got5 = sorted(g.V(5).coalesce(__.out(), __.in_()).id_().toList())
    assert got5 == sorted(IN[5])
    got0 = sorted(g.V(0).coalesce(__.out(), __.in_()).id_().toList())
    assert got0 == sorted(OUT[0])
    # mixed seeds: each element picks its own arm
    mixed = sorted(g.V(0, 5).coalesce(__.out(), __.in_()).id_().toList())
    assert mixed == sorted(list(OUT[0]) + list(IN[5]))
    # optional: passthrough for elements with no sub-result
    opt = sorted(g.V(0, 5).optional(__.out()).id_().toList())
    assert opt == sorted(list(OUT[0]) + [5])
    with pytest.raises(TypeError):
        g.V(3).union(__.out(), __.out().id_()).toDF()
    with pytest.raises(TypeError):
        g.V(3).coalesce(__.outE()).toDF()


# ----------------------------------------------------------------------
# round-3 standard-Gremlin extras batch 2: choose, project().by(),
# hasNot/hasLabel, cyclicPath/identity, tail, sample
# ----------------------------------------------------------------------
def test_choose(g):
    # 0 has out-edges (true arm), 5 does not (false arm)
    got = sorted(g.V(0, 5).choose(__.out(), __.out(), __.in_())
                 .id_().toList())
    assert got == sorted(list(OUT[0]) + list(IN[5]))
    # no false arm: element passes through unchanged
    got = sorted(g.V(0, 5).choose(__.out(), __.out()).id_().toList())
    assert got == sorted(list(OUT[0]) + [5])
    with pytest.raises(TypeError):
        g.V(3).choose(__.out(), __.out(), __.in_().id_()).toDF()


def test_project_by(gp):
    rows = (gp.V(3).project("v", "deg", "par")
            .by().by(__.out().count()).by("parity").toDF().collect())
    assert [(r["v"], r["deg"], r["par"]) for r in rows] == [(3, 5, "odd")]
    # empty sub-stream projects count 0, not null
    rows = (gp.V(5).project("v", "deg").by().by(__.out().count())
            .toDF().collect())
    assert [(r["v"], r["deg"]) for r in rows] == [(5, 0)]
    # sum over out-neighbor scores
    rows = (gp.V(3).project("s").by(__.out().values("score").sum_())
            .toDF().collect())
    assert rows[0]["s"] == pytest.approx(sum(OUT[3]))
    with pytest.raises(TypeError):
        gp.V(3).project("a").by().by("parity").toDF()
    with pytest.raises(TypeError):
        gp.V(3).project("a").by(__.out()).toDF()  # no trailing aggregate
    with pytest.raises(KeyError):
        gp.V(3).project("a").by("nope").toDF()


def test_hasnot_haslabel(spark, toy_graph, gp):
    from graphscope_spark.graph import LinkGraph
    # nullable property: even ids carry it, odd ids do not
    v = spark.createDataFrame(
        [(i, float(i) if i % 2 == 0 else None) for i in range(12)],
        "id long, score double")
    lg = LinkGraph(vertices=v, edges=toy_graph.edges, directed=True)
    t = traversal(lg)
    assert sorted(t.V().hasNot("score").id_().toList()) == [
        i for i in range(12) if i % 2 == 1]
    # column absent entirely -> everything passes
    assert t.V().hasNot("nope").n() == 12
    # labels
    vl = toy_graph.vertices.withColumn(
        "label", F.when(F.col("id") < 6, "page").otherwise("site"))
    el = toy_graph.edges.withColumn(
        "label", F.when(F.col("src") < F.col("dst"), "fwd").otherwise("back"))
    tl = traversal(LinkGraph(vertices=vl, edges=el, directed=True))
    assert sorted(tl.V().hasLabel("site").id_().toList()) == list(range(6, 12))
    assert sorted(tl.V().hasLabel("page", "site").id_().toList()) == list(range(12))
    assert tl.E().hasLabel("back").n() == sum(1 for s, d in TOY_EDGES if s > d)
    with pytest.raises(KeyError):
        gp.V().hasLabel("x").toDF()  # gp has no label column
    with pytest.raises(TypeError):
        tl.V().hasLabel()


def test_cyclicpath_identity(g, toy_graph):
    t = traversal(toy_graph).with_path()
    # 9->10->11->9 is the only 3-hop walk from 9 and it cycles
    assert t.V(9).out().out().out().cyclicPath().n() == 1
    assert t.V(9).out().out().out().simplePath().n() == 0
    # simplePath + cyclicPath partition any walk set
    three = t.V(3).out().out().out()
    assert three.simplePath().n() + three.cyclicPath().n() == three.n()
    with pytest.raises(TypeError):
        g.V(3).out().cyclicPath()
    assert g.V(3).identity().id_().toList() == [3]


def test_tail(g):
    assert g.V().order().tail(3).id_().toList() == [9, 10, 11]
    # value traversers: last 2 in value order
    assert g.V(3).out().id_().tail(2).toList() == sorted(OUT[3])[-2:]
    # tail(n) with n > stream size = whole stream
    assert sorted(g.V(3).out().tail(99).id_().toList()) == sorted(OUT[3])


def test_sample(g):
    s1 = g.V().sample(4).id_().toList()
    s2 = g.V().sample(4).id_().toList()
    assert s1 == s2  # deterministic
    assert len(s1) == 4 and len(set(s1)) == 4
    assert set(s1) <= set(range(12))
    # n > population: everything
    assert sorted(g.V().sample(99).id_().toList()) == list(range(12))
    # a different seed is also deterministic
    assert (g.V().sample(4, seed=7).id_().toList()
            == g.V().sample(4, seed=7).id_().toList())


# -- regression: local-scope / filter semantics under duplicate
# traversers and multi-row (multi-label) element tables ---------------

def test_project_duplicate_traversers_local_scope(g):
    # V(0,3).out() reaches 1 and 2 twice (via 0 and via 3): project's
    # sub-aggregate is PER TRAVERSER local scope, so each duplicate row
    # must report its element's own out-degree, not a merged stream
    rows = (g.V(0, 3).out().project("v", "d").by().by(__.out().count())
            .toDF().collect())
    got = sorted((r["v"], r["d"]) for r in rows)
    expect = sorted((d, len(OUT.get(d, ()))) for s in (0, 3) for d in OUT[s])
    assert got == expect
    # empty-steps modulator counts the single-element local stream (1),
    # never the duplicate multiplicity
    rows = (g.V(0, 3).out().project("v", "one").by().by(__.count())
            .toDF().collect())
    assert {r["one"] for r in rows} == {1}


def test_project_fold_empty_projects_empty_list(g):
    # sink vertex folds to [], matching group()'s empty-key convention
    rows = (g.V(5, 3).project("v", "nbrs").by().by(__.out().id_().fold())
            .toDF().collect())
    by_v = {r["v"]: sorted(r["nbrs"]) for r in rows}
    assert by_v[5] == []
    assert by_v[3] == sorted(OUT[3])


def test_group_duplicate_traversers_multiplicity(g):
    # group() is a global barrier: each traverser contributes its
    # sub-stream ONCE (linear in duplicates, never squared)
    rows = {r["key"]: r["val"] for r in
            g.V(0, 3).out().group().by().by(__.out().count())
            .toDF().collect()}
    # vertex 2 is reached twice; its out-degree is len(OUT[2]) -> 2x
    expect = {}
    for s in (0, 3):
        for d in OUT[s]:
            expect[d] = expect.get(d, 0) + len(OUT.get(d, ()))
    assert rows == expect


def test_multilabel_filter_no_fanout(spark, toy_graph):
    from graphscope_spark.graph import LinkGraph
    # one row per (id, label): ids < 6 carry BOTH labels
    rows = [(i, "page") for i in range(12)] + [(i, "site") for i in range(6)]
    v = spark.createDataFrame(rows, "id long, label string")
    tl = traversal(LinkGraph(vertices=v, edges=toy_graph.edges,
                             directed=True))
    # V() yields one traverser per vertex row (documented); hasLabel is
    # a FILTER — matching two label rows must not multiply traversers
    assert tl.V(0).n() == 2           # two label rows for vertex 0
    assert tl.V(0).hasLabel("page", "site").n() == 2   # unchanged, not 4
    assert tl.V(0).dedup().hasLabel("page", "site").n() == 1
    assert sorted(tl.V().dedup().hasLabel("site").id_().toList()) == \
        list(range(6))
    # has() existence on the multi-row table: semi-join, no fan-out
    assert tl.V(0).dedup().has("label").n() == 1
    # edge labels: two label rows for the same (s,d) pair must not
    # multiply the matching edge traverser
    el = (toy_graph.edges.withColumn("label", F.lit("fwd")).unionByName(
        toy_graph.edges.limit(1).withColumn("label", F.lit("extra"))))
    te = traversal(LinkGraph(vertices=toy_graph.vertices, edges=el,
                             directed=True))
    one = te.E().dedup().limit(1)
    assert one.hasLabel("fwd", "extra").n() == 1


def test_choose_preserves_path_and_sack(toy_graph):
    t = traversal(toy_graph).with_path()
    # path tracking survives choose(): a later path()/simplePath() works
    paths = (t.V(0).choose(__.out(), __.out()).path().toList())
    assert sorted(paths) == sorted([0, d] for d in OUT[0])
    assert t.V(9).out().out().choose(__.out(), __.out()).cyclicPath().n() == 1
    # sack survives choose()
    vals = (traversal(toy_graph).with_sack(7).V(0)
            .choose(__.out(), __.out()).sack().toList())
    assert vals == [7] * len(OUT[0])


def test_tail_on_edges(g):
    # g.E().tail(n) uses the default (esrc, edst) order
    last2 = g.E().tail(2).toList()
    assert last2 == sorted(TOY_EDGES)[-2:]
    assert g.E().tail(999).n() == len(TOY_EDGES)


def test_aggregate_cap_on_edges(g):
    # aggregate('x') on an edge traverser collects EDGES (src,dst
    # structs), not just source ids
    got = g.V(3).outE().aggregate("x").cap("x").toList()
    assert len(got) == 1
    pairs = sorted((r["src"], r["dst"]) for r in got[0])
    assert pairs == sorted((3, d) for d in OUT[3])


def test_sack_by_edge_prop_parallel_edges(spark):
    from graphscope_spark.graph import LinkGraph
    # parallel edges (1,2) with different weights: the property lookup
    # must not multiply traversers — (src,dst) identifies the edge and
    # the weight resolves deterministically to the min
    e = spark.createDataFrame([(1, 2, 1.0), (1, 2, 5.0), (1, 3, 2.0)],
                              "src long, dst long, w double")
    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    lg = LinkGraph(vertices=v, edges=e, directed=True)
    t = traversal(lg).with_sack(0.0)
    vals = sorted(t.V(1).outE().sack("sum").by("w").sack().toList())
    assert len(vals) == 3            # three edge rows, no fan-out
    assert vals == [1.0, 1.0, 2.0]   # parallel pair resolves to min
    # label() on the same multigraph: one value per edge row
    el = e.withColumn("label", F.concat(F.lit("w"), F.col("w").cast("int")))
    tl = traversal(LinkGraph(vertices=v, edges=el.drop("w"), directed=True))
    assert tl.E().label().n() == 3


def test_union_coalesce_preserve_sack_and_tags(toy_graph):
    # sack survives union()/coalesce(): both arms carry it
    ts = traversal(toy_graph).with_sack(5)
    vals = ts.V(0).union(__.out(), __.in_()).sack().toList()
    assert vals == [5] * (len(OUT[0]) + len(IN[0]))
    vals = ts.V(0).coalesce(__.out(), __.in_()).sack().toList()
    assert vals == [5] * len(OUT[0])
    vals = ts.V(5).optional(__.out()).sack().toList()
    assert vals == [5]
    # tags set before the branch survive for a later select()
    got = (traversal(toy_graph).V(3).as_("a").union(__.out())
           .dedup().as_("b").select("a", "b").toDF().collect())
    assert {r["a"] for r in got} == {3}
    assert sorted(r["b"] for r in got) == sorted(OUT[3])


def test_match_transitive_triads(g):
    """match() pattern sugar: a->b, b->c, a->c against the Python
    adjacency twin."""
    rows = (g.V().match(
        __.as_("a").out().as_("b"),
        __.as_("b").out().as_("c"),
        __.as_("a").out().as_("c"),
    ).select("a", "b", "c").toDF().collect())
    got = sorted((r["a"], r["b"], r["c"]) for r in rows)
    want = sorted(
        (a, b, c)
        for a in OUT for b in OUT.get(a, ())
        for c in OUT.get(b, ()) if c in OUT.get(a, ()))
    assert got == want and len(got) > 0


def test_match_constraint_and_reuse(g):
    """A pattern without a trailing as_ constrains its start binding;
    repositioning at a bound tag works mid-match."""
    rows = (g.V().match(
        __.as_("a").out().as_("b"),
        __.as_("a").hasId(3),
    ).select("a", "b").toDF().collect())
    got = sorted((r["a"], r["b"]) for r in rows)
    assert got == sorted((3, d) for d in OUT[3])


def test_match_endpoint_agreement_filters(g):
    """Binding an already-bound endpoint keeps only agreeing rows —
    a<-b<-a back-edge pattern = reciprocal pairs."""
    rows = (g.V().match(
        __.as_("a").out().as_("b"),
        __.as_("b").out().as_("a"),
    ).select("a", "b").toDF().collect())
    got = sorted((r["a"], r["b"]) for r in rows)
    want = sorted((a, b) for a in OUT for b in OUT[a]
                  if a in OUT.get(b, ()))
    assert got == want and len(got) > 0


def test_match_errors(g):
    with pytest.raises(TypeError, match="start with"):
        g.V().match(__.out().as_("b")).toDF()
    with pytest.raises(TypeError, match="unbound"):
        g.V().match(__.as_("a").out().as_("b"),
                    __.as_("zzz").out().as_("c")).toDF()
    with pytest.raises(TypeError, match="vertex-kind"):
        g.V().match(__.as_("a").out().count().as_("b")).toDF()
    with pytest.raises(TypeError, match="at least one"):
        g.V().match()
