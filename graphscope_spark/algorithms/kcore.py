"""k-core / k-shell / core decomposition — reference parity:
apps/kcore/kcore.h:27-129 (iterative peel :79-90) and
apps/kshell/kshell.h; python wrappers analytical/app/k_core.py:29-55,
k_shell.py:29-56.

k-core: maximal subgraph in which every vertex has (undirected simple)
degree ≥ k. Spark plan: peel loop — compute degrees, drop vertices
below k, semi-join edges, repeat until no vertex is dropped. Each round
is one groupBy + two semi-joins; rounds bounded by peel depth (small on
web graphs).

core_numbers: the FULL decomposition (core number = max k such that the
vertex is in the k-core) in ONE fixpoint, via the distributed h-index
iteration (Montresor/Lü semantics: h_0 = degree;
h_{t+1}(v) = H-index of {h_t(u) : u ∈ N(v)}; the fixpoint is exactly
the core number). This replaces O(k_max) invocations of the peel when
all core numbers (or the max core) are needed, and yields every
k-shell in the same pass. Each superstep is one shuffle join + two
hash aggregates + a per-vertex window whose partitions are bounded by
the number of DISTINCT neighbor h-values (≤ h(v)+1), so mega-hubs
never materialize adjacency arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner, _CKPT_LEVEL


def k_core(graph: LinkGraph, k: int, max_iter: int = 1000) -> DataFrame:
    """Vertices of the k-core: DataFrame(id long)."""
    edges = graph.simple_edges().localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    before = edges.count()
    for _ in range(max_iter):
        deg = (
            edges.select(F.col(SRC).alias(ID))
            .unionAll(edges.select(F.col(DST).alias(ID)))
            .groupBy(ID)
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select(ID)
        new_edges = (
            edges.join(keep.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(keep.withColumnRenamed(ID, DST), DST, "left_semi")
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        # one driver action per round: last round's `after` IS this
        # round's `before` (carried, not recounted)
        after = new_edges.count()
        edges = new_edges
        if after == before:
            break
        before = after
    return (
        edges.select(F.col(SRC).alias(ID))
        .unionAll(edges.select(F.col(DST).alias(ID)))
        .distinct()
    )


def core_numbers(graph: LinkGraph, max_iter: int = 10_000,
                 und_edges: DataFrame | None = None, **kw) -> DataFrame:
    """Core number of every vertex: DataFrame(id long, core long).

    Distributed h-index fixpoint (one pass for ALL k): h starts at the
    simple undirected degree and each superstep replaces it with the
    H-index of the neighbors' current values; the sequence decreases
    monotonically to the core number. Convergence is locality-bounded
    (rounds ≤ graph-dependent, typically O(10) on web graphs).

    The per-vertex H-index is computed WITHOUT collecting neighbor
    arrays: neighbor values are capped at the vertex's own h (the
    H-index can never exceed it), grouped to (id, value, count) — at
    most h(v)+1 rows per vertex — then a per-id cumulative window gives
    H = max(min(value, #neighbors with value ≥ value)). Hub-safe: a
    10^6-degree hub contributes ≤ h+1 grouped rows, not 10^6 array
    elements.

    Reference semantics: generalizes apps/kcore/kcore.h:79-90 — the
    k-core(k) = {v : core(v) ≥ k} for every k at once.

    und_edges: optional override of the symmetrized edge rows
    (src,dst). Pass the arc MULTISET E ∪ reverse(E) to get NetworkX's
    directed total-degree core numbers (reciprocal arcs count twice);
    default is the simple undirected edge set.
    """
    if und_edges is None:
        edges = graph.simple_edges()
        und_edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    und = und_edges.select(SRC, DST).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL)

    init = (
        und.groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").cast("long").alias("h"))
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        # neighbor values arriving at each vertex, capped at its own h
        nbr = (
            und.join(state.select(F.col(ID).alias(DST), F.col("h").alias("hv")), DST)
            .select(F.col(SRC).alias(ID), "hv")
            .join(state.select(ID, F.col("h").alias("hcur")), ID)
            .select(ID, "hcur", F.least("hv", "hcur").alias("val"))
        )
        cnt = nbr.groupBy(ID, "hcur", "val").agg(F.count("*").alias("c"))
        w = (
            Window.partitionBy(ID)
            .orderBy(F.desc("val"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        hidx = (
            cnt.withColumn("cum", F.sum("c").over(w))
            .groupBy(ID, "hcur")
            .agg(F.max(F.least(F.col("val"), F.col("cum"))).alias("hnew"))
        )
        return hidx.select(
            ID,
            F.least("hnew", "hcur").cast("long").alias("h"),
            (F.col("hnew") < F.col("hcur")).alias("__chg"),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        changed = new.where(F.col("__chg")).count()
        return changed == 0, {"changed": changed}

    runner = SuperstepRunner(max_iter=max_iter, **kw)
    result = runner.run(init.withColumn("__chg", F.lit(True)), step, until)
    core = result.state.select(ID, F.col("h").alias("core"))
    und.unpersist()
    # vertices with no simple edges have core 0
    return (
        graph.vertices.select(ID)
        .join(core, ID, "left")
        .select(ID, F.coalesce("core", F.lit(0)).cast("long").alias("core"))
    )


def max_core(graph: LinkGraph) -> DataFrame:
    """Vertices of the maximum-k core (one decomposition pass, not an
    upward walk of peels): DataFrame(id long)."""
    c = core_numbers(graph)
    kmax = c.agg(F.max("core").alias("m")).collect()[0]["m"] or 0
    return c.where(F.col("core") == int(kmax)).select(ID)


def k_shell(graph: LinkGraph, k: int) -> DataFrame:
    """Vertices in the k-shell = k-core minus (k+1)-core (kshell.h) =
    {v : core(v) = k} — one decomposition pass instead of two peels."""
    return core_numbers(graph).where(F.col("core") == int(k)).select(ID)


def k_crust(graph: LinkGraph, k: int | None = None) -> DataFrame:
    """Vertices of the k-crust (upstream networkx/algorithms/core.py::
    k_crust): {v : core(v) <= k}, k defaulting to max_core - 1. One
    decomposition pass + a filter."""
    c = core_numbers(graph)
    if k is None:
        kmax = c.agg(F.max("core").alias("m")).collect()[0]["m"] or 0
        k = int(kmax) - 1
    return c.where(F.col("core") <= int(k)).select(ID)


def k_corona(graph: LinkGraph, k: int) -> DataFrame:
    """Vertices of the k-corona (upstream core.py::k_corona): nodes in
    the k-core with EXACTLY k neighbors inside the k-core. One
    decomposition pass + one co-partitioned neighbor-count join — the
    adjacency never materializes as arrays."""
    k = int(k)
    # the decomposition feeds BOTH the in-core set and the exact-k
    # filter — materialize it once (shared-subtree discipline)
    c = core_numbers(graph).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL)
    in_core = c.where(F.col("core") >= k).select(ID)
    edges = graph.simple_edges()
    und = edges.unionAll(
        edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    # count, per k-core vertex, its neighbors that are also in-core
    core_nbrs = (
        und.join(in_core.withColumnRenamed(ID, SRC), SRC, "left_semi")
        .join(in_core.withColumnRenamed(ID, DST), DST, "left_semi")
        .groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").alias("nc"))
    )
    exact = c.where(F.col("core") == k).select(ID)
    return (
        exact.join(core_nbrs, ID, "left")
        .where(F.coalesce("nc", F.lit(0)) == k)
        .select(ID)
    )


def onion_layers(graph: LinkGraph, max_iter: int = 100_000) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016;
    upstream networkx/algorithms/core.py::onion_layers semantics):
    repeatedly peel every remaining vertex whose degree is <= the
    running core threshold; each peel pass is one layer (contiguous
    ints from 1). Isolated vertices form layer 1 on their own when
    present (upstream convention).

    DataFrame(id long, layer long). Undirected simple-graph semantics.

    Scale plan: per layer one scalar min-degree aggregate + one
    semi/anti join pair + one degree re-aggregate on the SHRINKING
    remainder — the same peel shape as k_core; layer count on
    power-law web graphs is O(10-100), each round cheaper than the
    last. No driver-side adjacency."""
    edges = graph.simple_edges()
    und = (
        edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    # remaining-vertex degree table (isolates carry 0)
    deg = (
        graph.vertices.select(ID)
        .join(und.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("d")),
              ID, "left")
        .select(ID, F.coalesce("d", F.lit(0)).cast("long").alias("d"))
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    result = None
    current_core = 1
    current_layer = 1
    for it in range(max_iter):
        row = deg.agg(F.min("d").alias("dmin"),
                      F.count("*").alias("n")).collect()[0]
        if row["n"] == 0:
            break
        dmin = int(row["dmin"])
        if it == 0 and dmin == 0:
            cutoff = 0  # isolates alone form layer 1 (upstream special case)
        else:
            current_core = max(current_core, dmin)
            cutoff = current_core
        layer = deg.where(F.col("d") <= cutoff).select(ID)
        assigned = layer.withColumn("layer", F.lit(current_layer).cast("long"))
        result = assigned if result is None else result.unionAll(assigned)
        # drop peeled vertices and their edges, re-derive degrees
        und = (
            und.join(layer.withColumnRenamed(ID, SRC), SRC, "left_anti")
            .join(layer.withColumnRenamed(ID, DST), DST, "left_anti")
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        deg = (
            deg.join(layer, ID, "left_anti")
            .select(ID)
            .join(und.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("d")),
                  ID, "left")
            .select(ID, F.coalesce("d", F.lit(0)).cast("long").alias("d"))
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        current_layer += 1
    if result is None:
        spark = graph.vertices.sparkSession
        return spark.createDataFrame([], f"{ID} long, layer long")
    return result
