"""Path sampling (random walks) — reference parity: the `sampling_path`
app (coordinator/gscoordinator/builtin/app/.gs_conf.yaml sampling_path
entry; used by the learning engine's walk-based samplers).

The reference samples uniformly at random, which is irreproducible
across runs and engines. Here the "random" choice is a DETERMINISTIC
hash draw: at step t, walk w moving from vertex u picks

    argmin_{(u,v) ∈ E} md5(seed | w | t | v)

i.e. a fixed pseudo-random priority per (walk, step, candidate). This
keeps the walk distribution uniform-ish over neighbors (md5 is a
uniform hash) while making every path a pure function of
(graph, seed) — reproducible across restarts, cluster sizes, and
engines (the DuckDB oracle replays the identical draws; md5 for
engine portability, same trick as the MinHash family in dedup.py).

Scale: one superstep per hop = join frontier→E on the vertex key +
min_by per walk (map-side partial agg). Walk state is O(#walks) rows;
E never replicates per walk beyond the frontier join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def sampling_path(
    graph: LinkGraph,
    srcs: list[int] | DataFrame,
    path_len: int,
    seed: int = 42,
) -> DataFrame:
    """One walk per source vertex; returns (walk long, pos int,
    id long) rows — pos 0 is the source, walks stop early at
    out-degree-0 vertices (the reference's dead-end behavior).

    path_len = number of HOPS attempted (so ≤ path_len+1 rows/walk).
    """
    spark = graph.vertices.sparkSession
    if isinstance(srcs, DataFrame):
        start = srcs.select(F.col(ID).cast("long"))
    else:
        start = spark.createDataFrame([(int(s),) for s in srcs], f"{ID} long")
    start = start.join(graph.vertices.select(ID), ID, "left_semi")

    edges = graph.edges.select(SRC, DST)
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )

    # walk id = source vertex id (one walk per source — matches the
    # reference's per-source sampling; for k walks/vertex call with a
    # salted seed per repetition)
    out = start.select(
        F.col(ID).alias("walk"), F.lit(0).alias("pos"), F.col(ID)
    )
    frontier = out
    for t in range(1, int(path_len) + 1):
        draw = F.md5(
            F.concat_ws("|", F.lit(int(seed)), F.col("walk"), F.lit(t), F.col(DST))
        )
        nxt = (
            frontier.join(edges, frontier[ID] == edges[SRC])
            .groupBy("walk")
            .agg(F.min_by(DST, draw).alias(ID))
            .select("walk", F.lit(t).alias("pos"), ID)
        )
        out = out.unionByName(nxt)
        frontier = nxt
    return out


def _node2vec_weights(p: float, q: float) -> tuple[int, int, int]:
    """Integer ticket counts proportional to node2vec's (1/p, 1, 1/q)
    transition biases. Integers make the weighted draw ENGINE-EXACT:
    candidate v holds w_v lottery tickets md5(seed|walk|t|v|tick) and
    the global minimum ticket wins — every ticket is iid uniform, so
    P(v wins) = w_v / Σw exactly, with a pure string comparison (no
    float RNG or libm calls that could differ across engines)."""
    from fractions import Fraction
    from math import lcm

    fr = Fraction(1, 1) / Fraction(p).limit_denominator(100)
    fq = Fraction(1, 1) / Fraction(q).limit_denominator(100)
    d = lcm(fr.denominator, 1, fq.denominator)
    return int(fr * d), d, int(fq * d)


def node2vec_path(
    graph: LinkGraph,
    srcs: list[int] | DataFrame,
    path_len: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """node2vec-biased deterministic walks (Grover & Leskovec 2016
    semantics): from u (arrived via prev), candidate v is weighted
    1/p if v == prev (return), 1 if prev—v is an edge (BFS-ish), 1/q
    otherwise (DFS-ish). First hop is uniform. Returns
    (walk long, pos int, id long); walks stop at dead ends.

    Same walk surface as sampling_path (the reference's learning-engine
    sampler family), with the second-order bias the walk-based
    embedding pipelines (node2vec/DeepWalk-style) feed on.

    Scale: per hop, one join frontier→E on the vertex key, one
    (prev, v) edge-existence left-join (co-partitioned with E's
    (src, dst) key), ticket explode bounded by max weight × out-degree
    of the frontier only, then a map-side-combinable min_by per walk.
    """
    w_ret, w_one, w_q = _node2vec_weights(p, q)
    spark = graph.vertices.sparkSession
    if isinstance(srcs, DataFrame):
        start = srcs.select(F.col(ID).cast("long"))
    else:
        start = spark.createDataFrame([(int(s),) for s in srcs], f"{ID} long")
    start = start.join(graph.vertices.select(ID), ID, "left_semi")

    edges = graph.edges.select(SRC, DST)
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
    edges = edges.distinct().cache()
    exist = edges.select(
        F.col(SRC).alias("__ps"), F.col(DST).alias("__pd"),
        F.lit(True).alias("__is1"),
    )

    out = start.select(
        F.col(ID).alias("walk"), F.lit(0).alias("pos"), F.col(ID)
    )
    frontier = start.select(
        F.col(ID).alias("walk"), F.col(ID).alias("u"),
        F.lit(None).cast("long").alias("prev"),
    )
    for t in range(1, int(path_len) + 1):
        cand = (
            frontier.join(edges, frontier["u"] == edges[SRC])
            .join(
                exist,
                (F.col("prev") == F.col("__ps")) & (F.col(DST) == F.col("__pd")),
                "left",
            )
            .select(
                "walk", "u", "prev", DST,
                F.when(F.col("prev").isNull(), F.lit(1))
                .when(F.col(DST) == F.col("prev"), F.lit(w_ret))
                .when(F.col("__is1"), F.lit(w_one))
                .otherwise(F.lit(w_q))
                .alias("w"),
            )
        )
        # w == 0 (p or q beyond the rational cap) = zero probability:
        # no tickets. The filter also keeps sequence() ascending-only.
        tickets = cand.where(F.col("w") > 0).select(
            "walk", "u", DST,
            F.explode(F.sequence(F.lit(0), F.col("w") - 1)).alias("tick"),
        )
        draw = F.md5(F.concat_ws(
            "|", F.lit(int(seed)), F.col("walk"), F.lit(t),
            F.col(DST), F.col("tick"),
        ))
        nxt = (
            tickets.groupBy("walk")
            .agg(F.min_by(DST, draw).alias(ID), F.any_value("u").alias("prev"))
        )
        out = out.unionByName(
            nxt.select("walk", F.lit(t).alias("pos"), ID)
        )
        frontier = nxt.select("walk", F.col(ID).alias("u"), "prev")
    edges.unpersist()
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) training pairs from a walk corpus — the
    word2vec-style consumption of sampling_path/node2vec_path output
    (each walk is a 'sentence', contexts within ±window positions).

    Returns (walk long, center long, context long, off int) with
    off = context_pos - center_pos (never 0). Pure self-join on the
    walk key: shuffles once on walk id; at web scale walks are short
    (pos ≤ path_len) so the per-key blowup is bounded by 2·window per
    row, not quadratic."""
    a, b = walks.alias("a"), walks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.walk") == F.col("b.walk"))
            & (F.col("a.pos") != F.col("b.pos"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= int(window)),
        )
        .select(
            F.col("a.walk").alias("walk"),
            F.col("a.id").alias("center"),
            F.col("b.id").alias("context"),
            (F.col("b.pos") - F.col("a.pos")).cast("int").alias("off"),
        )
    )


def neighbor_sample(
    graph: LinkGraph,
    seeds: list[int] | DataFrame,
    fanouts: list[int],
    seed: int = 42,
    strategy: str = "random",
    weight_col: str = "weight",
) -> DataFrame:
    """GraphSAGE-style multi-hop fanout sampling — the learning
    engine's neighbor expansion (GLE `g.V(seeds).outV().sample(k)`
    chains; the reference's V/E traversal sources are
    python/graphscope/learning/graph.py:263-331, with graph-learn
    supplying the samplers). Returns (root long, hop int, src long,
    dst long): for every root, hop h keeps ≤ fanouts[h] out-neighbors
    of each hop-(h-1) frontier vertex.

    strategy='random': without-replacement uniform draw made
    DETERMINISTIC the walks.py way — rank candidates by
    md5(seed:root:hop:src:dst) and keep the k smallest (engine-
    portable; the DuckDB oracle replays identical draws).
    strategy='topk_weight': graph-learn's topk sampler — highest
    `weight_col` wins, ties broken by min dst.

    Scale shape: the whole expansion is ONE Catalyst plan — per hop a
    frontier⋈E hash join plus a row_number window partitioned by
    (root, src), whose partitions are bounded by a vertex's out-degree
    (never the corpus); frontiers stay (root, vertex) pairs, so edges
    replicate only along sampled paths. fanouts is short (2-3 hops in
    GraphSAGE practice), so no checkpointing is needed."""
    from pyspark.sql import Window

    spark = graph.vertices.sparkSession
    if isinstance(seeds, DataFrame):
        roots = seeds.select(F.col(ID).cast("long").alias("root"))
    else:
        roots = spark.createDataFrame([(int(s),) for s in seeds], "root long")
    roots = roots.join(
        graph.vertices.select(F.col(ID).alias("root")), "root", "left_semi"
    ).distinct()

    cols = [SRC, DST] + ([weight_col] if strategy == "topk_weight" else [])
    edges = graph.edges.select(*cols)
    if not graph.directed:
        back = edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST),
            *([weight_col] if strategy == "topk_weight" else []),
        )
        edges = edges.unionByName(back)

    frontier = roots.select("root", F.col("root").alias("node"))
    parts: list[DataFrame] = []
    for hop, k in enumerate(fanouts):
        cand = frontier.join(edges, frontier["node"] == edges[SRC]).select(
            "root", SRC, DST,
            *([weight_col] if strategy == "topk_weight" else []),
        )
        if strategy == "random":
            order = [
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(int(seed)).cast("string"),
                        F.col("root").cast("string"),
                        F.lit(int(hop)).cast("string"),
                        F.col(SRC).cast("string"),
                        F.col(DST).cast("string"),
                    )
                ).asc()
            ]
        elif strategy == "topk_weight":
            order = [F.col(weight_col).desc(), F.col(DST).asc()]
        else:
            raise ValueError(f"strategy must be random|topk_weight, got {strategy!r}")
        w = Window.partitionBy("root", SRC).orderBy(*order)
        samp = (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k))
            .select("root", F.lit(int(hop)).alias("hop"), SRC, DST)
        )
        parts.append(samp)
        frontier = samp.select("root", F.col(DST).alias("node")).distinct()

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sage_features(
    graph: LinkGraph,
    features: DataFrame,
    seeds: "list[int] | DataFrame",
    fanouts: list[int],
    agg: str = "mean",
    seed: int = 42,
    strategy: str = "random",
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """GraphSAGE data-side feature aggregation (the learning engine's
    neighbor-pooling step — reference demos feed graph-learn
    EgoGraphs whose per-hop features are exactly this pooling;
    learning_engine/README.md, python/graphscope/learning/graph.py:
    263-331). Per seed root: its own features plus, for every hop h,
    the `agg` pool (mean|max) of the sampled hop-h neighborhood's
    features.

    One Catalyst plan end-to-end: the `neighbor_sample` expansion, ONE
    sample⋈features hash join, ONE (root, hop) aggregate, and a static
    per-hop pivot (fanouts is 2-3 entries in GraphSAGE practice, so
    the pivot is a short chain of per-hop left joins on the root key —
    no dynamic pivot shuffle). Mean is computed as SUM/COUNT so
    integer feature columns pool bit-exactly (the structure.py
    discipline). Roots whose hop-h sample is empty pool to 0.0 — the
    GraphSAGE zero-vector convention for empty neighborhoods.
    """
    if agg not in ("mean", "max"):
        raise ValueError(f"agg must be mean|max, got {agg!r}")
    spark = graph.vertices.sparkSession
    if isinstance(seeds, DataFrame):
        roots = seeds.select(F.col(ID).cast("long").alias("root"))
    else:
        roots = spark.createDataFrame([(int(s),) for s in seeds], "root long")
    roots = roots.join(
        graph.vertices.select(F.col(ID).alias("root")), "root", "left_semi"
    ).distinct()

    if feature_cols is None:
        feature_cols = [c for c in features.columns if c != ID]

    # materialize the shared subtrees ONCE: roots feed the sampler, the
    # self-feature join, and the output base; features feed the pool
    # join and the self row; pooled feeds one pivot branch per hop.
    # Without these cuts every branch re-derives the whole expansion
    # (the fabric/degree-subtree audit finding, BENCH/PLANS.md r3).
    roots = roots.localCheckpoint(eager=True)
    features = features.localCheckpoint(eager=True)
    samp = neighbor_sample(
        graph, roots.select(F.col("root").alias(ID)), fanouts,
        seed=seed, strategy=strategy,
    )
    joined = samp.join(
        features.select(F.col(ID).alias(DST), *feature_cols), DST
    )
    if agg == "mean":
        aggs = [
            (F.sum(c) / F.count(F.lit(1))).alias(c) for c in feature_cols
        ]
    else:
        aggs = [F.max(c).cast("double").alias(c) for c in feature_cols]
    pooled = joined.groupBy("root", "hop").agg(*aggs).localCheckpoint(
        eager=True
    )

    out = roots.join(
        features.select(
            F.col(ID).alias("root"),
            *[
                F.col(c).cast("double").alias(f"self_{c}")
                for c in feature_cols
            ],
        ),
        "root",
        "left",
    )
    sel = [F.col("root")] + [
        F.coalesce(f"self_{c}", F.lit(0.0)).alias(f"self_{c}")
        for c in feature_cols
    ]
    for h in range(len(fanouts)):
        ph = pooled.where(F.col("hop") == h).select(
            "root",
            *[F.col(c).alias(f"h{h + 1}_{agg}_{c}") for c in feature_cols],
        )
        out = out.join(ph, "root", "left")
        sel += [
            F.coalesce(f"h{h + 1}_{agg}_{c}", F.lit(0.0)).alias(
                f"h{h + 1}_{agg}_{c}"
            )
            for c in feature_cols
        ]
    return out.select(*sel)
