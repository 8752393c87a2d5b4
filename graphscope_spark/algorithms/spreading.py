"""Semi-supervised label spreading (Zhu & Ghahramani 2002 harmonic
function propagation) — classify every vertex of a link graph from a
small labeled seed set.

This is the data-side companion of §2.9's learning surface (next to
neighbor_sample/node2vec/gen_labels): given seeds (id, class), the
class scores of unlabeled vertices relax to the harmonic average of
their neighbors, seeds stay clamped:

  f_k'(v) = (1/deg(v)) · Σ_{u~v} f_k(u)      for unlabeled v
  f_k'(s) = 1[class(s) = k]                  for seeds s (clamped)

on the symmetrized fabric. Scores converge to the harmonic solution
(random-walk absorption probabilities onto each seed class).

Scale shape — identical to pagerank's superstep: the K class scores
are PACKED AS COLUMNS (ppr.py's layout), so each round is ONE
edges ⋈ state join + ONE groupBy(dst) with K map-side-combined sums,
then a clamp projection. K = #distinct classes (small by contract:
this is few-shot labeling); the seed table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def label_spreading(
    graph: LinkGraph,
    seeds: DataFrame,
    max_iter: int = 50,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    scores: bool = False,
) -> DataFrame:
    """Returns (id, label, score): the argmax class per vertex (ties →
    smaller class id; vertices unreachable from any seed get label
    NULL, score 0). ``scores=True`` returns the full per-class score
    columns (id, s_<class>...) instead.

    ``seeds``: (id, class) DataFrame, class integral; clamped to 1.
    """
    scols = seeds.columns
    seed_df = seeds.select(
        F.col(scols[0]).cast("long").alias(ID),
        F.col(scols[1]).cast("long").alias("_cls"),
    )
    classes = sorted(
        r["_cls"] for r in seed_df.select("_cls").distinct().collect()
    )
    if not classes:
        raise ValueError("label_spreading needs at least one seed")
    K = len(classes)
    ccols = [f"s_{c}" for c in classes]

    spark = graph.vertices.sparkSession
    n = graph.num_vertices()
    if n == 0:
        if scores:
            return spark.createDataFrame(
                [], "id long, " + ", ".join(f"{c} double" for c in ccols)
            )
        return spark.createDataFrame([], "id long, label long, score double")

    sym = graph.undirected_edges().select(SRC, DST).cache()
    sym.count()
    deg = sym.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").cast("double").alias("deg")
    )
    verts = (
        graph.vertices.select(ID)
        .join(deg, ID, "left")
        .select(ID, F.coalesce("deg", F.lit(0.0)).alias("deg"))
        .join(F.broadcast(seed_df), ID, "left")
        .cache()
    )
    verts.count()

    def clamp(col_k, c):
        return (
            F.when(F.col("_cls").isNotNull(),
                   F.when(F.col("_cls") == c, F.lit(1.0)).otherwise(F.lit(0.0)))
            .otherwise(col_k)
        )

    init = verts.select(
        ID, "deg", "_cls",
        *[clamp(F.lit(0.0), c).alias(cc) for c, cc in zip(classes, ccols)],
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        msgs = (
            sym.join(
                state.select(F.col(ID).alias(SRC), *ccols), SRC
            )
            .groupBy(DST)
            .agg(*[F.sum(cc).alias(cc) for cc in ccols])
            .withColumnRenamed(DST, ID)
        )
        prev = state.select(
            ID, "deg", "_cls",
            *[F.col(cc).alias(f"p_{cc}") for cc in ccols],
        )
        return prev.join(msgs, ID, "left").select(
            ID, "deg", "_cls",
            *[
                clamp(
                    F.when(
                        F.col("deg") > 0,
                        F.coalesce(F.col(cc), F.lit(0.0)) / F.col("deg"),
                    ).otherwise(F.lit(0.0)),
                    c,
                ).alias(cc)
                for c, cc in zip(classes, ccols)
            ],
            *[F.col(f"p_{cc}") for cc in ccols],
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        row = new.agg(
            *[
                F.coalesce(
                    F.sum(F.abs(F.col(cc) - F.col(f"p_{cc}"))), F.lit(0.0)
                ).alias(cc)
                for cc in ccols
            ]
        ).collect()[0]
        eps = max(float(row[cc]) for cc in ccols)
        stop = (fixed_rounds is None) and eps < tol * n
        return stop, {"l1_max": eps}

    init = init.select(
        ID, "deg", "_cls", *ccols,
        *[F.lit(0.0).alias(f"p_{cc}") for cc in ccols],
    )
    max_rounds = fixed_rounds if fixed_rounds is not None else max_iter
    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    state = result.state
    if scores:
        out = state.select(ID, *ccols)
    else:
        best = F.greatest(*[F.col(cc) for cc in ccols])
        label = F.lit(None).cast("long")
        # reverse order => earlier (smaller) class wins ties
        for c, cc in zip(reversed(classes), reversed(ccols)):
            label = F.when(
                (best > 0) & (F.col(cc) == best), F.lit(c)
            ).otherwise(label)
        out = state.select(
            ID, label.alias("label"), best.alias("score")
        )
    verts.unpersist()
    sym.unpersist()
    return out
