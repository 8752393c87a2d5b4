"""`import graphscope`-compatible facade.

Mirrors the reference's top-level Python surface
(python/graphscope/__init__.py:19-32: `session`/`Session`/`g`/
`get_default_session`/`load_from`/`Graph` plus the 19
analytical/app/*.py functions with their exact signatures) onto this
engine, so code written against the reference runs with a one-line
import swap:

    import graphscope_spark.compat as graphscope

    sess = graphscope.session()
    g = graphscope.load_from(edges=edges_df)     # or sess.g(edges_df)
    ctx = graphscope.pagerank(g, delta=0.85, max_round=10)
    df = ctx.to_dataframe({"id": "v.id", "rank": "r"})

Deliberate differences (documented, not hidden):
- A "graph" is this engine's LinkGraph (the reference's vineyard
  fragment). `load_from` accepts a Spark DataFrame, a list of (src,
  dst[, ...]) tuples, or a parquet/csv path — not vineyard Loaders.
- Algorithm results come back as a Context whose `.df` is the Spark
  DataFrame; `to_dataframe`/`to_numpy`/`output` follow the reference
  selector convention ('v.id' = vertex id, 'r' = the result value,
  'r.<col>' = a column of a multi-value result such as hits,
  framework/context.py:584-623) and collect to the client, exactly as
  the reference's do.
- `session(num_workers=..)` accepts and records the reference's
  cluster kwargs but provisions a SparkSession; parallelism comes from
  the Spark master, not a coordinator.

App signatures are copied from the reference byte-for-byte
(analytical/app/{pagerank,wcc,...}.py) and dispatched to the kernels
in graphscope_spark.algorithms:
- `pagerank(g, delta, max_round)` = the reference's fixed-round GRAPE
  app (apps/pagerank/pagerank.h) → pagerank(fixed_rounds=max_round).
- `pagerank_nx(g, alpha, max_iter, tol)` = the convergence variant
  (apps/pagerank/pagerank_networkx.h) → pagerank(tol=tol).
- `lpa(g, max_round)` = the u2i label propagation (apps/lpa) →
  lpa_u2i.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import ID, LinkGraph
from graphscope_spark.session import get_spark
from graphscope_spark import algorithms as A

__all__ = [
    "session", "Session", "g", "get_default_session", "load_from",
    "Graph", "Context",
    "bfs", "property_bfs", "cdlp", "clustering",
    "degree_assortativity_coefficient", "degree_centrality",
    "eigenvector_centrality", "hits", "k_core", "k_shell",
    "katz_centrality", "louvain", "lpa", "pagerank", "pagerank_nx",
    "sssp", "property_sssp", "triangles", "wcc",
]

Graph = LinkGraph  # the reference's framework.graph.Graph role

_default_session: "Session | None" = None


class Session:
    """The reference's client Session (client/session.py:238) reduced
    to its graph-building role: holds the SparkSession and builds
    graphs. Cluster kwargs (num_workers, k8s_*, ...) are accepted and
    recorded for API compatibility; parallelism is the Spark master's."""

    def __init__(self, master: str | None = None, app_name: str = "graphscope",
                 **cluster_kwargs: Any):
        self.spark = get_spark(app_name, master=master)
        self.cluster_kwargs = cluster_kwargs
        self._closed = False

    # reference Session.g (client/session.py:1009)
    def g(self, incoming_data=None, oid_type: str = "int64",
          directed: bool = True, generate_eid: bool = True) -> LinkGraph:
        if incoming_data is None:
            # empty graph (the reference returns a mutable empty Graph;
            # ours is immutable — add edges by building a new one)
            e = self.spark.createDataFrame([], "src long, dst long")
            v = self.spark.createDataFrame([], f"{ID} long")
            return LinkGraph(vertices=v, edges=e, directed=directed)
        return _as_graph(self.spark, incoming_data, directed)

    def gremlin(self, graph: LinkGraph):
        """The reference's sess.gremlin(g) interactive handle
        (client/session.py) → this engine's Gremlin-lite traversal
        source: sess.gremlin(g).V()... compiles to Catalyst plans."""
        from graphscope_spark.traversal import traversal
        return traversal(graph)

    def close(self) -> None:
        self._closed = True

    def __enter__(self) -> "Session":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def session(**kw: Any) -> Session:
    """graphscope.session() (client/session.py) — also installs the
    result as the default session."""
    global _default_session
    _default_session = Session(**kw)
    return _default_session


def get_default_session() -> Session:
    global _default_session
    if _default_session is None or _default_session._closed:
        _default_session = Session()
    return _default_session


def g(incoming_data=None, oid_type: str = "int64", directed: bool = True,
      generate_eid: bool = True) -> LinkGraph:
    """Module-level g() on the default session (client/session.py:1358)."""
    return get_default_session().g(incoming_data, oid_type, directed,
                                   generate_eid)


def _as_graph(spark, data, directed: bool) -> LinkGraph:
    if isinstance(data, LinkGraph):
        return data
    if isinstance(data, DataFrame):
        return LinkGraph.from_edges(data, directed=directed)
    if isinstance(data, str):
        reader = spark.read
        df = (reader.parquet(data) if not data.endswith(".csv")
              else reader.option("header", True).csv(data, inferSchema=True))
        return LinkGraph.from_edges(df, directed=directed)
    if isinstance(data, (list, tuple)):
        cols = ["src", "dst"] + [f"p{i}" for i in range(len(data[0]) - 2)]
        df = spark.createDataFrame(list(data), cols)
        return LinkGraph.from_edges(df, directed=directed)
    raise TypeError(f"cannot build a graph from {type(data).__name__}")


def load_from(edges=None, vertices=None, directed: bool = True,
              **kw: Any) -> LinkGraph:
    """graphscope.load_from (framework/graph_builder.py) simplified:
    edges/vertices are DataFrames, tuple lists, or parquet/csv paths
    instead of vineyard Loaders."""
    if edges is None:
        raise ValueError("load_from: edges required")
    spark = get_default_session().spark
    lg = _as_graph(spark, edges, directed)
    if vertices is not None:
        v = vertices if isinstance(vertices, DataFrame) else \
            spark.createDataFrame(list(vertices), f"{ID} long")
        lg = LinkGraph(vertices=v.withColumn(ID, F.col(ID).cast("long")),
                       edges=lg.edges, directed=directed)
    return lg


# ----------------------------------------------------------------------
# Context — the reference's result handle (framework/context.py:505-625)
# ----------------------------------------------------------------------
class Context:
    """Wraps an algorithm's Spark result DataFrame(id, <values...>)
    with the reference Context's client-side retrieval surface."""

    def __init__(self, df: DataFrame, graph: LinkGraph):
        self.df = df
        self._graph = graph

    def _select(self, selector: dict | None, vertex_range=None) -> DataFrame:
        df = self.df
        if vertex_range is not None:
            lo, hi = vertex_range
            df = df.where((F.col(ID) >= lo) & (F.col(ID) < hi))
        if selector is None:
            return df
        vals = [c for c in df.columns if c != ID]
        cols = []
        joined: set[str] = set()  # join each vertex property ONCE even
        # when several selectors reference it (a second join would
        # duplicate __v_<prop> and make the final select ambiguous)
        for out, sel in selector.items():
            if sel == "v.id":
                cols.append(F.col(ID).alias(out))
            elif sel == "v.data" or sel.startswith("v."):
                prop = sel[2:]
                if prop not in self._graph.vertices.columns:
                    raise KeyError(f"selector {sel!r}: no vertex column")
                cols.append(F.col(f"__v_{prop}").alias(out))
                if prop not in joined:
                    joined.add(prop)
                    df = df.join(
                        self._graph.vertices.select(
                            ID, F.col(prop).alias(f"__v_{prop}")),
                        ID, "left")
            elif sel == "r":
                if len(vals) != 1:
                    raise ValueError(
                        f"selector 'r' is ambiguous: result columns {vals}")
                cols.append(F.col(vals[0]).alias(out))
            elif sel.startswith("r."):
                cols.append(F.col(sel[2:]).alias(out))
            else:
                raise KeyError(f"unsupported selector {sel!r}")
        return df.select(*cols)

    def to_dataframe(self, selector: dict | None = None, vertex_range=None):
        """pandas DataFrame, like the reference's client fetch
        (context.py:589-594)."""
        return self._select(selector, vertex_range).toPandas()

    def to_numpy(self, selector: str, vertex_range=None, axis=0):
        import numpy as np
        pdf = self._select({"x": selector}, vertex_range).toPandas()
        return np.asarray(pdf["x"])

    def output(self, fd: str, selector: dict, vertex_range=None, **kw):
        """Write csv to a local path (the reference also does s3/hdfs,
        context.py:608-619)."""
        self.to_dataframe(selector, vertex_range).to_csv(
            fd, header=True, index=False)

    def to_spark(self) -> DataFrame:
        return self.df


def _ctx(df: DataFrame, graph: LinkGraph) -> Context:
    return Context(df, graph)


# ----------------------------------------------------------------------
# App functions — reference signatures (analytical/app/*.py), our kernels
# ----------------------------------------------------------------------
def pagerank(graph, delta=0.85, max_round=10) -> Context:
    return _ctx(A.pagerank(graph, alpha=delta, fixed_rounds=max_round), graph)


def pagerank_nx(graph, alpha=0.85, max_iter=100, tol=1e-06) -> Context:
    return _ctx(A.pagerank(graph, alpha=alpha, max_iter=max_iter, tol=tol),
                graph)


def wcc(graph) -> Context:
    return _ctx(A.wcc(graph), graph)


def cdlp(graph, max_round=10) -> Context:
    return _ctx(A.cdlp(graph, max_round=max_round), graph)


def lpa(graph, max_round=10) -> Context:
    return _ctx(A.lpa_u2i(graph, max_round=max_round), graph)


def sssp(graph, src=0) -> Context:
    return _ctx(A.sssp(graph, src=src), graph)


def property_sssp(graph, src=0) -> Context:
    return _ctx(A.property_sssp(graph, src=src), graph)


def bfs(graph, src=0) -> Context:
    return _ctx(A.bfs(graph, src=src), graph)


def property_bfs(graph, src=0) -> Context:
    return _ctx(A.property_bfs(graph, src=src), graph)


def triangles(graph) -> Context:
    return _ctx(A.triangles(graph), graph)


def clustering(graph) -> Context:
    return _ctx(A.clustering(graph), graph)


def degree_centrality(graph, centrality_type="both") -> Context:
    return _ctx(A.degree_centrality(graph, centrality_type=centrality_type),
                graph)


def eigenvector_centrality(graph, tolerance=1e-06, max_round=100) -> Context:
    return _ctx(A.eigenvector_centrality(graph, tolerance=tolerance,
                                         max_round=max_round), graph)


def katz_centrality(graph, alpha=0.1, beta=1.0, tolerance=1e-06,
                    max_round=100, normalized=True) -> Context:
    return _ctx(A.katz_centrality(graph, alpha=alpha, beta=beta,
                                  tolerance=tolerance, max_round=max_round,
                                  normalized=normalized), graph)


def hits(graph, tolerance=0.01, max_round=100, normalized=True) -> Context:
    return _ctx(A.hits(graph, tolerance=tolerance, max_round=max_round,
                       normalized=normalized), graph)


def k_core(graph, k: int) -> Context:
    return _ctx(A.k_core(graph, k=k), graph)


def k_shell(graph, k: int) -> Context:
    return _ctx(A.k_shell(graph, k=k), graph)


def louvain(graph, min_progress=1000, progress_tries=1) -> Context:
    return _ctx(A.louvain(graph, min_progress=min_progress,
                          progress_tries=progress_tries), graph)


def degree_assortativity_coefficient(G, x="out", y="in", weight=None):
    # scalar in the reference too (a context holding one value; its
    # users read the number) — return the float directly
    return A.degree_assortativity_coefficient(G, x=x, y=y, weight=weight)
