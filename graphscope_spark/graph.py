"""LinkGraph — the property-graph abstraction, DataFrame-native.

Mirrors the reference's graph surface (SURVEY.md §1, §2.1-§2.2):

- vertices: DataFrame with a long ``id`` column plus arbitrary properties
  (the reference's vertex label property table, an Arrow table per
  fragment — core/fragment/arrow_projected_fragment.h:359).
- edges: DataFrame with long ``src``/``dst`` columns plus properties
  (the reference's CSR/CSC topology + edge property table).
- vertex identity: deterministic ``xxhash64(oid)`` replaces the
  reference's HashPartitioner GID assignment
  (core/loader/arrow_fragment_loader.h:65; gid = fid<<off | lid,
  core/fragment/dynamic_fragment.h:1163). Deterministic hashing keeps
  component ids / tie-breaks restart-stable and cluster-size-invariant.
- "fragment" = Spark partition: `build()` repartitions edges by
  pmod(hash(src), P) and sorts within partitions by (src, dst) — the
  DataFrame-native equivalent of the reference's per-fragment CSR
  (arrow_projected_fragment.h:442-465).

The inner/outer-vertex mirror machinery of the reference
(wcc_projected.h:107-113 SyncStateOnOuterVertex) has no analogue here:
shuffle exchange between supersteps replaces mirror synchronization.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC, DST, ID = "src", "dst", "id"


@dataclass(frozen=True)
class LinkGraph:
    """Immutable property graph over two DataFrames.

    DataFrame immutability makes the reference's copy/view/clear ops
    (dag_utils.py:492-637) trivial — every transformation returns a new
    LinkGraph sharing the parents' plans.
    """

    vertices: DataFrame
    edges: DataFrame
    directed: bool = True
    _cached: dict = field(default_factory=dict, compare=False, repr=False)

    # ------------------------------------------------------------------
    # Construction (reference: g.add_vertices/add_edges, graph.py:369-563)
    # ------------------------------------------------------------------
    @staticmethod
    def from_edges(
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        src: str = SRC,
        dst: str = DST,
    ) -> "LinkGraph":
        """Build from an edge DataFrame; vertices deduced from endpoints
        when not supplied (the reference's default `_` vertex label
        deduction, framework/graph.py:417-563)."""
        e = edges.withColumnRenamed(src, SRC).withColumnRenamed(dst, DST)
        e = e.withColumn(SRC, F.col(SRC).cast("long")).withColumn(DST, F.col(DST).cast("long"))
        if vertices is None:
            vertices = (
                e.select(F.col(SRC).alias(ID))
                .unionAll(e.select(F.col(DST).alias(ID)))
                .distinct()
            )
        else:
            vertices = vertices.withColumn(ID, F.col(ID).cast("long"))
        return LinkGraph(vertices=vertices, edges=e, directed=directed)

    @staticmethod
    def from_url_edges(
        url_edges: DataFrame,
        src_url: str = "src_url",
        dst_url: str = "dst_url",
        directed: bool = True,
    ) -> "LinkGraph":
        """Hash string OIDs (urls) to stable 64-bit vertex ids.

        xxhash64 is deterministic across restarts and cluster sizes —
        the property the reference gets from hashing OIDs in
        vineyard::HashPartitioner (arrow_fragment_loader.h:65). Collision
        probability at 10^12 urls is ~2.7e-2 birthday-bound on 64 bits;
        `audit_hash_collisions` checks it at build time.
        """
        e = url_edges.select(
            F.xxhash64(F.col(src_url)).alias(SRC),
            F.xxhash64(F.col(dst_url)).alias(DST),
        )
        v = (
            url_edges.select(F.col(src_url).alias("url"))
            .unionAll(url_edges.select(F.col(dst_url).alias("url")))
            .distinct()
            .select(F.xxhash64("url").alias(ID), "url")
        )
        return LinkGraph(vertices=v, edges=e, directed=directed)

    @staticmethod
    def audit_hash_collisions(urls: DataFrame, url_col: str = "url") -> int:
        """#distinct urls − #distinct hashes (0 ⇒ collision-free)."""
        row = urls.agg(
            F.countDistinct(url_col).alias("u"),
            F.countDistinct(F.xxhash64(url_col)).alias("h"),
        ).collect()[0]
        return int(row["u"] - row["h"])

    # ------------------------------------------------------------------
    # Transformation operators (reference §2.2)
    # ------------------------------------------------------------------
    def project(
        self,
        vertex_cols: list[str] | None = None,
        edge_cols: list[str] | None = None,
    ) -> "LinkGraph":
        """Property projection (reference g.project, graph.py:606-636,
        and _project_to_simple, app.py:45-56) — pure column pruning,
        which Catalyst pushes into the scan."""
        v = self.vertices.select(ID, *(vertex_cols or []))
        e = self.edges.select(SRC, DST, *(edge_cols or []))
        return replace(self, vertices=v, edges=e, _cached={})

    def to_undirected(self) -> "LinkGraph":
        """Undirected closure (reference to_undirected,
        dag_utils.py:522-567): symmetrize + dedupe on (src, dst),
        self-loops preserved once. Edge PROPERTIES (weight/label/...)
        survive: reversed rows carry the forward row's values, and when
        both directions pre-existed with conflicting values the merge
        is the deterministic per-column min (the same duplicate-row
        convention as the traversal layer's property lookups)."""
        extra = [c for c in self.edges.columns if c not in (SRC, DST)]
        e = self.edges.select(SRC, DST, *extra)
        sym = e.unionByName(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), *extra))
        if extra:
            merged = sym.groupBy(SRC, DST).agg(
                *[F.min(c).alias(c) for c in extra])
        else:
            merged = sym.distinct()
        return replace(self, edges=merged, directed=False, _cached={})

    def undirected_edges(self) -> DataFrame:
        """Symmetrized distinct edge set (src,dst) — the message fabric
        for WCC/CDLP on directed inputs (wcc_projected.h:88-104 pushes
        along out- AND in-edges).

        ALWAYS symmetrizes: `directed=False` does not guarantee the
        stored rows are a symmetric closure (from_edges keeps rows as
        given), and a hash-min exchange over one-directional storage
        silently fails to propagate whenever the minimum id sits on
        the dst side. For already-symmetric storage the union+distinct
        is an identity — one extra aggregate, paid once per algorithm
        (callers cache the fabric)."""
        e = self.edges.select(SRC, DST)
        return e.unionAll(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        ).distinct()

    def simple_edges(self) -> DataFrame:
        """Undirected, deduped, self-loop-free edges with src < dst —
        canonical form for triangle counting (triangles.h:75-92)."""
        e = self.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
        canon = e.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
        )
        return canon.distinct()

    def induce_subgraph(self, vertex_ids: DataFrame) -> "LinkGraph":
        """Induced subgraph (reference induce_subgraph,
        dag_utils.py:638-666): semi-join both endpoints against the
        vertex set. vertex_ids: DataFrame with column `id`."""
        vs = vertex_ids.select(ID).distinct()
        v = self.vertices.join(vs, ID, "left_semi")
        e = (
            self.edges.join(vs.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(vs.withColumnRenamed(ID, DST), DST, "left_semi")
        )
        return replace(self, vertices=v, edges=e, _cached={})

    def add_column(self, result, on: "str | dict" = ID) -> "LinkGraph":
        """Join algorithm results back as vertex properties (reference
        add_column, graph.py:573-596 / grape_instance.cc:561).

        Two forms: add_column(df, on='id') joins a DataFrame by key;
        the reference's add_column(ctx, {'kcore': 'r'}) form
        (docs/getting_started.rst:219-220) takes a compat Context (or
        its result DataFrame) plus a selector dict ('r' = the single
        result column, 'r.<col>' = a named one)."""
        if isinstance(on, dict):
            df = getattr(result, "df", result)
            vals = [c for c in df.columns if c != ID]
            cols = [F.col(ID)]
            for out, sel in on.items():
                if sel == "r":
                    if len(vals) != 1:
                        raise ValueError(
                            f"selector 'r' is ambiguous: result columns {vals}")
                    cols.append(F.col(vals[0]).alias(out))
                elif sel.startswith("r."):
                    cols.append(F.col(sel[2:]).alias(out))
                else:
                    raise KeyError(f"unsupported selector {sel!r}")
            result, on = df.select(*cols), ID
        return replace(self, vertices=self.vertices.join(result, on, "left"), _cached={})

    # ------------------------------------------------------------------
    # Multi-label graphs (reference add_labels_to_graph,
    # dag_utils.py:165-213: new vertex/edge labels appended to a loaded
    # graph). Labels are a `label` discriminator column — the DataFrame
    # twin of the reference's per-label Arrow tables; `project` /
    # filter(label = x) recovers a single-label view.
    # ------------------------------------------------------------------
    @staticmethod
    def empty(spark: SparkSession, directed: bool = True) -> "LinkGraph":
        """Empty property graph (reference sess.g(),
        session.py:1009-1012) — populate with add_vertices/add_edges."""
        return LinkGraph(
            vertices=spark.createDataFrame([], f"{ID} long, label string"),
            edges=spark.createDataFrame([], f"{SRC} long, {DST} long, label string"),
            directed=directed,
        )

    def _with_label_col(self, df: DataFrame) -> DataFrame:
        return df if "label" in df.columns else df.withColumn("label", F.lit("_"))

    def add_vertices(self, vertices: DataFrame, label: str = "_") -> "LinkGraph":
        """Append a vertex label (reference g.add_vertices,
        framework/graph.py:369-416 + add_labels_to_graph)."""
        v = vertices.withColumn(ID, F.col(ID).cast("long")).withColumn(
            "label", F.lit(label)
        )
        base = self._with_label_col(self.vertices)
        return replace(
            self,
            vertices=base.unionByName(v, allowMissingColumns=True),
            _cached={},
        )

    def add_edges(
        self, edges: DataFrame, label: str = "_", src: str = SRC, dst: str = DST
    ) -> "LinkGraph":
        """Append an edge label (reference g.add_edges,
        framework/graph.py:417-563); endpoint vertices are NOT deduced
        here (call add_vertices, or use from_edges for the deduced
        form)."""
        e = (
            edges.withColumnRenamed(src, SRC)
            .withColumnRenamed(dst, DST)
            .withColumn(SRC, F.col(SRC).cast("long"))
            .withColumn(DST, F.col(DST).cast("long"))
            .withColumn("label", F.lit(label))
        )
        base = self._with_label_col(self.edges)
        return replace(
            self, edges=base.unionByName(e, allowMissingColumns=True), _cached={}
        )

    # ------------------------------------------------------------------
    # Degrees & report ops (reference dynamic_fragment_reporter.h:59-124)
    # ------------------------------------------------------------------
    def out_degrees(self) -> DataFrame:
        """(id, out_degree) for EVERY vertex (0 for sinks)."""
        d = self.edges.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("out_degree"))
        return (
            self.vertices.select(ID)
            .join(d, ID, "left")
            .select(ID, F.coalesce("out_degree", F.lit(0)).alias("out_degree"))
        )

    def in_degrees(self) -> DataFrame:
        d = self.edges.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("in_degree"))
        return (
            self.vertices.select(ID)
            .join(d, ID, "left")
            .select(ID, F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        )

    def degrees(self) -> DataFrame:
        """(id, degree) over the undirected simple closure — the degree
        the reference's triangle orientation keys on (triangles.h:50-56)."""
        e = self.simple_edges()
        both = e.select(F.col(SRC).alias(ID)).unionAll(e.select(F.col(DST).alias(ID)))
        d = both.groupBy(ID).agg(F.count("*").alias("degree"))
        return (
            self.vertices.select(ID)
            .join(d, ID, "left")
            .select(ID, F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    def num_vertices(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        return self.edges.count()

    def num_self_loops(self) -> int:
        return self.edges.where(F.col(SRC) == F.col(DST)).count()

    def has_node(self, vid: int) -> bool:
        return self.vertices.where(F.col(ID) == vid).limit(1).count() > 0

    def has_edge(self, src: int, dst: int) -> bool:
        return (
            self.edges.where((F.col(SRC) == src) & (F.col(DST) == dst)).limit(1).count() > 0
        )

    def neighbors(self, vid: int) -> DataFrame:
        """Out-neighbors of one vertex (reference NEIGHBORS_BY_NODE)."""
        return self.edges.where(F.col(SRC) == vid).select(F.col(DST).alias(ID)).distinct()

    # ------------------------------------------------------------------
    # Build / persistence (reference §3.2: load → hash-partition → CSR →
    # seal to vineyard; here: repartition → sortWithinPartitions → parquet)
    # ------------------------------------------------------------------
    def build(self, num_partitions: int | None = None) -> "LinkGraph":
        """Materialize the CSR-equivalent layout in memory: edges
        hash-partitioned by src and sorted by (src, dst) within each
        partition, cached. Every downstream superstep join on `src`
        reuses this partitioning (no re-shuffle of the big side)."""
        spark = self.edges.sparkSession
        p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        e = self.edges.repartition(p, SRC).sortWithinPartitions(SRC, DST).cache()
        v = self.vertices.repartition(p, ID).cache()
        return replace(self, vertices=v, edges=e, _cached={})

    def save(self, path: str, num_partitions: int | None = None) -> None:
        """Persist the built layout (reference g.save_to,
        graph.py:933-1009). Parquet dirs stand in for Iceberg tables in
        the sandbox (same layout contract: partitioned+sorted edges)."""
        spark = self.edges.sparkSession
        p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        (
            self.edges.repartition(p, SRC)
            .sortWithinPartitions(SRC, DST)
            .write.mode("overwrite")
            .parquet(f"{path}/edges")
        )
        self.vertices.write.mode("overwrite").parquet(f"{path}/vertices")
        # persist directedness: load() must not silently treat a
        # round-tripped undirected graph as directed (symmetrization
        # branches in pagerank/sssp key on the flag)
        spark.createDataFrame(
            [(bool(self.directed),)], "directed boolean"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @staticmethod
    def load(spark: SparkSession, path: str,
             directed: bool | None = None) -> "LinkGraph":
        """Load a save()d layout. `directed` defaults to the persisted
        flag (pre-meta layouts without one load as directed=True);
        passing it explicitly overrides."""
        if directed is None:
            try:
                directed = bool(
                    spark.read.parquet(f"{path}/meta").collect()[0]["directed"])
            except Exception:
                directed = True
        return LinkGraph(
            vertices=spark.read.parquet(f"{path}/vertices"),
            edges=spark.read.parquet(f"{path}/edges"),
            directed=directed,
        )

    def cache(self) -> "LinkGraph":
        self.vertices.cache()
        self.edges.cache()
        return self

    def unpersist(self) -> "LinkGraph":
        self.vertices.unpersist()
        self.edges.unpersist()
        return self
