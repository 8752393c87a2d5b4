"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes the implemented operator surface of
graphscope_spark (SURVEY.md §2) over the driver's parquet tables;
oracle_sql() holds the DuckDB-equivalent ANSI SQL. Iterative graph
algorithms are exposed FIXED-ROUND so the oracle can unroll the same
supersteps as CTE chains (convergence-driven runs are covered by
pytest vs NumPy oracles). Float columns are rounded identically on
both sides (Spark and DuckDB sum in different orders).

Graphs are derived deterministically from the TPC-H-ish tables
(graphscope_spark/harness.py): G1 = customer→supplier bipartite
(directed, hub-skewed), G2 = supplier co-occurrence (canonical).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphscope_spark import harness as H
from graphscope_spark.algorithms import (
    avg_clustering,
    bfs,
    bfs_generic,
    cdlp,
    clustering,
    degree_assortativity_coefficient,
    degree_centrality,
    edge_boundary,
    eigenvector_centrality,
    hits,
    is_simple_path,
    all_pairs_shortest_path_length,
    betweenness_centrality,
    closeness_centrality,
    harmonic_centrality,
    k_core,
    k_shell,
    katz_centrality,
    louvain,
    lpa_u2i,
    node_boundary,
    pagerank,
    property_sssp,
    sssp,
    sssp_average_length,
    sssp_has_path,
    sssp_path,
    transitivity,
    triangles,
    wcc,
)
from graphscope_spark.functions import dedup as D
from graphscope_spark.functions import similarity as S
from graphscope_spark.functions import text as T
from graphscope_spark import web as W
from graphscope_spark.generators import rmat_sql as _rmat_sql
from graphscope_spark.graph import LinkGraph


# ----------------------------------------------------------------------
# Spark query callables — each (spark, sf_dir) -> DataFrame
# ----------------------------------------------------------------------
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir).build()
    pr = pagerank(g, alpha=0.85, fixed_rounds=5)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: reset vector on the two smallest G1 vertex
    ids (0.7/0.3), dangling defaults to the same vector (NX semantics)."""
    g = H.g1(spark, sf_dir).build()
    s1, s2 = [
        r[0]
        for r in g.vertices.select("id").orderBy("id").limit(2).collect()
    ]
    pr = pagerank(
        g, alpha=0.85, fixed_rounds=5, personalization={s1: 0.7, s2: 0.3}
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components over G3 (the directed
    supplier-sequence graph with real cycles); scc = min member id.
    Oracle is an independent transitive-closure formulation."""
    from graphscope_spark.algorithms import scc

    g = H.g3(spark, sf_dir).build()
    return scc(g)


def q_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component bipartiteness of G4's undirected fabric — two
    components at sf0.01, one with odd cycles, one without."""
    from graphscope_spark.algorithms import bipartite_components

    g = H.g4(spark, sf_dir).build()
    return bipartite_components(g)


def q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-supplier pairs by co-citation on bipartite G1 (suppliers
    sharing >= 150 customers), cosine/jaccard-normalized."""
    from graphscope_spark.algorithms import cocitation

    g = H.g1(spark, sf_dir).build()
    out = cocitation(g, min_common=150)
    return out.select(
        "u", "v", "common",
        F.round("cosine", 6).alias("cosine"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_bibcoupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bibliographic coupling on G3 (suppliers citing the same
    successors)."""
    from graphscope_spark.algorithms import bibliographic_coupling

    g = H.g3(spark, sf_dir).build()
    out = bibliographic_coupling(g, min_common=3)
    return out.select(
        "u", "v", "common",
        F.round("cosine", 6).alias("cosine"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-truss of undirected G4 (279 surviving edges, 2 peel rounds;
    oracle unrolls 4 rounds — past the fixpoint, so both sides agree)."""
    from graphscope_spark.algorithms import k_truss

    g = H.g4(spark, sf_dir).build()
    return k_truss(g, k=12)


def q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA hub/authority power iteration over G3, 5 fixed rounds —
    mass-conserving, so the SQL unroll is exact with no normalization
    scalar."""
    from graphscope_spark.algorithms import salsa

    g = H.g3(spark, sf_dir).build()
    out = salsa(g, fixed_rounds=5)
    return out.select(
        "id",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    )


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import reciprocity

    g = H.g3(spark, sf_dir).build()
    r = reciprocity(g)
    return r.select("id", F.round("reciprocity", 6).alias("reciprocity"))


def q_overall_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import overall_reciprocity

    g = H.g3(spark, sf_dir).build()
    r = overall_reciprocity(g)
    return r.select(F.round("reciprocity", 6).alias("reciprocity"))


def q_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC DAG of G4 — the inter-component edges a crawler scheduler
    walks; components named by min member id."""
    from graphscope_spark.algorithms import condensation_edges

    g = H.g4(spark, sf_dir).build()
    return condensation_edges(g)


def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bow-tie decomposition over G4 (the parity-asymmetric
    supplier-sequence graph): every region materializes at sf0.01."""
    from graphscope_spark.algorithms import bowtie

    g = H.g4(spark, sf_dir).build()
    return bowtie(g)


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over G1: personalized PageRank whose reset vector is
    uniform over the SQL-reproducible seed rule {id % 97 == 1} (the
    repo's landmark convention), 5 fixed rounds."""
    from graphscope_spark.algorithms import trustrank

    g = H.g1(spark, sf_dir).build()
    seeds = g.vertices.select("id").where(F.col("id") % 97 == 1)
    tr = trustrank(g, seeds, alpha=0.85, fixed_rounds=5)
    return tr.select("id", F.round("trust", 6).alias("trust"))


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass (Gyongyi et al.) over G1: uniform PageRank +
    seeded TrustRank, spam_mass = (PR - TR)/PR."""
    from graphscope_spark.algorithms import spam_mass

    g = H.g1(spark, sf_dir).build()
    seeds = g.vertices.select("id").where(F.col("id") % 97 == 1)
    sm = spam_mass(g, seeds, alpha=0.85, fixed_rounds=5)
    return sm.select(
        "id",
        F.round("rank", 6).alias("rank"),
        F.round("trust", 6).alias("trust"),
        F.round("spam_mass", 6).alias("spam_mass"),
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the undirected weighted G2 fabric:
    contributions rank·w/Σw(out) along symmetrized edges."""
    g = H.g2w(spark, sf_dir).build()
    pr = pagerank(g, alpha=0.85, fixed_rounds=5, weight_col="w")
    return pr.select("id", F.round("rank", 6).alias("rank"))


def q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir).build()
    return wcc(g, fixed_rounds=8, two_phase=False)


def q_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component size histogram of G1 (Broder-style giant-component
    report) over the converged large/small-star labels; twin = the
    closure components rolled up identically."""
    from graphscope_spark.algorithms import cc_two_phase
    from graphscope_spark.algorithms.cc_twophase import component_stats

    g = H.g1(spark, sf_dir).build()
    return component_stats(cc_two_phase(g))


def q_ppr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched 4-seed personalized PageRank over G1 in ONE iterative
    job (one rank column per seed; seeds = 4 smallest vertex ids), 5
    fixed rounds — twin carries the same K columns through its CTE
    chain."""
    from graphscope_spark.algorithms import ppr_batch

    g = H.g1(spark, sf_dir).build()
    seeds = [
        r[0]
        for r in g.vertices.select("id").orderBy("id").limit(4).collect()
    ]
    out = ppr_batch(g, seeds, alpha=0.85, fixed_rounds=5)
    return out.select(
        "id", *[F.round(c, 6).alias(c) for c in out.columns if c != "id"]
    )


def q_bloom_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter 'seen before?' over documents: filter built from
    even doc_ids' text, probed by every document. 4096 bits keeps the
    false-positive rate nonzero on purpose — the twin replays the md5
    hash family bit-for-bit, so even the FPs must match."""
    from graphscope_spark.functions.bloom import bloom_filter_seen

    docs = H.load(spark, sf_dir, "documents").select("doc_id", "text")
    seen = docs.where(F.col("doc_id") % 2 == 0)
    out = bloom_filter_seen(
        docs, seen, "text", num_bits=4096, num_hashes=4
    )
    return out.select("doc_id", "maybe_seen")


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness crawl scheduling (web.crawl_schedule) over the
    synthetic page URLs: deterministic md5 priority draw, per-host
    fetch slots, 2s delay, per-host cap 50."""
    urls = _synth_url_edges(spark, sf_dir).select(
        F.col("src_url").alias("url")
    ).distinct()
    return W.crawl_schedule(urls, delay_sec=2.0, max_per_host=50)


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-quality report of the modulo-8 layout on G1: edge
    cut, straggler balance, ghost-mirror count."""
    from graphscope_spark.algorithms.partitioning import partition_quality

    g = H.g1(spark, sf_dir)
    return partition_quality(g, num_parts=8)


def q_cc_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large/small-star CC run TO CONVERGENCE (the edge-rewriting loop
    converges in O(log^2 n) rounds regardless of diameter, so
    to-convergence is driver-budget-safe where hash-min is not); the
    twin is the round-free recursive-closure formulation."""
    from graphscope_spark.algorithms import cc_two_phase

    g = H.g1(spark, sf_dir).build()
    return cc_two_phase(g)


def q_cdlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2(spark, sf_dir).build()
    return cdlp(g, max_round=5)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles(H.g2(spark, sf_dir))


def q_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    dc = degree_centrality(H.g1(spark, sf_dir), "both")
    return dc.select("id", F.round("centrality", 6).alias("centrality"))


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = degree_assortativity_coefficient(H.g2(spark, sf_dir), x="out", y="in")
    return spark.createDataFrame([(round(r, 6),)], "assortativity double")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_core(H.g2(spark, sf_dir), k=20)


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-Luby maximal independent set on G2, fixed 3
    rounds so the DuckDB twin unrolls bit-exactly (undecided vertices
    carry NULL state; tests/test_mis.py checks run-to-completion
    independence + maximality)."""
    from graphscope_spark.algorithms.mis import maximal_independent_set

    return maximal_independent_set(H.g2(spark, sf_dir), fixed_rounds=3)


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones–Plassmann greedy coloring on G2, fixed 4 rounds so the
    DuckDB twin unrolls bit-exactly (still-uncolored vertices carry
    NULL state; tests/test_coloring.py checks run-to-completion
    properness + the Δ+1 bound)."""
    from graphscope_spark.algorithms.coloring import greedy_color

    return greedy_color(H.g2(spark, sf_dir), fixed_rounds=4)


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer butterfly counts on the bipartite G1
    customer→supplier graph (tests/test_butterfly.py pins the motif
    arithmetic on K2,2/K2,3 and a python twin)."""
    from graphscope_spark.algorithms.butterfly import butterflies

    return butterflies(H.g1(spark, sf_dir))


def q_butterfly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global butterfly count, length-3 path count, and the
    Robins–Alexander bipartite clustering coefficient on G1."""
    from graphscope_spark.algorithms.butterfly import butterfly_stats

    return butterfly_stats(H.g1(spark, sf_dir))


def q_modularity_cdlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 5-round CDLP assignment on G2 — the
    standalone quality metric next to louvain's internal halt Q."""
    from graphscope_spark.algorithms.louvain import modularity

    g = H.g2(spark, sf_dir).build()
    return modularity(g, cdlp(g, max_round=5))


def q_quotient_g1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient (contraction) graph of G1 under a 64-shard modulo
    assignment — the generic sibling of condensation and louvain's
    phase-2 contraction (host-graph-style rollup of any partition)."""
    from graphscope_spark.algorithms.quotient import quotient_graph

    g = H.g1(spark, sf_dir)
    assign = g.vertices.select("id", (F.col("id") % 64).alias("label"))
    q = quotient_graph(g, assign)
    return q.edges.select("src", "dst", "n_edges")


def q_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-style keep-best dedup on documents: one row per
    (source, lang) — the longest text, doc_id as the deterministic
    tiebreak — via a single map-side-combinable struct-max aggregate
    (no window)."""
    docs = H.load(spark, sf_dir, "documents")
    best = D.keep_best(
        docs, ["source", "lang"], F.col("n_chars"), "doc_id"
    )
    return best.select("source", "lang", "doc_id", "n_chars")


def q_embedding_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle sample covariance of the 64-d embedding table
    (functions/embeddings.py phase 1 of distributed PCA): posexplode
    pair expansion into one map-side-combined hash aggregate — the
    shuffle carries O(d^2 x partitions) partial sums only."""
    from graphscope_spark.functions.embeddings import embedding_covariance

    emb = H.load(spark, sf_dir, "embeddings")
    cov = embedding_covariance(emb, "embedding")
    return cov.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        # + 0.0 folds IEEE -0.0 to 0.0 (the twin does the same): a
        # tiny negative covariance rounding to zero must hash equal
        (F.round("cov", 6) + F.lit(0.0)).alias("cov"),
    )


def q_rmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph500 RMAT generator, scale 10 x edge_factor 8 (8192 edges,
    1024-vertex id space): one zero-shuffle codegen projection; the
    twin unrolls the identical md5 quadrant draws per bit level.
    Independent of sf_dir by design — edge i is a pure function of
    (seed, i)."""
    from graphscope_spark.generators import rmat_edges

    return rmat_edges(spark, scale=10, edge_factor=8)


def q_label_spreading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zhu-Ghahramani label spreading on undirected G1 from 4 seeds
    (alternating classes on the 4 smallest ids), 5 fixed rounds,
    packed class-score columns."""
    from graphscope_spark.algorithms.spreading import label_spreading

    g = H.g1(spark, sf_dir).build()
    ids = [
        r[0]
        for r in g.vertices.select("id").orderBy("id").limit(4).collect()
    ]
    seeds = spark.createDataFrame(
        [(v, i % 2) for i, v in enumerate(ids)], "id long, class long"
    )
    out = label_spreading(g, seeds, fixed_rounds=5)
    return out.select("id", "label", F.round("score", 6).alias("score"))


def q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep diameter lower bound on undirected G2 (BFS from
    min id, re-BFS from the farthest min-id vertex)."""
    from graphscope_spark.algorithms.paths import diameter_double_sweep

    return diameter_double_sweep(H.g2(spark, sf_dir).build())


def q_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Borůvka MSF edges on weighted G2W, fixed 2
    rounds so the DuckDB twin unrolls bit-exactly (the partial forest
    is a subset of the full one; tests/test_msf.py checks the full
    run vs networkx)."""
    from graphscope_spark.algorithms.msf import boruvka_msf

    return boruvka_msf(H.g2w(spark, sf_dir), fixed_rounds=2)


_BORUVKA_TWIN_ROUNDS = 8  # oracle_sql() unroll depth for the two below


def _assert_boruvka_unroll_covers(g) -> None:
    """The msf_weight/single_linkage twins unroll exactly
    _BORUVKA_TWIN_ROUNDS Borůvka rounds, which equals convergence only
    while ceil(log2 |V|) <= rounds. Guard it here so a scale factor
    with more vertices turns into a loud driver error on this row, not
    a silently diverging oracle."""
    n = g.vertices.count()
    if n > (1 << _BORUVKA_TWIN_ROUNDS):
        raise AssertionError(
            f"G2W has {n} vertices > 2**{_BORUVKA_TWIN_ROUNDS}: the "
            "unrolled DuckDB Borůvka twin no longer covers "
            "run-to-convergence — raise _BORUVKA_TWIN_ROUNDS"
        )


def q_msf_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-forest edge count + total weight on G2W (twin unrolls
    _BORUVKA_TWIN_ROUNDS ≥ ⌈log2 |V|⌉ rounds, guarded below)."""
    from graphscope_spark.algorithms.msf import msf_weight

    g = H.g2w(spark, sf_dir)
    _assert_boruvka_unroll_covers(g)
    return msf_weight(g)


def q_single_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-linkage clusters of G2W at distance 1.5 (MSF cut —
    Gower & Ross equivalence; forest is the only pair state). Twin
    unroll depth guarded like q_msf_weight."""
    from graphscope_spark.algorithms.msf import single_linkage

    g = H.g2w(spark, sf_dir)
    _assert_boruvka_unroll_covers(g)
    return single_linkage(g, threshold=1.5)


def q_annd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NX average_neighbor_degree over undirected G2 (bit-exact
    integer-sum/count division)."""
    from graphscope_spark.algorithms.structure import average_neighbor_degree

    return average_neighbor_degree(H.g2(spark, sf_dir))


def q_degree_connectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-correlation function knn(k) (NX
    average_degree_connectivity) over undirected G2. directed=False
    matters since the operator gained the full directed NX surface —
    a directed graph would get successors-only semantics."""
    from graphscope_spark.algorithms.structure import (
        average_degree_connectivity,
    )

    g = LinkGraph.from_edges(H.g2_edges(spark, sf_dir), directed=False)
    return average_degree_connectivity(g)


def q_clustering_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onnela weighted clustering over weighted-undirected G2W (NX
    clustering weight= semantics): one sorted triangle 3-join with
    cbrt((w1*w2*w3)/max^3) per triangle, 3-corner explode-sum."""
    from graphscope_spark.algorithms.clustering import clustering_weighted

    c = clustering_weighted(H.g2w(spark, sf_dir), "w")
    return c.select("id", F.round("clustering", 6).alias("clustering"))


def q_square_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lind C4 square clustering over undirected G3 (NX
    square_clustering): wedge enumeration doubling as the common-
    neighbor counter."""
    from graphscope_spark.algorithms.clustering import square_clustering

    g = LinkGraph.from_edges(H.g3_edges(spark, sf_dir), directed=False)
    c = square_clustering(g)
    return c.select("id", F.round("clustering", 6).alias("clustering"))


def q_generalized_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Saramäki generalized degree over undirected G3 (sparse, so the
    per-edge triangle multiplicities actually vary): per vertex, how
    many incident edges sit on exactly t triangles."""
    from graphscope_spark.algorithms.clustering import generalized_degree

    g = LinkGraph.from_edges(H.g3_edges(spark, sf_dir), directed=False)
    return generalized_degree(g)


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-normalized rich-club coefficient φ(k) over undirected G2
    (suffix-sum windows over degree histograms only); the library
    returns exact phi, rounded here to match the twin's ROUND 6."""
    from graphscope_spark.algorithms.structure import rich_club_coefficient

    rc = rich_club_coefficient(H.g2(spark, sf_dir))
    return rc.select("k", F.round("phi", 6).alias("phi"))


def q_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex eccentricity over undirected G2w (same pair fabric
    as apsp_g2)."""
    from graphscope_spark.algorithms.structure import eccentricity

    return eccentricity(H.g2w(spark, sf_dir).build())


def q_wiener(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiener-family topological indices (wiener / hyper-Wiener /
    Schultz / Gutman, upstream networkx wiener.py semantics) over
    undirected G2 — ONE pair-fabric pass + one broadcast degree join +
    one scalar aggregate (algorithms/structure.topological_indices)."""
    from graphscope_spark.algorithms.structure import topological_indices

    t = topological_indices(H.g2(spark, sf_dir).build())
    return t.select(
        "connected",
        F.round("wiener", 6).alias("wiener"),
        F.round("hyper_wiener", 6).alias("hyper_wiener"),
        F.round("schultz", 6).alias("schultz"),
        F.round("gutman", 6).alias("gutman"),
    )


def q_global_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global efficiency (upstream efficiency_measures.py: mean over
    ordered pairs of 1/d) over undirected G2 — same fabric, one
    scalar aggregate."""
    from graphscope_spark.algorithms.structure import global_efficiency

    e = global_efficiency(H.g2(spark, sf_dir).build())
    return e.select(F.round("efficiency", 6).alias("efficiency"))


def q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round SimRank (Jeh & Widom 2002, upstream
    simrank_similarity semantics) over the mod-5-trimmed directed G4
    — pair-state Jacobi updates, two in-edge joins + one (u,v)
    aggregate per round (algorithms/simrank.py). Fixed rounds so the
    oracle unrolls identically (the pagerank discipline); the
    tolerance-converged variant is pytest-verified vs real networkx."""
    from graphscope_spark.algorithms.simrank import simrank
    from graphscope_spark.graph import LinkGraph

    e = (H.g4_edges(spark, sf_dir)
         .where((F.col("src") % 5 == 0) & (F.col("dst") % 5 == 0)
                & (F.col("src") != F.col("dst"))))
    g = LinkGraph.from_edges(e, directed=True).build()
    s = simrank(g, importance_factor=0.6, fixed_rounds=3,
                deterministic_sum=True)
    return s.select("u", "v", F.round("s", 6).alias("s"))


def q_topo_generations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological generations (Kahn layers, upstream networkx
    dag.py::topological_generations semantics) of the synthetic
    layered DAGK graph — one zero-in-degree anti-join + edge peel per
    layer on a strictly shrinking remainder (algorithms/dag.py)."""
    from graphscope_spark.algorithms.dag import topological_generations

    return topological_generations(H.dagk(spark, sf_dir))


def q_dag_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAG longest-path length over DAGK — generation-sliced max-plus
    DP (O(E) relax work TOTAL; upstream dag_longest_path semantics).
    Returns (longest, n_longest_tails) for the oracle; the full path
    walk is exercised by pytest."""
    from graphscope_spark.algorithms.dag import (
        dag_longest_path,
        topological_generations,
    )

    g = H.dagk(spark, sf_dir)
    path = dag_longest_path(g)
    longest = len(path) - 1 if path else 0
    # tails achieving the max = vertices in the deepest generation?
    # NO — longest ending at v is generation(v) for this unit-weight
    # DAG only when every vertex is reachable from a root by a
    # longest chain; count via the DP distance instead: recompute the
    # per-vertex longest-ending length with the same DP.
    gens = topological_generations(g)
    spark_ = gens.sparkSession
    # unit-weight longest ending at v == its generation index (Kahn
    # generation = length of the longest incoming chain)
    mx = gens.agg(F.max("generation").alias("m"))
    n_tails = (gens.crossJoin(F.broadcast(mx))
               .where(F.col("generation") == F.col("m")).count())
    return spark_.createDataFrame(
        [(int(longest), int(n_tails))], "longest long, n_longest_tails long")


def q_graph_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """radius / diameter / |center| / |periphery| over undirected
    G2w."""
    from graphscope_spark.algorithms.structure import graph_extremes

    return graph_extremes(H.g2w(spark, sf_dir).build())


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree distribution of G1 (the Broder WWW'00 fig. 2
    report)."""
    from graphscope_spark.algorithms.degree import degree_histogram

    return degree_histogram(H.g1(spark, sf_dir), mode="in")


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clauset–Shalizi–Newman power-law exponent MLE for G1's
    in-degree tail (d ≥ 2)."""
    from graphscope_spark.algorithms.degree import powerlaw_alpha

    return powerlaw_alpha(H.g1(spark, sf_dir), d_min=2, mode="in")


def q_graph_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir)
    return spark.createDataFrame(
        [(g.num_vertices(), g.num_edges(), g.num_self_loops())],
        "num_vertices long, num_edges long, num_self_loops long",
    )


def q_node_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir)
    s = (
        H.load(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 1)
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    return node_boundary(g, s)


def q_induced_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir)
    cust = (
        H.load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    supp = H.load(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + H.OFFSET).cast("long").alias("id")
    )
    sub = g.induce_subgraph(cust.unionAll(supp))
    return sub.edges.agg(F.count("*").alias("num_edges"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(H.load(spark, sf_dir, "documents"))


def q_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: LSH candidates → Jaccard verify →
    WCC duplicate clusters → (doc_id, keep_id)."""
    return D.fuzzy_dedup(
        H.load(spark, sf_dir, "documents"),
        num_hashes=8, band_size=2, n=3, threshold=0.2,
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_stats(H.load(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_score(H.load(spark, sf_dir, "documents"))


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM counts trained on the full documents corpus —
    integer-exact (ctx, w, cnt) model table."""
    from graphscope_spark.functions import lm as LM

    return LM.train_ngram_lm(H.load(spark, sf_dir, "documents"), n=2)


def q_ngram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring: bigram LM trained on the
    even-doc_id half of the corpus (the 'trusted' corpus), all
    documents scored against it — held-out docs carry real OOV
    n-grams, exercising the smoothing path."""
    from graphscope_spark.functions import lm as LM

    docs = H.load(spark, sf_dir, "documents")
    model = LM.train_ngram_lm(docs.where(F.col("doc_id") % 2 == 0), n=2)
    out = LM.ngram_perplexity(docs, lm=model, n=2)
    return out.select(
        "doc_id", "n_ngrams", "n_oov",
        F.round("avg_logprob", 6).alias("avg_logprob"),
        F.round("ppl", 6).alias("ppl"),
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Appendix-A rule filter; min_stopword_hits relaxed to 1
    because the synthetic corpus vocabulary carries only 'the'/'a'
    from the required-stopword list (the published 2 would zero out
    every keep and value-check nothing)."""
    return T.gopher_rules(
        H.load(spark, sf_dir, "documents"), min_stopword_hits=1
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (functions/bpe.py): 8 merges learned on
    the documents corpus; output is the ranked merge table, matched
    bit-exactly (incl. pair counts) by the unrolled DuckDB chain."""
    from graphscope_spark.functions.bpe import bpe_train

    _, mdf = bpe_train(H.load(spark, sf_dir, "documents"), n_merges=8)
    return mdf


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 8 learned merges back to the corpus: per-doc token
    counts and the full space-joined token stream (byte-identical to
    the oracle's nested-replace re-derivation)."""
    from graphscope_spark.functions.bpe import bpe_encode, bpe_train

    docs = H.load(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, n_merges=8)
    out = bpe_encode(docs, merges)
    return out.select(
        "doc_id", "n_words", "n_tokens",
        F.array_join("tokens", " ").alias("token_str"),
    )


def _c4_injected_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) with the line structure the C4 oracle injects —
    see q_c4_rules docstring."""
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    n = F.size(words)
    nlines = F.ceil(n / F.lit(5)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), nlines - 1)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    did = F.col("doc_id")
    lines = F.transform(
        idx,
        lambda i: F.concat(
            F.array_join(F.slice(words, i * 5 + 1, 5), " "),
            F.when((did + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    text2 = F.concat(
        F.array_join(lines, "\n"),
        F.when(did % 17 == 0, F.lit("\nlorem ipsum dolor sit amet."))
        .otherwise(F.lit("")),
        F.when(did % 19 == 0, F.lit('\nconst cfg = { "a": 1 };'))
        .otherwise(F.lit("")),
        F.when(did % 11 == 0,
               F.lit("\nplease enable javascript to view this page."))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", text2.alias("text"))


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (functions/text.py c4_rules). The synthetic
    corpus has no newlines or punctuation, so line structure is
    injected in-query — identically in the DuckDB oracle — as a pure
    function of (doc_id, text): 5-word lines, '.'-terminated except
    every third line per doc, plus page-level lorem-ipsum / brace /
    javascript injections on doc_id residues, exercising every rule in
    both keep and drop directions."""
    return T.c4_rules(_c4_injected_docs(H.load(spark, sf_dir, "documents")))


def q_fineweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-shaped composed filter over documents: lang=='en' AND
    Gopher rules (raw text, min_stopword_hits=1 as in gopher_rules)
    AND C4 rules (injected line structure, as in c4_rules) AND exact
    keep-first dedup on the C4-cleaned text among survivors. The twin
    nests the two existing stage oracles verbatim and adds the lang
    test + winner join — the composition contract, not new rules."""
    docs = H.load(spark, sf_dir, "documents")
    c4 = T.c4_rules(_c4_injected_docs(docs)).select(
        "doc_id", F.col("keep").alias("c4_keep"), "clean_text"
    )
    gop = T.gopher_rules(docs, min_stopword_hits=1).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    base = (
        docs.select("doc_id", (F.col("lang") == "en").alias("lang_ok"))
        .join(c4, "doc_id")
        .join(gop, "doc_id")
    )
    passed = F.col("lang_ok") & F.col("gopher_keep") & F.col("c4_keep")
    winners = (
        base.where(passed)
        .groupBy(F.md5("clean_text").alias("_h"))
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    return (
        base.withColumn("_h", F.md5("clean_text"))
        .join(winners, "_h", "left")
        .select(
            "doc_id", "lang_ok", "gopher_keep", "c4_keep",
            (passed & (F.col("doc_id") != F.col("_keep_id"))).alias("is_dup"),
            (passed & (F.col("doc_id") == F.col("_keep_id"))).alias("keep"),
        )
    )


_BOILER = ("subscribe to our newsletter for daily updates and weekly "
           "offers today")


def _bpe_ctes(n_merges: int) -> str:
    """Shared CTE chain for the BPE oracles: word-frequency table,
    sentinel-encoded symbol strings (chr(1)-wrapped tokens,
    chr(1)chr(1) between — token boundaries survive replace()), and
    per-step (pair counts -> argmax -> greedy rewrite). replace()'s
    scan-resumes-after-the-replacement rule IS the reference
    algorithm's greedy left-to-right in-word merge pass (see
    functions/bpe.py module docstring)."""
    sep = "chr(1)"
    sep2 = "chr(1) || chr(1)"
    ctes = [
        r"""wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(coalesce(text, ''),
                                                    '\s+'),
                  x -> x <> '')) AS word
    FROM documents) GROUP BY word)""",
        f"""s0 AS MATERIALIZED (
  SELECT freq,
         {sep} || array_to_string(
           list_append(list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), '</w>'),
           {sep2}) || {sep} AS s
  FROM wf)""",
    ]
    for m in range(1, n_merges + 1):
        prev = f"s{m - 1}"
        ctes.append(
            f"""p{m} AS (
  SELECT a, b, SUM(freq) AS cnt FROM (
    SELECT freq, toks[i] AS a, toks[i + 1] AS b
    FROM (SELECT freq,
                 string_split(substring(s, 2, length(s) - 2), {sep2}) AS toks
          FROM {prev}),
         unnest(range(1, len(toks))) AS u(i))
  GROUP BY a, b)"""
        )
        ctes.append(
            f"""best{m} AS MATERIALIZED (
  SELECT a, b, cnt FROM p{m} ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        ctes.append(
            f"""s{m} AS MATERIALIZED (
  SELECT freq,
         replace(s,
           {sep} || (SELECT a FROM best{m}) || {sep2}
                 || (SELECT b FROM best{m}) || {sep},
           {sep} || (SELECT a FROM best{m})
                 || (SELECT b FROM best{m}) || {sep}) AS s
  FROM {prev})"""
        )
    return "WITH " + ",\n".join(ctes)


def _bpe_train_sql(n_merges: int) -> str:
    parts = [
        f"SELECT CAST({m} AS INT) AS rank, a AS lhs, b AS rhs,"
        f" CAST(cnt AS BIGINT) AS cnt FROM best{m}"
        for m in range(1, n_merges + 1)
    ]
    return _bpe_ctes(n_merges) + "\n" + "\nUNION ALL\n".join(parts)


def _bpe_encode_sql(n_merges: int) -> str:
    """Re-derives the merge chain, then applies all n nested replaces
    to every corpus word and reassembles per-doc token streams."""
    sep = "chr(1)"
    sep2 = "chr(1) || chr(1)"
    expr = (
        f"{sep} || array_to_string(list_append("
        "list_transform(range(1, length(w) + 1),"
        f" i -> substring(w, i, 1)), '</w>'), {sep2}) || {sep}"
    )
    # DuckDB lambdas cannot contain subqueries — the merge pairs enter
    # as cross-joined single-row tables m1..mN referenced as columns.
    for m in range(1, n_merges + 1):
        expr = (
            f"replace({expr},\n  {sep} || m{m}.a || {sep2}"
            f" || m{m}.b || {sep},\n  {sep} ||"
            f" m{m}.a || m{m}.b || {sep})"
        )
    crosses = " ".join(
        f"CROSS JOIN best{m} m{m}" for m in range(1, n_merges + 1)
    )
    return (
        _bpe_ctes(n_merges)
        + f""",
dw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     x -> x <> '') AS words
  FROM documents),
enc0 AS (
  SELECT doc_id, len(words) AS n_words,
         list_transform(words, w -> {expr}) AS wss
  FROM dw {crosses}),
enc AS (
  SELECT doc_id, n_words,
         list_transform(wss, s ->
           string_split(substring(s, 2, length(s) - 2), {sep2})) AS wt
  FROM enc0)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(coalesce(list_sum(list_transform(wt, t -> len(t))), 0)
            AS BIGINT) AS n_tokens,
       coalesce(array_to_string(flatten(wt), ' '), '') AS token_str
FROM enc
"""
    )


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (functions/dedup.py dedup_substrings,
    min_len=8). The synthetic vocabulary makes natural 8-gram
    collisions vanishing, so duplicates are injected in-query —
    identically in the DuckDB twin: every doc_id%5==0 doc gets an
    11-word shared boilerplate suffix (cross-doc duplication, keeper =
    doc 0), and every doc_id%13==0 doc re-appends its own first 8
    words (intra-doc duplication)."""
    docs = H.load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    did = F.col("doc_id")
    text2 = F.concat(
        F.col("text"),
        F.when(did % 5 == 0, F.lit(" " + _BOILER)).otherwise(F.lit("")),
        F.when(did % 13 == 0,
               F.concat(F.lit(" "), F.array_join(F.slice(words, 1, 8), " ")))
        .otherwise(F.lit("")),
    )
    return D.dedup_substrings(
        docs.select("doc_id", text2.alias("text")), min_len=8
    )


def q_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear classifier scoring with an
    in-query deterministic weights table (w(bucket) = (bucket % 1001)
    / 1000 - 0.5 over the corpus's distinct buckets — the md5 bucket
    rule makes it engine-portable). label is kept out of the driver
    row (sign-of-score at the 0 knife edge is 1-ulp sensitive to sum
    order); pytest covers it."""
    from graphscope_spark.functions import classify as C

    docs = H.load(spark, sf_dir, "documents")
    nb = 4096
    b = docs.select(
        F.explode(C.token_buckets("text", nb)).alias("bucket")
    ).distinct()
    weights = b.select(
        "bucket",
        ((F.col("bucket") % 1001) / 1000.0 - 0.5).alias("w"),
    )
    out = C.linear_classifier_score(docs, weights, n_buckets=nb)
    return out.select(
        "doc_id", "n_tokens",
        F.round("score", 6).alias("score"),
        F.round("prob", 6).alias("prob"),
    )


def q_dsir_logw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-n-gram importance log-weights (Xie et al. 2023):
    target model = the English subset, raw model = the whole corpus;
    logw(doc) = Σ_feats log p_en(bucket) − log p_all(bucket), Laplace
    α=1 over 4096 buckets."""
    from graphscope_spark.functions import dsir as D

    docs = H.load(spark, sf_dir, "documents")
    out = D.dsir_log_weights(
        docs, docs.where(F.col("lang") == "en"), n_buckets=4096
    )
    return out.select("doc_id", "n_feats", F.round("logw", 6).alias("logw"))


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel-top-k resampling: keep the 20 raw docs with the
    highest logw + deterministic-Gumbel key (md5 uniform draw — the
    paper's without-replacement sampler, restart-stable)."""
    from graphscope_spark.functions import dsir as D

    docs = H.load(spark, sf_dir, "documents")
    kept = D.dsir_resample(
        docs, docs.where(F.col("lang") == "en"), n_keep=20, n_buckets=4096
    )
    return kept.select(
        "doc_id", "n_feats",
        F.round("logw", 6).alias("logw"),
        F.round("key", 6).alias("gkey"),
    )


def q_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLE-style 2-hop GraphSAGE fanout sampling (3, then 2) from the
    id%7==1 seed vertices of G2 — deterministic md5 ticket draws, so
    the DuckDB twin unrolls both hops with identical ROW_NUMBER
    windows."""
    from graphscope_spark.algorithms.walks import neighbor_sample

    g = H.g2(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") % 7 == 1)
    return neighbor_sample(g, seeds, [3, 2])


def q_sage_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE mean-pool feature aggregation (walks.sage_features)
    over UNDIRECTED G1 from the id%31==1 seeds, fanouts [3, 2]:
    per root its own (degree, id%10) features plus the bit-exact
    integer-mean of each sampled hop's features. Twin unrolls the same
    md5 ticket draws + SUM/COUNT pooling."""
    from graphscope_spark.algorithms.walks import sage_features

    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    deg = (
        g.undirected_edges()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("deg"))
    )
    feats = g.vertices.select("id").join(deg, "id", "left").select(
        "id",
        F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
        (F.col("id") % 10).cast("long").alias("idmod"),
    )
    seeds = g.vertices.where(F.col("id") % 31 == 1)
    return sage_features(g, feats, seeds, [3, 2], agg="mean")


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail: lang-ID + self-trained bigram LM
    perplexity + rank-exact per-language terciles."""
    from graphscope_spark.functions import lm as LM

    return LM.ccnet_buckets(H.load(spark, sf_dir, "documents"), n=2)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.lang_id(H.load(spark, sf_dir, "documents"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(H.load(spark, sf_dir, "documents"))


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.repetition_ratio(H.load(spark, sf_dir, "documents"))


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # thresholds sit inside the synthetic corpus's quality (0.604-0.676
    # under the letters-only/non-empty-token formula) and length (10-99
    # tokens) ranges so the filter provably removes documents rather
    # than passing everything through
    return T.corpus_filter(
        H.load(spark, sf_dir, "documents"),
        min_tokens=20,
        max_tokens=100_000,
        min_quality=0.63,
    )


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (LLM pretraining shard assembly):
    deterministic (md5(id), id) layout, shard = exclusive running token
    sum // budget — computed as a distributed two-phase prefix sum, not
    a single global window."""
    return T.pack_shards(H.load(spark, sf_dir, "documents"), budget_tokens=2000)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed sklearn-style idf,
    term-asc tie-break): explode + two hash aggregates + a per-doc
    window — never a global sort."""
    from graphscope_spark.functions import ranking as R

    return R.tfidf_top_terms(H.load(spark, sf_dir, "documents"), k=3)


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of every matching document against a literal query;
    corpus scalars (N, avgdl) ride a broadcast 1-row aggregate."""
    from graphscope_spark.functions import ranking as R

    return R.bm25_score(H.load(spark, sf_dir, "documents"),
                        query="fast hash join order")


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (term → sorted posting list) with a df band
    filter; one explode + distinct + one hash aggregate.  The library
    API returns a real array<long> postings column; the driver-facing
    query stringifies it (array_join) because the driver's pandas
    canonicalizer cannot hash list cells."""
    from graphscope_spark.functions import ranking as R

    idx = R.inverted_index(H.load(spark, sf_dir, "documents"),
                           min_df=2, max_df=450)
    return idx.select(
        "term", "df",
        F.array_join("postings", ",").alias("postings"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (13-gram → 8-gram here for the short
    synthetic docs): docs sharing ANY word n-gram with the benchmark
    subset (doc_id % 10 = 0) are dropped; shingling is a pure array
    expression, the benchmark shingle set is broadcast."""
    docs = H.load(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 10 = 0").select("text")
    return D.decontaminate(docs, bench, n=8).select("doc_id", "lang", "n_chars")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample (md5 uniform draw —
    restart-stable, parallelism-independent; strata not listed are
    dropped, sampleBy semantics)."""
    from graphscope_spark.functions.sampling import stratified_sample

    return stratified_sample(
        H.load(spark, sf_dir, "documents"),
        "lang", {"en": 0.5, "de": 0.25, "zh": 0.1}, seed=7,
    ).select("doc_id", "lang", "n_chars")


def q_assign_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by cumulative thresholds
    over the same md5 draw (gen_labels re-expressed, learning/graph.py
    :123-253)."""
    from graphscope_spark.functions.sampling import assign_splits

    return assign_splits(
        H.load(spark, sf_dir, "documents"), seed=11,
    ).select("doc_id", "lang", "split")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        H.load(spark, sf_dir, "documents"), n=3, threshold=0.2
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        H.load(spark, sf_dir, "documents"), num_hashes=8, band_size=2, n=3
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-then-prune over the embeddings table.
    Threshold lowered to 0.35 because the synthetic embeddings carry
    no planted near-duplicates — at the paper's 0.95 nothing prunes
    and the keep path would be value-checked vacuously (0.35 prunes
    93/500 at sf0.01)."""
    from graphscope_spark.functions.kmeans import semantic_dedup

    return semantic_dedup(
        H.load(spark, sf_dir, "embeddings"), k=8, iters=2, threshold=0.35
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (k=8, 2 update rounds) over the
    embeddings table — the SemDeDup-style clustering primitive."""
    from graphscope_spark.functions.kmeans import kmeans_assign

    return kmeans_assign(H.load(spark, sf_dir, "embeddings"), k=8, iters=2)


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = H.load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return S.knn_cosine(emb, queries, k=5)


def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force kNN over int8 scalar-quantized vectors (per-vector
    symmetric scales cancel in cosine — no dequantization)."""
    emb = H.load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return S.knn_quantized(emb, queries, k=5)


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = H.load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qpart"),
    )
    return S.knn_ivf(emb, queries, partition_col="label", k=3)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = H.load(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_exact(emb, threshold=0.4)


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup path: hyperplane-LSH buckets generate
    candidates (4 bands × 4 planes OR-construction), exact cosine
    verifies — only same-(band,bucket) groups shuffle, never the full
    pair space."""
    emb = H.load(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_lsh(emb, threshold=0.4, num_planes=4, num_bands=4)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = H.load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = H.load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = ev.withColumn("prev", F.lag("us").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev").isNull() | ((F.col("us") - F.col("prev")) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return gaps.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events")
    )


def q_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming twin of events_hourly: stage the events
    parquet into a directory (file-stream appends contract), run the
    watermarked windowed rollup with trigger=availableNow to a memory
    sink, and return the finalized table.  Same DuckDB oracle as the
    batch query — the streaming plan must produce identical rows."""
    import shutil
    import tempfile

    from graphscope_spark.streaming import hourly_rollup_stream, stream_events

    d = tempfile.mkdtemp(prefix="gs_events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    q = (
        hourly_rollup_stream(stream_events(spark, d))
        .writeStream.format("memory")
        .queryName("events_hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("events_hourly_stream")


def q_simhash_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    SimHash keep-first filter over the documents stream at
    max_hamming=0, where the sequential keep chain degenerates to
    keep-min-doc_id per fingerprint — SQL-expressible, so the one
    stateful-kernel path gets a full value-hash oracle. k>0 (the true
    near-dup chain) is pinned by tests/test_streaming_state.py
    (stream == sequential batch twin across micro-batch boundaries)."""
    import shutil
    import tempfile

    from graphscope_spark.streaming import simhash_dedup_stream

    d = tempfile.mkdtemp(prefix="gs_docs_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{d}/part-0.parquet")
    docs = spark.readStream.schema("doc_id long, text string").parquet(d)
    q = (
        simhash_dedup_stream(docs, prefix_bits=16, max_hamming=0)
        .writeStream.format("memory")
        .queryName("simhash_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("simhash_stream_dedup")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(
        H.load(spark, sf_dir, "documents"), max_hamming=16, prefix_bits=8
    )


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup (multimodal.py image_near_dup_pairs):
    synth BMP corpus + 10 planted one-pixel-perturbed copies (id+10000)
    re-encoded in-query; dHash + banded segment join must recover every
    planted pair. Rows-only driver check (pixel decode is not in
    DuckDB); the planted-recall contract is pinned by the n_planted
    aggregate row and tests/test_image_dedup.py."""
    from graphscope_spark.functions.multimodal import (
        decode_bmp, encode_bmp, image_near_dup_pairs, synth_media,
    )

    media = synth_media(spark, n=240)
    imgs = media.where(F.col("kind") == "image").limit(10).collect()
    dups = []
    for r in imgs:
        img = decode_bmp(bytes(r["payload"]))
        img2 = img.copy()
        img2[0, 0, 0] = (int(img2[0, 0, 0]) + 5) % 256
        dups.append((r["media_id"] + 10000, "image",
                     bytearray(encode_bmp(img2)), r["width"], r["height"],
                     r["duration_ms"]))
    allm = media.unionByName(spark.createDataFrame(dups, media.schema))
    pairs = image_near_dup_pairs(allm, max_hamming=10)
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(((F.col("b") - F.col("a")) == 10000).cast("long"))
        .alias("n_planted"),
        F.sum("hamming").alias("sum_hamming"),
    )


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal end-to-end (synth media with REAL BMP/WAV payloads →
    # Arrow-batched decode + feature extraction → frame-sample plan);
    # deterministic aggregate so the rows-only driver check still pins
    # real numbers. No SQL oracle: BMP/WAV decode is not in DuckDB.
    from graphscope_spark.functions.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=300)
    feats = extract_features(media)
    agg = feats.agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("decoded").cast("long")).alias("n_decoded"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.sum(F.element_at("feature", 1)), 6).alias("sum_f0"),
    )
    frames = frame_sample_plan(media, every_ms=1000).agg(
        F.count("*").alias("n_frames")
    )
    return agg.crossJoin(frames)


def q_pages_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-rule pages flow (synthesized input; rows-only check):
    # pages → byte-identical extraction → hashed edge table → degrees
    from graphscope_spark.pages import extract_text, generate_pages, pages_to_edges

    pages = generate_pages(spark, n=500)
    bad = pages.withColumn("e", extract_text("html")).where(
        F.col("e") != F.col("text")
    )
    g = LinkGraph.from_url_edges(pages_to_edges(pages))
    return spark.createDataFrame(
        [(pages.count(), bad.count(), g.num_vertices(), g.num_edges())],
        "n_pages long, n_extract_mismatch long, n_vertices long, n_edges long",
    )


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    return bfs(g, src=1)


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    d = sssp(g, src=1, weight_col="w")
    return d.select(
        "id",
        F.when(F.col("distance") == float("inf"), F.lit(-1.0))
        .otherwise(F.round("distance", 6))
        .alias("distance"),
    )


def q_sssp_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    v = sssp_average_length(g, src=1, weight_col="w")
    return spark.createDataFrame([(round(v, 6),)], "avg_distance double")


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir).build()
    h = hits(g, fixed_rounds=5, normalized=True)
    return h.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2(spark, sf_dir).build()
    c = katz_centrality(g, alpha=0.1, beta=1.0, fixed_rounds=5, normalized=True)
    return c.select("id", F.round("centrality", 6).alias("centrality"))


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2(spark, sf_dir).build()
    c = eigenvector_centrality(g, fixed_rounds=5)
    return c.select("id", F.round("centrality", 6).alias("centrality"))


def q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = H.g2w_edges(spark, sf_dir)
    g = LinkGraph.from_edges(e, directed=True).build()
    return lpa_u2i(g, max_round=5, weight_col="w")


def q_kshell(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G1 (hub-skewed bipartite): shells are non-trivial there, unlike
    # the near-complete supplier co-occurrence graph G2
    return k_shell(H.g1(spark, sf_dir), k=12)


def q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full core decomposition in ONE distributed h-index fixpoint
    (kmax=47 on G1 at sf0.01, fixpoint in 4 rounds) — replaces
    O(k_max) peel invocations when all core numbers are wanted."""
    from graphscope_spark.algorithms import core_numbers

    return core_numbers(H.g1(spark, sf_dir))


def q_k_crust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-crust (upstream networkx core.py::k_crust: core number <= k)
    on G1 — one decomposition pass + a filter, no extra peels."""
    from graphscope_spark.algorithms import k_crust

    return k_crust(H.g1(spark, sf_dir), k=12)


def q_k_corona(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-corona (upstream core.py::k_corona: core == k AND exactly k
    in-core neighbors) on G1 — decomposition pass + ONE co-partitioned
    neighbor-count join (no adjacency arrays)."""
    from graphscope_spark.algorithms import k_corona

    return k_corona(H.g1(spark, sf_dir), k=12)


def q_community_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-aware link prediction (Soundarajan-Hopcroft CN/RA +
    within-inter-cluster, upstream link_prediction.py semantics) over
    undirected G1 with nation as the community map on BOTH sides
    (customers c_nationkey, suppliers s_nationkey) — ONE wedge-join
    pass, community table broadcast on all three wedge roles
    (algorithms/linkpred.community_link_prediction_scores). Same
    (u%7, v%7) stratum trim as link_prediction_g1 (23k of 1.1M
    candidate pairs at sf0.01), value-checked against the full
    pipeline."""
    from graphscope_spark.algorithms import community_link_prediction_scores

    cust = (
        H.load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").cast("long").alias("id"),
                F.col("c_nationkey").cast("long").alias("community"))
    )
    supp = (
        H.load(spark, sf_dir, "supplier")
        .select((F.col("s_suppkey") + H.OFFSET).cast("long").alias("id"),
                F.col("s_nationkey").cast("long").alias("community"))
    )
    s = community_link_prediction_scores(H.g1(spark, sf_dir),
                                         cust.unionAll(supp))
    return s.where((F.col("u") % 7 == 0) & (F.col("v") % 7 == 0)).select(
        "u", "v", "cn", "cn_sh",
        F.round("ra_sh", 6).alias("ra_sh"),
        F.round("wic", 6).alias("wic"),
    )


def q_anf_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighborhood function (FM-sketch ANF, Palmer et al.
    KDD'02) over undirected G1, radii 0..4 (the curve saturates at 4).
    Hash currency: integer-exact total_r; nf rounded to 2 dp."""
    from graphscope_spark.algorithms.anf import neighborhood_function

    g = H.g1(spark, sf_dir).build()
    nf = neighborhood_function(g, max_radius=4, num_trials=8)
    return nf.select("radius", "total_r", F.round("nf", 2).alias("nf"))


def q_anf_balls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex 2-hop ball-size FM estimates on undirected G1 — the
    per-vertex (1600-row) hash check of the sketch superstep."""
    from graphscope_spark.algorithms.anf import anf_balls

    g = H.g1(spark, sf_dir).build()
    return anf_balls(g, radius=2, num_trials=8).select(
        "id", F.round("est", 6).alias("est"))


def q_distance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective diameter (0.9-quantile, HyperANF interpolation) and
    average distance of undirected G1 from one 6-round sketch run."""
    from graphscope_spark.algorithms.anf import distance_stats

    g = H.g1(spark, sf_dir).build()
    return distance_stats(g, q=0.9, max_radius=6, num_trials=8).select(
        F.round("eff_diam", 4).alias("eff_diam"),
        F.round("avg_dist", 4).alias("avg_dist"))


def q_hyperball_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall approximate harmonic centrality (Boldi/Vigna ICDMW'13)
    on undirected G1 from the same FM ball sketches — the web-scale
    stand-in for the exact per-source-BFS harmonic_centrality."""
    from graphscope_spark.algorithms.anf import hyperball_harmonic

    g = H.g1(spark, sf_dir).build()
    hb = hyperball_harmonic(g, max_radius=6, num_trials=8)
    return hb.select("id", F.round("centrality", 6).alias("centrality"))


def q_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFS visitation rank (apps/dfs/dfs.h token walk) from customer 1
    over undirected G1 — driver-side walk of the collected (guarded)
    component, min-id child order. No SQL oracle (sequential visit
    order is not SQL-expressible); pytest carries an independent
    recursive-Python twin."""
    from graphscope_spark.algorithms import dfs

    return dfs(H.g1(spark, sf_dir), source=1, directed=False)


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NetworkX link-prediction scores (common neighbors, Jaccard,
    Adamic-Adar, resource allocation, preferential attachment) over
    undirected G1 — one wedge self-join + one hash aggregate
    (algorithms/linkpred.py). Result trimmed to the
    (u % 7 == 0 AND v % 7 == 0) stratum: 23k of the 1.1M distance-2
    candidate pairs at sf0.01, value-checked against the full pipeline."""
    from graphscope_spark.algorithms import link_prediction_scores

    s = link_prediction_scores(H.g1(spark, sf_dir))
    return s.where((F.col("u") % 7 == 0) & (F.col("v") % 7 == 0)).select(
        "u",
        "v",
        "cn",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        "pref_attachment",
    )


def _synth_url_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Common-Crawl-style page-link edges synthesized
    from orders (no URL columns exist in the testdata): messy src URLs
    (uppercase scheme/host, default port, tracking params, trailing
    slash, fragment) linking to CDN-style dst URLs. The DuckDB oracles
    build the identical strings with the same arithmetic."""
    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    return o.select(
        F.concat(
            F.lit("HTTP://WWW.Site"), c(F.col("o_custkey") % 20),
            F.lit(".COM:80/page/"), c(F.col("o_orderkey") % 11),
            F.lit("/?utm_source=x&q="), c(F.col("o_orderkey") % 3),
            F.lit("#frag"),
        ).alias("src_url"),
        F.concat(
            F.lit("https://cdn.site"), c(F.col("o_orderkey") % 25),
            F.lit(".com:443/asset/"), c(F.col("o_custkey") % 5),
        ).alias("dst_url"),
    )


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization kernels (web.py): canonical form, host,
    registered domain, CC reversed-host — all pure Catalyst regexp /
    array expressions, DuckDB twin reproduces each rule."""
    urls = _synth_url_edges(spark, sf_dir).select("src_url").distinct()
    h = W.url_host("src_url")
    return urls.select(
        F.col("src_url").alias("url"),
        W.canonicalize_url("src_url").alias("canon"),
        h.alias("host"),
        W.registered_domain(h).alias("domain"),
        W.reverse_host(h).alias("rhost"),
    )


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-edge → registered-domain webgraph rollup (web.py
    host_graph): host extraction folds into the scan projection, one
    map-side-combined hash aggregate, self-links dropped (CC host-graph
    convention)."""
    return W.host_graph(
        _synth_url_edges(spark, sf_dir), level="domain", drop_self=True
    )


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line-level exact dedup + doc reassembly
    (functions/dedup.py dedup_lines) over documents, space-delimited
    tokens standing in for lines at this corpus size."""
    return D.dedup_lines(
        H.load(spark, sf_dir, "documents"), delim=" "
    )


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common-Crawl flagship composition end-to-end: page URL edges
    → host webgraph rollup (web.py) → xxhash64 vertex hashing
    (LinkGraph.from_url_edges, the 10^12-url scale path) → fixed-round
    PageRank → join ranks back to host names. PageRank is
    id-assignment-independent, so the DuckDB oracle runs the same
    unroll directly over host-string edge keys — no hash to reproduce."""
    hg = W.host_graph(
        _synth_url_edges(spark, sf_dir), level="host", drop_self=True
    )
    g = LinkGraph.from_url_edges(
        hg, src_url="src_host", dst_url="dst_host"
    ).build()
    pr = pagerank(g, alpha=0.85, fixed_rounds=5)
    return pr.join(g.vertices, "id").select(
        F.col("url").alias("host"), F.round("rank", 6).alias("rank")
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/IPv4/phones → typed placeholders + counts,
    functions/text.py pii_redact). The synthetic docs carry no PII, so
    deterministic PII is appended in-query — identically in the DuckDB
    oracle — before the redaction kernel runs."""
    c = lambda e: e.cast("string")  # noqa: E731
    docs = H.load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" user"), c(F.col("doc_id")), F.lit("@ex.org ip 10.0."),
            c(F.col("doc_id") % 256), F.lit("."), c(F.col("doc_id") % 100),
            F.lit(" tel 555-000-"),
            F.lpad(c(F.col("doc_id") % 10000), 4, "0"),
        ).alias("text"),
    )
    return T.pii_redact(docs)


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate-line removal (functions/dedup.py
    remove_boilerplate): lines in more than max_df distinct docs are
    dropped everywhere; space-delimited tokens stand in for lines."""
    return D.remove_boilerplate(
        H.load(spark, sf_dir, "documents"), max_df=5, delim=" "
    )


def q_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering(H.g2(spark, sf_dir)).select(
        "id", F.round("clustering", 6).alias("clustering")
    )


def q_avg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = avg_clustering(H.g2(spark, sf_dir))
    return spark.createDataFrame([(round(v, 6),)], "avg_clustering double")


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = transitivity(H.g2(spark, sf_dir))
    return spark.createDataFrame([(round(v, 6),)], "transitivity double")


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir)
    return g.out_degrees().join(g.in_degrees(), "id")


def q_edge_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g1(spark, sf_dir)
    s = (
        H.load(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 1)
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    return edge_boundary(g, s)


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    c = closeness_centrality(g, weight_col=None, wf_improve=True)
    return c.select("id", F.round("centrality", 6).alias("centrality"))


def q_apsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    return all_pairs_shortest_path_length(g, weight_col=None)


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source Brandes betweenness (networkx k-sample estimator
    rescale n/k) over undirected G1 — level-synchronous multi-source
    forward sweep + per-level backward dependency accumulation.
    Sources = {id % 97 == 1}, the SQL-reproducible stand-in for the
    deterministic min-xxhash64 draw (same convention as
    closeness_g1_landmarks)."""
    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    src = g.vertices.where(F.col("id") % 97 == 1)
    b = betweenness_centrality(g, sources=src, normalized=True)
    return b.select("id", F.round("centrality", 6).alias("centrality"))


def q_betweenness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (all-sources) WEIGHTED betweenness over the weighted
    supplier co-occurrence graph G2W (networkx weight= semantics):
    multi-source Bellman-Ford distances → shortest-path DAG → hop
    levels → sigma sweep → backward dependency accumulation. The
    DuckDB twin unrolls the same three fixpoints with poison-row
    non-convergence guards (harness.betweenness_w_sql)."""
    g = H.g2w(spark, sf_dir).build()
    b = betweenness_centrality(g, weight_col="w", normalized=True)
    return b.select("id", F.round("centrality", 6).alias("centrality"))


def q_edge_betweenness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted EDGE betweenness over G2W (networkx
    edge_betweenness_centrality weight= semantics): same forward
    sweeps as betweenness_w_g2w, backward sweep accumulates per-DAG-
    edge dependencies; undirected edges canonical src < dst."""
    from graphscope_spark.algorithms.betweenness import (
        edge_betweenness_centrality,
    )

    g = H.g2w(spark, sf_dir).build()
    b = edge_betweenness_centrality(g, weight_col="w", normalized=True)
    return b.select("src", "dst", F.round("centrality", 6).alias("centrality"))


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """networkx harmonic_centrality (sum of reciprocal shortest-path
    distances) over undirected G1, landmark sources {id % 97 == 1}."""
    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    src = g.vertices.where(F.col("id") % 97 == 1)
    c = harmonic_centrality(g, sources=src)
    return c.select("id", F.round("centrality", 6).alias("centrality"))


def q_property_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the multi-label construction surface
    # (empty → add_vertices × 2 → add_edges, reference
    # add_labels_to_graph) + the labeled-context sssp
    e = H.g1_edges(spark, sf_dir)
    cust = e.select(F.col("src").alias("id")).distinct()
    supp = e.select(F.col("dst").alias("id")).distinct()
    g = (
        LinkGraph.empty(spark, directed=False)
        .add_vertices(cust, "customer")
        .add_vertices(supp, "supplier")
        .add_edges(e, "links")
        .build()
    )
    d = property_sssp(g, src=1)
    return d.select(
        "label",
        "id",
        F.when(F.col("distance") == float("inf"), F.lit(-1.0))
        .otherwise(F.round("distance", 6))
        .alias("distance"),
    )


def q_closeness_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the scale path: landmark sources (deterministic id % 97 == 1 —
    # the SQL-reproducible stand-in for the auto min-xxhash64 sample)
    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    src = g.vertices.where(F.col("id") % 97 == 1)
    c = closeness_centrality(g, sources=src, wf_improve=True)
    return c.select("id", F.round("centrality", 6).alias("centrality"))


def q_sssp_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    p = sssp_path(g, src=1, weight_col="w")
    return p.select("pred", "id", F.round("distance", 6).alias("distance"))


def q_bfs_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    return bfs_generic(g, src=1, output_format="tree")


def q_has_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir).build()
    ok = sssp_has_path(g, src=1, dst=2)
    return spark.createDataFrame([(bool(ok),)], "has_path boolean")


def q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed 1 level × 2 local-move cycles — deterministic (integer
    # weights ⇒ exact aggregates; all tie-breaks total orders), so the
    # oracle unrolls the identical cycles as CTEs
    g = H.g2w(spark, sf_dir).build()
    return louvain(g, weight_col="w", fixed_levels=1, fixed_iters=2)


def q_simple_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = H.g2w(spark, sf_dir)
    ok = is_simple_path(g, [1, 2, 3])
    return spark.createDataFrame([(bool(ok),)], "is_path boolean")


def q_node2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec-biased deterministic walks over undirected G1
    (p=4 -> rarely return, q=0.25 -> DFS-leaning): integer-ticket
    weighted draws, engine-exact vs the DuckDB twin."""
    from graphscope_spark.algorithms import node2vec_path

    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    return node2vec_path(g, srcs=[1, 2, 3, 4, 5], path_len=4,
                         p=4.0, q=0.25, seed=42)


def q_skipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context, offset) training pairs from the
    node2vec walk corpus on undirected G1 — the walk→embedding-training
    bridge (each walk a 'sentence', ±2 window)."""
    from graphscope_spark.algorithms import node2vec_path
    from graphscope_spark.algorithms.walks import skipgram_pairs

    g = LinkGraph.from_edges(H.g1_edges(spark, sf_dir), directed=False).build()
    walks = node2vec_path(g, srcs=[1, 2, 3, 4, 5], path_len=4,
                          p=4.0, q=0.25, seed=42)
    return skipgram_pairs(walks, window=2)


def q_sampling_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks (algorithms/walks.py): hash-draw
    neighbor selection — reproducible across engines, so fully
    hash-checkable against the DuckDB twin."""
    from graphscope_spark.algorithms import sampling_path

    g = H.g2(spark, sf_dir).build()
    return sampling_path(g, srcs=[1, 2, 3, 4, 5], path_len=4, seed=42)


def q_gremlin_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin-lite correlated where (GIE rst:206-214):
    g.V().where(__.out().count().is_(P.gte(20))) — customers with ≥20
    distinct suppliers. Compiles to a seeded agg + semi-join plan."""
    from graphscope_spark.traversal import P, __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().where(__.out().count().is_(P.gte(20))).toDF()


def q_gremlin_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V(1).repeat(__.out()).times(2).dedup() on G2 — bounded repeat
    unrolled into one two-join plan (GIE rst:340-358)."""
    from graphscope_spark.traversal import __, traversal

    g = H.g2(spark, sf_dir).build()
    t = traversal(g)
    return t.V(1).repeat(__.out()).times(2).dedup().toDF()


def q_gremlin_sack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.withSack(0.0).V(1).outE().sack(sum).by('w').inV().outE()
    .sack(sum).by('w').inV().sack() on weighted G2 — accumulated
    2-hop path weights; the sack rides the traverser row, the whole
    chain is one Catalyst plan (two edge joins + two property joins)."""
    from graphscope_spark.traversal import traversal

    g = H.g2w(spark, sf_dir)
    t = traversal(g).with_sack(0.0)
    sums = (
        t.V(1)
        .outE().sack("sum").by("w").inV()
        .outE().sack("sum").by("w").inV()
        .sack()
        .toDF()
    )
    return sums.select(F.round("val", 6).alias("wsum"))


def q_gremlin_groupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().out().groupCount() on G1 — arrivals per supplier (GIE
    aggregate steps, rst:320-330): hop join + map-side-combined agg."""
    from graphscope_spark.traversal import traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().out().groupCount().toDF()


def q_gremlin_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().group().by().by(__.out().id_().fold()) on G1 — per-vertex
    sorted out-neighbor list (GIE group().by().by(), rst:320-330):
    prefix sub-plan + ONE hash-aggregate on the key, empty keys kept
    as [] (Gremlin fold-of-empty). The driver-facing query stringifies
    the fold (array_join) — the driver's pandas canonicalizer cannot
    hash list cells; the traversal API itself returns real arrays."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return (t.V().group().by().by(__.out().id_().fold()).toDF()
            .select(F.col("key").alias("id"),
                    F.array_join(F.col("val"), ",").alias("succ")))


def q_gremlin_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().match(a→b, b→c, a→c).select(a,b,c) on sparse directed G3
    — transitive-triad pattern matching via the match() sugar (beyond
    GIE, which lists Match unsupported at rst:359-369): three hop
    patterns = three shuffle joins in one Catalyst plan."""
    from graphscope_spark.traversal import __, traversal

    g = H.g3(spark, sf_dir).build()
    t = traversal(g)
    return (t.V().match(
        __.as_("a").out().as_("b"),
        __.as_("b").out().as_("c"),
        __.as_("a").out().as_("c"),
    ).select("a", "b", "c").toDF())


def q_gremlin_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V(1).repeat(__.out().dedup()).until(__.not_(__.out())) on G1 —
    unbounded repeat with a post-condition (GIE repeat().until(),
    rst:340-358): frontier loop with checkpoint-cut rounds; elements
    whose until-predicate holds (no outgoing edges) exit the loop."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return (t.V(1).repeat(__.out().dedup())
            .until(__.not_(__.out())).dedup().toDF())


def q_filter_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL blocklist filter (web.filter_urls): drop URLs whose
    registered domain is blocked — literal-list form folds into ONE
    codegen NOT-isin filter over the extracted domain, zero shuffles.
    The DuckDB twin applies the identical host/last-two-labels rule."""
    urls = (_synth_url_edges(spark, sf_dir)
            .select(F.col("dst_url").alias("url")).distinct())
    return W.filter_urls(
        urls, ["site3.com", "site7.com", "site11.com"], url_col="url")


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style text normalization (functions/text.normalize_text):
    lower + strip punctuation/symbols + collapse whitespace, one
    codegen projection, zero shuffles; DuckDB twin uses the same
    POSIX/Unicode classes."""
    docs = H.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.normalize_text("text").alias("norm"))


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's byte-identical extraction contract, value-
    checked against an independent engine: real HTML parsing
    (pages.extract_text — <title>/<p> contents in document order,
    non-captured elements skipped) over deterministically synthesized
    pages; the DuckDB twin reconstructs the exact extracted string
    from the same arithmetic."""
    from graphscope_spark.pages import extract_text

    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    html = F.concat(
        F.lit("<html><head><title>T"), c(F.col("o_custkey") % 50),
        F.lit("</title></head><body><p>alpha "), c(F.col("o_orderkey") % 19),
        F.lit('</p><a href="u">skip me</a><p>beta '),
        c(F.col("o_orderkey") % 23),
        F.lit("</p></body></html>"),
    )
    return o.select(
        F.col("o_orderkey").alias("k"),
        extract_text(F.encode(html, "UTF-8")).alias("text"),
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container round trip value-checked cross-engine: pages
    synthesized from orders arithmetic → packed into 8 gzip-member
    WARC shards (warc.pages_to_warc) → re-parsed (warc.read_warc);
    the DuckDB twin reconstructs every (url, warc_date, html) from
    the same arithmetic, so the writer+reader must preserve each
    record byte-identically."""
    from graphscope_spark import warc as W

    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    html = F.concat(
        F.lit("<html><body><p>order "), c(F.col("o_orderkey")),
        F.lit(" cust "), c(F.col("o_custkey") % 50),
        F.lit("</p></body></html>"),
    )
    pages = o.select(
        F.concat(
            F.lit("https://shop"), c(F.col("o_custkey") % 97),
            F.lit(".example/o/"), c(F.col("o_orderkey")),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("o_orderkey") % 86400
        ).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
    )
    rec = W.read_warc(W.pages_to_warc(pages, n_shards=8))
    return rec.select(
        "url",
        "warc_date",
        F.length("html").cast("long").alias("n_bytes"),
        F.decode("html", "UTF-8").alias("html_text"),
    )


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX lookup index over real WARC shards: orders-arithmetic pages
    → 8 gzip-member shards → cdx_index. The DuckDB twin reconstructs
    (surt, url, warc_date, digest) from the same arithmetic (digest =
    md5 of the html payload — both engines hash the identical bytes
    the container round-trips). offset/length are compression-
    dependent and are verified by the ranged-fetch pytest instead."""
    from graphscope_spark import warc as W

    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    html = F.concat(
        F.lit("<html><body><p>order "), c(F.col("o_orderkey")),
        F.lit(" cust "), c(F.col("o_custkey") % 50),
        F.lit("</p></body></html>"),
    )
    pages = o.select(
        F.concat(
            F.lit("https://shop"), c(F.col("o_custkey") % 97),
            F.lit(".example/o/"), c(F.col("o_orderkey")),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("o_orderkey") % 86400
        ).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
    )
    cdx = W.cdx_index(W.pages_to_warc(pages, n_shards=8))
    return cdx.select("surt", "url", "warc_date", "digest")


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REP crawl-policy filtering through the REAL parser+matcher:
    per-host robots.txt bodies synthesized from orders arithmetic
    (hosts with c%5=0 carry a gsbot-specific block-all group; every
    host's '*' group disallows /o/<c%10> but allows the longer
    /o/<c%10><c%7>), matched for agent=gsbot. The DuckDB twin derives
    each URL's allowed bit straight from the RFC semantics over the
    same arithmetic — specific-group exclusivity, longest-prefix win,
    default-allow."""
    from graphscope_spark import web as W

    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    ck = F.col("o_custkey") % 97
    urls = o.select(
        F.concat(F.lit("https://shop"), c(ck), F.lit(".example/o/"),
                 c(F.col("o_orderkey"))).alias("url"),
    )
    hosts = o.select(ck.alias("c")).distinct()
    star = F.concat(
        F.lit("# policy\nUser-agent: *\nDisallow: /o/"), c(F.col("c") % 10),
        F.lit("\nAllow: /o/"), c(F.col("c") % 10), c(F.col("c") % 7),
        F.lit("\n"),
    )
    body = F.when(
        F.col("c") % 5 == 0,
        F.concat(F.lit("User-agent: gsbot\nDisallow: /\n\n"), star),
    ).otherwise(star)
    robots = hosts.select(
        F.concat(F.lit("shop"), c(F.col("c")), F.lit(".example")).alias("host"),
        body.alias("body"),
    )
    rules = W.parse_robots(robots)
    return W.robots_allowed(urls, rules, agent="gsbot")


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index (pages.anchor_text_index): real HTML parsing
    (Arrow-batched _AnchorExtractor, nested inline markup folded into
    the anchor text) over deterministically synthesized pages, then one
    explode + one hash aggregate per target URL. The DuckDB twin
    reconstructs each (href, text) pair from the same arithmetic — the
    parser must recover exactly what the generator embedded."""
    from graphscope_spark.pages import anchor_text_index

    o = H.load(spark, sf_dir, "orders")
    c = lambda e: e.cast("string")  # noqa: E731
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        c(F.col("o_custkey") % 20),
        F.lit(".example/p/"), c(F.col("o_orderkey") % 7),
        F.lit('">pre <b>x'), c(F.col("o_orderkey") % 13),
        F.lit('</b> post</a><p>filler</p><a href="https://cdn.site'),
        c(F.col("o_orderkey") % 25),
        F.lit('.com/a">asset '), c(F.col("o_custkey") % 5),
        F.lit("</a></body></html>"),
    )
    pages = o.select(
        F.concat(F.lit("u"), c(F.col("o_orderkey"))).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    idx = anchor_text_index(pages)
    return idx.select(
        "dst_url", "n_refs", F.array_join("texts", "|").alias("texts"))


def q_gremlin_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().coalesce(__.out(), __.in_()) on G1 — per-element first
    non-empty arm (customers emit suppliers; suppliers, having no
    out-edges, fall through to their customers). One plan: both arms
    seeded + min-arm-index pick + equi-join re-emit."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().coalesce(__.out(), __.in_()).toDF()


def q_gremlin_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V(1,2,3).union(__.out(), __.in_()) on G2 — concatenated arm
    streams with duplicates preserved (≡ both())."""
    from graphscope_spark.traversal import __, traversal

    g = H.g2(spark, sf_dir).build()
    t = traversal(g)
    return t.V(1, 2, 3).union(__.out(), __.in_()).toDF()


def q_gremlin_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().optional(__.out()) on G1 — out-neighbors where they
    exist, the vertex itself where none (suppliers pass through)."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().optional(__.out()).toDF()


def q_saveload_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """save_to/load_from round-trip value-checked (reference
    g.save_to/load_from, framework/graph.py:933-1009): build G1, save
    the partitioned+sorted layout (the sandbox's Iceberg stand-in),
    re-load it as a fresh LinkGraph, and compute out-degrees from the
    RE-LOADED graph against the direct SQL twin — the round-trip must
    lose nothing."""
    import tempfile

    from graphscope_spark.graph import LinkGraph

    g = H.g1(spark, sf_dir).build()
    path = tempfile.mkdtemp(prefix="gs_saveload_") + "/g1"
    g.save(path)
    g2 = LinkGraph.load(spark, path)
    return (g2.edges.groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("odeg")))


def q_registry_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load_app plugin registry driven end-to-end (reference
    load_app(algo, gar), framework/app.py:426-466): resolve the
    builtin 'sssp' by its reference algo name and run it through the
    App handle, against the same unrolled Bellman-Ford twin."""
    from graphscope_spark.app import load_app

    g = H.g2w(spark, sf_dir).build()
    d = load_app("sssp")(g, src=1, weight_col="w")
    return d.select(
        "id",
        F.when(F.col("distance") == float("inf"), F.lit(-1.0))
        .otherwise(F.round("distance", 6))
        .alias("distance"),
    )


def q_pregel_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pregel UDF surface driven end-to-end against the builtin
    SSSP oracle (reference @pregel SSSP, test_udf_app.py:100-123):
    the user program is four Column-expression hooks
    (init/gen_message/combine='min'/compute), so each superstep is
    one edge shuffle + a map-side-combined min-aggregate — Catalyst
    compiles user logic to codegen the way the reference transpiles
    Python to Cython."""
    from graphscope_spark.pregel import run_pregel, sssp_program

    g = H.g2w(spark, sf_dir).build()
    out = run_pregel(g, sssp_program(src=1, weight_col="w"), max_iter=50)
    return out.select(
        "id",
        F.when(F.col("value") >= float("inf"), F.lit(-1.0))
        .otherwise(F.round("value", 6))
        .alias("distance"),
    )


def q_pie_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PIE UDF surface (reference @pie, test_udf_app.py SSSP_PIE)
    driven against the same SSSP oracle: PEval seeds the source,
    IncEval relaxes the active frontier each round via the
    SuperstepRunner (checkpoint-cut, resumable)."""
    from graphscope_spark.pie import run_pie, sssp_pie

    g = H.g2w(spark, sf_dir).build()
    out = run_pie(g, sssp_pie(src=1, weight_col="w"), max_iter=50)
    return out.select(
        "id",
        F.when(F.col("distance") >= float("inf"), F.lit(-1.0))
        .otherwise(F.round("distance", 6))
        .alias("distance"),
    )


def q_gremlin_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().project('id','odeg','ideg').by().by(__.out().count())
    .by(__.in_().count()) on G1 — one named column per modulator, each
    a seeded sub-plan joined back on the element; empty sub-streams
    project count 0 (Gremlin semantics). ONE Catalyst plan."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return (t.V().project("id", "odeg", "ideg")
            .by().by(__.out().count()).by(__.in_().count()).toDF())


def q_gremlin_choose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().choose(__.out().count().is_(gte(20)), __.out(),
    __.identity()) on G1 — hubs (out-degree >= 20) expand to their
    out-neighbors, everything else passes through unchanged. The
    split is one semi/anti-join pair; both arms stay in one plan."""
    from graphscope_spark.traversal import P, __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().choose(__.out().count().is_(P.gte(20)),
                        __.out(), __.identity()).toDF()


def q_gremlin_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().order().tail(5) on G1 — last 5 vertices in id order,
    planned as a distributed top-n on the reversed order
    (TakeOrderedAndProject), never a full sort."""
    from graphscope_spark.traversal import traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().order().tail(5).toDF()


def q_gremlin_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().where(out().count() >= 20).outE().subgraph('sg').cap('sg')
    on G1 — the GIE docs' simplified Subgraph step (rst:365): extract
    the hub vertices' out-edges into a LinkGraph; the result is the
    extracted graph's deduped edge table."""
    from graphscope_spark.traversal import P, __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    sg = (t.V().where(__.out().count().is_(P.gte(20)))
          .outE().subgraph("sg").cap("sg"))
    return sg.edges.select("src", "dst")


def q_gremlin_select_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g.V().group().by().by(__.out().count()).select(values) on G1 —
    group + Column.values projection (GIE rst:310-311): the per-vertex
    out-degree multiset as value traversers, sinks contributing 0."""
    from graphscope_spark.traversal import __, traversal

    g = H.g1(spark, sf_dir).build()
    t = traversal(g)
    return t.V().group().by().by(__.out().count()).select("values").toDF()


# ----------------------------------------------------------------------
# Oracle SQL (DuckDB; tables pre-registered as views)
# ----------------------------------------------------------------------
_STOP_EN = ",".join(f"'{w}'" for w in T.STOPWORDS_EN)
_LEX_VALUES = ",".join(
    f"('{w}','{lang}')" for lang, ws in T.LANG_LEXICON.items() for w in ws
)

TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       ROUND((length(text) - len(string_split(text, ' ')) + 1.0)
             / len(string_split(text, ' ')), 6) AS avg_token_len
FROM documents
"""

TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS len,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ({_STOP_EN}))) AS DOUBLE) AS stop_hits,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS DOUBLE) AS n_tok
  FROM documents),
ratios AS (
  SELECT doc_id,
         CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END AS alpha_ratio,
         CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END AS len_ok
  FROM base)
SELECT doc_id,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND((alpha_ratio + stop_ratio + len_ok) / 3.0, 6) AS quality
FROM ratios
"""

LANG_ID_SQL = f"""
WITH lex(tok, cand) AS (VALUES {_LEX_VALUES}),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hits AS (
  SELECT t.doc_id, l.cand, COUNT(*) AS hits
  FROM toks t JOIN lex l ON l.tok = t.tok
  GROUP BY t.doc_id, l.cand),
best AS (
  SELECT doc_id, cand AS predicted_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand ASC) AS rn
  FROM hits)
SELECT d.doc_id, COALESCE(b.predicted_lang, 'und') AS predicted_lang
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.doc_id = d.doc_id
"""

FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fp,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""

REPETITION_RATIO_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT doc_id,
         len(toks) AS n,
         len(list_distinct(toks)) AS ndist,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bigs
  FROM t)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN n > 0 THEN 1.0 - ndist * 1.0 / n ELSE 0.0 END, 6)
         AS dup_token_ratio,
       ROUND(CASE WHEN len(bigs) > 0
             THEN 1.0 - len(list_distinct(bigs)) * 1.0 / len(bigs)
             ELSE 0.0 END, 6) AS dup_bigram_ratio
FROM b
"""

CORPUS_FILTER_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS len,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ({_STOP_EN}))) AS DOUBLE) AS stop_hits,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS DOUBLE) AS n_tok
  FROM documents),
qual AS (
  SELECT doc_id,
         ROUND((CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END
              + CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END
              + CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END)
               / 3.0, 6) AS quality
  FROM base),
fp AS (
  SELECT doc_id, md5(text) AS fp,
         len(string_split(text, ' ')) AS n_tok
  FROM documents),
kept AS (
  SELECT f.doc_id, f.fp, f.n_tok, q.quality
  FROM fp f JOIN qual q USING (doc_id)
  WHERE f.n_tok BETWEEN 20 AND 100000 AND q.quality >= 0.63),
first AS (SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp)
SELECT k.doc_id, k.fp, CAST(k.n_tok AS BIGINT) AS n_tokens, k.quality
FROM kept k JOIN first USING (doc_id, fp)
"""

STRATIFIED_SAMPLE_SQL = """
WITH d AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substring(md5(7 || ':' || doc_id), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents)
SELECT doc_id, lang, n_chars FROM d
WHERE (lang = 'en' AND u < 0.5)
   OR (lang = 'de' AND u < 0.25)
   OR (lang = 'zh' AND u < 0.1)
"""

ASSIGN_SPLITS_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(11 || ':' || doc_id), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM d
"""

PACK_SHARDS_SQL = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents)
SELECT doc_id, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY k, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
            // 2000 AS BIGINT) AS shard
FROM d
"""

# ranking.py tokenization: lower + split on non-alphanumeric runs,
# empties dropped — identical semantics in Java regex and RE2.
_RANK_TERMS = ("list_filter(regexp_split_to_array(lower(text), "
               "'[^a-z0-9]+'), x -> x <> '')")

TFIDF_TOP_SQL = f"""
WITH dt AS (
  SELECT doc_id, unnest({_RANK_TERMS}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM dt GROUP BY doc_id, term),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         CAST(t.tf AS DOUBLE)
           * (ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE))
              + 1.0) AS raw
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tf, raw,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY raw DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, tf, ROUND(raw, 6) AS score, rnk
FROM ranked WHERE rnk <= 3
"""

BM25_SQL = f"""
WITH dt AS (
  SELECT doc_id, unnest({_RANK_TERMS}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM dt
  WHERE term IN ('fast', 'hash', 'join', 'order')
  GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
dl AS (
  SELECT doc_id, CAST(len({_RANK_TERMS}) AS DOUBLE) AS dl
  FROM documents),
scal AS (
  SELECT COUNT(*) AS n_docs,
         AVG(CAST(len({_RANK_TERMS}) AS DOUBLE)) AS avgdl
  FROM documents),
contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(t2.df AS DOUBLE) + 0.5)
                  / (CAST(t2.df AS DOUBLE) + 0.5))
           * CAST(t.tf AS DOUBLE) * 2.2
           / (CAST(t.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS c
  FROM tf t JOIN dfreq t2 USING (term)
  JOIN dl d USING (doc_id) CROSS JOIN scal s)
SELECT doc_id, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY doc_id
"""

INVERTED_INDEX_SQL = f"""
WITH dt AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id, unnest({_RANK_TERMS}) AS term FROM documents)),
idx AS (
  SELECT term, COUNT(*) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM dt GROUP BY term)
SELECT term, df, postings FROM idx WHERE df BETWEEN 2 AND 450
"""

# lm.py twin: padded bigram extraction shared by both LM queries.
# Padding = one BOS + one EOS (n=2), so every document contributes
# len(terms)+1 prediction events — empty docs keep the single
# (<s>, </s>) event and never drop out.
_LM_GRAMS = f"""
toks AS (SELECT doc_id,
         list_concat(list_concat(['<s>'], {_RANK_TERMS}), ['</s>']) AS p
         FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(p) - 1),
                i -> struct_pack(ctx := p[i], w := p[i + 1]))) AS g
  FROM toks),
flat AS (SELECT doc_id, g.ctx AS ctx, g.w AS w FROM grams)"""

GOPHER_RULES_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
           AS words,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines,
         text
  FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         len(lines) AS n_lines,
         CASE WHEN len(words) > 0 THEN
           list_sum(list_transform(words, x -> length(x)))::DOUBLE
             / len(words) END AS mean_wl,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) / 3
           + (length(text) - length(replace(text, '…', ''))) AS symbols,
         len(list_filter(lines,
             l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS bullets,
         len(list_filter(lines,
             l -> l LIKE '%...' OR l LIKE '%…')) AS ells,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
           AS alphaw,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             s -> list_contains(list_transform(words, x -> lower(x)), s)))
           AS stops
  FROM base),
r AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         n_words BETWEEN 50 AND 100000 AS ok_words,
         n_words > 0 AND mean_wl >= 3.0 AND mean_wl <= 10.0
           AS ok_mean_word_len,
         n_words > 0 AND symbols::DOUBLE / n_words <= 0.1 AS ok_symbols,
         n_lines = 0 OR bullets::DOUBLE / n_lines <= 0.9 AS ok_bullets,
         n_lines = 0 OR ells::DOUBLE / n_lines <= 0.3 AS ok_ellipsis,
         n_words > 0 AND alphaw::DOUBLE / n_words >= 0.8 AS ok_alpha,
         stops >= 1 AS ok_stopwords
  FROM m)
SELECT *, ok_words AND ok_mean_word_len AND ok_symbols AND ok_bullets
         AND ok_ellipsis AND ok_alpha AND ok_stopwords AS keep
FROM r
"""

# C4 rules: the injection CTE mirrors q_c4_rules' in-query line
# synthesis bit for bit (5-word lines, '.' except every third line per
# doc, lorem/brace/javascript page injections on doc_id residues);
# the rule CTEs mirror functions/text.py::c4_rules.
C4_RULES_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS words
  FROM documents),
inj AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             CASE WHEN len(words) > 0
                  THEN range(0, CAST(ceil(len(words) / 5) AS INT))
                  ELSE [] END,
             i -> array_to_string(list_slice(words, i*5 + 1, i*5 + 5), ' ')
                  || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
           chr(10))
         || CASE WHEN doc_id % 17 = 0
                 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
         || CASE WHEN doc_id % 19 = 0
                 THEN chr(10) || 'const cfg = { "a": 1 };' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN chr(10) || 'please enable javascript to view this page.'
                 ELSE '' END AS text
  FROM w),
base AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS lines
  FROM inj),
scored AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines,
           l -> (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
                AND len(list_filter(regexp_split_to_array(l, '\s+'),
                                    x -> x <> '')) >= 5
                AND NOT regexp_matches(lower(l), '\bjavascript\b')) AS kept,
         NOT contains(lower(text), 'lorem ipsum') AS ok_no_bad_phrase,
         NOT contains(text, '{') AS ok_no_brace
  FROM base)
SELECT doc_id, n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       len(kept) >= 3 AS ok_lines,
       ok_no_bad_phrase, ok_no_brace,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       len(kept) >= 3 AND ok_no_bad_phrase AND ok_no_brace AS keep
FROM scored
"""

FINEWEB_SQL = f"""
WITH c AS MATERIALIZED (
  SELECT doc_id, keep AS c4_keep, clean_text FROM ({C4_RULES_SQL}) tc),
g AS MATERIALIZED (
  SELECT doc_id, keep AS gopher_keep FROM ({GOPHER_RULES_SQL}) tg),
b AS MATERIALIZED (
  SELECT d.doc_id, d.lang = 'en' AS lang_ok, g.gopher_keep, c.c4_keep,
         c.clean_text
  FROM documents d JOIN c ON c.doc_id = d.doc_id
                   JOIN g ON g.doc_id = d.doc_id),
w AS MATERIALIZED (
  SELECT md5(clean_text) AS h, MIN(doc_id) AS keep_id FROM b
  WHERE lang_ok AND gopher_keep AND c4_keep GROUP BY md5(clean_text))
SELECT b.doc_id, b.lang_ok, b.gopher_keep, b.c4_keep,
       (b.lang_ok AND b.gopher_keep AND b.c4_keep
        AND b.doc_id <> w.keep_id) AS is_dup,
       (b.lang_ok AND b.gopher_keep AND b.c4_keep
        AND b.doc_id = w.keep_id) AS keep
FROM b LEFT JOIN w ON w.h = md5(b.clean_text)"""


# ExactSubstr dedup: injection CTE mirrors q_dedup_substrings; the
# pipeline mirrors functions/dedup.py::dedup_substrings (L=8 windows,
# md5 over the space-joined window, first occurrence = min (doc_id,
# pos) per hash = ROW_NUMBER 1). DuckDB list_filter lambda indexes are
# 1-based (Spark's are 0-based), hence the i-1 shifts.
DEDUP_SUBSTRINGS_SQL = r"""
WITH w0 AS (
  SELECT doc_id, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS ow
  FROM documents),
inj AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' subscribe to our newsletter for daily updates'
                      || ' and weekly offers today' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' ' || array_to_string(list_slice(ow, 1, 8), ' ')
                 ELSE '' END AS text
  FROM w0),
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
  FROM inj),
pos0 AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w) - 8 + 1, 0))) AS pos
  FROM tok),
wins AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(w, pos + 1, pos + 8), ' ')) AS h
  FROM pos0),
mark AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY h) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM wins),
marks AS (
  SELECT doc_id, list_sort(list(pos)) AS mk, COUNT(*) AS ndw
  FROM mark WHERE cnt > 1 AND rn > 1 GROUP BY doc_id),
joined AS (
  SELECT t.doc_id, t.w, coalesce(m.mk, []) AS mk,
         coalesce(m.ndw, 0) AS ndw
  FROM tok t LEFT JOIN marks m USING (doc_id)),
kept AS (
  SELECT doc_id, w, ndw,
         list_filter(w, (x, i) ->
           len(list_filter(mk, p -> (i - 1) >= p AND (i - 1) < p + 8)) = 0)
           AS kw
  FROM joined)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(ndw AS BIGINT) AS n_dup_windows,
       CAST(len(w) - len(kw) AS BIGINT) AS n_removed_tokens,
       coalesce(array_to_string(kw, ' '), '') AS clean_text
FROM kept
"""

CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_transform({_RANK_TERMS},
                t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 4096))
           AS bucket
  FROM documents),
wts AS (
  SELECT DISTINCT bucket,
         (bucket % 1001) / 1000.0 - 0.5 AS w
  FROM toks),
per AS (
  SELECT t.doc_id, COUNT(t.bucket) AS n_tokens,
         COALESCE(SUM(w.w), 0.0) AS sw
  FROM toks t LEFT JOIN wts w USING (bucket)
  GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id,
         COALESCE(p.n_tokens, 0) AS n_tokens,
         CASE WHEN COALESCE(p.n_tokens, 0) > 0
              THEN p.sw / p.n_tokens ELSE 0.0 END AS score
  FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id)
SELECT doc_id, n_tokens, ROUND(score, 6) AS score,
       ROUND(1.0 / (1.0 + exp(-score)), 6) AS prob
FROM scored
"""

# DSIR (Xie et al. 2023): same md5 bucket rule as the classifier,
# unigram+bigram features, Laplace α=1 over B=4096 buckets. Buckets of
# raw docs are in the raw model by construction, so lr is built from
# the raw model's bucket set (left-joined to the target counts).
_DSIR_FEATS = f"""
toks AS (
  SELECT doc_id, lang,
         {_RANK_TERMS} AS t
  FROM (SELECT doc_id, lang, coalesce(text, '') AS text FROM documents)),
feats AS (
  SELECT doc_id, lang,
         list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 4096)
         || list_transform(range(1, len(t)), i ->
              ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT % 4096)
           AS f
  FROM toks),
flat AS (SELECT doc_id, lang, unnest(f) AS bucket FROM feats),
tm AS (SELECT bucket, COUNT(*) AS ct FROM flat WHERE lang = 'en' GROUP BY bucket),
rm AS (SELECT bucket, COUNT(*) AS cr FROM flat GROUP BY bucket),
lr AS (
  SELECT r.bucket,
         ln(CAST(COALESCE(t.ct, 0) AS DOUBLE) + 1.0)
           - ln((SELECT CAST(SUM(ct) AS DOUBLE) FROM tm) + 4096.0)
           - ln(CAST(r.cr AS DOUBLE) + 1.0)
           + ln((SELECT CAST(SUM(cr) AS DOUBLE) FROM rm) + 4096.0) AS lr
  FROM rm r LEFT JOIN tm t USING (bucket)),
per AS (
  SELECT f.doc_id, COUNT(f.bucket) AS n_feats, SUM(l.lr) AS logw
  FROM flat f LEFT JOIN lr l USING (bucket)
  GROUP BY f.doc_id),
scored AS (
  SELECT d.doc_id,
         COALESCE(p.n_feats, 0) AS n_feats,
         COALESCE(p.logw, 0.0) AS logw
  FROM documents d LEFT JOIN per p USING (doc_id))"""

DSIR_LOGW_SQL = f"""
WITH {_DSIR_FEATS}
SELECT doc_id, n_feats, ROUND(logw, 6) AS logw FROM scored
"""

DSIR_SAMPLE_SQL = f"""
WITH {_DSIR_FEATS},
gk AS (
  SELECT doc_id, n_feats, logw,
         logw + (-ln(-ln(greatest(
           ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0,
           1e-12)))) AS gkey
  FROM scored)
SELECT doc_id, n_feats, ROUND(logw, 6) AS logw, ROUND(gkey, 6) AS gkey
FROM gk ORDER BY gkey DESC, doc_id LIMIT 20
"""

NGRAM_LM_SQL = f"""
WITH {_LM_GRAMS}
SELECT ctx, w, COUNT(*) AS cnt FROM flat GROUP BY ctx, w
"""

NGRAM_PPL_SQL = f"""
WITH {_LM_GRAMS},
train AS (
  SELECT ctx, w, COUNT(*) AS cnt FROM flat
  WHERE doc_id % 2 = 0 GROUP BY ctx, w),
ctxtot AS (SELECT ctx, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt
           FROM train GROUP BY ctx),
v AS (SELECT CAST(COUNT(DISTINCT w) + 1 AS DOUBLE) AS v FROM train),
scored AS (
  SELECT f.doc_id,
         CASE WHEN t.cnt IS NULL THEN 1 ELSE 0 END AS oov,
         ln((CAST(COALESCE(t.cnt, 0) AS DOUBLE) + 1.0)
            / (CAST(COALESCE(c.ctx_cnt, 0) AS DOUBLE) + (SELECT v FROM v)))
           AS logp
  FROM flat f
  LEFT JOIN train t ON t.ctx = f.ctx AND t.w = f.w
  LEFT JOIN ctxtot c ON c.ctx = f.ctx)
SELECT doc_id, COUNT(*) AS n_ngrams, CAST(SUM(oov) AS BIGINT) AS n_oov,
       ROUND(SUM(logp) / COUNT(*), 6) AS avg_logprob,
       ROUND(exp(-(SUM(logp) / COUNT(*))), 6) AS ppl
FROM scored GROUP BY doc_id
"""

CCNET_BUCKETS_SQL = f"""
WITH lex(tok, cand) AS (VALUES {_LEX_VALUES}),
ltoks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
lhits AS (
  SELECT t.doc_id, l.cand, COUNT(*) AS hits
  FROM ltoks t JOIN lex l ON l.tok = t.tok
  GROUP BY t.doc_id, l.cand),
lbest AS (
  SELECT doc_id, cand AS lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand ASC) AS rn
  FROM lhits),
langs AS (
  SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang
  FROM documents d LEFT JOIN (SELECT * FROM lbest WHERE rn = 1) b
    ON b.doc_id = d.doc_id),
{_LM_GRAMS},
train AS (SELECT ctx, w, COUNT(*) AS cnt FROM flat GROUP BY ctx, w),
ctxtot AS (SELECT ctx, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt
           FROM train GROUP BY ctx),
v AS (SELECT CAST(COUNT(DISTINCT w) + 1 AS DOUBLE) AS v FROM train),
lscored AS (
  SELECT f.doc_id,
         ln((CAST(COALESCE(t.cnt, 0) AS DOUBLE) + 1.0)
            / (CAST(COALESCE(c.ctx_cnt, 0) AS DOUBLE) + (SELECT v FROM v)))
           AS logp
  FROM flat f
  LEFT JOIN train t ON t.ctx = f.ctx AND t.w = f.w
  LEFT JOIN ctxtot c ON c.ctx = f.ctx),
ppl AS (
  SELECT doc_id, ROUND(exp(-(SUM(logp) / COUNT(*))), 6) AS ppl
  FROM lscored GROUP BY doc_id),
j AS (SELECT l.doc_id, l.lang, p.ppl
      FROM langs l JOIN ppl p ON p.doc_id = l.doc_id),
r AS (
  SELECT doc_id, lang, ppl,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY ppl, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM j)
SELECT doc_id, lang, ppl,
       CASE WHEN rn * 3 <= cnt THEN 'head'
            WHEN rn * 3 <= 2 * cnt THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""

DECONTAMINATE_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(a) - 7),
                               i -> array_to_string(a[i:i+7], '|'))) AS sh
  FROM t),
b AS (
  SELECT DISTINCT sh FROM g WHERE doc_id % 10 = 0),
hits AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (sh))
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)
"""

_SHINGLES_SQL = """
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
sh_raw AS (
  SELECT doc_id,
         tok || '|' || lead(tok, 1) OVER w || '|' || lead(tok, 2) OVER w AS sh
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (SELECT DISTINCT doc_id, sh FROM sh_raw WHERE sh IS NOT NULL)
"""

NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT p.a, p.b,
       ROUND(p.common * 1.0 / (sa.sz + sb.sz - p.common), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.a
JOIN sizes sb ON sb.doc_id = p.b
WHERE ROUND(p.common * 1.0 / (sa.sz + sb.sz - p.common), 6) >= 0.2
"""

MINHASH_LSH_SQL = f"""
WITH {_SHINGLES_SQL},
seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
sig AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(mh, ',' ORDER BY seed)) AS bkey
  FROM sig GROUP BY doc_id, seed // 2)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""

# Fuzzy-dedup twin: same shingles/minhash/bands CTEs, Jaccard-verified
# candidate pairs, then duplicate clusters via RECURSIVE transitive
# closure (round-free exact components — the Spark side's WCC runs to
# convergence, so both compute the exact same clusters).
FUZZY_DEDUP_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
sig AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(mh, ',' ORDER BY seed)) AS bkey
  FROM sig GROUP BY doc_id, seed // 2),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
verified AS (
  SELECT p.a, p.b
  FROM pairs p
  JOIN cand c ON c.a = p.a AND c.b = p.b
  JOIN sizes sa ON sa.doc_id = p.a
  JOIN sizes sb ON sb.doc_id = p.b
  WHERE ROUND(p.common * 1.0 / (sa.sz + sb.sz - p.common), 6) >= 0.2),
esym AS (SELECT a AS s, b AS d FROM verified
         UNION SELECT b, a FROM verified),
reach AS (
  SELECT s, d FROM esym
  UNION
  SELECT r.s, e.d FROM reach r JOIN esym e ON r.d = e.s),
comp AS (SELECT s AS doc_id, MIN(d) AS mn FROM reach GROUP BY s)
SELECT dd.doc_id,
       LEAST(dd.doc_id, COALESCE(c.mn, dd.doc_id)) AS keep_id
FROM documents dd LEFT JOIN comp c ON c.doc_id = dd.doc_id
"""

KNN_QUANTIZED_SQL = """
WITH sc AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> abs(x))) AS s
  FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN s = 0
              THEN list_transform(e, x -> 0.0)
              ELSE list_transform(e, x -> CAST(CAST(round(x / s * 127.0)
                                               AS INT) AS DOUBLE)) END AS q
  FROM sc),
q AS (SELECT vec_id AS query_id, q AS qvec FROM qz WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, z.vec_id,
         list_cosine_similarity(q.qvec, z.q) AS cos
  FROM q JOIN qz z ON z.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored)
SELECT query_id, vec_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""

KNN_COSINE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored)
SELECT query_id, vec_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""

KNN_IVF_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec, label AS qpart
  FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q JOIN embeddings e ON e.label = q.qpart AND e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored)
SELECT query_id, vec_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3
"""

EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""

def _embedding_near_dup_lsh_sql(
    num_planes: int = 4, num_bands: int = 4, dim: int = 64, threshold: float = 0.4
) -> str:
    """SQL twin of embedding_near_dup_lsh: the md5-parity sign matrix
    (hyperplane_signs — engine-portable by construction) is embedded as
    list literals; per-band bucket = sign-bit concatenation, candidates
    share any band's bucket, exact cosine verifies."""
    from graphscope_spark.functions.similarity import hyperplane_signs

    planes = hyperplane_signs(num_bands * num_planes, dim)
    rows = ",\n    ".join(
        f"({p // num_planes}, {p % num_planes}, "
        f"[{', '.join(str(s) for s in planes[p])}]::DOUBLE[])"
        for p in range(num_bands * num_planes)
    )
    return f"""
WITH signs(band, plane, s) AS (VALUES
    {rows}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
proj AS (
  SELECT e.vec_id, sg.band, sg.plane, list_dot_product(e.v, sg.s) AS p
  FROM e CROSS JOIN signs sg),
bits AS (
  SELECT vec_id, band,
         CAST(SUM(CASE WHEN p >= 0
                  THEN CAST(POW(2, {num_planes - 1} - plane) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id, band),
cand AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM bits a JOIN bits b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT c.a, c.b, ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cos
FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
"""


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

EVENTS_SESSIONS_SQL = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM t GROUP BY user_id
"""

DEDUP_EXACT_SQL = """
SELECT md5(text) AS h, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY md5(text)
"""

# SimHash64 in pure SQL (bit-for-bit the dedup.py _simhash64_py kernel:
# token hash = first 8 bytes of md5 big-endian; acc per bit; result bit
# = acc > 0; signed int64; bucket = top 8 bits; hamming via
# bit_count(xor)). Gives the driver a real value-hash check for the
# one Python kernel in the dedup suite.
SIMHASH_PAIRS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hnum AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks),
bits AS (
  SELECT doc_id, b.i,
         SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM hnum CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) b
  GROUP BY doc_id, b.i),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 AND i < 63
             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
         + CASE WHEN MAX(CASE WHEN i = 63 AND acc > 0 THEN 1 ELSE 0 END) = 1
           THEN -9223372036854775807 - 1 ELSE 0 END AS simhash,
         CAST(SUM(CASE WHEN acc > 0 AND i >= 56
              THEN (CAST(1 AS BIGINT) << (i - 56)) ELSE 0 END) AS BIGINT) AS bucket
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 16
"""

# Streaming stateful dedup oracle: at max_hamming=0 the sequential
# keep chain = keep MIN(doc_id) per exact fingerprint; bucket = top 16
# bits (unsigned) of the same bit-exact SimHash twin as above.
SIMHASH_STREAM_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hnum AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks),
bits AS (
  SELECT doc_id, b.i,
         SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM hnum CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) b
  GROUP BY doc_id, b.i),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 AND i < 63
             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
         + CASE WHEN MAX(CASE WHEN i = 63 AND acc > 0 THEN 1 ELSE 0 END) = 1
           THEN -9223372036854775807 - 1 ELSE 0 END AS simhash,
         CAST(SUM(CASE WHEN acc > 0 AND i >= 48
              THEN (CAST(1 AS BIGINT) << (i - 48)) ELSE 0 END) AS BIGINT) AS bucket
  FROM bits GROUP BY doc_id)
SELECT bucket, MIN(doc_id) AS doc_id, simhash
FROM sh GROUP BY bucket, simhash
"""


# ----------------------------------------------------------------------
# Contract entry points
# ----------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank (NetworkX semantics, to convergence) over the
    customer→supplier link graph at sf0.001, top-ranked vertices."""
    sf_dir = "/root/testdata/sf0.001"
    g = H.g1(spark, sf_dir).build()
    pr = pagerank(g, alpha=0.85, tol=1e-6, max_iter=50)
    return pr.orderBy(F.desc("rank"), F.asc("id")).limit(20).select(
        "id", F.round("rank", 6).alias("rank")
    )


# Gremlin-lite traversals (graphscope_spark/traversal.py) — relational
# twins of the step chains
GREMLIN_HUBS_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL})
SELECT src AS id FROM e GROUP BY src HAVING COUNT(*) >= 20
"""

GREMLIN_2HOP_SQL = f"""
WITH e AS MATERIALIZED ({H.G2_SQL})
SELECT DISTINCT b.dst AS id FROM e a JOIN e b ON a.dst = b.src WHERE a.src = 1
"""

GREMLIN_GROUPCOUNT_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL})
SELECT dst AS key, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY dst
"""

GREMLIN_GROUP_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
folded AS (SELECT src AS id,
           string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS succ
           FROM e GROUP BY src)
SELECT v.id, COALESCE(f.succ, '') AS succ
FROM verts v LEFT JOIN folded f ON f.id = v.id
"""

CLUSTERING_W_SQL = f"""
WITH e0 AS MATERIALIZED ({H.G2W_SQL}),
mx AS (SELECT MAX(w) AS m FROM e0),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c,
         e1.w AS wab, e2.w AS wbc, e3.w AS wac
  FROM e0 e1
  JOIN e0 e2 ON e2.src = e1.dst
  JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (
  SELECT a AS id, wab, wbc, wac FROM tri
  UNION ALL SELECT b, wab, wbc, wac FROM tri
  UNION ALL SELECT c, wab, wbc, wac FROM tri),
tsum AS (
  SELECT id,
         SUM(cbrt((wab / (SELECT m FROM mx))
                  * (wbc / (SELECT m FROM mx))
                  * (wac / (SELECT m FROM mx)))) AS ts
  FROM corners GROUP BY id),
sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
verts AS (SELECT DISTINCT src AS id FROM sym)
SELECT v.id,
       ROUND(CASE WHEN d.d >= 2 AND t.ts IS NOT NULL
                  THEN 2.0 * t.ts / (d.d * (d.d - 1)) ELSE 0.0 END,
             6) AS clustering
FROM verts v JOIN deg d ON d.id = v.id
LEFT JOIN tsum t ON t.id = v.id
"""

SQUARE_CLUSTERING_SQL = f"""
WITH g AS MATERIALIZED ({H.G3_SQL}),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM g WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
wedges AS MATERIALIZED (
  SELECT l.src AS v, l.dst AS u, r.dst AS w
  FROM sym l JOIN sym r ON r.src = l.src AND l.dst < r.dst),
cn AS MATERIALIZED (SELECT u, w, COUNT(*) AS cn FROM wedges GROUP BY u, w),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
pp AS (
  SELECT wd.v, c.cn - 1 AS sq,
         c.cn + CASE WHEN a.src IS NOT NULL THEN 1 ELSE 0 END AS degm,
         du.d AS ku, dw.d AS kw
  FROM wedges wd
  JOIN cn c ON c.u = wd.u AND c.w = wd.w
  LEFT JOIN e a ON a.src = wd.u AND a.dst = wd.w
  JOIN deg du ON du.id = wd.u
  JOIN deg dw ON dw.id = wd.w),
st AS (
  SELECT v, SUM(sq) AS squares,
         SUM(sq + (ku - degm) + (kw - degm)) AS pot
  FROM pp GROUP BY v)
SELECT d.id,
       ROUND(CASE WHEN st.pot > 0 THEN st.squares * 1.0 / st.pot
                  ELSE 0.0 END, 6) AS clustering
FROM deg d LEFT JOIN st ON st.v = d.id
"""

GENERALIZED_DEGREE_SQL = f"""
WITH g AS MATERIALIZED ({H.G3_SQL}),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM g WHERE src <> dst),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
etri AS (
  SELECT src, dst, COUNT(*) AS t FROM (
    SELECT a AS src, b AS dst FROM tri
    UNION ALL SELECT b, c FROM tri
    UNION ALL SELECT a, c FROM tri)
  GROUP BY src, dst),
et AS (
  SELECT e.src, e.dst, COALESCE(x.t, 0) AS t
  FROM e LEFT JOIN etri x ON x.src = e.src AND x.dst = e.dst)
SELECT id, t, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT src AS id, t FROM et UNION ALL SELECT dst, t FROM et)
GROUP BY id, t
"""

GREMLIN_MATCH_SQL = f"""
WITH e AS MATERIALIZED ({H.G3_SQL})
SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
FROM e e1
JOIN e e2 ON e2.src = e1.dst
JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""

GREMLIN_UNTIL_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL})
SELECT DISTINCT dst AS id FROM e WHERE src = 1
"""

NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(
            regexp_replace(lower(text), '[\p{P}\p{S}]', '', 'g'),
            '\s+', ' ', 'g')) AS norm
FROM documents
"""

EXTRACT_TEXT_SQL = """
SELECT o_orderkey AS k,
       'T' || (o_custkey % 50) || chr(10) ||
       'alpha ' || (o_orderkey % 19) || chr(10) ||
       'beta ' || (o_orderkey % 23) AS text
FROM orders
"""

WARC_ROUNDTRIP_SQL = """
WITH p AS (
  SELECT 'https://shop' || (o_custkey % 97) || '.example/o/' || o_orderkey AS url,
         strftime(TIMESTAMP '2024-01-01 00:00:00'
                  + (o_orderkey % 86400) * INTERVAL 1 SECOND,
                  '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
         '<html><body><p>order ' || o_orderkey || ' cust '
           || (o_custkey % 50) || '</p></body></html>' AS html_text
  FROM orders)
SELECT url, warc_date, CAST(length(html_text) AS BIGINT) AS n_bytes, html_text
FROM p
"""

CDX_INDEX_SQL = """
WITH p AS (
  SELECT o_custkey % 97 AS c, o_orderkey AS k,
         '<html><body><p>order ' || o_orderkey || ' cust '
           || (o_custkey % 50) || '</p></body></html>' AS html_text
  FROM orders)
SELECT 'example,shop' || c || ')/o/' || k AS surt,
       'https://shop' || c || '.example/o/' || k AS url,
       strftime(TIMESTAMP '2024-01-01 00:00:00'
                + (k % 86400) * INTERVAL 1 SECOND,
                '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
       md5(html_text) AS digest
FROM p
"""

SAGE_FEATURES_SQL = f"""
WITH g AS MATERIALIZED ({H.G1_SQL}),
e AS MATERIALIZED (
  SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
v AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
feat AS MATERIALIZED (
  SELECT v.id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
         v.id % 10 AS idmod
  FROM v LEFT JOIN deg d ON d.id = v.id),
roots AS (SELECT id AS root FROM v WHERE id % 31 = 1),
h0 AS (
  SELECT root, e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY root, e.src ORDER BY
           md5('42:' || CAST(root AS VARCHAR) || ':0:'
               || CAST(e.src AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)))
           AS rn
  FROM roots JOIN e ON e.src = root),
s0 AS (SELECT root, src, dst FROM h0 WHERE rn <= 3),
f1 AS (SELECT DISTINCT root, dst AS node FROM s0),
h1 AS (
  SELECT f1.root, e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY f1.root, e.src ORDER BY
           md5('42:' || CAST(f1.root AS VARCHAR) || ':1:'
               || CAST(e.src AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)))
           AS rn
  FROM f1 JOIN e ON e.src = f1.node),
s1 AS (SELECT root, src, dst FROM h1 WHERE rn <= 2),
p0 AS (
  SELECT root, SUM(f.deg) * 1.0 / COUNT(*) AS m_deg,
         SUM(f.idmod) * 1.0 / COUNT(*) AS m_idmod
  FROM s0 JOIN feat f ON f.id = s0.dst GROUP BY root),
p1 AS (
  SELECT root, SUM(f.deg) * 1.0 / COUNT(*) AS m_deg,
         SUM(f.idmod) * 1.0 / COUNT(*) AS m_idmod
  FROM s1 JOIN feat f ON f.id = s1.dst GROUP BY root)
SELECT r.root,
       CAST(f.deg AS DOUBLE) AS self_deg,
       CAST(f.idmod AS DOUBLE) AS self_idmod,
       COALESCE(p0.m_deg, 0.0) AS h1_mean_deg,
       COALESCE(p0.m_idmod, 0.0) AS h1_mean_idmod,
       COALESCE(p1.m_deg, 0.0) AS h2_mean_deg,
       COALESCE(p1.m_idmod, 0.0) AS h2_mean_idmod
FROM roots r
JOIN feat f ON f.id = r.root
LEFT JOIN p0 ON p0.root = r.root
LEFT JOIN p1 ON p1.root = r.root
"""

NEIGHBOR_SAMPLE_SQL = f"""
WITH e AS MATERIALIZED ({H.G2_SQL}),
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
roots AS (SELECT id AS root FROM v WHERE id % 7 = 1),
h0 AS (
  SELECT root, e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY root, e.src ORDER BY
           md5('42:' || CAST(root AS VARCHAR) || ':0:'
               || CAST(e.src AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)))
           AS rn
  FROM roots JOIN e ON e.src = root),
s0 AS (SELECT root, src, dst FROM h0 WHERE rn <= 3),
f1 AS (SELECT DISTINCT root, dst AS node FROM s0),
h1 AS (
  SELECT f1.root, e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY f1.root, e.src ORDER BY
           md5('42:' || CAST(f1.root AS VARCHAR) || ':1:'
               || CAST(e.src AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)))
           AS rn
  FROM f1 JOIN e ON e.src = f1.node),
s1 AS (SELECT root, src, dst FROM h1 WHERE rn <= 2)
SELECT root, 0 AS hop, src, dst FROM s0
UNION ALL
SELECT root, 1 AS hop, src, dst FROM s1
"""

ROBOTS_FILTER_SQL = """
WITH p AS (
  SELECT o_custkey % 97 AS c, CAST(o_orderkey AS VARCHAR) AS ks
  FROM orders)
SELECT 'https://shop' || c || '.example/o/' || ks AS url,
       'shop' || c || '.example' AS host,
       '/o/' || ks AS path,
       CASE WHEN c % 5 = 0 THEN false
            WHEN starts_with(ks, CAST(c % 10 AS VARCHAR)
                                 || CAST(c % 7 AS VARCHAR)) THEN true
            WHEN starts_with(ks, CAST(c % 10 AS VARCHAR)) THEN false
            ELSE true END AS allowed
FROM p
"""

ANCHOR_TEXTS_SQL = """
WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
a AS (
  SELECT 'https://site' || (o_custkey % 20) || '.example/p/'
           || (o_orderkey % 7) AS dst_url,
         'pre x' || (o_orderkey % 13) || ' post' AS text
  FROM o
  UNION ALL
  SELECT 'https://cdn.site' || (o_orderkey % 25) || '.com/a',
         'asset ' || (o_custkey % 5)
  FROM o
)
SELECT dst_url, CAST(COUNT(*) AS BIGINT) AS n_refs,
       array_to_string(list_sort(list(DISTINCT text)), '|') AS texts
FROM a GROUP BY dst_url
"""

GREMLIN_COALESCE_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
haso AS (SELECT DISTINCT src FROM e),
outs AS (SELECT dst AS id FROM e),
ins AS (SELECT e.src AS id FROM e
        WHERE e.dst NOT IN (SELECT src FROM haso))
SELECT id FROM outs UNION ALL SELECT id FROM ins
"""

GREMLIN_UNION_SQL = f"""
WITH e AS MATERIALIZED ({H.G2_SQL})
SELECT dst AS id FROM e WHERE src IN (1, 2, 3)
UNION ALL
SELECT src AS id FROM e WHERE dst IN (1, 2, 3)
"""

GREMLIN_OPTIONAL_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
SELECT dst AS id FROM e
UNION ALL
SELECT id FROM verts WHERE id NOT IN (SELECT src FROM e)
"""

SAVELOAD_DEGREES_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL})
SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS odeg FROM e GROUP BY src
"""

GREMLIN_PROJECT_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
od AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src),
idg AS (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst)
SELECT v.id, CAST(COALESCE(od.c, 0) AS BIGINT) AS odeg,
       CAST(COALESCE(idg.c, 0) AS BIGINT) AS ideg
FROM verts v LEFT JOIN od ON od.id = v.id LEFT JOIN idg ON idg.id = v.id
"""

GREMLIN_CHOOSE_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
hubs AS (SELECT src FROM e GROUP BY src HAVING COUNT(*) >= 20)
SELECT e.dst AS id FROM e WHERE e.src IN (SELECT src FROM hubs)
UNION ALL
SELECT id FROM verts WHERE id NOT IN (SELECT src FROM hubs)
"""

GREMLIN_TAIL_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
SELECT id FROM verts ORDER BY id DESC LIMIT 5
"""

GREMLIN_SUBGRAPH_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
hubs AS (SELECT src FROM e GROUP BY src HAVING COUNT(*) >= 20)
SELECT DISTINCT e.src, e.dst FROM e JOIN hubs h ON e.src = h.src
"""

GREMLIN_SELECT_VALUES_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
deg AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src)
SELECT CAST(COALESCE(d.c, 0) AS BIGINT) AS val
FROM verts v LEFT JOIN deg d ON d.id = v.id
"""


GREMLIN_SACK_SQL = f"""
WITH e AS ({H.G2W_SQL})
SELECT ROUND(e1.w + e2.w, 6) AS wsum
FROM e e1 JOIN e e2 ON e2.src = e1.dst
WHERE e1.src = 1
"""


# URL kernels (web.py twin): same regex, same rule order.
_URL_RE_SQL = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
_TRACKING_RE_SQL = "^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"

_SYNTH_URLS_SQL = """
SELECT 'HTTP://WWW.Site' || CAST(o_custkey % 20 AS VARCHAR)
       || '.COM:80/page/' || CAST(o_orderkey % 11 AS VARCHAR)
       || '/?utm_source=x&q=' || CAST(o_orderkey % 3 AS VARCHAR)
       || '#frag' AS src_url,
       'https://cdn.site' || CAST(o_orderkey % 25 AS VARCHAR)
       || '.com:443/asset/' || CAST(o_custkey % 5 AS VARCHAR) AS dst_url
FROM orders
"""

FILTER_URLS_SQL = f"""
WITH e AS ({_SYNTH_URLS_SQL}),
u AS (SELECT DISTINCT dst_url AS url FROM e),
h AS (SELECT url,
        regexp_replace(lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),
                       ':[0-9]+$', '') AS host
      FROM u),
d AS (SELECT url, host, string_split(host, '.') AS labels FROM h)
SELECT url FROM d
WHERE (CASE WHEN len(labels) >= 2
            THEN array_to_string(list_slice(labels, len(labels) - 1,
                                            len(labels)), '.')
            ELSE host END)
      NOT IN ('site3.com', 'site7.com', 'site11.com')
"""

CRAWL_FRONTIER_SQL = f"""
WITH e AS ({_SYNTH_URLS_SQL}),
u AS (SELECT DISTINCT src_url AS url FROM e),
h AS (SELECT url,
        regexp_replace(lower(regexp_extract(url, '{_URL_RE_SQL}', 2)),
                       ':[0-9]+$', '') AS host,
        ('0x' || substr(md5('crawl|' || url), 1, 15))::BIGINT AS pri
      FROM u),
s AS (SELECT url, host,
        ROW_NUMBER() OVER (PARTITION BY host ORDER BY pri, url) - 1 AS slot
      FROM h WHERE host <> '')
SELECT url, host, CAST(slot AS BIGINT) AS slot,
       CAST(slot * 2.0 AS DOUBLE) AS fetch_at
FROM s WHERE slot < 50"""

PARTITION_QUALITY_SQL = f"""
WITH e AS MATERIALIZED ({H.G1_SQL}),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
a AS (SELECT id, id % 8 AS part FROM verts),
t AS (SELECT e.src, e.dst, s.part AS sp, d.part AS dp
      FROM e JOIN a s ON s.id = e.src JOIN a d ON d.id = e.dst),
cut AS (SELECT COUNT(*) AS num_edges,
               COALESCE(SUM(CASE WHEN sp <> dp THEN 1 ELSE 0 END), 0) AS cut_edges
        FROM t),
loads AS (SELECT part, COUNT(*) AS load FROM a GROUP BY part),
bal AS (SELECT CAST(MAX(load) AS DOUBLE) / AVG(load) AS balance FROM loads),
gh AS (SELECT COUNT(*) AS ghost_vertices
       FROM (SELECT DISTINCT src, dp FROM t WHERE sp <> dp)),
np AS (SELECT COUNT(DISTINCT part) AS num_parts FROM a)
SELECT np.num_parts, cut.num_edges, cut.cut_edges,
       ROUND(CASE WHEN cut.num_edges > 0
                  THEN CAST(cut.cut_edges AS DOUBLE) / cut.num_edges
                  ELSE 0.0 END, 6) AS edge_cut_frac,
       ROUND(bal.balance, 6) AS balance, gh.ghost_vertices
FROM np, cut, bal, gh"""

URL_CANONICAL_SQL = f"""
WITH e AS ({_SYNTH_URLS_SQL}),
u AS (SELECT DISTINCT src_url AS url FROM e),
p AS (
  SELECT url,
         lower(regexp_extract(url, '{_URL_RE_SQL}', 1)) AS scheme,
         lower(regexp_extract(url, '{_URL_RE_SQL}', 2)) AS auth,
         regexp_extract(url, '{_URL_RE_SQL}', 3) AS path0,
         regexp_extract(url, '{_URL_RE_SQL}', 4) AS query
  FROM u),
r AS (
  SELECT url, scheme, auth,
         CASE WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$',  '')
              WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              ELSE auth END AS chost,
         CASE WHEN length(path0) > 1 THEN regexp_replace(path0, '/$', '')
              ELSE path0 END AS path,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE_SQL}'))),
             '&') AS qs,
         regexp_replace(auth, ':[0-9]+$', '') AS host
  FROM p),
d AS (
  SELECT url, scheme, chost, path, qs, host,
         string_split(host, '.') AS labels
  FROM r)
SELECT url,
       CASE WHEN scheme = '' THEN url
            ELSE scheme || '://' || chost || path ||
                 (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END)
       END AS canon,
       host,
       CASE WHEN len(labels) >= 2
            THEN array_to_string(list_slice(labels, len(labels) - 1,
                                            len(labels)), '.')
            ELSE host END AS domain,
       array_to_string(list_reverse(labels), '.') AS rhost
FROM d
"""

HOST_GRAPH_SQL = f"""
WITH e AS ({_SYNTH_URLS_SQL}),
h AS (
  SELECT regexp_replace(lower(regexp_extract(src_url, '{_URL_RE_SQL}', 2)),
                        ':[0-9]+$', '') AS sh,
         regexp_replace(lower(regexp_extract(dst_url, '{_URL_RE_SQL}', 2)),
                        ':[0-9]+$', '') AS dh
  FROM e),
d AS (
  SELECT CASE WHEN len(string_split(sh, '.')) >= 2
              THEN array_to_string(list_slice(string_split(sh, '.'),
                   len(string_split(sh, '.')) - 1,
                   len(string_split(sh, '.'))), '.')
              ELSE sh END AS src_host,
         CASE WHEN len(string_split(dh, '.')) >= 2
              THEN array_to_string(list_slice(string_split(dh, '.'),
                   len(string_split(dh, '.')) - 1,
                   len(string_split(dh, '.'))), '.')
              ELSE dh END AS dst_host
  FROM h
  WHERE sh <> '' AND dh <> '')
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM d
WHERE src_host <> dst_host
GROUP BY src_host, dst_host
"""

DEDUP_LINES_SQL = """
WITH lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS line
  FROM documents),
ranked AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines),
reasm AS (
  SELECT doc_id,
         string_agg(line, ' ' ORDER BY pos) AS text,
         CAST(COUNT(*) AS BIGINT) AS lines_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(r.text, '') AS text,
       COALESCE(r.lines_kept, 0) AS lines_kept,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS lines_orig
FROM documents d LEFT JOIN reasm r ON r.doc_id = d.doc_id
"""


# Host-string edge list for the host_pagerank oracle: same synth URLs,
# same host extraction, DISTINCT pairs (host_graph emits one row per
# pair), self-links dropped.
HOST_EDGES_SQL = f"""
SELECT DISTINCT
  regexp_replace(lower(regexp_extract(src_url, '{_URL_RE_SQL}', 2)),
                 ':[0-9]+$', '') AS src,
  regexp_replace(lower(regexp_extract(dst_url, '{_URL_RE_SQL}', 2)),
                 ':[0-9]+$', '') AS dst
FROM ({_SYNTH_URLS_SQL})
WHERE src <> '' AND dst <> '' AND src <> dst
"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
_PII_PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

PII_REDACT_SQL = f"""
WITH d AS (
  SELECT doc_id,
         text || ' user' || CAST(doc_id AS VARCHAR) || '@ex.org ip 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST(doc_id % 100 AS VARCHAR)
              || ' tel 555-000-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents),
e1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS text
  FROM d),
e2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips,
         regexp_replace(text, '{_PII_IP}', '<IP>', 'g') AS text
  FROM e1),
e3 AS (
  SELECT doc_id, n_emails, n_ips,
         CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(text, '{_PII_PHONE}', '<PHONE>', 'g') AS text
  FROM e2)
SELECT doc_id, text, n_emails, n_ips, n_phones FROM e3
"""

REMOVE_BOILERPLATE_SQL = """
WITH lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS line
  FROM documents),
rare AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) <= 5),
reasm AS (
  SELECT l.doc_id,
         string_agg(l.line, ' ' ORDER BY l.pos) AS text,
         CAST(COUNT(*) AS BIGINT) AS lines_kept
  FROM lines l JOIN rare r ON r.line = l.line
  GROUP BY l.doc_id)
SELECT d.doc_id,
       COALESCE(r.text, '') AS text,
       COALESCE(r.lines_kept, 0) AS lines_kept,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS lines_orig
FROM documents d LEFT JOIN reasm r ON r.doc_id = d.doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_g1_r5": q_pagerank,
        "pagerank_pers_g1_r5": q_pagerank_personalized,
        "scc_g3": q_scc,
        "bowtie_g4": q_bowtie,
        "salsa_g3_r5": q_salsa,
        "ktruss_g4_k12": q_ktruss,
        "bipartite_comps_g4": q_bipartite,
        "kmeans_vec8": q_kmeans,
        "semantic_dedup": q_semantic_dedup,
        "cocitation_g1": q_cocitation,
        "reciprocity_g3": q_reciprocity,
        "condensation_g4": q_condensation,
        "spam_mass_g1_r5": q_spam_mass,
        "pagerank_w_g2w_r5": q_pagerank_weighted,
        "wcc_g1_r8": q_wcc,
        "cc_twophase_g1": q_cc_twophase,
        "component_stats_g1": q_component_stats,
        "ppr_batch_g1_r5": q_ppr_batch,
        "bloom_seen": q_bloom_seen,
        "crawl_frontier": q_crawl_frontier,
        "partition_quality_g1": q_partition_quality,
        "quotient_shards_g1": q_quotient_g1,
        "label_spreading_g1_r5": q_label_spreading,
        "rmat_s10": q_rmat,
        "keep_best_docs": q_keep_best,
        "fineweb_filter": q_fineweb,
        "embedding_cov64": q_embedding_cov,
        "cdlp_g2_r5": q_cdlp,
        "triangles_g2": q_triangles,
        "degree_centrality_g1": q_degree_centrality,
        "assortativity_g2": q_assortativity,
        "kcore_g2_k20": q_kcore,
        "graph_report_g1": q_graph_report,
        "node_boundary_g1": q_node_boundary,
        "induced_subgraph_g1": q_induced_subgraph,
        "dedup_exact": q_dedup_exact,
        "fuzzy_dedup": q_fuzzy_dedup,
        "token_stats": q_token_stats,
        "corpus_filter": q_corpus_filter,
        "pack_shards": q_pack_shards,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bm25": q_bm25,
        "inverted_index": q_inverted_index,
        "ngram_lm_bigram": q_ngram_lm,
        "quality_classifier": q_classifier,
        "dsir_logw": q_dsir_logw,
        "dsir_sample": q_dsir_sample,
        "gopher_rules": q_gopher_rules,
        "c4_rules": q_c4_rules,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "dedup_substrings": q_dedup_substrings,
        "ccnet_buckets": q_ccnet_buckets,
        "ngram_ppl_bigram": q_ngram_ppl,
        "decontaminate": q_decontaminate,
        "stratified_sample": q_stratified_sample,
        "assign_splits": q_assign_splits,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "knn_cosine": q_knn_cosine,
        "knn_quantized": q_knn_quantized,
        "knn_ivf_label": q_knn_ivf,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "events_hourly_stream": q_events_hourly_stream,
        "events_sessions": q_events_sessions,
        "simhash_pairs": q_simhash_pairs,
        "simhash_stream_dedup": q_simhash_stream_dedup,
        "pages_pipeline": q_pages_pipeline,
        "bfs_g2_src1": q_bfs,
        "sssp_g2w_src1": q_sssp,
        "hits_g1_r5": q_hits,
        "katz_g2_r5": q_katz,
        "eigenvector_g2_r5": q_eigenvector,
        "lpa_g2w_r5": q_lpa,
        "clustering_g2": q_clustering,
        "is_simple_path_g2": q_simple_path,
        "closeness_g2": q_closeness,
        "apsp_g2": q_apsp,
        "betweenness_g1_s97": q_betweenness,
        "betweenness_w_g2w": q_betweenness_weighted,
        "edge_betweenness_w_g2w": q_edge_betweenness_weighted,
        "harmonic_g1_s97": q_harmonic,
        "louvain_g2w_l1_i2": q_louvain,
        "sssp_path_g2w_src1": q_sssp_path,
        "closeness_g1_landmarks": q_closeness_landmarks,
        "multimodal_features": q_multimodal,
        "image_near_dup": q_image_near_dup,
        "property_sssp_g1": q_property_sssp,
        "gremlin_group_g1": q_gremlin_group,
        "gremlin_until_g1": q_gremlin_until,
        "gremlin_match_g3": q_gremlin_match,
        "filter_urls": q_filter_urls,
        "normalize_text": q_normalize_text,
        "extract_text_synth": q_extract_text,
        "anchor_texts": q_anchor_texts,
        "warc_roundtrip": q_warc_roundtrip,
        "cdx_index": q_cdx_index,
        "robots_filter": q_robots_filter,
        "neighbor_sample_g2": q_neighbor_sample,
        "sage_features_g1": q_sage_features,
        "saveload_degrees_g1": q_saveload_degrees,
        "registry_sssp_g2w": q_registry_sssp,
        "pregel_sssp_g2w": q_pregel_sssp,
        "pie_sssp_g2w": q_pie_sssp,
        "gremlin_choose_g1": q_gremlin_choose,
        "gremlin_sack_g2w": q_gremlin_sack,
        "sampling_path_g2": q_sampling_path,
        "node2vec_g1": q_node2vec,
        "skipgram_g1": q_skipgram,
        "core_numbers_g1": q_core_numbers,
        "k_corona_g1": q_k_corona,
        "community_lp_g1": q_community_lp,
        "wiener_g2": q_wiener,
        "topo_generations_dagk": q_topo_generations,
        "simrank_g4m5_r3": q_simrank,
        "dag_longest_dagk": q_dag_longest,
        "mis_g2_r3": q_mis,
        "coloring_g2_r4": q_coloring,
        "butterfly_stats_g1": q_butterfly_stats,
        "modularity_cdlp_g2": q_modularity_cdlp,
        "diameter_g2": q_diameter,
        "msf_weight_g2w": q_msf_weight,
        "single_linkage_g2w": q_single_linkage,
        "annd_g2": q_annd,
        "degree_connectivity_g2": q_degree_connectivity,
        "rich_club_g2": q_rich_club,
        "clustering_w_g2w": q_clustering_weighted,
        "square_clustering_g3": q_square_clustering,
        "generalized_degree_g3": q_generalized_degree,
        "graph_extremes_g2": q_graph_extremes,
        "powerlaw_alpha_g1": q_powerlaw_alpha,
        "anf_nf_g1_r4": q_anf_nf,
        "hyperball_harmonic_g1": q_hyperball_harmonic,
        "dfs_g1_src1": q_dfs,
        "link_prediction_g1": q_link_prediction,
        "url_canonical": q_url_canonical,
        "host_graph_domains": q_host_graph,
        "dedup_lines": q_dedup_lines,
        "pii_redact": q_pii_redact,
        "remove_boilerplate": q_remove_boilerplate,
        "host_pagerank": q_host_pagerank,
    }


def extended_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Near-duplicate / derived-operator queries RETIRED from the
    driver-facing surface (round-3 verdict item 7: the driver samples
    only 50 of queries(), so redundant rows dilute what the sample
    verifies). Every entry here exercises machinery that a remaining
    queries() row or a pytest still covers (e.g. the 10 retired
    gremlin steps share the traversal join machinery with the 4 kept
    ones and keep their 42 pytests; kshell derives from kcore;
    overall_reciprocity is an aggregate of reciprocity). They remain
    registered so `tools/check_oracles.py` sweeps them with identical
    oracles every session — retirement changes the driver sample
    density, not local verification coverage."""
    return {
        "bibcoupling_g3": q_bibcoupling,
        "k_crust_g1": q_k_crust,
        "global_efficiency_g2": q_global_efficiency,
        "transitivity_g2": q_transitivity,
        "overall_reciprocity_g3": q_overall_reciprocity,
        "trustrank_g1_r5": q_trustrank,
        "repetition_ratio": q_repetition_ratio,
        "text_quality": q_text_quality,
        "minhash_lsh": q_minhash_lsh,
        "embedding_near_dup": q_embedding_near_dup,
        "events_hourly": q_events_hourly,
        "sssp_avg_len_g2w": q_sssp_avg,
        "kshell_g1_k12": q_kshell,
        "avg_clustering_g2": q_avg_clustering,
        "degrees_g1": q_degrees,
        "edge_boundary_g1": q_edge_boundary,
        "bfs_tree_g2_src1": q_bfs_tree,
        "has_path_g2_1_2": q_has_path,
        "gremlin_hubs_g1": q_gremlin_hubs,
        "gremlin_2hop_g2": q_gremlin_2hop,
        "gremlin_groupcount_g1": q_gremlin_groupcount,
        "gremlin_coalesce_g1": q_gremlin_coalesce,
        "gremlin_project_g1": q_gremlin_project,
        "gremlin_tail_g1": q_gremlin_tail,
        "gremlin_union_g2": q_gremlin_union,
        "gremlin_optional_g1": q_gremlin_optional,
        "gremlin_subgraph_g1": q_gremlin_subgraph,
        "gremlin_select_values_g1": q_gremlin_select_values,
        "butterflies_g1": q_butterflies,
        "msf_g2w_r2": q_msf,
        "eccentricity_g2": q_eccentricity,
        "degree_histogram_g1": q_degree_histogram,
        "anf_balls_g1_r2": q_anf_balls,
        "distance_stats_g1": q_distance_stats,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for the driver-facing queries() surface AND the
    retired extended_queries() registry (tools/check_oracles.py sweeps
    both with identical twins; the driver only reads keys present in
    queries()). The filter keeps the contract free of truly orphaned
    keys."""
    registered = set(queries()) | set(extended_queries())
    d = _oracle_sql_all()
    return {k: v for k, v in d.items() if k in registered}


def _oracle_sql_all() -> dict[str, str]:
    return {
        "pagerank_g1_r5": H.pagerank_sql(5),
        "pagerank_pers_g1_r5": H.pagerank_personalized_sql(5),
        "scc_g3": H.scc_sql(),
        "bowtie_g4": H.bowtie_sql(H.G4_SQL),
        "salsa_g3_r5": H.salsa_sql(5),
        "ktruss_g4_k12": H.ktruss_sql(12, 4),
        "bipartite_comps_g4": H.bipartite_sql(),
        "kmeans_vec8": H.kmeans_sql(8, 2),
        "semantic_dedup": H.semantic_dedup_sql(8, 2, 0.35),
        "cocitation_g1": H.cocitation_sql(150),
        "bibcoupling_g3": H.cocitation_sql(3, H.G3_SQL, coupling=True),
        "reciprocity_g3": H.reciprocity_sql(),
        "overall_reciprocity_g3": H.overall_reciprocity_sql(),
        "condensation_g4": H.condensation_sql(),
        "trustrank_g1_r5": H.trustrank_sql(5),
        "spam_mass_g1_r5": H.spam_mass_sql(5),
        "pagerank_w_g2w_r5": H.pagerank_weighted_sql(5),
        "wcc_g1_r8": H.wcc_sql(8),
        "cc_twophase_g1": H.cc_closure_sql(),
        "component_stats_g1": f"""
WITH comps AS MATERIALIZED ({H.cc_closure_sql()}),
sizes AS (SELECT comp, COUNT(*) AS size FROM comps GROUP BY comp),
hist AS (SELECT size, COUNT(*) AS n_components FROM sizes GROUP BY size),
tot AS (SELECT COUNT(*) AS n FROM comps)
SELECT h.size, h.n_components, h.size * h.n_components AS n_vertices,
       ROUND(CAST(h.size * h.n_components AS DOUBLE) / tot.n, 6)
         AS frac_vertices
FROM hist h, tot""",
        "ppr_batch_g1_r5": H.ppr_batch_sql(5, 4),
        "bloom_seen": H.bloom_seen_sql(4096, 4),
        "crawl_frontier": CRAWL_FRONTIER_SQL,
        "partition_quality_g1": PARTITION_QUALITY_SQL,
        "label_spreading_g1_r5": H.label_spreading_sql(5, 4),
        "rmat_s10": _rmat_sql(10, 8),
        "fineweb_filter": FINEWEB_SQL,
        "embedding_cov64": """
WITH e AS MATERIALIZED (
  SELECT embedding AS v FROM embeddings WHERE embedding IS NOT NULL),
dd AS (SELECT range AS i FROM range(64)),
pairs AS (
  SELECT di.i AS i, dj.i AS j,
         SUM(CAST(e.v[di.i + 1] AS DOUBLE) * CAST(e.v[dj.i + 1] AS DOUBLE)) AS sxy,
         COUNT(*) AS n,
         SUM(CAST(e.v[di.i + 1] AS DOUBLE)) AS sx,
         SUM(CAST(e.v[dj.i + 1] AS DOUBLE)) AS sy
  FROM e, dd di, dd dj WHERE di.i <= dj.i GROUP BY di.i, dj.i)
SELECT i, j, ROUND(sxy / n - (sx / n) * (sy / n), 6) + 0.0 AS cov FROM pairs""",
        "keep_best_docs": """
WITH ranked AS (
  SELECT source, lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source, lang
                            ORDER BY n_chars DESC, doc_id DESC) AS rn
  FROM documents)
SELECT source, lang, doc_id, n_chars FROM ranked WHERE rn = 1""",
        "quotient_shards_g1": H.quotient_sql(
            f"SELECT id, id % 64 AS label FROM (SELECT src AS id FROM ({H.G1_SQL}) UNION SELECT dst FROM ({H.G1_SQL}))",
            H.G1_SQL),
        "cdlp_g2_r5": H.cdlp_sql(5),
        "triangles_g2": H.TRIANGLES_SQL,
        "degree_centrality_g1": H.DEGREE_CENTRALITY_SQL,
        "assortativity_g2": H.ASSORTATIVITY_SQL,
        "kcore_g2_k20": H.kcore_sql(20, 10),
        "graph_report_g1": H.GRAPH_REPORT_SQL,
        "node_boundary_g1": H.NODE_BOUNDARY_SQL,
        "induced_subgraph_g1": H.INDUCED_SUBGRAPH_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "fuzzy_dedup": FUZZY_DEDUP_SQL,
        "token_stats": TOKEN_STATS_SQL,
        "repetition_ratio": REPETITION_RATIO_SQL,
        "corpus_filter": CORPUS_FILTER_SQL,
        "pack_shards": PACK_SHARDS_SQL,
        "tfidf_top_terms": TFIDF_TOP_SQL,
        "bm25": BM25_SQL,
        "inverted_index": INVERTED_INDEX_SQL,
        "ngram_lm_bigram": NGRAM_LM_SQL,
        "quality_classifier": CLASSIFIER_SQL,
        "dsir_logw": DSIR_LOGW_SQL,
        "dsir_sample": DSIR_SAMPLE_SQL,
        "gopher_rules": GOPHER_RULES_SQL,
        "c4_rules": C4_RULES_SQL,
        "bpe_train": _bpe_train_sql(8),
        "bpe_encode": _bpe_encode_sql(8),
        "dedup_substrings": DEDUP_SUBSTRINGS_SQL,
        "ccnet_buckets": CCNET_BUCKETS_SQL,
        "ngram_ppl_bigram": NGRAM_PPL_SQL,
        "decontaminate": DECONTAMINATE_SQL,
        "stratified_sample": STRATIFIED_SAMPLE_SQL,
        "assign_splits": ASSIGN_SPLITS_SQL,
        "text_quality": TEXT_QUALITY_SQL,
        "lang_id": LANG_ID_SQL,
        "doc_fingerprint": FINGERPRINT_SQL,
        "ngram_jaccard": NGRAM_JACCARD_SQL,
        "minhash_lsh": MINHASH_LSH_SQL,
        "knn_cosine": KNN_COSINE_SQL,
        "knn_quantized": KNN_QUANTIZED_SQL,
        "knn_ivf_label": KNN_IVF_SQL,
        "embedding_near_dup": EMBEDDING_NEAR_DUP_SQL,
        "embedding_near_dup_lsh": _embedding_near_dup_lsh_sql(),
        "events_hourly": EVENTS_HOURLY_SQL,
        "events_hourly_stream": EVENTS_HOURLY_SQL,
        "events_sessions": EVENTS_SESSIONS_SQL,
        "simhash_pairs": SIMHASH_PAIRS_SQL,
        "simhash_stream_dedup": SIMHASH_STREAM_DEDUP_SQL,
        # pages_pipeline: non-SQL kernels → rows-only
        "bfs_g2_src1": H.bfs_sql(1, 12),
        "sssp_g2w_src1": H.sssp_sql(1, 20),
        "sssp_avg_len_g2w": H.sssp_avg_sql(1, 20),
        "hits_g1_r5": H.hits_sql(5),
        "katz_g2_r5": H.katz_sql(5, alpha=0.1, beta=1.0),
        "eigenvector_g2_r5": H.eigenvector_sql(5),
        "lpa_g2w_r5": H.lpa_sql(5),
        "kshell_g1_k12": H.kshell_sql(12, 20, H.G1_SQL),
        "clustering_g2": H.CLUSTERING_SQL,
        "avg_clustering_g2": H.AVG_CLUSTERING_SQL,
        "transitivity_g2": H.TRANSITIVITY_SQL,
        "degrees_g1": H.DEGREES_SQL,
        "edge_boundary_g1": H.EDGE_BOUNDARY_SQL,
        "is_simple_path_g2": H.simple_path_sql([1, 2, 3]),
        "closeness_g2": H.closeness_sql(12),
        "apsp_g2": H.apsp_sql(12),
        "betweenness_g1_s97": H.betweenness_sql(14),
        "betweenness_w_g2w": H.betweenness_w_sql(6),
        "edge_betweenness_w_g2w": H.betweenness_w_sql(6, edge=True),
        "harmonic_g1_s97": H.harmonic_sql(15),
        "louvain_g2w_l1_i2": H.louvain_sql(2),
        "sssp_path_g2w_src1": H.sssp_path_sql(1, 20),
        "bfs_tree_g2_src1": H.bfs_tree_sql(1, 12),
        "has_path_g2_1_2": H.has_path_sql(1, 2, 12),
        "closeness_g1_landmarks": H.closeness_landmarks_sql(15),
        "property_sssp_g1": H.property_sssp_sql(1, 15),
        "gremlin_hubs_g1": GREMLIN_HUBS_SQL,
        "gremlin_2hop_g2": GREMLIN_2HOP_SQL,
        "gremlin_groupcount_g1": GREMLIN_GROUPCOUNT_SQL,
        "gremlin_group_g1": GREMLIN_GROUP_SQL,
        "gremlin_until_g1": GREMLIN_UNTIL_SQL,
        "gremlin_match_g3": GREMLIN_MATCH_SQL,
        "filter_urls": FILTER_URLS_SQL,
        "normalize_text": NORMALIZE_TEXT_SQL,
        "extract_text_synth": EXTRACT_TEXT_SQL,
        "anchor_texts": ANCHOR_TEXTS_SQL,
        "warc_roundtrip": WARC_ROUNDTRIP_SQL,
        "cdx_index": CDX_INDEX_SQL,
        "robots_filter": ROBOTS_FILTER_SQL,
        "neighbor_sample_g2": NEIGHBOR_SAMPLE_SQL,
        "sage_features_g1": SAGE_FEATURES_SQL,
        "gremlin_coalesce_g1": GREMLIN_COALESCE_SQL,
        "saveload_degrees_g1": SAVELOAD_DEGREES_SQL,
        "registry_sssp_g2w": H.sssp_sql(1, 20),
        "pregel_sssp_g2w": H.sssp_sql(1, 20),
        "pie_sssp_g2w": H.sssp_sql(1, 20),
        "gremlin_project_g1": GREMLIN_PROJECT_SQL,
        "gremlin_choose_g1": GREMLIN_CHOOSE_SQL,
        "gremlin_tail_g1": GREMLIN_TAIL_SQL,
        "gremlin_union_g2": GREMLIN_UNION_SQL,
        "gremlin_optional_g1": GREMLIN_OPTIONAL_SQL,
        "gremlin_subgraph_g1": GREMLIN_SUBGRAPH_SQL,
        "gremlin_select_values_g1": GREMLIN_SELECT_VALUES_SQL,
        "gremlin_sack_g2w": GREMLIN_SACK_SQL,
        "sampling_path_g2": H.sampling_path_sql([1, 2, 3, 4, 5], 4, 42),
        "node2vec_g1": H.node2vec_sql([1, 2, 3, 4, 5], 4, 4.0, 0.25, 42),
        "skipgram_g1": H.skipgram_sql([1, 2, 3, 4, 5], 4, 4.0, 0.25, 2, 42),
        "core_numbers_g1": H.core_numbers_sql(6),
        "k_crust_g1": H.kcrust_sql(12, 6),
        "k_corona_g1": H.kcorona_sql(12, 6),
        "community_lp_g1": H.COMMUNITY_LP_SQL,
        "mis_g2_r3": H.mis_sql(3),
        "coloring_g2_r4": H.coloring_sql(4),
        "butterflies_g1": H.butterflies_sql(),
        "butterfly_stats_g1": H.butterfly_stats_sql(),
        "modularity_cdlp_g2": H.modularity_sql(H.cdlp_sql(5)),
        "diameter_g2": H.diameter_sweep_sql(12),
        "msf_g2w_r2": H.boruvka_sql(2),
        "single_linkage_g2w": H.single_linkage_sql(1.5, _BORUVKA_TWIN_ROUNDS),
        "msf_weight_g2w": (
            "SELECT COUNT(*) AS n_edges,"
            " ROUND(COALESCE(SUM(w), 0), 6) AS total_weight FROM ("
            + H.boruvka_sql(_BORUVKA_TWIN_ROUNDS)
            + ")"
        ),
        "annd_g2": H.avg_neighbor_degree_sql(),
        "degree_connectivity_g2": H.degree_connectivity_sql(),
        "rich_club_g2": H.rich_club_sql(),
        "clustering_w_g2w": CLUSTERING_W_SQL,
        "square_clustering_g3": SQUARE_CLUSTERING_SQL,
        "generalized_degree_g3": GENERALIZED_DEGREE_SQL,
        "eccentricity_g2": H.eccentricity_sql(12),
        "wiener_g2": H.wiener_sql(12),
        "topo_generations_dagk": H.topo_generations_sql(24),
        "simrank_g4m5_r3": H.simrank_sql(3, 0.6),
        "dag_longest_dagk": H.dag_longest_sql(24),
        "global_efficiency_g2": H.global_efficiency_sql(12),
        "graph_extremes_g2": H.graph_extremes_sql(12),
        "degree_histogram_g1": H.degree_histogram_sql(),
        "powerlaw_alpha_g1": H.powerlaw_alpha_sql(),
        "anf_nf_g1_r4": H.anf_nf_sql(4),
        "hyperball_harmonic_g1": H.hyperball_harmonic_sql(6),
        "anf_balls_g1_r2": H.anf_balls_sql(2),
        "distance_stats_g1": H.distance_stats_sql(6),
        "link_prediction_g1": H.LINK_PREDICTION_SQL,
        "url_canonical": URL_CANONICAL_SQL,
        "host_graph_domains": HOST_GRAPH_SQL,
        "dedup_lines": DEDUP_LINES_SQL,
        "pii_redact": PII_REDACT_SQL,
        "remove_boilerplate": REMOVE_BOILERPLATE_SQL,
        "host_pagerank": H.pagerank_sql(
            5, graph_sql=HOST_EDGES_SQL, id_alias="host"
        ),
        # dfs_g1_src1: sequential visit order not SQL-expressible →
        # rows-only; pytest has the recursive-Python twin
    }
