"""Builtin algorithm library (reference registry:
coordinator/gscoordinator/builtin/app/.gs_conf.yaml:2-217; python
wrappers python/graphscope/analytical/app/*.py).

Every function takes a LinkGraph and returns a vertex-indexed result
DataFrame (the reference's vertex_data context,
core/context/vertex_data_context.h) or a scalar.
"""

from graphscope_spark.algorithms.pagerank import pagerank
from graphscope_spark.algorithms.wcc import wcc
from graphscope_spark.algorithms.cc_twophase import cc_two_phase
from graphscope_spark.algorithms.ppr import ppr_batch
from graphscope_spark.algorithms.spreading import label_spreading
from graphscope_spark.algorithms.quotient import quotient_graph
from graphscope_spark.algorithms.partitioning import partition_quality
from graphscope_spark.algorithms.cdlp import cdlp
from graphscope_spark.algorithms.triangles import triangles, triangle_count
from graphscope_spark.algorithms.degree import (  # noqa: F401
    degree_centrality,
    degree_assortativity_coefficient,
    degree_histogram,
    powerlaw_alpha,
)
from graphscope_spark.algorithms.hits import hits
from graphscope_spark.algorithms.kcore import (
    core_numbers,
    k_core,
    k_corona,
    k_crust,
    k_shell,
    max_core,
    onion_layers,
)
from graphscope_spark.algorithms.clustering import (
    avg_clustering,
    clustering,
    transitivity,
)
from graphscope_spark.algorithms.sssp import (
    bfs,
    bfs_generic,
    sssp,
    sssp_average_length,
    sssp_has_path,
    sssp_path,
)
from graphscope_spark.algorithms.centrality import eigenvector_centrality, katz_centrality
from graphscope_spark.algorithms.lpa import lpa_u2i
from graphscope_spark.algorithms.mis import maximal_independent_set
from graphscope_spark.algorithms.coloring import greedy_color  # noqa: F401
from graphscope_spark.algorithms.butterfly import (  # noqa: F401
    butterflies,
    butterfly_stats,
)
from graphscope_spark.algorithms.structure import (  # noqa: F401
    average_degree_connectivity,
    average_neighbor_degree,
    eccentricity,
    global_efficiency,
    graph_extremes,
    rich_club_coefficient,
    topological_indices,
)
from graphscope_spark.algorithms.paths import diameter_double_sweep  # noqa: F401
from graphscope_spark.algorithms.msf import (  # noqa: F401
    boruvka_msf,
    msf_weight,
    single_linkage,
)
from graphscope_spark.algorithms.boundary import edge_boundary, node_boundary
from graphscope_spark.algorithms.paths import is_simple_path
from graphscope_spark.algorithms.closeness import (
    all_pairs_shortest_path_length,
    closeness_centrality,
)
from graphscope_spark.algorithms.louvain import louvain, modularity  # noqa: F401
from graphscope_spark.algorithms.property import property_bfs, property_sssp
from graphscope_spark.algorithms.walks import node2vec_path, sampling_path
from graphscope_spark.algorithms.dfs import dfs
from graphscope_spark.algorithms.betweenness import (
    betweenness_centrality,
    harmonic_centrality,
)
from graphscope_spark.algorithms.anf import (
    hyperball_harmonic,
    anf_balls,
    average_distance,
    distance_stats,
    effective_diameter,
    neighborhood_function,
)
from graphscope_spark.algorithms.linkpred import (
    common_neighbors,
    community_link_prediction_scores,
    link_prediction_scores,
)
from graphscope_spark.algorithms.simrank import simrank  # noqa: F401
from graphscope_spark.algorithms.trustrank import (  # noqa: F401
    trustrank,
    spam_mass,
)
from graphscope_spark.algorithms.scc import (  # noqa: F401
    scc,
    number_strongly_connected_components,
    is_strongly_connected,
)
from graphscope_spark.algorithms.bowtie import bowtie  # noqa: F401
from graphscope_spark.algorithms.salsa import salsa  # noqa: F401
from graphscope_spark.algorithms.ktruss import k_truss  # noqa: F401
from graphscope_spark.algorithms.cocitation import (  # noqa: F401
    cocitation,
    bibliographic_coupling,
)
from graphscope_spark.algorithms.bipartite import (  # noqa: F401
    bipartite_components,
    is_bipartite,
    two_coloring,
)
from graphscope_spark.algorithms.reciprocity import (  # noqa: F401
    reciprocity,
    overall_reciprocity,
    condensation_edges,
)

__all__ = [
    "pagerank", "wcc", "cc_two_phase", "ppr_batch", "label_spreading",
    "quotient_graph", "partition_quality", "cdlp", "triangles",
    "triangle_count",
    "degree_centrality", "degree_assortativity_coefficient",
    "hits", "k_core", "k_shell", "core_numbers", "max_core",
    "k_crust", "k_corona", "onion_layers",
    "clustering", "avg_clustering", "transitivity",
    "bfs", "bfs_generic", "sssp", "sssp_average_length", "sssp_has_path",
    "sssp_path",
    "eigenvector_centrality", "katz_centrality",
    "lpa_u2i", "node_boundary", "edge_boundary", "is_simple_path",
    "closeness_centrality", "all_pairs_shortest_path_length",
    "louvain", "property_sssp", "property_bfs", "sampling_path", "dfs",
    "betweenness_centrality", "harmonic_centrality", "node2vec_path",
    "link_prediction_scores", "common_neighbors",
    "community_link_prediction_scores",
    "neighborhood_function", "effective_diameter", "average_distance",
    "distance_stats", "anf_balls", "hyperball_harmonic",
    "trustrank", "spam_mass",
    "scc", "number_strongly_connected_components", "is_strongly_connected",
    "bowtie",
    "reciprocity", "overall_reciprocity", "condensation_edges",
    "salsa", "k_truss", "cocitation", "bibliographic_coupling",
    "bipartite_components", "is_bipartite", "two_coloring",
    "maximal_independent_set",
    "greedy_color", "butterflies", "butterfly_stats", "modularity",
    "degree_histogram", "powerlaw_alpha", "diameter_double_sweep",
    "average_neighbor_degree", "average_degree_connectivity",
    "rich_club_coefficient", "eccentricity", "graph_extremes",
    "topological_indices", "global_efficiency",
    "boruvka_msf", "msf_weight", "single_linkage", "simrank",
]
