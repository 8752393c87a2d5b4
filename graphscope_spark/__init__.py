"""graphscope_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capability set of the GraphScope analytical engine
(GRAPE-style iterative graph analytics — see SURVEY.md) as idiomatic
PySpark DataFrame jobs: declarative logical plans optimized by Catalyst,
iterative supersteps driven by a Python fixpoint loop with per-iteration
checkpointing, explicit salting for power-law hub skew, and Arrow-batched
pandas UDFs for the few kernels SQL cannot express.

Reference parity targets (file:line cites are into /root/reference):
- PageRank (NetworkX semantics): apps/pagerank/pagerank_networkx.h:54-151
- WCC (hash-min):                apps/projected/wcc_projected.h:70-180
- CDLP (LDBC label propagation): coordinator .gs_conf.yaml:41
- Triangles (oriented intersect):apps/clustering/triangles.h:43-158
"""

from graphscope_spark.app import App, load_app, register_app
from graphscope_spark.graph import LinkGraph
from graphscope_spark.pie import PIEProgram, run_pie
from graphscope_spark.pregel import PregelProgram, run_pregel
from graphscope_spark.session import get_spark
from graphscope_spark.traversal import traversal
from graphscope_spark.warc import (
    cdx_index, fetch_warc_record, pages_to_warc, read_warc, surt_key,
)
from graphscope_spark.web import (
    canonicalize_url, filter_urls, host_graph, parse_robots,
    robots_allowed, url_host,
)

__version__ = "0.1.0"

__all__ = [
    "LinkGraph", "get_spark", "PregelProgram", "run_pregel",
    "PIEProgram", "run_pie", "App", "load_app", "register_app",
    "traversal", "canonicalize_url", "filter_urls", "host_graph", "url_host",
    "parse_robots", "robots_allowed",
    "pages_to_warc", "read_warc", "cdx_index", "surt_key", "fetch_warc_record",
    "__version__",
]
