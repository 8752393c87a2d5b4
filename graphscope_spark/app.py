"""Algorithm plugin registry — reference parity: framework/app.py
426-466 (`load_app(algo, gar)` loading packaged algorithms from a
`.gar` zip whose `.gs_conf.yaml` maps algo name → class) and the
builtin registry coordinator/gscoordinator/builtin/app/.gs_conf.yaml.

The reference packages C++/Cython sources that a coordinator compiles;
a PySpark library needs neither an archive format nor a compile step —
a plugin is just a Python callable. So the `.gar` is replaced by the
Python import system:

- `register_app(name)` registers a callable (a plain
  `(graph, **kw) -> DataFrame` function, a PregelProgram, a
  PIEProgram, or a zero/param factory returning one of those).
- `load_app(name)` returns an `App` handle; `app(graph, **kw)` runs it
  (AppAssets.__call__ / AppDAGNode.__call__, app.py:275-340).
- Dotted-path names (`"pkg.mod:attr"`) import on demand — the moral
  equivalent of loading an algorithm that ships outside the engine.

Every builtin from SURVEY.md §2 is pre-registered under its reference
algo name (the `algo:` keys of .gs_conf.yaml), so
`load_app("sssp")(g, src=4)` matches the reference example
`load_app('sssp', gar=...)(src=4)`.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

from pyspark.sql import DataFrame

from graphscope_spark.graph import LinkGraph

_REGISTRY: dict[str, Any] = {}


def register_app(name: str, obj: Any = None):
    """Register `obj` (callable / PregelProgram / PIEProgram / factory)
    under `name`. Usable as a decorator: `@register_app("my_algo")`."""
    if obj is None:
        def deco(f):
            _REGISTRY[name] = f
            return f
        return deco
    _REGISTRY[name] = obj
    return obj


class App:
    """Loaded-app handle (AppAssets, app.py:118-169): `app(graph,
    **kwargs)` resolves the registered object and runs it."""

    def __init__(self, algo: str, obj: Any):
        self._algo = algo
        self._obj = obj

    def __repr__(self) -> str:  # mirrors AppAssets.__repr__ shape
        return f"graphscope_spark.app.App <algo: {self._algo}>"

    def __call__(self, graph: LinkGraph, *args, **kwargs) -> DataFrame:
        from graphscope_spark.pie import PIEProgram, run_pie
        from graphscope_spark.pregel import PregelProgram, run_pregel

        obj = self._obj
        # a factory (e.g. sssp_program(src=4)) builds the program from
        # the call's args; a plain function takes (graph, *args, **kw)
        if isinstance(obj, PregelProgram):
            return run_pregel(graph, obj, *args, **kwargs)
        if isinstance(obj, PIEProgram):
            return run_pie(graph, obj, *args, **kwargs)
        if callable(obj):
            import inspect

            # distinguish a plain (graph, **kw) algorithm from a
            # factory that builds a program WITHOUT the graph (the
            # "zero/param factory" form of the module docstring, e.g.
            # register_app("my", lambda: sssp_program(src=3)) or
            # register_app("my", sssp_program)): bind the graph-first
            # call; if the signature rejects it, call factory-style
            try:
                inspect.signature(obj).bind(graph, *args, **kwargs)
                takes_graph = True
            except TypeError:
                takes_graph = False
            except ValueError:  # builtins without introspectable sigs
                takes_graph = True
            out = obj(graph, *args, **kwargs) if takes_graph \
                else obj(*args, **kwargs)
            if isinstance(out, PregelProgram):
                return run_pregel(graph, out)
            if isinstance(out, PIEProgram):
                return run_pie(graph, out)
            return out
        raise TypeError(f"unrunnable app object for {self._algo!r}: {obj!r}")


def load_app(algo: str) -> App:
    """Resolve a registered or dotted-path (`"pkg.mod:attr"`) algorithm
    name to a runnable App (framework/app.py:426-466; the registry
    replaces the .gar archive — see module docstring).

    Raises KeyError for unknown names (the reference raises
    FileNotFoundError for a missing gar path)."""
    if algo in _REGISTRY:
        return App(algo, _REGISTRY[algo])
    if ":" in algo:
        mod, attr = algo.split(":", 1)
        return App(algo, getattr(importlib.import_module(mod), attr))
    raise KeyError(
        f"no app registered as {algo!r}; register_app() it or use a "
        "'module:attr' dotted path")


def _register_builtins() -> None:
    """Pre-register the builtin library under the reference's algo
    names (.gs_conf.yaml:2-217)."""
    from graphscope_spark import algorithms as A

    for name, fn in {
        "pagerank": A.pagerank,
        "wcc": A.wcc,
        "cc_two_phase": A.cc_two_phase,
        "ppr_batch": A.ppr_batch,
        "label_spreading": A.label_spreading,
        "quotient_graph": A.quotient_graph,
        "partition_quality": A.partition_quality,
        "cdlp": A.cdlp,
        "lpau2i": A.lpa_u2i,
        "sssp": A.sssp,
        "sssp_path": A.sssp_path,
        "sssp_has_path": A.sssp_has_path,
        "sssp_average_length": A.sssp_average_length,
        "bfs": A.bfs,
        "bfs_generic": A.bfs_generic,
        "dfs": A.dfs,
        "hits": A.hits,
        "kcore": A.k_core,
        "kshell": A.k_shell,
        "core_numbers": A.core_numbers,
        "triangles": A.triangles,
        "clustering": A.clustering,
        "avg_clustering": A.avg_clustering,
        "transitivity": A.transitivity,
        "degree_centrality": A.degree_centrality,
        "degree_assortativity_coefficient": A.degree_assortativity_coefficient,
        "eigenvector_centrality": A.eigenvector_centrality,
        "katz_centrality": A.katz_centrality,
        "closeness_centrality": A.closeness_centrality,
        "all_pairs_shortest_path_length": A.all_pairs_shortest_path_length,
        "louvain": A.louvain,
        "node_boundary": A.node_boundary,
        "edge_boundary": A.edge_boundary,
        "is_simple_path": A.is_simple_path,
        "property_sssp": A.property_sssp,
        "property_bfs": A.property_bfs,
        "sampling_path": A.sampling_path,
        "mis": A.maximal_independent_set,
        "greedy_color": A.greedy_color,
        "msf": A.boruvka_msf,
        "single_linkage": A.single_linkage,
        "butterflies": A.butterflies,
        "modularity": A.modularity,
        "degree_histogram": A.degree_histogram,
        "eccentricity": A.eccentricity,
        # round 4 additions
        "k_crust": A.k_crust,
        "k_corona": A.k_corona,
        "onion_layers": A.onion_layers,
        "community_link_prediction": A.community_link_prediction_scores,
        "topological_indices": A.topological_indices,
        "global_efficiency": A.global_efficiency,
        "simrank": A.simrank,
    }.items():
        _REGISTRY.setdefault(name, fn)
    # DAG family lives in its own module (not in algorithms.__init__'s
    # LinkGraph->DataFrame convention: dag_longest_path returns a list)
    from graphscope_spark.algorithms import dag as _dag

    for name, fn in {
        "topological_generations": _dag.topological_generations,
        "dag_longest_path": _dag.dag_longest_path,
        "dag_descendants": _dag.descendants,
        "dag_ancestors": _dag.ancestors,
    }.items():
        _REGISTRY.setdefault(name, fn)


_register_builtins()
