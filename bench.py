"""Benchmark harness — driver contract + north-rule metrics.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...,
   "pagerank": {"edges": E, "supersteps": K, "edges_per_sec_superstep": ...}}

The north-rule headline (BASELINE.json metric) is edges/sec per
PageRank superstep + iterations-to-1e-6-L1-convergence on a power-law
web link graph; `web_pagerank` measures exactly that on the synthetic
Common-Crawl-shaped pages graph (deterministic seed, FIXTURES.md), with
graph build EXCLUDED from the timed region (build is a one-time cost
amortized over many analytical runs — the reference likewise loads into
vineyard once and runs many apps against it, SURVEY.md §3.2).

Scaling-efficiency evidence (two "cluster sizes" in-sandbox) is
produced by tools/bench_scaling.py which invokes this file at local[8]
and local[32]; see BENCH/BASELINE.md.

All progress goes to stderr; stdout carries only the final JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from graphscope_spark import get_spark
from graphscope_spark import harness as H
from graphscope_spark.algorithms import cdlp, pagerank, triangle_count, wcc
from graphscope_spark.functions import dedup as D
from graphscope_spark.functions import similarity as S
from graphscope_spark.graph import LinkGraph
from graphscope_spark.pages import generate_edges, generate_pages, pages_to_edges


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument("--pages-n", type=int, default=0, help="override web graph size (0 = scale by sf)")
    ap.add_argument("--pr-rounds", type=int, default=0, help="fixed PageRank rounds for web_pagerank (0 = run to 1e-6 convergence)")
    ap.add_argument("--edge-vertices", type=int, default=0,
                    help="use the closed-form edge generator with this many vertices instead of the HTML pages pipeline (for 10^8-edge scaling runs)")
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--graph-path", default="",
                    help="read the web graph from this LinkGraph.save() dir instead of generating (scaling runs: generate ONCE at full parallelism, then each level re-reads — a cluster likewise reads the built table from storage)")
    ap.add_argument("--save-graph", default="",
                    help="after building the web graph, save() it here and exit")
    args = ap.parse_args()

    sf_dir = args.sf_dir
    sf = sf_of(sf_dir)
    only = {q for q in args.queries.split(",") if q}

    spark = get_spark("graphscope-spark-bench")
    cores = spark.sparkContext.defaultParallelism
    log(f"bench: sf_dir={sf_dir} sf={sf} parallelism={cores}")

    timings: dict[str, float] = {}
    extra: dict = {}

    def timed(name: str, fn) -> None:
        if only and name not in only:
            return
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)
        log(f"  {name}: {timings[name]}s")

    # Host-speed calibration: a FIXED deterministic job (shuffle of 20M
    # closed-form rows + hash agg) whose cost is independent of sf and
    # of this repo's code. Cross-round comparisons should normalize by
    # this — the sandbox is a VM on a shared hypervisor and measured
    # multi-core throughput varies several-fold with host load (round 2
    # control experiment: the identical r1 commit re-ran 6x slower than
    # its recorded BENCH_r01 numbers on a noisy afternoon).
    def calib() -> None:
        (
            spark.range(0, 20_000_000)
            .select((F.col("id") % 65536).alias("k"),
                    (F.xxhash64("id") % 1000000007).alias("h"))
            .groupBy("k").agg(F.sum("h").alias("s"))
            .agg(F.sum("s")).collect()
        )

    _t0 = time.monotonic()
    calib()
    extra["calib_shuffle_20m_sec"] = round(time.monotonic() - _t0, 3)
    # Warm repeat: the first run is JIT/codegen-warmup-dominated (~5-7s
    # at ANY core count on a healthy host), so it cannot distinguish
    # host contention from warmup. The warm run is ~1-2.4s healthy at
    # local[2..32] (measured 2026-08-17 quiet-host) and 4-14s under the
    # round-2 hypervisor contention — the scaling driver gates level
    # acceptance on THIS number (tools/bench_scaling.py --calib-cap).
    _t0 = time.monotonic()
    calib()
    extra["calib_warm_20m_sec"] = round(time.monotonic() - _t0, 3)
    log(f"  calib_shuffle_20m: {extra['calib_shuffle_20m_sec']}s "
        f"(warm {extra['calib_warm_20m_sec']}s)")

    # ------------------------------------------------------------------
    # North-rule headline: PageRank on the synthetic power-law web graph.
    # Prepare (generate pages -> extract links -> hash urls -> build) is
    # timed separately as web_build; the superstep loop is web_pagerank.
    # ------------------------------------------------------------------
    n_pages = args.pages_n or max(10_000, int(2_000_000 * sf)) if sf > 0 else 100_000
    web = {}

    def prep_web() -> None:
        if args.graph_path:
            g = LinkGraph.load(spark, args.graph_path).build()
        elif args.edge_vertices > 0:
            e = generate_edges(spark, args.edge_vertices, avg_degree=args.avg_degree)
            # vertex set is closed-form (range) — no 2|E|-row distinct;
            # generation streams straight into the build shuffle and is
            # materialized exactly once, by the cache fill
            v = spark.range(0, args.edge_vertices).select(F.col("id"))
            g = LinkGraph.from_edges(e, vertices=v).build()
        else:
            pages = generate_pages(spark, n=n_pages)
            # materialize extraction ONCE (generate_pages is lazy; without
            # this every downstream action would re-run generation+parse)
            url_edges = pages_to_edges(pages).localCheckpoint(eager=True)
            g = LinkGraph.from_url_edges(url_edges).build()
        # materialize the CSR-equivalent cached layout
        web["E"] = g.num_edges()
        web["V"] = g.num_vertices()
        web["g"] = g

    def run_web_pr() -> None:
        info: dict = {}
        kwargs = dict(alpha=0.85, info_out=info, checkpoint_every=5)
        if args.pr_rounds > 0:
            kwargs["fixed_rounds"] = args.pr_rounds
        else:
            kwargs.update(tol=1e-6, max_iter=60)
        t0 = time.monotonic()
        pr = pagerank(web["g"], **kwargs)
        top = pr.orderBy(F.desc("rank")).limit(5).collect()
        dt = time.monotonic() - t0
        k = info["iterations"]
        # superstep throughput from the loop's own per-iteration clock
        # (excludes one-time outdeg materialization + final top-k)
        per = sorted(h["seconds"] for h in info["history"])
        loop_sec = sum(per)
        median = per[len(per) // 2]
        extra["pagerank"] = {
            "vertices": web["V"],
            "edges": web["E"],
            "supersteps": k,
            "converged": info["converged"],
            "sec_per_superstep": round(loop_sec / max(1, k), 4),
            "sec_per_superstep_median": round(median, 4),
            "edges_per_sec_superstep": round(web["E"] * k / loop_sec),
            "edges_per_sec_superstep_median": round(web["E"] / median),
            "setup_sec": round(dt - loop_sec, 3),
            "top_rank": round(top[0]["rank"], 8),
            # chronological per-superstep seconds — lets a scaling run
            # distinguish a uniform slowdown from stall bursts
            "superstep_seconds": [
                round(h["seconds"], 3) for h in info["history"]
            ],
        }
        log(f"  web_pagerank: V={web['V']} E={web['E']} supersteps={k} "
            f"edges/s/superstep={extra['pagerank']['edges_per_sec_superstep']}")

    if args.save_graph:
        timed("web_build", prep_web)
        web["g"].save(args.save_graph)
        print(
            json.dumps(
                {"saved": args.save_graph, "edges": web["E"], "vertices": web["V"]}
            ),
            flush=True,
        )
        spark.stop()
        return 0

    def run_web_tri() -> None:
        # triangle headline on the hub-skewed WEB graph (the target
        # workload shape). The near-clique G2 co-occurrence graph is a
        # correctness-only query (`triangles_g2` in __spark_entry__) —
        # its ~10^8 triangles on 1k vertices is a density no web graph
        # has and benchmarks the explode, not the engine.
        extra["web_triangles"] = triangle_count(web["g"])

    def run_web_anf() -> None:
        # sketch-based distance stats (FM/ANF): the web-scale stand-in
        # for exact APSP. PageRank-shaped supersteps; saturates at the
        # graph's effective diameter (~3-4 rounds on the hub web graph).
        from graphscope_spark.algorithms.anf import _avg_distance, _interp_quantile, _nf_curve

        curve = [nf for nf, _ in _nf_curve(web["g"], max_radius=8, num_trials=8)]
        extra["web_anf"] = {
            "eff_diameter": round(_interp_quantile(curve, 0.9), 4),
            "avg_distance": round(_avg_distance(curve), 4),
            "nf_last": round(curve[-1]),
        }
        log(f"  web_anf: {extra['web_anf']}")

    if not only or {"web_pagerank", "web_build", "web_triangles", "web_anf"} & only:
        timed("web_build", prep_web)
        timed("web_pagerank", run_web_pr)
        timed("web_triangles", run_web_tri)
        timed("web_anf", run_web_anf)
        web.get("g") and web["g"].unpersist()

    # ------------------------------------------------------------------
    # Driver-table graph algorithms (G1/G2 from the sf parquet tables)
    # ------------------------------------------------------------------
    g1_holder = {}

    def prep_g1():
        g = H.g1(spark, sf_dir).build()
        g.num_edges()
        g1_holder["g"] = g

    def run_pr_g1():
        info: dict = {}
        pagerank(g1_holder["g"], alpha=0.85, tol=1e-6, max_iter=60, info_out=info).agg(
            F.sum("rank")
        ).collect()
        extra["pagerank_g1_supersteps"] = info["iterations"]

    def run_wcc_g1():
        wcc(g1_holder["g"]).agg(F.countDistinct("comp")).collect()

    if not only or {"pagerank_g1", "wcc_g1"} & only:
        prep_g1()
        timed("pagerank_g1", run_pr_g1)
        timed("wcc_g1", run_wcc_g1)
        g1_holder["g"].unpersist()

    g2_holder = {}

    def prep_g2():
        g = H.g2(spark, sf_dir).build()
        g.num_edges()
        g2_holder["g"] = g

    def run_cdlp_g2():
        cdlp(g2_holder["g"], max_round=10).agg(F.countDistinct("label")).collect()

    if not only or "cdlp_g2" in only:
        prep_g2()
        timed("cdlp_g2", run_cdlp_g2)
        g2_holder["g"].unpersist()

    # ------------------------------------------------------------------
    # Training-data pipeline ops on documents/embeddings
    # ------------------------------------------------------------------
    def run_minhash():
        docs = H.load(spark, sf_dir, "documents")
        D.minhash_lsh_pairs(docs, num_hashes=8, band_size=2, n=3).count()

    def run_knn():
        emb = H.load(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        S.knn_cosine(emb, queries, k=5).count()

    timed("minhash_lsh", run_minhash)
    timed("knn_cosine", run_knn)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline-suite wall time (web PageRank supersteps + graph algos + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "parallelism": cores,
        "web_graph_pages": n_pages,
        **extra,
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
