"""Standalone PageRank job for spark-submit (north rule: `spark-submit
--py-files` launch on N / 4N executors).

The graphscope_spark package arrives via --py-files (see
tools/submit.sh) — this script deliberately does NOT sys.path the repo,
so it proves the packaged-library launch path works:

    tools/submit.sh local[8] /root/testdata/sf0.001 /tmp/pr_out

On a real cluster the same command line takes --master yarn/k8s and an
Iceberg table identifier instead of the parquet dir; nothing in the job
body changes.

Emits ONE JSON line: vertices, edges, supersteps, converged,
edges/sec/superstep, output path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", help="parquet dir with orders.parquet (edge source)")
    ap.add_argument("out", help="output path for per-vertex ranks (parquet)")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="durable superstep checkpoints (resumable)")
    args = ap.parse_args()

    # session comes from spark-submit's conf (master, cores, partitions)
    spark = SparkSession.builder.appName("graphscope-spark-pagerank").getOrCreate()

    # the library was shipped with --py-files; import AFTER the session
    # exists to prove the executors/driver see the packaged zip
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.graph import LinkGraph

    orders = spark.read.parquet(f"{args.sf_dir.rstrip('/')}/orders.parquet")
    edges = orders.select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
    )
    g = LinkGraph.from_edges(edges).build()
    nv, ne = g.num_vertices(), g.num_edges()

    info: dict = {}
    t0 = time.time()
    ranks = pagerank(g, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter,
                     checkpoint_dir=args.checkpoint_dir, info_out=info)
    ranks.write.mode("overwrite").parquet(args.out)
    wall = time.time() - t0

    steps = info.get("iterations")
    meta = {
        "vertices": nv,
        "edges": ne,
        "supersteps": steps,
        "converged": info.get("converged"),
        "wall_sec": round(wall, 3),
        "edges_per_sec_superstep": int(ne * (steps or 1) / wall) if wall > 0 else None,
        "out": args.out,
        "rows_written": spark.read.parquet(args.out).count(),
    }
    print(json.dumps(meta))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
