"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in the sandbox, so the N -> 4N executor
criterion is evidenced by running the IDENTICAL PageRank job on the
IDENTICAL deterministic input at two local parallelism levels
(local[2] = N, local[8] = 4N), each in a fresh JVM via subprocess.

Host-contamination gating (round-2 lesson: the hypervisor under this
VM sometimes anti-scales an embarrassingly-parallel control job to
0.15 efficiency — no reading taken in such a window means anything):
every level's measurement is accepted only when

  (a) its WARM 20M-row calib job (bench.py calib_warm_20m_sec, a fixed
      shuffle+hash-agg independent of this repo's code) runs under
      --calib-cap seconds (healthy quiet-host range measured
      2026-08-17: 1.0-2.4s at local[2..32]; the contaminated round-2
      window read 4-14s), and
  (b) the PageRank mean/median sec-per-superstep ratio is under
      --stall-ratio (external preemption shows up as a few stalled
      supersteps: round 2 saw 63.6s mean vs 17.2s median at local[8]).

A level failing the gate is retried after --retry-sleep seconds, up to
--max-retries times; all attempts are logged to stderr and the
accepted attempt's calib values are published in BENCH/BASELINE.md.

Shuffle-partition protocol (ADVICE r2): by default
`spark.sql.shuffle.partitions` scales with the level's core count
(partitions proportional to cluster cores, what a production launcher
does when executor count changes — NOT what bare spark-submit defaults
to, which is a static 200). Because scaled partitions mean the two
levels do not execute byte-identical plans, `--pinned-partitions P`
re-runs the protocol with partitions pinned at P for every level so
both efficiencies can be reported side by side.

Writes --md-out (default BENCH/BASELINE.md) with the results table.

Usage: python tools/bench_scaling.py [--vertices 20000000] [--rounds 6]
       [--levels 2,4,8] [--graph-path /tmp/g] [--pinned-partitions 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench(cores: int, extra: list[str], tag: str, partitions: int = 0) -> dict:
    # shuffle partitions scale with cores unless pinned (see module
    # docstring), and the JVM's GC/compiler thread pools are pinned to
    # the level's core count — otherwise a local[2] "executor" on a
    # 32-core host gets host-wide GC threads, a hidden subsidy that
    # inflates the small level's throughput.
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SHUFFLE_PARTITIONS=str(partitions or cores),
        SPARK_GRAFT_JAVA_OPTS=(
            f"-XX:ParallelGCThreads={cores} "
            f"-XX:ConcGCThreads={max(1, cores // 2)} "
            f"-XX:CICompilerCount={max(2, cores // 2)}"
        ),
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")] + extra
    print(f"== {tag} (local[{cores}], partitions="
          f"{partitions or cores}) ==", file=sys.stderr, flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"bench failed: {tag} at local[{cores}]")
    return json.loads(out.stdout.strip().splitlines()[-1])


def prepare_graph(n_vertices: int, avg_degree: int, path: str) -> dict:
    """Generate + build + save ONCE at full parallelism. Each level then
    reads the same on-disk table — like a cluster reading the built
    Iceberg table from object storage (generation is not the job under
    measurement)."""
    cores = os.cpu_count() or 8
    return _bench(
        cores,
        [
            "--edge-vertices", str(n_vertices),
            "--avg-degree", str(avg_degree),
            "--save-graph", path,
        ],
        "prepare",
    )


def gate(r: dict, calib_cap: float, stall_ratio: float) -> str | None:
    """Return a rejection reason if the level's reading is
    host-contaminated, else None."""
    warm = r.get("calib_warm_20m_sec")
    if warm is not None and warm > calib_cap:
        return f"calib_warm {warm}s > cap {calib_cap}s"
    pr = r.get("pagerank") or {}
    mean, med = pr.get("sec_per_superstep"), pr.get("sec_per_superstep_median")
    if mean and med and mean / med > stall_ratio:
        return f"superstep mean/median {mean / med:.2f} > {stall_ratio} (stall bursts)"
    return None


def run_level(
    cores: int, rounds: int, args, tag: str, partitions: int = 0
) -> dict:
    src = (
        ["--graph-path", args.graph_path]
        if args.graph_path
        else ["--edge-vertices", str(args.vertices), "--avg-degree", str(args.avg_degree)]
    )
    extra = ["--queries", "web_build,web_pagerank", "--pr-rounds", str(rounds)] + src
    last = None
    for attempt in range(1, args.max_retries + 2):
        r = _bench(cores, extra, f"{tag} attempt {attempt}", partitions)
        reason = gate(r, args.calib_cap, args.stall_ratio)
        r["gate_rejected"] = reason
        print(f"   calib_warm={r.get('calib_warm_20m_sec')}s "
              f"median={r['pagerank']['sec_per_superstep_median']}s "
              f"{'REJECT: ' + reason if reason else 'ACCEPT'}",
              file=sys.stderr, flush=True)
        if reason is None:
            return r
        last = r
        if attempt <= args.max_retries:
            time.sleep(args.retry_sleep)
    print(f"   giving up after {args.max_retries + 1} attempts; "
          "keeping last (CONTAMINATED) reading", file=sys.stderr)
    return last


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=20_000_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--levels", default="2,4,8",
                    help="comma-separated parallelism levels, ascending; efficiency is reported for every pair (ADVICE r1: a third level separates genuine scaling from a handicapped baseline)")
    ap.add_argument("--graph-path", default="",
                    help="measure from a pre-saved LinkGraph dir instead of regenerating per level. If the dir does not exist it is generated+saved once at full parallelism first.")
    ap.add_argument("--pinned-partitions", type=int, default=0,
                    help="pin spark.sql.shuffle.partitions to this at EVERY level (byte-identical plans) instead of scaling partitions with cores")
    ap.add_argument("--calib-cap", type=float, default=3.0,
                    help="reject a level whose warm 20M-row calib exceeds this many seconds (healthy: 1.0-2.4s)")
    ap.add_argument("--stall-ratio", type=float, default=2.0,
                    help="reject a level whose mean/median sec-per-superstep exceeds this (stall bursts = external preemption)")
    ap.add_argument("--max-retries", type=int, default=3)
    ap.add_argument("--retry-sleep", type=int, default=180)
    ap.add_argument("--md-out", default=os.path.join("BENCH", "BASELINE.md"))
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    if args.graph_path and not os.path.isdir(args.graph_path):
        prepare_graph(args.vertices, args.avg_degree, args.graph_path)

    runs = {
        lv: run_level(lv, args.rounds, args, f"measure local[{lv}]",
                      args.pinned_partitions)
        for lv in levels
    }

    def thr(r: dict) -> float:
        # steady-state (median superstep): a production PageRank run is
        # O(10-100) supersteps, so the one-time JIT/codegen warmup round
        # is noise there; the median is the honest per-superstep rate.
        return r["pagerank"]["edges_per_sec_superstep_median"]

    effs = {}
    for i, a in enumerate(levels):
        for b in levels[i + 1:]:
            effs[f"{a}->{b}"] = round((thr(runs[b]) / thr(runs[a])) / (b / a), 3)

    r0 = runs[levels[0]]
    e = r0["pagerank"]["edges"]
    k = r0["pagerank"]["supersteps"]

    result = {
        "vertices": args.vertices,
        "edges": e,
        "supersteps": k,
        "partition_protocol": (
            f"pinned={args.pinned_partitions}" if args.pinned_partitions
            else "scaled-with-cores"
        ),
        "levels": {str(lv): runs[lv]["pagerank"] for lv in levels},
        "wall": {str(lv): runs[lv]["queries"]["web_pagerank"] for lv in levels},
        "scaling_efficiency": effs,
        "calib_shuffle_20m_sec": {
            str(lv): runs[lv].get("calib_shuffle_20m_sec") for lv in levels
        },
        "calib_warm_20m_sec": {
            str(lv): runs[lv].get("calib_warm_20m_sec") for lv in levels
        },
        "gate_rejected": {
            str(lv): runs[lv].get("gate_rejected") for lv in levels
        },
    }
    print(json.dumps(result))

    rows = "\n".join(
        f"| local[{lv}] | {k} | {result['wall'][str(lv)]} "
        f"| {runs[lv]['pagerank']['sec_per_superstep_median']} | {thr(runs[lv]):,.0f} "
        f"| {runs[lv].get('calib_warm_20m_sec')} |"
        for lv in levels
    )
    eff_rows = "\n".join(
        f"| {pair} (x{int(pair.split('->')[1]) // int(pair.split('->')[0])}) | {v} |"
        for pair, v in effs.items()
    )
    north_pairs = [
        (p, v) for p, v in effs.items()
        if int(p.split("->")[1]) == 4 * int(p.split("->")[0])
    ]
    north = min(north_pairs, key=lambda t: t[1]) if north_pairs else ("n/a", float("nan"))
    part_note = (
        f"partitions PINNED at {args.pinned_partitions} for every level "
        "(byte-identical physical plans across levels)"
        if args.pinned_partitions
        else "partitions scaled with the level's core count (what a "
        "production launcher does as executor count changes; bare "
        "spark-submit would default to a static 200 — see the pinned-"
        "partition companion table for the byte-identical-plan protocol)"
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, args.md_out)
    with open(md, "w") as f:
        f.write(f"""# BENCH — measured north-rule metrics

Protocol (BASELINE.md): identical deterministic job + input at every
parallelism level, standing in for clusters of that many executors;
fresh JVM per level. `spark.sql.shuffle.partitions`: {part_note}.
JVM GC/JIT thread pools are pinned to each level's core count, so a
small level is not subsidized by host-wide GC threads on this 32-core
box.

**Host-contamination gate** (round-2 lesson): each level's reading was
accepted only if its WARM fixed-calibration job (20M-row
shuffle+hash-agg, code-independent) ran in <= {args.calib_cap}s
(healthy quiet-host range 1.0-2.4s; the contaminated round-2 window
read 4-14s) AND the PageRank mean/median sec-per-superstep ratio was
<= {args.stall_ratio} (stall bursts = external preemption). Rejected
attempts were retried after {args.retry_sleep}s.

Input: deterministic closed-form power-law edge table
({args.vertices:,} vertices, {e:,} edges, bounded-Pareto hub-skewed
in-degree — Common-Crawl-shaped; pages.py generate_edges), built and
saved ONCE at full parallelism, then re-read by every level (a cluster
likewise reads the built table from object storage). Per-level prep
(read + repartition-to-cores + sort + cache + degree table) is untimed
build; the measured region is the PageRank superstep loop only.
Job: NetworkX-semantics PageRank, alpha=0.85, {k} supersteps
(fixed-round for identical work at every level).

Levels {levels} of 32 host cores: three levels so the N->4N claim can
be cross-checked against N->2N and 2N->4N (a superlinear pairwise step
indicates a handicapped small baseline — GC/spill pressure at few
cores — rather than true scaling; see the pairwise table). Levels are
kept <= 8 of 32 cores so each "executor" has full memory bandwidth,
as separate machines would: local[8]->local[32] on ONE box saturates
the shared memory bus (measured 0.28-0.37 in round 1) — an artifact of
co-locating 32 executor threads on one host, not of the plan, which
shuffles the same bytes per core at every level.

| level | supersteps | wall (s) | sec/superstep (median) | edges/sec/superstep (median) | calib warm (s) |
|---|---|---|---|---|---|
{rows}

Pairwise scaling efficiency (throughput ratio / core ratio):

| pair | efficiency |
|---|---|
{eff_rows}

**North-rule N -> 4N scaling efficiency: {north[1]} ({north[0]})**
(target >= 0.8). Where a pairwise value exceeds 1.0, treat it as
measurement noise / small-level handicap, not evidence of superlinear
scaling; the claim stands on ALL pairwise values clearing the bar, not
on the most favorable pair.

Gate decisions per level (null = accepted first try or on retry):
{json.dumps(result["gate_rejected"])}
calib_shuffle_20m_sec (first-run, JIT-dominated, kept for cross-round
comparability) per level: {result["calib_shuffle_20m_sec"]}
calib_warm_20m_sec (the gated control) per level:
{result["calib_warm_20m_sec"]}

Convergence: the same graph shape at tol=1e-6 (L1 < tol*N, NetworkX
semantics) converges in ~30-40 supersteps (bench.py without
--pr-rounds); per-vertex scores match the NumPy oracle to 1e-6
(pytest).

Host-speed caveat: the sandbox is a VM on a shared hypervisor and its
multi-core throughput varies SEVERAL-FOLD with external host load
(round-2 control experiment: the bit-identical round-1 commit re-ran
6x slower than BENCH_r01 recorded, guest idle). The warm-calib gate
above is how this run excludes such windows; cross-ROUND absolute
comparisons must still normalize by the calib numbers.
""")
    print(f"wrote {md}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
