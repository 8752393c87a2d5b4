"""Machine scaling-envelope controls for the N -> 4N evidence.

Two process-parallel microbenchmarks bracket what ANY job can achieve
when scaling 2 -> 8 worker processes on this box:

- cpu: integer hash loop, cache-resident — measures whether the
  hypervisor actually delivers 4x the cycles (scaling factor ~4.0 on
  an honest host; round-2 contaminated windows read ~0.6, i.e.
  anti-scaling).
- membw: strided sum over a per-process 512 MB array — measures the
  box's aggregate memory-bandwidth scaling, the physical ceiling for
  shuffle/hash-agg workloads like a PageRank superstep. On a single
  socket this saturates well below 4x; on a real cluster of separate
  machines it would be ~4x by construction.

Report: per-level aggregate ops/s and the pairwise scaling factor.
A distributed-plan property can only be judged against this envelope:
if the box delivers X aggregate bandwidth going 2 -> 8 cores, a
bandwidth-bound job's achievable efficiency is X/4, whatever the plan.

Usage: python tools/machine_envelope.py [--levels 2,8] [--secs 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _cpu_worker(secs: float, barrier, out) -> None:
    x, n = 0x9E3779B97F4A7C15, 0
    barrier.wait()  # start together, after per-process setup
    stop_t = time.monotonic() + secs
    while time.monotonic() < stop_t:
        for _ in range(100_000):
            x = (x * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        n += 100_000
    out.put(n)


def _membw_worker(secs: float, barrier, out) -> None:
    import numpy as np

    a = np.ones(64 * 1024 * 1024, dtype=np.float64)  # 512 MB, touched
    barrier.wait()  # alloc/import excluded from the timed window
    n = 0
    stop_t = time.monotonic() + secs
    while time.monotonic() < stop_t:
        n += int(a[::8].sum() > 0) * a[::8].size  # stride-8: miss-dominated
        a[::8] += 1.0
    out.put(n)


def run(kind: str, procs: int, secs: float) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    worker = _cpu_worker if kind == "cpu" else _membw_worker
    ps = [mp.Process(target=worker, args=(secs, barrier, q))
          for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return max(total, 1) / secs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--secs", type=float, default=8.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    out: dict = {"levels": levels, "secs": args.secs}
    for kind in ("cpu", "membw"):
        rates = {lv: run(kind, lv, args.secs) for lv in levels}
        out[kind] = {str(lv): round(r) for lv, r in rates.items()}
        a, b = levels[0], levels[-1]
        out[f"{kind}_scaling_factor"] = round(rates[b] / rates[a], 3)
        out[f"{kind}_efficiency"] = round((rates[b] / rates[a]) / (b / a), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
