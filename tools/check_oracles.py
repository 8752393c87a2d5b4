"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at the given
sf dir; compare row-count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from graphscope_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        vals = []
        for c in sorted(d):
            v = d[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append((c, v))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # sweep the driver-facing core AND the retired extended registry —
    # the curation (round-4) changes driver sample density, not what
    # this local gate verifies
    qs = dict(entrymod.queries())
    if hasattr(entrymod, "extended_queries"):
        qs.update(entrymod.extended_queries())
    oracles = entrymod.oracle_sql()

    # run ALL DuckDB oracles first (Spark exhausts fds on local[*])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_results: dict[str, tuple[list, list, float]] = {}
    for name in qs:
        if (only and name not in only) or name not in oracles:
            continue
        t0 = time.monotonic()
        ddf = con.sql(oracles[name])
        drows = ddf.fetchall()
        dcols = [d[0] for d in ddf.description]
        duck_results[name] = (drows, dcols, time.monotonic() - t0)
    con.close()

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # keep sweeping — report, don't abort
            import traceback
            traceback.print_exc()
            print(f"{name:24s} FAIL  raised {type(exc).__name__}: {exc}",
                  flush=True)
            failures.append(name)
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows  ({spark_s:.1f}s)", flush=True)
            continue
        drows, dcols, duck_s = duck_results[name]
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = canon(srows, scols) == canon(drows, dcols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{name:24s} {status}  rows={len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {dcols}'} "
            f"vals={'=' if ok_vals else 'DIFF'}  ({spark_s:.1f}s/{duck_s:.1f}s)",
            flush=True,
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_count:
                a, b = canon(srows, scols), canon(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark: {x}\n   duck : {y}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
