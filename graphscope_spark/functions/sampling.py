"""Deterministic sampling / split assignment for training-data
pipelines (no analytical-engine counterpart; the reference's learning
engine assigns train/val/test splits at load time —
python/graphscope/learning/graph.py:123-253 gen_labels — which these
operators re-express as engine-portable hash draws).

Draw: u(id) = int(first 8 hex chars of md5(seed ':' id)) / 2^32 — a
uniform [0,1) value that is restart-stable, cluster-size-independent,
and bit-identical in any engine with md5 (the DuckDB oracles replay
it). No RNG state, no sampleBy non-determinism across retries.

Scale shape: one codegen projection per row (md5 + conv + compare) —
no shuffle, no UDF; filters push down on top of the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def uniform_draw(id_col: Column | str, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) per id (md5-based, engine-portable)."""
    h = F.md5(F.concat_ws(":", F.lit(int(seed)).cast("string"),
                          F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli sample at the given fractions (strata
    absent from `fractions` are dropped — DataFrame.sampleBy semantics,
    but deterministic under retry/restart and identical at any
    parallelism)."""
    frac = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    return (
        df.withColumn("__f", frac.getItem(F.col(strata_col)))
        .where(F.col("__f").isNotNull()
               & (uniform_draw(id_col, seed) < F.col("__f")))
        .drop("__f")
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or arbitrary) split labels by
    cumulative thresholds over the uniform draw; weights must sum to
    ~1. Mirrors the reference learning engine's gen_labels ranges with
    a hash draw instead of positional ranges (stable under data
    reordering)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = uniform_draw(id_col, seed)
    expr, acc = None, 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)
