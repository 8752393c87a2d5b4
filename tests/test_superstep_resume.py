"""Checkpoint manifest + resume (north rule: resumable from checkpoint
with per-partition lineage + metrics) — superstep.py contract."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from graphscope_spark.superstep import SuperstepRunner


def _counter_step(state, it):
    return state.select("id", (F.col("x") + 1).alias("x"))


def _until(new, old, it):
    s = new.agg(F.sum("x")).collect()[0][0]
    return False, {"sum_x": int(s)}


def test_manifest_written_and_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ck")
    init = spark.range(10).select(F.col("id"), F.lit(0).alias("x"))

    r1 = SuperstepRunner(max_iter=4, checkpoint_every=2, checkpoint_dir=ckpt)
    res1 = r1.run(init, _counter_step, _until)
    assert res1.iterations == 4
    assert {r["x"] for r in res1.state.collect()} == {4}

    # manifest records every iteration with metrics; checkpoint rounds
    # carry a durable path
    with open(os.path.join(ckpt, "manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [r["iteration"] for r in recs] == [0, 1, 2, 3]
    assert all("sum_x" in r and "seconds" in r for r in recs)
    complete = [r for r in recs if r.get("complete")]
    assert complete and complete[-1]["iteration"] == 3
    assert os.path.exists(complete[-1]["path"])
    # per-partition lineage: one record per written part file, with
    # sizes, for every durable checkpoint; absent on non-ckpt rounds
    for r in recs:
        if r.get("complete"):
            assert r["partitions"], r
            assert all(
                p["file"].startswith("part-") and p["bytes"] > 0
                for p in r["partitions"]
            )
            assert all(
                os.path.exists(os.path.join(r["path"], p["file"]))
                for p in r["partitions"]
            )
        else:
            assert r["partitions"] == []

    # resume continues from the last complete iteration, not from scratch
    r2 = SuperstepRunner(max_iter=6, checkpoint_every=2, checkpoint_dir=ckpt)
    res2 = r2.run(init, _counter_step, _until, resume=True)
    assert res2.iterations == 2  # iterations 4 and 5 only
    assert {r["x"] for r in res2.state.collect()} == {6}


def test_no_dir_uses_local_checkpoint(spark):
    init = spark.range(5).select(F.col("id"), F.lit(0).alias("x"))
    res = SuperstepRunner(max_iter=3).run(init, _counter_step, None)
    assert res.iterations == 3
    assert {r["x"] for r in res.state.collect()} == {3}


def test_lazy_checkpoint_fixed_rounds_no_until(spark):
    """eager=False + until=None + no durable dir: each round must
    materialize the lazy checkpoint BEFORE freeing its parent, or the
    chain dies with 'checkpoint block not found'."""
    init = spark.range(10).select(F.col("id"), F.lit(0).alias("x"))
    res = SuperstepRunner(max_iter=3, eager=False).run(
        init, _counter_step, None)
    assert {r["x"] for r in res.state.collect()} == {3}
    assert res.iterations == 3


def test_resume_past_max_iter_runs_zero_rounds(spark, tmp_path):
    """Resuming with start_iter >= max_iter must report 0 iterations
    and must NOT overwrite the manifest's incomplete tail with the
    older resumed state (which would skip iterations on re-resume)."""
    ckpt = str(tmp_path / "ck2")
    init = spark.range(10).select(F.col("id"), F.lit(0).alias("x"))
    r1 = SuperstepRunner(max_iter=4, checkpoint_every=2, checkpoint_dir=ckpt)
    r1.run(init, _counter_step, _until)
    before = r1.read_manifest()
    # resume with a smaller budget than what already completed
    r2 = SuperstepRunner(max_iter=2, checkpoint_every=2, checkpoint_dir=ckpt)
    res = r2.run(init, _counter_step, _until, resume=True)
    assert res.iterations == 0
    assert not res.converged
    # state is the resumed checkpoint, untouched
    assert {r["x"] for r in res.state.collect()} == {4}
    # manifest gained no record claiming new work
    after = r2.read_manifest()
    assert [r["iteration"] for r in after] == [r["iteration"] for r in before]


def test_iceberg_checkpoint_detection_and_guard(spark, tmp_path):
    """checkpoint_format='iceberg' is a real code path gated on a
    configured Iceberg catalog: in this sandbox no catalog exists, so
    detection returns None and the runner raises the documented error
    instead of silently writing parquet."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from graphscope_spark.superstep import (
        SuperstepRunner, iceberg_catalog,
    )

    assert iceberg_catalog(spark) is None
    runner = SuperstepRunner(
        max_iter=2, checkpoint_every=1,
        checkpoint_dir=str(tmp_path / "run1"),
        checkpoint_format="iceberg",
    )
    init = spark.range(4).select(F.col("id"))
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        runner.run(init, lambda s, i: s, lambda n, o, i: (False, {}))
    with _pytest.raises(ValueError, match="parquet\\|iceberg"):
        SuperstepRunner(checkpoint_format="delta")
