"""Superstep driver — the BSP fixpoint loop Catalyst does not have.

Mirrors the reference's worker loop (core/worker/
default_property_worker.h:84-124: messages_.Start(); PEval; then
StartARound / IncEval / FinishARound until ToTerminate()), re-expressed
for Spark:

- each superstep is a DataFrame transformation state → state';
- convergence is a scalar aggregate collected on the driver (the
  reference's global Sum(eps) communicator, pagerank_networkx.h:83,135);
- per-iteration *checkpointing* truncates the logical-plan lineage that
  would otherwise grow by one self-join per superstep (100 supersteps of
  uncheckpointed joins OOM the driver on plan size alone);
- a *manifest* (JSONL: iteration, rows, metrics, wall time, checkpoint
  path) gives resumable runs with per-partition lineage — the north-rule
  requirement. `resume()` scans the manifest and restarts from the last
  complete iteration.

At cluster scale the checkpoint target is an Iceberg table (snapshot per
iteration): pass ``checkpoint_format="iceberg"`` and the runner writes
``<catalog>.<db>.<run>_iter_NNNNN`` tables through any Iceberg catalog
configured on the session (``spark.sql.catalog.*`` confs + the
iceberg-spark-runtime jar, neither shippable in this sandbox — the path
raises a clear error here and is exercised by the catalog-detection
pytest). The sandbox default is a parquet dir per iteration with the
same manifest/resume contract. `localCheckpoint` (memory-replicated,
no I/O) is the fast default when resumability is not required.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Serialized in-memory storage for per-round state checkpoints. The
# default (deserialized) level pins tens of millions of row OBJECTS in
# the old generation — on a 10^7-vertex state that is multi-second (at
# few-core levels: multi-minute) major-GC pauses per round. Serialized
# blocks are a handful of byte arrays: same data, ~zero GC trace cost.
_CKPT_LEVEL = StorageLevel(True, True, False, False, 1)  # MEMORY_AND_DISK_SER


def iceberg_catalog(spark) -> str | None:
    """Name of an Iceberg catalog configured on this session, else
    None. Detection: a ``spark.sql.catalog.<name>`` conf whose value
    names an Iceberg Spark catalog class. No jar probing — if the conf
    is set but the jar is missing, the write fails with Spark's own
    ClassNotFound, which is the right error."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - no JVM context
        return None
    for k, v in confs:
        parts = k.split(".")
        if (len(parts) == 4 and k.startswith("spark.sql.catalog.")
                and "iceberg" in str(v).lower()):
            return parts[3]
    return None


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)


class SuperstepRunner:
    """Drives ``state' = step(state, i)`` until ``until(state', state, i)``
    returns True or ``max_iter`` is reached.

    step: (state, iteration) -> new state DataFrame
    until: (new_state, old_state, iteration) -> bool | (bool, metrics dict)
           (evaluated AFTER the step; return True to stop)
    """

    def __init__(
        self,
        max_iter: int = 100,
        checkpoint_every: int = 5,
        checkpoint_dir: str | None = None,
        eager: bool = True,
        adaptive: bool = False,
        checkpoint_format: str = "parquet",
    ):
        if checkpoint_format not in ("parquet", "iceberg"):
            raise ValueError(
                f"checkpoint_format must be parquet|iceberg, got "
                f"{checkpoint_format!r}")
        self.checkpoint_format = checkpoint_format
        self.max_iter = max_iter
        self.checkpoint_every = max(1, checkpoint_every)
        self.checkpoint_dir = checkpoint_dir
        self.eager = eager
        # AQE inside the fixpoint loop is measured ~2x overhead per
        # superstep (adaptive stage materialization + re-planning on
        # every tiny iterative query) while buying nothing: the loop's
        # shuffle sizes are stable across iterations and hub skew is
        # handled by explicit salting (skew.py). Off by default HERE
        # ONLY — one-shot build/ETL queries keep session-level AQE.
        self.adaptive = adaptive

    # -- manifest ------------------------------------------------------
    def _manifest_path(self) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, "manifest.jsonl")

    def _append_manifest(self, rec: dict) -> None:
        p = self._manifest_path()
        if not p:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read_manifest(self) -> list[dict]:
        p = self._manifest_path()
        if not p or not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def last_complete(self) -> dict | None:
        recs = [r for r in self.read_manifest() if r.get("complete")]
        return recs[-1] if recs else None

    # -- cache eviction ------------------------------------------------
    @staticmethod
    def _ckpt_rdd_id(df: DataFrame) -> int | None:
        """RDD id of a localCheckpoint'ed DataFrame (its analyzed plan
        is a LogicalRDD wrapping exactly the persisted RDD)."""
        try:
            return int(df._jdf.queryExecution().analyzed().rdd().id())
        except Exception:
            return None

    @staticmethod
    def _unpersist_id(df: DataFrame, rid: int | None) -> None:
        """Free a superseded per-round localCheckpoint block. Without
        this, k supersteps hold k cached states; long runs then evict /
        GC-thrash. Targets ONLY the tracked checkpoint RDD — never the
        caller's edge/vertex caches."""
        if rid is None:
            return
        sc = df.sparkSession.sparkContext
        try:
            r = sc._jsc.getPersistentRDDs().get(rid)
            if r is not None:
                r.unpersist(False)
        except Exception:
            pass

    # -- checkpointing -------------------------------------------------
    def _checkpoint(self, df: DataFrame, iteration: int) -> tuple[DataFrame, str | None]:
        if self.checkpoint_dir and self.checkpoint_format == "iceberg":
            # checkpoint_dir doubles as the run name: one Iceberg table
            # per iteration under <catalog>.graphscope_ckpt; resume
            # reads the table back through the catalog. Requires a
            # configured Iceberg catalog + runtime jar on the session.
            spark = df.sparkSession
            cat = iceberg_catalog(spark)
            if cat is None:
                raise RuntimeError(
                    "checkpoint_format='iceberg' but no Iceberg catalog "
                    "is configured on this SparkSession (need a "
                    "spark.sql.catalog.<name> conf pointing at an "
                    "Iceberg SparkCatalog plus the "
                    "iceberg-spark-runtime jar). In this sandbox use "
                    "the parquet checkpoint_format — identical "
                    "manifest/resume contract."
                )
            run = os.path.basename(os.path.normpath(self.checkpoint_dir))
            tbl = f"{cat}.graphscope_ckpt.{run}_iter_{iteration:05d}"
            df.writeTo(tbl).using("iceberg").createOrReplace()
            return spark.table(tbl), f"iceberg:{tbl}"
        if self.checkpoint_dir:
            path = os.path.join(self.checkpoint_dir, f"iter_{iteration:05d}")
            df.write.mode("overwrite").parquet(path)
            spark = df.sparkSession
            return spark.read.parquet(path), path
        # localCheckpoint: truncates lineage without disk I/O (fast path).
        return df.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL), None

    @staticmethod
    def _partition_lineage(path: str | None) -> list[dict]:
        """Per-partition lineage of a durable checkpoint: one record per
        written part file (file name + bytes). This is what makes a
        resume auditable partition-by-partition (north rule:
        'per-iteration checkpointing … with per-partition lineage and
        metrics') — on a real cluster the same listing comes from the
        Iceberg/parquet manifest instead of the local FS."""
        if not path or not os.path.isdir(path):
            return []
        return [
            {"file": f, "bytes": os.path.getsize(os.path.join(path, f))}
            for f in sorted(os.listdir(path))
            if f.startswith("part-")
        ]

    # -- main loop -----------------------------------------------------
    def run(
        self,
        init_state: DataFrame,
        step: Callable[[DataFrame, int], DataFrame],
        until: Callable[[DataFrame, DataFrame, int], bool | tuple[bool, dict]] | None = None,
        resume: bool = False,
    ) -> SuperstepResult:
        state = init_state
        start_iter = 0
        history: list[dict] = []

        if resume and self.checkpoint_dir:
            last = self.last_complete()
            if last and last.get("path"):
                spark = init_state.sparkSession
                p = last["path"]
                state = (spark.table(p[len("iceberg:"):])
                         if p.startswith("iceberg:")
                         else spark.read.parquet(p))
                start_iter = int(last["iteration"]) + 1
                history = self.read_manifest()

        spark = init_state.sparkSession
        # Loop-scoped configs (saved/restored around the fixpoint):
        # - AQE off: adaptive re-planning is ~2x overhead per tiny
        #   iterative query and buys nothing on stable shuffle sizes.
        # - broadcast joins off: the rank/label vector side would be
        #   auto-broadcast at sandbox sizes, serializing a multi-million
        #   entry hash relation PER SUPERSTEP on one thread (measured:
        #   dominates the round and kills core-scaling). At the design
        #   scale (10^9+ vertices) it could never broadcast; the
        #   shuffle-free SMJ over the pre-partitioned+sorted edge cache
        #   is the scale-representative plan.
        loop_conf = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true" if self.adaptive else "false",
        }
        saved = {k: spark.conf.get(k) for k in loop_conf}
        for k, v in loop_conf.items():
            spark.conf.set(k, v)

        state = state.localCheckpoint(eager=self.eager, storageLevel=_CKPT_LEVEL)
        state_id = self._ckpt_rdd_id(state)
        converged = False
        it = start_iter
        try:
            converged, it, state, rounds = self._loop(
                state, step, until, start_iter, history, state_id
            )
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        if (rounds and self.checkpoint_dir and history
                and not history[-1].get("complete")):
            # durable final checkpoint for the resume contract (the
            # stopping round may have been a persist-only round).
            # Guarded on rounds > 0: with a zero-round run (resume past
            # max_iter) history[-1] is a PRIOR run's incomplete record
            # and writing the resumed state under its iteration number
            # would silently skip the lost iterations on the next
            # resume.
            state, path = self._checkpoint(state, history[-1]["iteration"])
            history[-1]["path"] = path
            history[-1]["complete"] = True
            history[-1]["partitions"] = self._partition_lineage(path)
            self._append_manifest(history[-1])
        return SuperstepResult(
            state=state, iterations=rounds, converged=converged, history=history
        )

    def _loop(self, state, step, until, start_iter, history, state_id):
        converged = False
        it = start_iter
        rounds = 0
        for it in range(start_iter, self.max_iter):
            rounds += 1
            t0 = time.monotonic()
            new_state = step(state, it)

            # Materialize ONCE per superstep via RDD-level localCheckpoint
            # (lineage truncation without cacheManager involvement —
            # DataFrame.persist would lazily invalidate+rebuild dependent
            # cache entries on unpersist of their parents, silently
            # resurrecting full lineage). The convergence aggregate then
            # reads the materialized blocks.
            new_state = new_state.localCheckpoint(
                eager=self.eager, storageLevel=_CKPT_LEVEL
            )
            new_id = self._ckpt_rdd_id(new_state)

            stop, metrics = False, {}
            if until is not None:
                res = until(new_state, state, it)
                if isinstance(res, tuple):
                    stop, metrics = res
                else:
                    stop = bool(res)

            do_ckpt = ((it + 1) % self.checkpoint_every == 0) or stop or (
                it == self.max_iter - 1
            )
            path = None
            if do_ckpt and self.checkpoint_dir:
                # durable checkpoint: write the already-materialized
                # partitions (no recompute), re-read for lineage reset
                new_state, path = self._checkpoint(new_state, it)

            elapsed = time.monotonic() - t0
            rec = {
                "iteration": it,
                "seconds": round(elapsed, 4),
                "path": path,
                "complete": bool(path),
                "partitions": self._partition_lineage(path),
                **metrics,
            }
            history.append(rec)
            self._append_manifest(rec)

            if not (self.eager or until is not None
                    or (do_ckpt and self.checkpoint_dir)):
                # lazy localCheckpoint and nothing in this round ran an
                # action over new_state: its blocks do not exist yet
                # and the parent's blocks are its only data source —
                # force materialization BEFORE freeing the parent
                new_state.count()

            # old state fully consumed (step + until done) — free it
            self._unpersist_id(new_state, state_id)
            state_id = new_id

            state = new_state
            if stop:
                converged = True
                break

        return converged, it, state, rounds
