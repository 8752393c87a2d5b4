"""SparkSession factory with scale-oriented defaults.

The configs here are the ones that matter at 100 TB on a 1000-executor
cluster; they are harmless on local[*]:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting):
  power-law web graphs concentrate edges on mega-hub keys, and AQE's
  skew-join handling splits the oversized join partitions that a plain
  hash-partitioned ``edges JOIN ranks ON src`` would otherwise produce.
- Arrow on for every pandas boundary (UDFs + toPandas), no per-row Python.
- shuffle.partitions scaled with parallelism (caller overridable) —
  the reference's "fragments per worker"; at cluster scale set this to
  2-3x total cores via spark-submit conf, AQE coalesces the tail.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graphscope-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` default: $SPARK_GRAFT_MASTER or local[$SPARK_GRAFT_CPUS]
    (falling back to local[*]). On a real cluster this is supplied by
    spark-submit and the ``master`` arg is left None.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    if shuffle_partitions is None:
        env_p = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        if env_p:
            # explicit override: scaling runs (tools/bench_scaling.py)
            # set this per level — either to the level's core count
            # (what a production launcher/job template does when
            # executor count changes; bare spark-submit would default
            # to a STATIC 200 regardless of cluster size) or to a
            # pinned value via --pinned-partitions so every level runs
            # a byte-identical plan. BENCH/BASELINE.md reports both
            # protocols side by side (ADVICE r2).
            shuffle_partitions = int(env_p)
        elif inner.isdigit():
            # default local[N] → N partitions
            shuffle_partitions = int(inner)
        else:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Iterative algorithms checkpoint per-superstep; keep lineage short.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # 128 MB scan splits: the sweet spot for wide parquet page tables.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: driver == executor, so ALL caching (per-superstep
        # localCheckpoints) lives in this heap — size it generously or
        # iterative jobs GC-thrash (observed 2-4s pauses at 8g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # batch-job timeout headroom: a stop-the-world GC on a fat heap
        # must not get the executor declared dead mid-superstep
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill scratch: production executors write shuffle files
    # to node-local NVMe, which scales with the number of nodes. In
    # this single-box sandbox the default (/tmp) is one shared virtual
    # disk whose bandwidth does NOT scale with cores — a measurement
    # artifact, not a plan property — so tmpfs stands in for
    # node-local storage when available. Override with
    # SPARK_GRAFT_LOCAL_DIR (set it to a disk path to model
    # disk-bound shuffle).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-graft-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        # e.g. -XX:ParallelGCThreads=N for scaling runs: a local[N]
        # "executor" on a many-core host otherwise gets host-wide GC
        # threads — a hidden subsidy that inflates the small level
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
