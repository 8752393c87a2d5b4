"""Streaming incremental WCC (incremental_wcc_sink): labels after the
stream drains must equal a cold batch wcc over the full edge set."""

from __future__ import annotations

import os

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import wcc
from graphscope_spark.streaming import incremental_wcc_sink


def test_stream_equals_batch(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    work = str(tmp_path / "work")
    os.makedirs(src_dir)

    batch1 = [(i, i + 1) for i in range(0, 10)] + [(50, 51)]
    batch2 = [(10, 50), (60, 61)]  # merges chain with 50s, new comp

    spark.createDataFrame(batch1, "src long, dst long").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)

    stream = spark.readStream.schema("src long, dst long").parquet(src_dir)
    q = incremental_wcc_sink(stream, work)
    q.awaitTermination(120)

    spark.createDataFrame(batch2, "src long, dst long").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    q2 = incremental_wcc_sink(
        spark.readStream.schema("src long, dst long").parquet(src_dir), work
    )
    q2.awaitTermination(120)

    got = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(os.path.join(work, "labels")).collect()
    }
    all_edges = batch1 + batch2
    cold = {
        r["id"]: r["comp"]
        for r in wcc(
            LinkGraph.from_edges(
                spark.createDataFrame(all_edges, "src long, dst long")
            )
        ).collect()
    }
    assert got == cold
    # every vertex of the merged chain shares component 0
    for v in list(range(11)) + [50, 51]:
        assert got[v] == 0
