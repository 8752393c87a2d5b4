"""Dump formatted Catalyst plans for the headline operators into
BENCH/PLANS.md — the plan-quality evidence the 100 TB story rests on
(predicate pushdown reaching the scan, WholeStageCodegen spans, no
per-row Python in hot paths, broadcast vs shuffle choices).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphscope_spark import get_spark
from graphscope_spark import harness as H
from graphscope_spark.graph import LinkGraph


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)

    sections: list[tuple[str, str, str]] = []

    import __spark_entry__ as entrymod

    # round-4 operators
    sections.append((
        "sage_features_g1 (GraphSAGE mean-pool, built fabric + "
        "checkpointed roots/features/pooled)",
        "one expansion + one features join + one (root,hop) agg + "
        "static pivot — 8 Exchanges after the shared-subtree fix",
        plan_of(entrymod.q_sage_features(spark, sf_dir)),
    ))
    sections.append((
        "gremlin_match_g3 (match() pattern sugar)",
        "3 hop patterns = 3 SMJs over the cached fabric; endpoint "
        "agreement folds into the 3rd join's key (read Exchanges "
        "OUTSIDE InMemoryRelation blocks only)",
        plan_of(entrymod.q_gremlin_match(spark, sf_dir)),
    ))

    g1 = H.g1(spark, sf_dir).build()

    # ---- round-5 operators ------------------------------------------
    # large/small-star round body (the edge-rewriting plan that repeats)
    from graphscope_spark.algorithms.cc_twophase import _star_round
    cc_state = g1.edges.where(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).localCheckpoint(eager=True)
    sections.append((
        "cc_two_phase star-op round body (one op per runner round)",
        "expect: one partial+final hash agg computing min(neighbor) "
        "per u, one shuffle join back to the pair list, one "
        "hash-distinct — a handful of Exchanges on one key space, no "
        "windows, no Python. The runner checkpoints between the large "
        "and small ops, so neither re-executes the other's subtree "
        "(chaining both in one step measured 30 Exchanges/round)",
        plan_of(_star_round(cc_state, large=True)),
    ))

    # ppr_batch superstep body (K packed rank columns, ONE edge shuffle)
    pedges = g1.edges.select("src", "dst").localCheckpoint(eager=True)
    pstate = g1.vertices.select(
        "id", F.lit(2.0).alias("outdeg"),
        *[F.lit(0.25).alias(f"r{k}") for k in range(4)],
    ).localCheckpoint(eager=True)
    pcontrib = (
        pedges.join(
            pstate.where(F.col("outdeg") > 0).select(
                F.col("id").alias("src"),
                *[(F.col(f"r{k}") / F.col("outdeg")).alias(f"r{k}")
                  for k in range(4)],
            ),
            "src",
        )
        .groupBy("dst")
        .agg(*[F.sum(f"r{k}").alias(f"r{k}") for k in range(4)])
    )
    sections.append((
        "ppr_batch superstep body (4 seeds packed)",
        "expect: the SAME single E-shuffle as one pagerank superstep — "
        "one join + one partial+final hash agg now carrying 4 sum "
        "columns (map-side combined); K seeds never multiply the "
        "shuffle count",
        plan_of(pcontrib),
    ))

    # bloom probe: filter as literal, zero shuffle
    from graphscope_spark.functions.bloom import BloomFilter, bloom_probe
    docs5 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bf5 = BloomFilter(tuple([0] * 64), 4096, 4)
    sections.append((
        "bloom_probe (membership test)",
        "expect: ONE Project over the scan — 4 md5 positions + "
        "element_at bit tests against the array literal, zero "
        "Exchanges, zero Python",
        plan_of(bloom_probe(docs5, "text", bf5)),
    ))

    # RMAT generator: zero-shuffle codegen fold
    from graphscope_spark.generators import rmat_edges
    sections.append((
        "rmat_edges (Graph500 generator, scale 10)",
        "expect: Range → ONE Project with the aggregate() fold over "
        "bit levels, zero Exchanges, zero Python — embarrassingly "
        "parallel and restart-stable",
        plan_of(rmat_edges(spark, scale=10, edge_factor=8)),
    ))

    # keep_best: struct-max aggregate, no window
    from graphscope_spark.functions.dedup import keep_best as _keep_best
    sections.append((
        "keep_best (recrawl keep-best-per-key)",
        "expect: ONE partial+final hash aggregate of max(struct(score, "
        "tiebreak, row)) — map-side combine reduces hub keys to one "
        "running max per partition; NO row_number window, no sort",
        plan_of(
            _keep_best(docs5, ["source", "lang"], F.col("n_chars"), "doc_id")
        ),
    ))

    # label_spreading round body — same shape as pagerank superstep
    lstate = g1.vertices.select(
        "id", F.lit(2.0).alias("deg"), F.lit(None).cast("long").alias("_cls"),
        F.lit(0.5).alias("s_0"), F.lit(0.5).alias("s_1"),
    ).localCheckpoint(eager=True)
    lmsgs = (
        pedges.join(
            lstate.select(F.col("id").alias("src"), "s_0", "s_1"), "src"
        )
        .groupBy("dst")
        .agg(F.sum("s_0").alias("s_0"), F.sum("s_1").alias("s_1"))
    )
    sections.append((
        "label_spreading round body (2 classes packed)",
        "expect: one E-shuffle join + one partial+final hash agg with "
        "2 packed sums, then the clamp projection — pagerank's plan "
        "with class columns instead of rank",
        plan_of(lmsgs),
    ))

    # quotient rollup: two label joins + one hash agg
    from graphscope_spark.algorithms.quotient import quotient_graph
    q_assign = g1.vertices.select("id", (F.col("id") % 64).alias("label"))
    sections.append((
        "quotient_graph rollup (64-shard contraction)",
        "expect: two joins of E against the label table on the vertex "
        "key + ONE partial+final hash agg on (label_src, label_dst); "
        "no windows, no Python",
        plan_of(quotient_graph(g1, q_assign).edges),
    ))
    # ---- end round-5 ------------------------------------------------

    # onion-decomposition peel round body (the per-layer plan). The
    # production loop localCheckpoints und/deg every round — audit the
    # round over checkpointed inputs, which is the plan that actually
    # repeats.
    o_edges = g1.simple_edges()
    o_und = o_edges.unionAll(
        o_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    o_deg = (g1.vertices.select("id")
             .join(o_und.groupBy(F.col("src").alias("id"))
                   .agg(F.count("*").alias("d")), "id", "left")
             .select("id", F.coalesce("d", F.lit(0)).alias("d"))
             .localCheckpoint(eager=True))
    o_layer = o_deg.where(F.col("d") <= 2).select("id")
    o_next = (o_und.join(o_layer.withColumnRenamed("id", "src"), "src", "left_anti")
              .join(o_layer.withColumnRenamed("id", "dst"), "dst", "left_anti"))
    sections.append((
        "onion_layers peel round body",
        "expect: one scalar min aggregate feeds the cutoff; the round "
        "itself is a degree hash-agg (partial count map-side) + two "
        "left-anti hash joins dropping the peeled layer — all "
        "WholeStageCodegen, remainder shrinks every round",
        plan_of(o_next),
    ))

    # k-corona in-core neighbor count (post-decomposition join)
    from graphscope_spark.algorithms import k_corona as _k_corona
    sections.append((
        "k_corona_g1 (core==k with exactly k in-core neighbors)",
        "expect: the core-decomposition subtree once, then two "
        "left-semi joins restricting the symmetric edge set to the "
        "k-core + ONE neighbor-count hash agg + the exact-k filter "
        "join; no adjacency arrays",
        plan_of(_k_corona(H.g1(spark, sf_dir), 12)),
    ))

    # community-aware link prediction (wedge join + broadcast communities)
    sections.append((
        "community_lp_g1 (Soundarajan-Hopcroft + WIC scores)",
        "expect: ONE wedge self-join keyed on the common endpoint, "
        "community table BroadcastHashJoin-ed on all three wedge "
        "roles, one (u,v) hash agg folding cn/within/ra_sh map-side, "
        "left-anti against existing edges",
        plan_of(entrymod.q_community_lp(spark, sf_dir)),
    ))

    # simrank round body (pair-state Jacobi update) — composed inline
    # so the audited plan is the PRE-checkpoint round expression (the
    # library checkpoints each round, which would hide the dataflow)
    sr_e = (H.g4_edges(spark, sf_dir).where(
        (F.col("src") % 5 == 0) & (F.col("dst") % 5 == 0)
        & (F.col("src") != F.col("dst"))).localCheckpoint(eager=True))
    sr_v = (sr_e.select(F.col("src").alias("id"))
            .unionAll(sr_e.select(F.col("dst").alias("id")))
            .distinct().localCheckpoint(eager=True))
    sr_ind = sr_e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("ind"))
    sr_state = sr_v.select(F.col("id").alias("u"), F.col("id").alias("v"),
                           F.lit(1.0).alias("s")).localCheckpoint(eager=True)
    sr_sum = (sr_state.where(F.col("s") != 0.0)
              .join(sr_e.select(F.col("src").alias("a"),
                                F.col("dst").alias("nu")),
                    sr_state["u"] == F.col("a"))
              .join(sr_e.select(F.col("src").alias("b"),
                                F.col("dst").alias("nv")),
                    sr_state["v"] == F.col("b"))
              .groupBy(F.col("nu").alias("u"), F.col("nv").alias("v"))
              .agg(F.sum("s").alias("tot")))
    sr_new = (sr_v.select(F.col("id").alias("u"))
              .crossJoin(sr_v.select(F.col("id").alias("v")))
              .join(sr_sum, ["u", "v"], "left")
              .join(F.broadcast(sr_ind.select(F.col("id").alias("u"),
                                              F.col("ind").alias("iu"))),
                    "u", "left")
              .join(F.broadcast(sr_ind.select(F.col("id").alias("v"),
                                              F.col("ind").alias("iv"))),
                    "v", "left")
              .select("u", "v",
                      F.when(F.col("u") == F.col("v"), 1.0)
                      .otherwise(F.lit(0.6) * F.coalesce("tot", F.lit(0.0))
                                 / (F.coalesce("iu", F.lit(1))
                                    * F.coalesce("iv", F.lit(1)))).alias("s")))
    sections.append((
        "simrank round body (trimmed G4)",
        "expect per round: TWO shuffle joins of the pair state against "
        "the checkpointed in-edge table + ONE (u,v) hash agg with "
        "partial sums; in-degree normalization as BroadcastHashJoins; "
        "the crossJoin base is the guarded |V|^2 pair frame",
        plan_of(sr_new),
    ))

    # DAG longest-path DP round body (generation-sliced relax)
    from graphscope_spark.algorithms.dag import topological_generations
    dk = H.dagk(spark, sf_dir)
    dk_gens = topological_generations(dk).localCheckpoint(eager=True)
    dk_edges = (dk.edges
                .join(dk_gens.select(F.col("id").alias("dst"),
                                     F.col("generation").alias("dgen")), "dst")
                .localCheckpoint(eager=True))
    dk_state = dk_gens.select("id", F.lit(0.0).alias("dist"),
                              F.col("id").alias("parent"), "generation")
    dk_cur = dk_state.where(F.col("generation") < 3).select(
        F.col("id").alias("src"), F.col("dist").alias("dsrc"))
    dk_best = (dk_edges.where(F.col("dgen") == 3).join(dk_cur, "src")
               .groupBy("dst").agg(F.max(F.struct("dsrc", "src")).alias("s")))
    sections.append((
        "dag_longest_path DP round body (generation slice)",
        "expect: the dgen filter prunes the checkpointed edge slice "
        "BEFORE the join (O(E) relax TOTAL across rounds), one "
        "max-struct hash agg with map-side combine, no Python",
        plan_of(dk_best),
    ))

    # one PageRank superstep body (the per-round plan that repeats)
    edges = g1.edges.select("src", "dst")
    state = g1.vertices.select(
        "id", F.lit(1.0).alias("outdeg"), F.lit(0.5).alias("rank")
    )
    contrib = (
        edges.join(
            state.where(F.col("outdeg") > 0).select(
                F.col("id").alias("src"), (F.col("rank") / F.col("outdeg")).alias("c")
            ),
            "src",
        )
        .groupBy("dst")
        .agg(F.sum("c").alias("contrib_sum"))
    )
    step = state.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
    sections.append((
        "pagerank superstep body",
        "expect: ONE shuffle of E (hash agg with partial_sum map-side), "
        "one shuffle join back to V-state, WholeStageCodegen throughout, "
        "no Python evaluation",
        plan_of(step),
    ))

    # filter + projection pushdown into the parquet scan
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    pushed = li.where(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    sections.append((
        "scan pushdown (filter + column pruning)",
        "expect: PushedFilters [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)], "
        "ReadSchema limited to 2 columns",
        plan_of(pushed),
    ))

    # triangle count (explode-free global count)
    from graphscope_spark.algorithms.triangles import _oriented
    oriented = _oriented(g1)
    adj = oriented.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("n"))
    sections.append((
        "triangle orientation + adjacency build",
        "expect: degree exchange then orientation filter, sort_array "
        "collect_list objecthashagg; no corner explode downstream",
        plan_of(adj),
    ))

    # gremlin 2-hop: one composed plan, two shuffle joins
    from graphscope_spark.traversal import __, traversal
    t = traversal(g1)
    two_hop = t.V(1).repeat(__.out()).times(2).dedup().toDF()
    sections.append((
        "gremlin-lite 2-hop (repeat unrolled)",
        "expect: a single plan with two joins of E on the vertex key + "
        "final hash dedup; point-seed filter pushed to the first join "
        "input (often broadcast by AQE)",
        plan_of(two_hop),
    ))

    # core-decomposition superstep body (h-index round)
    from pyspark.sql import Window

    und = g1.simple_edges()
    und = und.unionAll(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    state = und.groupBy(F.col("src").alias("id")).agg(F.count("*").cast("long").alias("h"))
    nbr = (
        und.join(state.select(F.col("id").alias("dst"), F.col("h").alias("hv")), "dst")
        .select(F.col("src").alias("id"), "hv")
        .join(state.select("id", F.col("h").alias("hcur")), "id")
        .select("id", "hcur", F.least("hv", "hcur").alias("val"))
    )
    cnt = nbr.groupBy("id", "hcur", "val").agg(F.count("*").alias("c"))
    w = Window.partitionBy("id").orderBy(F.desc("val")).rowsBetween(
        Window.unboundedPreceding, 0)
    hidx = (
        cnt.withColumn("cum", F.sum("c").over(w))
        .groupBy("id", "hcur")
        .agg(F.max(F.least(F.col("val"), F.col("cum"))).alias("hnew"))
    )
    sections.append((
        "core-decomposition h-index superstep",
        "expect: one shuffle join of E on the vertex key, partial+final "
        "hash agg down to (id,hcur,val) groups (≤ h+1 rows per vertex — "
        "hub-safe, no adjacency arrays), then a window whose partitions "
        "are those bounded groups; WholeStageCodegen, no Python",
        plan_of(hidx),
    ))

    # gremlin group().by(key).by(value) — one hash-aggregate
    from graphscope_spark.traversal import __ as G_, traversal as traversal2
    grp = (
        traversal2(g1).V().out()
        .group().by().by(G_.out().count())
        .toDF()
    )
    sections.append((
        "gremlin-lite group().by().by()",
        "expect: the whole step chain in ONE plan — hop join, then a "
        "single partial+final hash aggregate keyed on the group key; "
        "no window, no collect",
        plan_of(grp),
    ))

    # betweenness forward-sweep body (the per-level plan that repeats)
    from graphscope_spark.algorithms.betweenness import _bfs_fabric
    bedges = _bfs_fabric(g1)
    frontier = g1.vertices.limit(64).select(
        F.col("id").alias("s"), F.col("id"), F.lit(1.0).alias("sigma"))
    settled = frontier.select("s", "id")
    cand = (
        bedges.join(frontier.select("s", F.col("id").alias("src"), "sigma"), "src")
        .groupBy("s", "dst").agg(F.sum("sigma").alias("sigma"))
        .withColumnRenamed("dst", "id")
        .join(settled, ["s", "id"], "left_anti")
    )
    sections.append((
        "betweenness forward-sweep level (multi-source Brandes)",
        "expect: one shuffle join of E on the vertex key, partial+final "
        "hash agg summing sigma keyed (s, dst) — map-side combine over "
        "shortest-path counts — then a left-anti hash join against the "
        "settled pair set; WholeStageCodegen, no Python",
        plan_of(cand),
    ))

    # LSH band join (the bucketed near-dup candidate plan)
    from graphscope_spark.functions import dedup as D
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cand = D.minhash_lsh_pairs(docs)
    sections.append((
        "minhash-LSH candidate pairs",
        "expect: shuffle keyed on (band, bucket) only — no all-pairs "
        "product; self-join within buckets",
        plan_of(cand),
    ))

    # host-graph rollup: URL→host extraction folded into the projection
    from graphscope_spark import web as W
    li2 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    page_edges = li2.select(
        F.concat(F.lit("http://h"), (F.col("o_custkey") % 20).cast("string"),
                 F.lit(".com/p")).alias("src_url"),
        F.concat(F.lit("http://h"), (F.col("o_orderkey") % 25).cast("string"),
                 F.lit(".com/q")).alias("dst_url"),
    )
    hg = W.host_graph(page_edges, level="domain", drop_self=True)
    sections.append((
        "host-graph rollup (url→domain + count)",
        "expect: regexp/array host extraction fused into the scan "
        "projection (one WholeStageCodegen span), then ONE partial+final "
        "hash aggregate on (src_host, dst_host) — hub hosts collapse "
        "map-side, no salting needed, no Python",
        plan_of(hg),
    ))

    # dedup_lines: global first-occurrence line dedup
    lines_out = D.dedup_lines(docs, delim=" ")
    sections.append((
        "dedup_lines (C4-style global line dedup + reassembly)",
        "expect: posexplode projection, ONE hash agg on md5(line) with "
        "partial min(struct) map-side, one shuffle join back on the "
        "line hash, one per-doc objecthashagg for reassembly; no "
        "window, no Python",
        plan_of(lines_out),
    ))

    # pii_redact: pure codegen regexp scan
    from graphscope_spark.functions import text as TX
    pii = TX.pii_redact(docs)
    sections.append((
        "pii_redact (email/IP/phone scrub)",
        "expect: a single Project over the scan — all six regexp "
        "expressions in one WholeStageCodegen span, zero shuffles, "
        "zero Python",
        plan_of(pii),
    ))

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "PLANS.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    notes = os.path.join(os.path.dirname(out), "PLANS_NOTES.md")
    with open(out, "w") as f:
        f.write("# Plan audit — `.explain(\"formatted\")` for headline operators\n\n"
                f"Generated by tools/explain_audit.py at {sf_dir}.\n")
        for title, expect, plan in sections:
            f.write(f"\n## {title}\n\n_{expect}_\n\n```\n{plan}```\n")
        # measured-narrative appendix (maintained by hand, survives regen)
        if os.path.exists(notes):
            f.write("\n")
            f.write(open(notes).read())
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
