"""Driver-contract harness: Spark queries + equivalent DuckDB oracle SQL.

Each operator from SURVEY.md §2 is exposed as a (spark_fn, oracle_sql)
pair over /root/testdata parquet tables. Graphs are derived
deterministically from the TPC-H-ish tables so the SQL oracle can
reproduce them:

- G1 "cust→supp" (directed bipartite, hub-skewed on suppliers):
    SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
- G2 "supplier co-occurrence" (undirected canonical src<dst):
    SELECT DISTINCT a.l_suppkey src, b.l_suppkey dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey

Iterative algorithms are exposed FIXED-ROUND (the reference's plain
`pagerank`/`cdlp` apps are likewise fixed-round) so the oracle SQL can
unroll the same number of supersteps as CTE chains. Convergence-driven
variants are exercised by pytest against the NumPy oracles instead.

Float columns are rounded (6 dp) on BOTH sides: Spark and DuckDB sum
in different orders, so raw doubles differ in the last ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph

OFFSET = 1_000_000  # supplier id offset in G1 (avoid custkey collisions)


# ----------------------------------------------------------------------
# Graph derivations (Spark side)
# ----------------------------------------------------------------------
def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def g1_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + OFFSET).cast("long").alias("dst"),
        )
        .distinct()
    )


G1_SQL = f"""
SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       CAST(l_suppkey + {OFFSET} AS BIGINT) AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def g2_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").cast("long").alias("src"),
            F.col("b.l_suppkey").cast("long").alias("dst"),
        )
        .distinct()
    )


G2_SQL = """
SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS src,
       CAST(b.l_suppkey AS BIGINT) AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


def g1(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph.from_edges(g1_edges(spark, sf_dir), directed=True)


def g2(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph.from_edges(g2_edges(spark, sf_dir), directed=True)


# ----------------------------------------------------------------------
# Oracle SQL generators — fixed-round supersteps unrolled as CTE chains
# ----------------------------------------------------------------------
def pagerank_sql(
    rounds: int,
    alpha: float = 0.85,
    graph_sql: str | None = None,
    id_alias: str = "id",
) -> str:
    """Unrolled NetworkX-semantics PageRank (SURVEY.md §2.4.1) over
    ``graph_sql`` — any (src, dst) edge query, numeric or string keys
    (the unroll only ever joins on equality) — defaulting to G1.
    ``id_alias`` renames the output id column (e.g. 'host')."""
    ctes = [
        f"edges AS MATERIALIZED ({graph_sql if graph_sql is not None else G1_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        """outdeg AS MATERIALIZED (
            SELECT v.id, CAST(COUNT(e.src) AS DOUBLE) AS outdeg
            FROM verts v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id)""",
        "r0 AS MATERIALIZED (SELECT id, outdeg, 1.0/(SELECT n FROM n) AS rank FROM outdeg)",
    ]
    for i in range(rounds):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"""d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0.0) * {alpha} AS ds
                 FROM {prev} WHERE outdeg = 0)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank / p.outdeg) AS contrib
                 FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.outdeg,
                        (1.0 - {alpha})/(SELECT n FROM n)
                        + (SELECT ds FROM d{i})/(SELECT n FROM n)
                        + {alpha} * COALESCE(c.contrib, 0.0) AS rank
                 FROM r0 v LEFT JOIN c{i} c ON c.id = v.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id AS {id_alias}, ROUND(rank, 6) AS rank FROM r{rounds}"""
    )


def pagerank_personalized_sql(
    rounds: int, alpha: float = 0.85, w1: float = 0.7, w2: float = 0.3
) -> str:
    """Unrolled personalized PageRank over G1: reset vector p puts
    w1/w2 (normalized) on the two smallest vertex ids, 0 elsewhere;
    dangling vector defaults to p (NX semantics)."""
    t = w1 + w2
    p1, p2 = w1 / t, w2 / t
    ctes = [
        f"edges AS MATERIALIZED ({G1_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        """outdeg AS MATERIALIZED (
            SELECT v.id, CAST(COUNT(e.src) AS DOUBLE) AS outdeg
            FROM verts v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id)""",
        """s AS MATERIALIZED (SELECT MIN(id) AS s1,
            (SELECT MIN(id) FROM verts
              WHERE id > (SELECT MIN(id) FROM verts)) AS s2 FROM verts)""",
        f"""r0 AS MATERIALIZED (
            SELECT o.id, o.outdeg,
                   CASE WHEN o.id = (SELECT s1 FROM s) THEN {p1}
                        WHEN o.id = (SELECT s2 FROM s) THEN {p2}
                        ELSE 0.0 END AS p,
                   1.0/(SELECT n FROM n) AS rank
            FROM outdeg o)""",
    ]
    for i in range(rounds):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"""d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0.0) * {alpha} AS ds
                 FROM {prev} WHERE outdeg = 0)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank / p.outdeg) AS contrib
                 FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.outdeg, v.p,
                        (1.0 - {alpha}) * v.p
                        + (SELECT ds FROM d{i}) * v.p
                        + {alpha} * COALESCE(c.contrib, 0.0) AS rank
                 FROM r0 v LEFT JOIN c{i} c ON c.id = v.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, ROUND(rank, 6) AS rank FROM r{rounds}"""
    )


def pagerank_weighted_sql(rounds: int, alpha: float = 0.85) -> str:
    """Unrolled weighted PageRank over the undirected weighted G2:
    contributions are rank·w/Σw(out) along the symmetrized fabric."""
    ctes = [
        f"e0 AS MATERIALIZED ({G2W_SQL})",
        """edges AS MATERIALIZED (SELECT src, dst, w FROM e0
                     UNION ALL SELECT dst, src, w FROM e0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        """outw AS MATERIALIZED (
            SELECT v.id, COALESCE(SUM(e.w), 0.0) AS outdeg
            FROM verts v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id)""",
        "r0 AS MATERIALIZED (SELECT id, outdeg, 1.0/(SELECT n FROM n) AS rank FROM outw)",
    ]
    for i in range(rounds):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"""d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0.0) * {alpha} AS ds
                 FROM {prev} WHERE outdeg = 0)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
                 SELECT e.dst AS id, SUM(p.rank / p.outdeg * e.w) AS contrib
                 FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.outdeg,
                        (1.0 - {alpha})/(SELECT n FROM n)
                        + (SELECT ds FROM d{i})/(SELECT n FROM n)
                        + {alpha} * COALESCE(c.contrib, 0.0) AS rank
                 FROM r0 v LEFT JOIN c{i} c ON c.id = v.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, ROUND(rank, 6) AS rank FROM r{rounds}"""
    )


def ppr_batch_sql(rounds: int, k: int = 4, alpha: float = 0.85) -> str:
    """Unrolled K-seed batched personalized PageRank over G1 (twin of
    algorithms/ppr.py::ppr_batch): seeds = the K smallest vertex ids,
    one rank column per seed carried through the whole CTE chain —
    the same columnar layout the Spark side ships per superstep."""
    rcols = [f"r{j}" for j in range(k)]

    def seed(j: int) -> str:
        return f"(SELECT id FROM sv WHERE rn = {j + 1})"

    ctes = [
        f"edges AS MATERIALIZED ({G1_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        """outdeg AS MATERIALIZED (
            SELECT v.id, CAST(COUNT(e.src) AS DOUBLE) AS outdeg
            FROM verts v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id)""",
        """sv AS MATERIALIZED (
            SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM verts)""",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS MATERIALIZED (SELECT o.id, o.outdeg, "
        + ", ".join(
            f"1.0/(SELECT n FROM n) AS {c}" for c in rcols
        )
        + " FROM outdeg o)",
    ]
    for i in range(rounds):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"COALESCE(SUM(CASE WHEN outdeg = 0 THEN {c} END), 0.0)"
                f" * {alpha} AS {c}"
                for c in rcols
            )
            + f" FROM {prev})"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, "
            + ", ".join(f"SUM(p.{c} / p.outdeg) AS {c}" for c in rcols)
            + f" FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0"
            " GROUP BY e.dst)"
        )
        ctes.append(
            f"{cur} AS MATERIALIZED (SELECT v.id, v.outdeg, "
            + ", ".join(
                f"CASE WHEN v.id = {seed(j)} THEN {1.0 - alpha}"
                f" + (SELECT {c} FROM d{i}) ELSE 0.0 END"
                f" + {alpha} * COALESCE(c.{c}, 0.0) AS {c}"
                for j, c in enumerate(rcols)
            )
            + f" FROM r0 v LEFT JOIN c{i} c ON c.id = v.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT id, "
        + ", ".join(f"ROUND({c}, 6) AS {c}" for c in rcols)
        + f" FROM r{rounds}"
    )


def bloom_seen_sql(num_bits: int = 4096, num_hashes: int = 4) -> str:
    """Twin of functions/bloom.py over documents: seen set = even
    doc_ids' text; every probe row recomputes the SAME md5 positions,
    so the exact false-positive set reproduces (membership at the
    bit-position level — an independent formulation of the word-packed
    Spark filter)."""
    return f"""
WITH docs AS MATERIALIZED (SELECT doc_id, CAST(text AS VARCHAR) AS text FROM documents),
hs AS MATERIALIZED (SELECT range AS i FROM range({int(num_hashes)})),
positions AS MATERIALIZED (
  SELECT DISTINCT
    ('0x' || substr(md5('bloom|' || hs.i::VARCHAR || '|' || d.text), 1, 15))::BIGINT
      % {int(num_bits)} AS pos
  FROM docs d, hs WHERE d.doc_id % 2 = 0),
pr AS MATERIALIZED (
  SELECT d.doc_id,
    ('0x' || substr(md5('bloom|' || hs.i::VARCHAR || '|' || d.text), 1, 15))::BIGINT
      % {int(num_bits)} AS pos
  FROM docs d, hs)
SELECT pr.doc_id,
       BOOL_AND(pr.pos IN (SELECT pos FROM positions)) AS maybe_seen
FROM pr GROUP BY pr.doc_id"""


def cc_closure_sql(graph_sql: str | None = None) -> str:
    """To-convergence components twin for cc_two_phase (large/small-star)
    — an INDEPENDENT formulation: undirected transitive closure via a
    recursive CTE, comp(v) = min reachable id. No round structure at
    all, so it checks the algorithm's *converged* answer rather than
    mirroring its supersteps."""
    return f"""
WITH RECURSIVE edges0 AS MATERIALIZED ({graph_sql or G1_SQL}),
edges AS MATERIALIZED (
  SELECT src, dst FROM edges0 WHERE src <> dst
  UNION SELECT dst, src FROM edges0 WHERE src <> dst),
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges0 UNION ALL SELECT dst FROM edges0)),
reach AS (
  SELECT src AS s, dst AS d FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.d),
SELECT_FINAL AS MATERIALIZED (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(r.d), v.id)) AS comp
  FROM verts v LEFT JOIN reach r ON r.s = v.id
  GROUP BY v.id)
SELECT id, comp FROM SELECT_FINAL"""


def wcc_sql(rounds: int) -> str:
    """Unrolled hash-min over G1's undirected closure (§2.4.2).
    Plain hash-min (no pointer shortcut) so each SQL round mirrors one
    Spark superstep exactly."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """edges AS MATERIALIZED (SELECT src, dst FROM edges0
                     UNION SELECT dst, src FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)",
        "l0 AS MATERIALIZED (SELECT id, id AS comp FROM verts)",
    ]
    for i in range(rounds):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, MIN(p.comp) AS nbr_min
                 FROM edges e JOIN {prev} p ON p.id = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, LEAST(p.comp, COALESCE(m.nbr_min, p.comp)) AS comp
                 FROM {prev} p LEFT JOIN m{i} m ON m.id = p.id)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, comp FROM l{rounds}"


def cdlp_sql(rounds: int) -> str:
    """Unrolled LDBC CDLP over G2 (§2.4.3): directed fabric = both
    directions, multiplicity kept; winner = (max count, min label)."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G2_SQL})",
        """nbrs AS MATERIALIZED (SELECT src, dst FROM edges0
                    UNION ALL SELECT dst, src FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM nbrs)",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM verts)",
    ]
    for i in range(rounds):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"""f{i} AS MATERIALIZED (SELECT n.dst AS id, p.label, COUNT(*) AS cnt
                 FROM nbrs n JOIN {prev} p ON p.id = n.src
                 GROUP BY n.dst, p.label)"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (SELECT id, label AS new_label FROM (
                   SELECT id, label,
                          ROW_NUMBER() OVER (PARTITION BY id
                              ORDER BY cnt DESC, label ASC) AS rn
                   FROM f{i}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, COALESCE(w.new_label, p.label) AS label
                 FROM {prev} p LEFT JOIN w{i} w ON w.id = p.id)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{rounds}"


TRIANGLES_SQL = f"""
WITH edges0 AS MATERIALIZED ({G2_SQL}),
simple AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT id, COUNT(*) AS d FROM (
    SELECT src AS id FROM simple UNION ALL SELECT dst FROM simple)
  GROUP BY id),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (da.d, s.src) < (db.d, s.dst) THEN s.src ELSE s.dst END AS a,
         CASE WHEN (da.d, s.src) < (db.d, s.dst) THEN s.dst ELSE s.src END AS b
  FROM simple s
  JOIN deg da ON da.id = s.src
  JOIN deg db ON db.id = s.dst),
tris AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oriented e1
  JOIN oriented e2 ON e2.a = e1.b
  JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS MATERIALIZED (
  SELECT x AS id FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris),
counts AS MATERIALIZED (SELECT id, COUNT(*) AS tricnt FROM corners GROUP BY id),
verts AS MATERIALIZED (SELECT src AS id FROM edges0 UNION SELECT dst FROM edges0)
SELECT v.id, CAST(COALESCE(c.tricnt, 0) AS BIGINT) AS tricnt
FROM verts v LEFT JOIN counts c ON c.id = v.id
"""

DEGREE_CENTRALITY_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
deg AS MATERIALIZED (
  SELECT id, COUNT(*) AS d FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
  GROUP BY id)
SELECT v.id,
       ROUND(COALESCE(d.d, 0) / ((SELECT n FROM n) - 1.0), 6) AS centrality
FROM verts v LEFT JOIN deg d ON d.id = v.id
"""

ASSORTATIVITY_SQL = f"""
WITH edges AS MATERIALIZED ({G2_SQL}),
outd AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
ind  AS MATERIALIZED (SELECT dst AS id, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY dst)
SELECT ROUND(CORR(o.d, i.d), 6) AS assortativity
FROM edges e JOIN outd o ON o.id = e.src JOIN ind i ON i.id = e.dst
"""


def kcore_sql(k: int, rounds: int, edges_sql: str | None = None) -> str:
    """Unrolled peel loop (extra rounds past the fixpoint are no-ops,
    so `rounds` only needs to exceed the peel depth). Default graph G2."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT src, dst FROM ({edges_sql or G2_SQL}) WHERE src <> dst)"
    ]
    for i in range(rounds):
        prev, cur = f"e{i}", f"e{i + 1}"
        ctes.append(
            f"""k{i} AS MATERIALIZED (SELECT id FROM (
                  SELECT id, COUNT(*) AS d FROM (
                    SELECT src AS id FROM {prev}
                    UNION ALL SELECT dst FROM {prev}) GROUP BY id)
                 WHERE d >= {k})"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT src, dst FROM {prev}
                 WHERE src IN (SELECT id FROM k{i})
                   AND dst IN (SELECT id FROM k{i}))"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT DISTINCT id FROM (
  SELECT src AS id FROM e{rounds} UNION ALL SELECT dst FROM e{rounds})"""
    )


GRAPH_REPORT_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS num_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS num_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges WHERE src = dst) AS num_self_loops
"""

NODE_BOUNDARY_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
s AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer WHERE c_nationkey = 1)
SELECT DISTINCT e.dst AS id
FROM edges e
WHERE e.src IN (SELECT id FROM s) AND e.dst NOT IN (SELECT id FROM s)
"""

INDUCED_SUBGRAPH_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
s AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS id FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT CAST(s_suppkey + {OFFSET} AS BIGINT) FROM supplier)
SELECT CAST(COUNT(*) AS BIGINT) AS num_edges
FROM edges e
WHERE e.src IN (SELECT id FROM s) AND e.dst IN (SELECT id FROM s)
"""


# ----------------------------------------------------------------------
# Weighted G2 (co-occurrence counts as edge weights) — exercises the
# weighted LPA / SSSP paths (lpa_u2i.h weights, sssp_projected.h EDATA)
# ----------------------------------------------------------------------
def g2w_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").cast("long").alias("src"),
            F.col("b.l_suppkey").cast("long").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )


G2W_SQL = """
SELECT CAST(a.l_suppkey AS BIGINT) AS src,
       CAST(b.l_suppkey AS BIGINT) AS dst,
       CAST(COUNT(*) AS DOUBLE) AS w
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY 1, 2
"""


def g2w(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Weighted supplier co-occurrence, treated as undirected (the
    algorithms symmetrize internally when directed=False)."""
    e = g2w_edges(spark, sf_dir)
    return LinkGraph(
        vertices=(
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        ),
        edges=e,
        directed=False,
    )


# Undirected closure CTEs over G2 (weighted + unweighted fabric)
_G2_UND = f"""
edges0 AS MATERIALIZED ({G2W_SQL}),
und AS MATERIALIZED (SELECT src, dst, w FROM edges0
           UNION ALL SELECT dst, src, w FROM edges0),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)
"""


def bfs_sql(src: int, rounds: int) -> str:
    """Unrolled BFS levels over undirected G2 from `src`; rounds must
    exceed the diameter (extra rounds are no-ops). Output matches
    algorithms/sssp.py bfs: depth long, unreachable = -1."""
    big = "1e17"
    ctes = [
        _G2_UND.strip(),
        f"""d0 AS MATERIALIZED (SELECT id,
              CASE WHEN id = {src} THEN 0.0 ELSE 1e18 END AS dist FROM verts)""",
    ]
    for i in range(rounds):
        prev, cur = f"d{i}", f"d{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, MIN(p.dist + 1.0) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < {big}
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, CASE WHEN dist >= {big} THEN CAST(-1 AS BIGINT)
                ELSE CAST(dist AS BIGINT) END AS depth FROM d{rounds}"""
    )


def sssp_sql(src: int, rounds: int) -> str:
    """Unrolled weighted Bellman-Ford over undirected weighted G2.
    Output matches algorithms/sssp.py sssp with unreachable mapped to
    -1.0 (distance double)."""
    big = "1e17"
    ctes = [
        _G2_UND.strip(),
        f"""d0 AS MATERIALIZED (SELECT id,
              CASE WHEN id = {src} THEN 0.0 ELSE 1e18 END AS dist FROM verts)""",
    ]
    for i in range(rounds):
        prev, cur = f"d{i}", f"d{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, MIN(p.dist + e.w) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < {big}
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, CASE WHEN dist >= {big} THEN -1.0
                ELSE ROUND(dist, 6) END AS distance FROM d{rounds}"""
    )


def sssp_avg_sql(src: int, rounds: int) -> str:
    inner = sssp_sql(src, rounds)
    return f"""
SELECT ROUND(AVG(distance), 6) AS avg_distance
FROM ({inner}) WHERE distance >= 0.0
"""


def hits_sql(rounds: int) -> str:
    """Unrolled HITS over G1 (hits.h:31-204 semantics: auth from hubs,
    hubs from auths, per-round max-normalization, final sum-normalize)."""
    ctes = [
        f"edges AS MATERIALIZED ({G1_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        """s0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM n) AS hub,
               0.0 AS auth FROM verts)""",
    ]
    for i in range(rounds):
        prev, cur = f"s{i}", f"s{i + 1}"
        ctes.append(
            f"""a{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.hub) AS auth
                 FROM edges e JOIN {prev} p ON p.id = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (SELECT e.src AS id, SUM(COALESCE(a.auth, 0.0)) AS hub
                 FROM edges e LEFT JOIN a{i} a ON a.id = e.dst GROUP BY e.src)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (SELECT v.id,
                   COALESCE(h.hub, 0.0) AS hub, COALESCE(a.auth, 0.0) AS auth
                 FROM verts v LEFT JOIN h{i} h ON h.id = v.id
                              LEFT JOIN a{i} a ON a.id = v.id)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT id,
                   hub / (SELECT CASE WHEN MAX(hub) = 0 THEN 1.0 ELSE MAX(hub) END FROM c{i}) AS hub,
                   auth / (SELECT CASE WHEN MAX(auth) = 0 THEN 1.0 ELSE MAX(auth) END FROM c{i}) AS auth
                 FROM c{i})"""
        )
    last = f"s{rounds}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id,
       ROUND(hub / (SELECT CASE WHEN SUM(hub) = 0 THEN 1.0 ELSE SUM(hub) END FROM {last}), 6) AS hub,
       ROUND(auth / (SELECT CASE WHEN SUM(auth) = 0 THEN 1.0 ELSE SUM(auth) END FROM {last}), 6) AS auth
FROM {last}"""
    )


def katz_sql(rounds: int, alpha: float = 0.1, beta: float = 1.0) -> str:
    """Unrolled Katz over G2 canonical-directed in-edges
    (katz_centrality.h: x' = alpha*Σ_in x + beta; final L2 normalize)."""
    ctes = [
        f"edges AS MATERIALIZED ({G2_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "x0 AS MATERIALIZED (SELECT id, 1.0 AS x FROM verts)",
    ]
    for i in range(rounds):
        prev, cur = f"x{i}", f"x{i + 1}"
        ctes.append(
            f"""i{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.x) AS inc
                 FROM edges e JOIN {prev} p ON p.id = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT v.id,
                   {alpha} * COALESCE(i.inc, 0.0) + {beta} AS x
                 FROM verts v LEFT JOIN i{i} i ON i.id = v.id)"""
        )
    last = f"x{rounds}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, ROUND(x / (SELECT SQRT(SUM(x*x)) FROM {last}), 6) AS centrality
FROM {last}"""
    )


def eigenvector_sql(rounds: int) -> str:
    """Unrolled eigenvector centrality over G2 canonical-directed
    in-edges (eigenvector_centrality.h: x' = x + Σ_in x, per-round L2
    normalization)."""
    ctes = [
        f"edges AS MATERIALIZED ({G2_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "x0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM n) AS x FROM verts)",
    ]
    for i in range(rounds):
        prev, cur = f"x{i}", f"x{i + 1}"
        ctes.append(
            f"""i{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.x) AS inc
                 FROM edges e JOIN {prev} p ON p.id = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""u{i} AS MATERIALIZED (SELECT p.id, p.x + COALESCE(i.inc, 0.0) AS x
                 FROM {prev} p LEFT JOIN i{i} i ON i.id = p.id)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT id,
                   x / (SELECT SQRT(SUM(x*x)) FROM u{i}) AS x FROM u{i})"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, ROUND(x, 6) AS centrality FROM x{rounds}"""
    )


def lpa_sql(rounds: int) -> str:
    """Unrolled weighted label propagation over undirected weighted G2
    (lpa_u2i.h semantics: adopt label with max incoming weight mass,
    min label breaks ties)."""
    ctes = [
        _G2_UND.strip(),
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM verts)",
    ]
    for i in range(rounds):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, p.label, SUM(e.w) AS mass
                 FROM und e JOIN {prev} p ON p.id = e.src
                 GROUP BY e.dst, p.label)"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (SELECT id, label AS new_label FROM (
                   SELECT id, label,
                          ROW_NUMBER() OVER (PARTITION BY id
                              ORDER BY mass DESC, label ASC) AS rn
                   FROM m{i}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, COALESCE(w.new_label, p.label) AS label
                 FROM {prev} p LEFT JOIN w{i} w ON w.id = p.id)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{rounds}"


def kshell_sql(k: int, rounds: int, edges_sql: str | None = None) -> str:
    """k-shell = k-core \\ (k+1)-core (kshell.h)."""
    return f"""
SELECT id FROM ({kcore_sql(k, rounds, edges_sql)})
EXCEPT
SELECT id FROM ({kcore_sql(k + 1, rounds, edges_sql)})
"""


def core_numbers_sql(rounds: int, edges_sql: str | None = None) -> str:
    """Full core decomposition via the unrolled h-index fixpoint
    (h0 = degree; h_{t+1}(v) = H-index of neighbor h_t values; the
    fixpoint is the core number — Lü et al. 2016). Formulated
    differently from the Spark plan (per-neighbor-row ROW_NUMBER here
    vs grouped cumulative-count window there); extra rounds past the
    fixpoint are no-ops, and `rounds` is checked against networkx in
    tests/test_extended_algorithms.py. Default graph G1 (kmax=47 at
    sf0.01, fixpoint in 4 rounds)."""
    ctes = [
        f"e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql or G1_SQL}) WHERE src <> dst)",
        "u AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        "h0 AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS h FROM u GROUP BY src)",
    ]
    for t in range(rounds):
        prev, cur = f"h{t}", f"h{t + 1}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
          SELECT id, MAX(LEAST(hv, rn)) AS h FROM (
            SELECT u.src AS id, n.h AS hv,
                   ROW_NUMBER() OVER (PARTITION BY u.src ORDER BY n.h DESC) AS rn
            FROM u JOIN {prev} n ON n.id = u.dst)
          GROUP BY id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, CAST(h AS BIGINT) AS core FROM h{rounds}"
    )


# Shared triangle-count CTE block over G2 (same text as TRIANGLES_SQL)
_TRI_CTES = f"""
edges0 AS MATERIALIZED ({G2_SQL}),
simple AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT id, COUNT(*) AS d FROM (
    SELECT src AS id FROM simple UNION ALL SELECT dst FROM simple)
  GROUP BY id),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (da.d, s.src) < (db.d, s.dst) THEN s.src ELSE s.dst END AS a,
         CASE WHEN (da.d, s.src) < (db.d, s.dst) THEN s.dst ELSE s.src END AS b
  FROM simple s
  JOIN deg da ON da.id = s.src
  JOIN deg db ON db.id = s.dst),
tris AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oriented e1
  JOIN oriented e2 ON e2.a = e1.b
  JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS MATERIALIZED (
  SELECT x AS id FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris),
counts AS MATERIALIZED (SELECT id, COUNT(*) AS tricnt FROM corners GROUP BY id),
verts AS MATERIALIZED (SELECT src AS id FROM edges0 UNION SELECT dst FROM edges0)
"""

CLUSTERING_SQL = f"""
WITH {_TRI_CTES}
SELECT v.id,
       ROUND(CASE WHEN COALESCE(d.d, 0) >= 2
             THEN 2.0 * COALESCE(c.tricnt, 0) / (d.d * (d.d - 1.0))
             ELSE 0.0 END, 6) AS clustering
FROM verts v
LEFT JOIN counts c ON c.id = v.id
LEFT JOIN deg d ON d.id = v.id
"""

AVG_CLUSTERING_SQL = f"""
WITH {_TRI_CTES}
SELECT ROUND(AVG(CASE WHEN COALESCE(d.d, 0) >= 2
             THEN 2.0 * COALESCE(c.tricnt, 0) / (d.d * (d.d - 1.0))
             ELSE 0.0 END), 6) AS avg_clustering
FROM verts v
LEFT JOIN counts c ON c.id = v.id
LEFT JOIN deg d ON d.id = v.id
"""

TRANSITIVITY_SQL = f"""
WITH {_TRI_CTES}
SELECT ROUND(SUM(2.0 * COALESCE(c.tricnt, 0))
             / SUM(COALESCE(d.d, 0) * (COALESCE(d.d, 0) - 1.0)), 6) AS transitivity
FROM verts v
LEFT JOIN counts c ON c.id = v.id
LEFT JOIN deg d ON d.id = v.id
"""

DEGREES_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
outd AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
ind  AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS d FROM edges GROUP BY dst)
SELECT v.id,
       CAST(COALESCE(o.d, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(i.d, 0) AS BIGINT) AS in_degree
FROM verts v LEFT JOIN outd o ON o.id = v.id LEFT JOIN ind i ON i.id = v.id
"""

EDGE_BOUNDARY_SQL = f"""
WITH edges AS MATERIALIZED ({G1_SQL}),
s AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer WHERE c_nationkey = 1)
SELECT DISTINCT e.src, e.dst
FROM edges e
WHERE e.src IN (SELECT id FROM s) AND e.dst NOT IN (SELECT id FROM s)
"""

# Link-prediction scores (algorithms/linkpred.py) over undirected G1,
# trimmed to the (u % 7 = 0 AND v % 7 = 0) stratum — 23k of the 1.1M
# distance-2 candidate pairs at sf0.01.  Same wedge enumeration the
# Spark plan uses; the anti-join against existing edges is a
# structural no-op on bipartite G1 (distance-2 pairs are same-side),
# and the NX-parity exclusion behavior is pytest-covered on gnp.
def kcrust_sql(k: int, rounds: int = 6, edges_sql: str | None = None) -> str:
    """k-crust = {v : core(v) <= k} (upstream core.py::k_crust) —
    reuses the unrolled h-index core-decomposition twin."""
    return (f"SELECT id FROM ({core_numbers_sql(rounds, edges_sql)}) "
            f"WHERE core <= {int(k)}")


def kcorona_sql(k: int, rounds: int = 6, edges_sql: str | None = None) -> str:
    """k-corona = nodes of the k-core with EXACTLY k neighbors inside
    the k-core (upstream core.py::k_corona)."""
    k = int(k)
    return f"""
WITH cn AS MATERIALIZED ({core_numbers_sql(rounds, edges_sql)}),
es AS MATERIALIZED (SELECT src, dst FROM ({edges_sql or G1_SQL}) WHERE src <> dst),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM es UNION ALL SELECT dst, src FROM es)),
incore AS MATERIALIZED (SELECT id FROM cn WHERE core >= {k}),
nbr AS MATERIALIZED (
  SELECT u.src AS id, COUNT(*) AS nc
  FROM und u
  JOIN incore a ON a.id = u.src
  JOIN incore b ON b.id = u.dst
  GROUP BY u.src)
SELECT c.id FROM cn c
LEFT JOIN nbr ON nbr.id = c.id
WHERE c.core = {k} AND COALESCE(nbr.nc, 0) = {k}
"""


COMMUNITY_LP_SQL = f"""
WITH e0 AS MATERIALIZED ({G1_SQL}),
und AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
comm AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(c_nationkey AS BIGINT) AS community
  FROM customer
  UNION ALL
  SELECT CAST(s_suppkey + {OFFSET} AS BIGINT) AS id,
         CAST(s_nationkey AS BIGINT) AS community
  FROM supplier),
wedges AS (
  SELECT a.src AS w, a.dst AS u, b.dst AS v
  FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst),
j AS (
  SELECT wg.u, wg.v,
         cu.community AS cu, cv.community AS cv, cw.community AS cw,
         d.deg AS wd
  FROM wedges wg
  JOIN comm cu ON cu.id = wg.u
  JOIN comm cv ON cv.id = wg.v
  JOIN comm cw ON cw.id = wg.w
  JOIN deg d ON d.id = wg.w),
p AS (
  SELECT u, v, COUNT(*) AS cn,
         SUM(CASE WHEN cu = cv AND cw = cu THEN 1 ELSE 0 END) AS within,
         SUM(CASE WHEN cu = cv AND cw = cu THEN 1.0 / wd ELSE 0 END) AS ra_sh
  FROM j GROUP BY u, v)
SELECT p.u, p.v, CAST(p.cn AS BIGINT) AS cn,
       CAST(p.cn + p.within AS BIGINT) AS cn_sh,
       ROUND(p.ra_sh, 6) AS ra_sh,
       ROUND(p.within * 1.0 / (p.cn - p.within + 0.001), 6) AS wic
FROM p
LEFT JOIN e0 x ON p.u = x.src AND p.v = x.dst
WHERE x.src IS NULL AND p.u % 7 = 0 AND p.v % 7 = 0
"""


LINK_PREDICTION_SQL = f"""
WITH e AS MATERIALIZED ({G1_SQL}),
und AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
wedges AS (
    SELECT a.dst AS u, b.dst AS v, a.src AS w
    FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst),
pairs AS (
    SELECT u, v, COUNT(*) AS cn,
           SUM(1.0 / LN(d.deg)) AS aa,
           SUM(1.0 / d.deg) AS ra
    FROM wedges JOIN deg d ON wedges.w = d.id
    GROUP BY u, v),
canon_e AS (SELECT LEAST(src, dst) AS s, GREATEST(src, dst) AS t FROM e)
SELECT p.u, p.v, p.cn,
       ROUND(p.cn * 1.0 / (du.deg + dv.deg - p.cn), 6) AS jaccard,
       ROUND(p.aa, 6) AS adamic_adar,
       ROUND(p.ra, 6) AS resource_allocation,
       CAST(du.deg * dv.deg AS BIGINT) AS pref_attachment
FROM pairs p
JOIN deg du ON p.u = du.id
JOIN deg dv ON p.v = dv.id
LEFT JOIN canon_e x ON p.u = x.s AND p.v = x.t
WHERE x.s IS NULL AND p.u % 7 = 0 AND p.v % 7 = 0
"""


def simple_path_sql(nodes: list[int]) -> str:
    """is_simple_path over undirected G2 for a fixed node list.
    NetworkX edge conventions: [] is not a path, a single existing
    node is (the FALSE hop predicate below makes the zero-hop cases
    valid SQL instead of 'WHERE ) = 0')."""
    if not nodes:
        return "SELECT CAST(FALSE AS BOOLEAN) AS is_path"
    hops = list(zip(nodes, nodes[1:]))
    hop_pred = (" OR ".join(f"(src = {a} AND dst = {b})" for a, b in hops)
                or "FALSE")
    ids = ", ".join(str(v) for v in nodes)
    distinct_ok = len(set(nodes)) == len(nodes)
    return f"""
WITH {_G2_UND.strip()}
SELECT CAST(
  {str(distinct_ok).upper()}
  AND (SELECT COUNT(DISTINCT (src, dst)) FROM und WHERE {hop_pred}) = {len(hops)}
  AND (SELECT COUNT(DISTINCT id) FROM verts WHERE id IN ({ids})) = {len(set(nodes))}
AS BOOLEAN) AS is_path
"""


def _pair_bfs_ctes(rounds: int) -> str:
    """Dense multi-source unit-weight relaxation over undirected G2:
    pair state p{i}(s, id, dist)."""
    ctes = [
        _G2_UND.strip(),
        """p0 AS MATERIALIZED (SELECT a.id AS s, b.id AS id,
              CASE WHEN a.id = b.id THEN 0.0 ELSE 1e18 END AS dist
            FROM verts a CROSS JOIN verts b)""",
    ]
    for i in range(rounds):
        prev, cur = f"p{i}", f"p{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT p.s, e.dst AS id, MIN(p.dist + 1.0) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < 1e17
                 GROUP BY p.s, e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.s, p.id,
                   LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.s = p.s AND m.id = p.id)"""
        )
    return "WITH " + ",\n".join(ctes)


def closeness_sql(rounds: int) -> str:
    """WF-improved closeness over undirected G2, unit weights
    (closeness_centrality.h:121-139 formula)."""
    return f"""{_pair_bfs_ctes(rounds)},
stats AS MATERIALIZED (
  SELECT s, SUM(dist) AS tot, COUNT(*) AS cnt
  FROM p{rounds} WHERE dist < 1e17 GROUP BY s),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
SELECT v.id,
       ROUND(CASE WHEN COALESCE(t.tot, 0) > 0 AND (SELECT n FROM nn) > 1
             THEN (t.cnt - 1.0) / t.tot * ((t.cnt - 1.0) / ((SELECT n FROM nn) - 1.0))
             ELSE 0.0 END, 6) AS centrality
FROM verts v LEFT JOIN stats t ON t.s = v.id
"""


def apsp_sql(rounds: int) -> str:
    """All-pairs shortest path lengths (finite pairs) over undirected
    G2, unit weights (all_pairs_shortest_path_length.h)."""
    return f"""{_pair_bfs_ctes(rounds)}
SELECT s AS source, id, dist AS distance
FROM p{rounds} WHERE dist < 1e17
"""


def harmonic_sql(rounds: int, mod: int = 97, rem: int = 1) -> str:
    """networkx harmonic_centrality over UNDIRECTED G1, unit weights,
    for the deterministic source set {id % mod = rem} (the
    SQL-reproducible landmark convention — closeness_landmarks_sql):
    centrality(u) = SUM over v != u reachable of 1/d(v,u), symmetric
    on the undirected fabric so the forward pair-BFS suffices."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """und AS MATERIALIZED (SELECT src, dst FROM edges0
                     UNION SELECT dst, src FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"srcs AS MATERIALIZED (SELECT id FROM verts WHERE id % {mod} = {rem})",
        """p0 AS MATERIALIZED (SELECT s.id AS s, v.id AS id,
              CASE WHEN s.id = v.id THEN 0.0 ELSE 1e18 END AS dist
            FROM srcs s CROSS JOIN verts v)""",
    ]
    for i in range(rounds):
        prev, cur = f"p{i}", f"p{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT p.s, e.dst AS id, MIN(p.dist + 1.0) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < 1e17
                 GROUP BY p.s, e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.s, p.id,
                   LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.s = p.s AND m.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f""",
stats AS MATERIALIZED (
  SELECT s, SUM(1.0 / dist) AS c
  FROM p{rounds} WHERE dist < 1e17 AND dist > 0 GROUP BY s)
SELECT v.id, ROUND(COALESCE(t.c, 0.0), 6) AS centrality
FROM srcs v LEFT JOIN stats t ON t.s = v.id"""
    )


def betweenness_sql(levels: int, mod: int = 97, rem: int = 1) -> str:
    """Sampled-source Brandes betweenness over UNDIRECTED G1,
    normalized (networkx k-sample estimator semantics: scale =
    1/((n-1)(n-2)) * n/k), sources = {id % mod = rem}, unrolled
    level-synchronously: forward CTEs f0..f{levels} carry
    (s, id, sigma) per BFS level with sigma = sum of predecessor
    sigmas; backward CTEs d{levels}..d1 carry Brandes' dependency
    delta(v) = sigma_v * SUM over DAG successors w of
    (1+delta_w)/sigma_w — the DAG condition dist_w = dist_v + 1 is
    structural (level i joined to level i+1 through the edge table).
    `levels` must exceed the source eccentricities; spare levels are
    empty CTEs and contribute nothing."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """und AS MATERIALIZED (SELECT src, dst FROM edges0
                     UNION SELECT dst, src FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"srcs AS MATERIALIZED (SELECT id FROM verts WHERE id % {mod} = {rem})",
        "f0 AS MATERIALIZED (SELECT id AS s, id, 1.0 AS sigma FROM srcs)",
        "vis0 AS MATERIALIZED (SELECT s, id FROM f0)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "kk AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM srcs)",
    ]
    for i in range(levels):
        ctes.append(
            f"""f{i + 1} AS MATERIALIZED (
              SELECT c.s, c.id, c.sigma FROM (
                SELECT f.s, e.dst AS id, SUM(f.sigma) AS sigma
                FROM und e JOIN f{i} f ON f.id = e.src
                GROUP BY f.s, e.dst) c
              WHERE NOT EXISTS (SELECT 1 FROM vis{i} v
                                WHERE v.s = c.s AND v.id = c.id))"""
        )
        ctes.append(
            f"""vis{i + 1} AS MATERIALIZED (
              SELECT s, id FROM vis{i}
              UNION ALL SELECT s, id FROM f{i + 1})"""
        )
    ctes.append(
        f"d{levels} AS MATERIALIZED "
        f"(SELECT s, id, sigma, 0.0 AS delta FROM f{levels})"
    )
    for i in range(levels - 1, 0, -1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
              SELECT d.s, e.src AS id, SUM((1.0 + d.delta) / d.sigma) AS m
              FROM und e JOIN d{i + 1} d ON d.id = e.dst
              GROUP BY d.s, e.src)"""
        )
        ctes.append(
            f"""d{i} AS MATERIALIZED (
              SELECT f.s, f.id, f.sigma,
                     f.sigma * COALESCE(c.m, 0.0) AS delta
              FROM f{i} f LEFT JOIN c{i} c ON c.s = f.s AND c.id = f.id)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT id, delta FROM d{i}" for i in range(1, levels + 1)
    )
    ctes.append(
        f"bc AS MATERIALIZED (SELECT id, SUM(delta) AS c FROM ({union}) GROUP BY id)"
    )
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT v.id,
       ROUND(COALESCE(b.c, 0.0) *
             CASE WHEN (SELECT n FROM nn) > 2
                  THEN (SELECT n FROM nn)
                       / (SELECT k FROM kk)
                       / (((SELECT n FROM nn) - 1.0)
                          * ((SELECT n FROM nn) - 2.0))
                  ELSE 1.0 END,
             6) AS centrality
FROM verts v LEFT JOIN bc b ON b.id = v.id
"""


def betweenness_w_sql(rounds: int, edge: bool = False) -> str:
    """Exact (all-sources) WEIGHTED Brandes betweenness over
    weighted-undirected G2W, normalized (networkx `weight=`
    semantics; edge=True emits per-EDGE betweenness with the
    1/(n(n-1)) edge rescale instead), unrolled as three Jacobi
    fixpoints that mirror the Spark sweep in
    betweenness.py::_weighted_dag_levels/_finish_dag:

    1. dist — `rounds` Bellman-Ford relaxations (exact once rounds >=
       the hop length of every weighted shortest path);
    2. dag — shortest-path DAG by float equality du + w = dv (the
       identical doubles both engines compute, since both accumulate
       path sums source-forward);
    3. sigma — path counts, Jacobi over the DAG (exact once rounds >=
       the DAG's longest path);
    4. delta — Brandes dependency, Jacobi from the leaf end.

    The unroll depth is SELF-VERIFYING, not trusted: each fixpoint
    runs one extra round and, if anything still changed, the final
    SELECT injects a poison row (id -1/-2/-3) so the driver's value
    hash fails loudly instead of silently accepting a truncated
    iteration."""
    inf = "CAST('inf' AS DOUBLE)"
    ctes = [
        f"e0 AS MATERIALIZED ({G2W_SQL})",
        """wund AS MATERIALIZED (
          SELECT src, dst, MIN(w) AS w FROM (
            SELECT src, dst, w FROM e0
            UNION ALL SELECT dst, src, w FROM e0)
          GROUP BY src, dst)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM wund)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        f"""d0 AS MATERIALIZED (
          SELECT s.id AS s, v.id AS id,
                 CASE WHEN s.id = v.id THEN 0.0 ELSE {inf} END AS dist
          FROM verts s CROSS JOIN verts v)""",
    ]
    for i in range(rounds + 1):
        ctes.append(
            f"""d{i + 1} AS MATERIALIZED (
              SELECT p.s, p.id, LEAST(p.dist, COALESCE(r.cand, {inf})) AS dist
              FROM d{i} p LEFT JOIN (
                SELECT d.s, e.dst AS id, MIN(d.dist + e.w) AS cand
                FROM wund e JOIN d{i} d ON d.id = e.src
                WHERE d.dist < {inf}
                GROUP BY d.s, e.dst) r ON r.s = p.s AND r.id = p.id)"""
        )
    r1 = rounds + 1
    ctes.append(
        f"""dchg AS MATERIALIZED (
          SELECT 1 AS x FROM d{rounds} a JOIN d{r1} b
            ON a.s = b.s AND a.id = b.id
          WHERE a.dist <> b.dist LIMIT 1)"""
    )
    ctes.append(
        f"fin AS MATERIALIZED (SELECT s, id, dist FROM d{rounds} WHERE dist < {inf})"
    )
    ctes.append(
        """dag AS MATERIALIZED (
          SELECT u.s, e.src, e.dst FROM wund e
          JOIN fin u ON u.id = e.src
          JOIN fin v ON v.s = u.s AND v.id = e.dst
          WHERE u.dist + e.w = v.dist)"""
    )
    ctes.append(
        """s0 AS MATERIALIZED (
          SELECT s, id, CASE WHEN s = id THEN 1.0 ELSE 0.0 END AS sigma
          FROM fin)"""
    )
    for i in range(rounds + 1):
        ctes.append(
            f"""s{i + 1} AS MATERIALIZED (
              SELECT f.s, f.id,
                     CASE WHEN f.s = f.id THEN 1.0
                          ELSE COALESCE(c.sg, 0.0) END AS sigma
              FROM fin f LEFT JOIN (
                SELECT g.s, g.dst AS id, SUM(x.sigma) AS sg
                FROM dag g JOIN s{i} x ON x.s = g.s AND x.id = g.src
                GROUP BY g.s, g.dst) c ON c.s = f.s AND c.id = f.id)"""
        )
    ctes.append(
        f"""schg AS MATERIALIZED (
          SELECT 1 AS x FROM s{rounds} a JOIN s{r1} b
            ON a.s = b.s AND a.id = b.id
          WHERE a.sigma <> b.sigma LIMIT 1)"""
    )
    ctes.append(
        f"""x0 AS MATERIALIZED (
          SELECT s, id, sigma, 0.0 AS delta FROM s{rounds})"""
    )
    for i in range(rounds + 1):
        ctes.append(
            f"""x{i + 1} AS MATERIALIZED (
              SELECT f.s, f.id, f.sigma,
                     f.sigma * COALESCE(c.m, 0.0) AS delta
              FROM x0 f LEFT JOIN (
                SELECT g.s, g.src AS id, SUM((1.0 + x.delta) / x.sigma) AS m
                FROM dag g JOIN x{i} x ON x.s = g.s AND x.id = g.dst
                WHERE x.sigma > 0
                GROUP BY g.s, g.src) c ON c.s = f.s AND c.id = f.id)"""
        )
    ctes.append(
        f"""xchg AS MATERIALIZED (
          SELECT 1 AS x FROM x{rounds} a JOIN x{r1} b
            ON a.s = b.s AND a.id = b.id
          WHERE a.delta <> b.delta LIMIT 1)"""
    )
    ctes.append(
        f"""bc AS MATERIALIZED (
          SELECT id, SUM(delta) AS c FROM x{rounds}
          WHERE id <> s GROUP BY id)"""
    )
    if edge:
        # per-DAG-edge dependency sigma_v·(1+delta_w)/sigma_w, summed
        # over sources, canonicalized src < dst (undirected G2W)
        ctes.append(
            f"""eb AS MATERIALIZED (
              SELECT LEAST(g.src, g.dst) AS src,
                     GREATEST(g.src, g.dst) AS dst,
                     SUM(sv.sigma * (1.0 + xw.delta) / xw.sigma) AS c
              FROM dag g
              JOIN x{rounds} sv ON sv.s = g.s AND sv.id = g.src
              JOIN x{rounds} xw ON xw.s = g.s AND xw.id = g.dst
              GROUP BY 1, 2)"""
        )
        joined = ",\n".join(ctes)
        return f"""WITH {joined}
SELECT e.src, e.dst,
       ROUND(COALESCE(b.c, 0.0) *
             CASE WHEN (SELECT n FROM nn) > 1
                  THEN 1.0 / ((SELECT n FROM nn)
                              * ((SELECT n FROM nn) - 1.0))
                  ELSE 1.0 END,
             6) AS centrality
FROM (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
      FROM wund) e
LEFT JOIN eb b ON b.src = e.src AND b.dst = e.dst
UNION ALL SELECT -1, -1, -1.0 WHERE EXISTS (SELECT 1 FROM dchg)
UNION ALL SELECT -2, -2, -2.0 WHERE EXISTS (SELECT 1 FROM schg)
UNION ALL SELECT -3, -3, -3.0 WHERE EXISTS (SELECT 1 FROM xchg)
"""
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT v.id,
       ROUND(COALESCE(b.c, 0.0) *
             CASE WHEN (SELECT n FROM nn) > 2
                  THEN 1.0 / (((SELECT n FROM nn) - 1.0)
                              * ((SELECT n FROM nn) - 2.0))
                  ELSE 1.0 END,
             6) AS centrality
FROM verts v LEFT JOIN bc b ON b.id = v.id
UNION ALL SELECT -1, -1.0 WHERE EXISTS (SELECT 1 FROM dchg)
UNION ALL SELECT -2, -2.0 WHERE EXISTS (SELECT 1 FROM schg)
UNION ALL SELECT -3, -3.0 WHERE EXISTS (SELECT 1 FROM xchg)
"""


def louvain_sql(iters: int) -> str:
    """Unrolled Louvain phase-1 local-move cycles over weighted G2
    (louvain.h:228-279 semantics: ΔQ = k_i_in − k_i·σ'/m2, winner =
    max ΔQ / min community id, stay scores 0, parity anti-cycle rule).
    Single level ⇒ internal weights are 0 throughout."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G2W_SQL})",
        """sym AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM (
             SELECT src, dst, w FROM edges0 WHERE src <> dst
             UNION ALL SELECT dst, src, w FROM edges0 WHERE src <> dst)
           GROUP BY src, dst)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)",
        "kk AS MATERIALIZED (SELECT src AS node, SUM(w) AS k FROM sym GROUP BY src)",
        "m2 AS MATERIALIZED (SELECT SUM(k) AS m2 FROM kk)",
        "s0 AS MATERIALIZED (SELECT node, node AS community FROM verts)",
    ]
    for i in range(iters):
        prev, cur = f"s{i}", f"s{i + 1}"
        parity = (
            "st.community > b.best" if i % 2 == 0 else "st.community < b.best"
        )
        ctes.append(
            f"""sig{i} AS MATERIALIZED (SELECT s.community, SUM(kk.k) AS sigma
                 FROM {prev} s JOIN kk ON kk.node = s.node GROUP BY s.community)"""
        )
        ctes.append(
            f"""nbr{i} AS MATERIALIZED (SELECT e.src AS node, s.community AS c,
                   SUM(e.w) AS kvc
                 FROM sym e JOIN {prev} s ON s.node = e.dst
                 GROUP BY e.src, s.community)"""
        )
        ctes.append(
            f"""cand{i} AS MATERIALIZED (
                 SELECT n.node, n.c,
                   CASE WHEN n.c = st.community AND (g.sigma - kk.k) = 0 THEN 0.0
                        ELSE n.kvc - kk.k *
                          (g.sigma - CASE WHEN n.c = st.community
                                     THEN kk.k ELSE 0.0 END)
                          / (SELECT m2 FROM m2)
                   END AS dq
                 FROM nbr{i} n
                 JOIN sig{i} g ON g.community = n.c
                 JOIN {prev} st ON st.node = n.node
                 JOIN kk ON kk.node = n.node
                 UNION ALL
                 SELECT node, community AS c, 0.0 AS dq FROM {prev})"""
        )
        ctes.append(
            f"""best{i} AS MATERIALIZED (SELECT node, c AS best FROM (
                   SELECT node, c,
                          ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY dq DESC, c ASC) AS rn
                   FROM cand{i}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT st.node,
                   CASE WHEN {parity} THEN st.community ELSE b.best END AS community
                 FROM {prev} st JOIN best{i} b ON b.node = st.node)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS id, community FROM s{iters}"
    )


def _relax_ctes(src: int, rounds: int, weighted: bool) -> list[str]:
    """Shared unrolled Bellman-Ford CTE chain over undirected G2
    (weighted or unit) — base for the path/tree/has-path oracles."""
    big = "1e17"
    step = "e.w" if weighted else "1.0"
    ctes = [
        _G2_UND.strip(),
        f"""d0 AS MATERIALIZED (SELECT id,
              CASE WHEN id = {src} THEN 0.0 ELSE 1e18 END AS dist FROM verts)""",
    ]
    for i in range(rounds):
        prev, cur = f"d{i}", f"d{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, MIN(p.dist + {step}) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < {big}
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.id = p.id)"""
        )
    return ctes


def sssp_path_sql(src: int, rounds: int) -> str:
    """Shortest-path tree over weighted undirected G2 — matches
    algorithms/sssp.py sssp_path (min-id optimal predecessor)."""
    ctes = _relax_ctes(src, rounds, weighted=True)
    last = f"d{rounds}"
    return (
        "WITH " + ",\n".join(ctes) + f""",
preds AS MATERIALIZED (
  SELECT e.dst AS id, MIN(e.src) AS pred
  FROM und e
  JOIN {last} ds ON ds.id = e.src
  JOIN {last} dd ON dd.id = e.dst
  WHERE dd.dist < 1e17 AND e.dst <> {src}
    AND ABS(ds.dist + e.w - dd.dist) <= 1e-12
  GROUP BY e.dst)
SELECT p.pred, p.id, ROUND(d.dist, 6) AS distance
FROM preds p JOIN {last} d ON d.id = p.id"""
    )


def bfs_tree_sql(src: int, rounds: int) -> str:
    """BFS tree (id, depth, pred) over undirected G2 — matches
    algorithms/sssp.py bfs_generic(output_format='tree')."""
    ctes = _relax_ctes(src, rounds, weighted=False)
    last = f"d{rounds}"
    return (
        "WITH " + ",\n".join(ctes) + f""",
visited AS MATERIALIZED (
  SELECT id, CAST(dist AS BIGINT) AS depth FROM {last} WHERE dist < 1e17),
tree AS MATERIALIZED (
  SELECT e.dst AS id, MIN(e.src) AS pred
  FROM und e
  JOIN visited du ON du.id = e.src
  JOIN visited dv ON dv.id = e.dst
  WHERE du.depth + 1 = dv.depth AND e.dst <> {src}
  GROUP BY e.dst)
SELECT v.id, v.depth, COALESCE(t.pred, {src}) AS pred
FROM visited v LEFT JOIN tree t ON t.id = v.id"""
    )


def has_path_sql(src: int, dst: int, rounds: int) -> str:
    ctes = _relax_ctes(src, rounds, weighted=False)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CAST((SELECT dist FROM d{rounds} WHERE id = {dst}) < 1e17
       AS BOOLEAN) AS has_path"""
    )


def closeness_landmarks_sql(rounds: int, mod: int = 97, rem: int = 1) -> str:
    """Landmark closeness over UNDIRECTED G1, unit weights, sources =
    {id % mod = rem} — the deterministic, SQL-reproducible stand-in
    for the min-xxhash64 auto-landmark sampling (closeness.py
    _effective_sources). WF-improved formula, landmark rows only."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """und AS MATERIALIZED (SELECT src, dst FROM edges0
                     UNION SELECT dst, src FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"srcs AS MATERIALIZED (SELECT id FROM verts WHERE id % {mod} = {rem})",
        """p0 AS MATERIALIZED (SELECT s.id AS s, v.id AS id,
              CASE WHEN s.id = v.id THEN 0.0 ELSE 1e18 END AS dist
            FROM srcs s CROSS JOIN verts v)""",
    ]
    for i in range(rounds):
        prev, cur = f"p{i}", f"p{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT p.s, e.dst AS id, MIN(p.dist + 1.0) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < 1e17
                 GROUP BY p.s, e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.s, p.id,
                   LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.s = p.s AND m.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f""",
stats AS MATERIALIZED (
  SELECT s, SUM(dist) AS tot, COUNT(*) AS cnt
  FROM p{rounds} WHERE dist < 1e17 GROUP BY s),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
SELECT v.id,
       ROUND(CASE WHEN COALESCE(t.tot, 0) > 0 AND (SELECT n FROM nn) > 1
             THEN (t.cnt - 1.0) / t.tot * ((t.cnt - 1.0) / ((SELECT n FROM nn) - 1.0))
             ELSE 0.0 END, 6) AS centrality
FROM srcs v LEFT JOIN stats t ON t.s = v.id"""
    )


def property_sssp_sql(src: int, rounds: int) -> str:
    """Labeled SSSP over undirected unit-weight G1 — matches
    algorithms/property.py property_sssp on the add_vertices/add_edges
    labeled graph (customer/supplier labels)."""
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """und AS MATERIALIZED (SELECT src, dst FROM edges0
                 UNION ALL SELECT dst, src FROM edges0)""",
        """labels AS MATERIALIZED (
             SELECT DISTINCT src AS id, 'customer' AS label FROM edges0
             UNION ALL
             SELECT DISTINCT dst AS id, 'supplier' AS label FROM edges0)""",
        "verts AS MATERIALIZED (SELECT DISTINCT id FROM labels)",
        f"""d0 AS MATERIALIZED (SELECT id,
              CASE WHEN id = {src} THEN 0.0 ELSE 1e18 END AS dist FROM verts)""",
    ]
    for i in range(rounds):
        prev, cur = f"d{i}", f"d{i + 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (SELECT e.dst AS id, MIN(p.dist + 1.0) AS cand
                 FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < 1e17
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (SELECT p.id, LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                 FROM {prev} p LEFT JOIN m{i} m ON m.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT l.label, l.id,
       CASE WHEN d.dist >= 1e17 THEN -1.0 ELSE ROUND(d.dist, 6) END AS distance
FROM labels l JOIN d{rounds} d ON d.id = l.id"""
    )


def sampling_path_sql(srcs: list[int], path_len: int, seed: int = 42) -> str:
    """Deterministic random-walk twin of algorithms/walks.sampling_path
    on G2: at step t walk w picks arg_min over out-neighbors v of
    md5(seed|w|t|v) — identical draws to the Spark side (md5 hex is
    engine-portable, same family as the MinHash oracle)."""
    src_vals = ",".join(f"({int(s)})" for s in srcs)
    ctes = [
        f"edges AS MATERIALIZED ({G2_SQL})",
        f"""s0 AS MATERIALIZED (
             SELECT walk, 0 AS pos, walk AS id
             FROM (VALUES {src_vals}) t(walk)
             WHERE walk IN (SELECT src FROM edges UNION SELECT dst FROM edges))""",
    ]
    for t in range(1, int(path_len) + 1):
        ctes.append(
            f"""s{t} AS MATERIALIZED (
                 SELECT p.walk, {t} AS pos,
                        arg_min(e.dst, md5(concat_ws('|', {int(seed)}, p.walk, {t}, e.dst))) AS id
                 FROM s{t - 1} p JOIN edges e ON e.src = p.id
                 GROUP BY p.walk)"""
        )
    union = "\nUNION ALL ".join(f"SELECT * FROM s{t}" for t in range(int(path_len) + 1))
    return "WITH " + ",\n".join(ctes) + f"""
SELECT walk, pos, id FROM ({union})"""


def node2vec_sql(srcs: list[int], path_len: int, p: float, q: float,
                 seed: int = 42) -> str:
    """DuckDB twin of algorithms/walks.node2vec_path over UNDIRECTED
    G1: integer-ticket weighted draw (w tickets per candidate,
    md5(seed|walk|t|v|tick), global min wins — engine-exact, no float
    RNG). Weight classes: prev NULL -> 1 (uniform first hop),
    v = prev -> w_ret, edge(prev, v) -> w_one, else w_q."""
    from graphscope_spark.algorithms.walks import _node2vec_weights

    w_ret, w_one, w_q = _node2vec_weights(p, q)
    src_vals = ",".join(f"({int(s)})" for s in srcs)
    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """edges AS MATERIALIZED (SELECT src, dst FROM edges0
                     UNION SELECT dst, src FROM edges0)""",
        f"""s0 AS MATERIALIZED (
             SELECT walk, 0 AS pos, walk AS id, CAST(NULL AS BIGINT) AS prev
             FROM (VALUES {src_vals}) t(walk)
             WHERE walk IN (SELECT src FROM edges))""",
    ]
    for t in range(1, int(path_len) + 1):
        ctes.append(
            f"""cand{t} AS MATERIALIZED (
                 SELECT p.walk, p.id AS u, e.dst,
                        CASE WHEN p.prev IS NULL THEN 1
                             WHEN e.dst = p.prev THEN {w_ret}
                             WHEN EXISTS (SELECT 1 FROM edges x
                                          WHERE x.src = p.prev
                                            AND x.dst = e.dst) THEN {w_one}
                             ELSE {w_q} END AS w
                 FROM s{t - 1} p JOIN edges e ON e.src = p.id)"""
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
                 SELECT walk, {t} AS pos,
                        arg_min(dst, md5(concat_ws('|', {int(seed)}, walk,
                                {t}, dst, tick))) AS id,
                        any_value(u) AS prev
                 FROM (SELECT walk, u, dst,
                              unnest(generate_series(0, w - 1)) AS tick
                       FROM cand{t} WHERE w > 0)
                 GROUP BY walk)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walk, pos, id FROM s{t}" for t in range(int(path_len) + 1))
    return "WITH " + ",\n".join(ctes) + f"""
{union}"""


def skipgram_sql(srcs: list[int], path_len: int, p: float, q: float,
                 window: int, seed: int = 42) -> str:
    """Skip-gram (center, context) pairs over the node2vec walk corpus
    — walk twin nested as a sub-WITH, then the ±window self-join."""
    inner = node2vec_sql(srcs, path_len, p, q, seed)
    return f"""WITH wk AS MATERIALIZED ({inner})
SELECT a.walk AS walk, a.id AS center, b.id AS context,
       CAST(b.pos - a.pos AS INT) AS off
FROM wk a JOIN wk b ON a.walk = b.walk AND a.pos <> b.pos
  AND abs(a.pos - b.pos) <= {int(window)}"""


# ----------------------------------------------------------------------
# ANF (approximate neighborhood function) twins — bit-exact FM sketches
# ----------------------------------------------------------------------

def _anf_ctes(radius: int, trials: int = 8, r_max: int = 59,
              edges_sql: str | None = None, directed: bool = False) -> list[str]:
    """Unrolled FM-sketch supersteps (algorithms/anf.py): identical md5
    bit draws ('0x'-parsed 15 hex chars → lowest set bit, capped at
    r_max) and bitwise-only R recovery, so masks match Spark exactly.
    Directed mode propagates AGAINST edge direction (out-reachability),
    mirroring anf._prop_edges."""
    cap = 1 << r_max
    base = edges_sql or G1_SQL
    fabric = (
        "SELECT DISTINCT dst AS src, src AS dst FROM e"
        if directed
        else "SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e"
    )
    ctes = [
        f"e AS MATERIALIZED ({base})",
        f"u AS MATERIALIZED ({fabric})",
        "verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        f"tr AS MATERIALIZED (SELECT range AS k FROM range({int(trials)}))",
        f"""s0 AS MATERIALIZED (
          SELECT id, k,
                 CASE WHEN h = 0 THEN {cap}
                      ELSE LEAST(h & -h, {cap}) END AS mask
          FROM (SELECT v.id, tr.k,
                       ('0x' || substr(md5(concat_ws('|', 'anf',
                            tr.k::VARCHAR, v.id::VARCHAR)), 1, 15))::BIGINT AS h
                FROM verts v, tr))""",
    ]
    for i in range(1, int(radius) + 1):
        prev, cur = f"s{i - 1}", f"s{i}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (
              SELECT u.dst AS id, s.k, bit_or(s.mask) AS nm
              FROM u JOIN {prev} s ON s.id = u.src
              GROUP BY u.dst, s.k)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
              SELECT s.id, s.k, s.mask | COALESCE(m.nm, 0) AS mask
              FROM {prev} s LEFT JOIN m{i} m ON m.id = s.id AND m.k = s.k)"""
        )
    return ctes


def _anf_sumr_sql(state: str) -> str:
    """Per-vertex sum of R_k (integer-exact in both engines)."""
    return f"""SELECT id, SUM(bit_count(((mask + 1) & ~mask) - 1)) AS sumr
               FROM {state} GROUP BY id"""


def anf_balls_sql(radius: int, trials: int = 8, r_max: int = 59,
                  edges_sql: str | None = None) -> str:
    """Per-vertex ball-size estimates after `radius` rounds, rounded to
    6 dp (pow() is the only float op; inputs are engine-exact ints)."""
    ctes = _anf_ctes(radius, trials, r_max, edges_sql)
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, ROUND(POW(2.0, sumr / {float(trials)}) / 0.77351, 6) AS est
FROM ({_anf_sumr_sql(f's{int(radius)}')})"""
    )


def anf_nf_sql(radius: int, trials: int = 8, r_max: int = 59,
               edges_sql: str | None = None) -> str:
    """Neighborhood function per radius. Hash currency is the
    integer-exact total_r (sum over vertices of sum_k R_k); nf is the
    float FM estimate rounded to 2 dp (coarse enough that summation
    order can never flip the rounding)."""
    ctes = _anf_ctes(radius, trials, r_max, edges_sql)
    nf_rows = []
    for t in range(int(radius) + 1):
        ctes.append(
            f"""nf{t} AS MATERIALIZED (
              SELECT CAST({t} AS BIGINT) AS radius,
                     CAST(SUM(sumr) AS BIGINT) AS total_r,
                     ROUND(SUM(POW(2.0, sumr / {float(trials)}) / 0.77351), 2) AS nf
              FROM ({_anf_sumr_sql(f's{t}')}))"""
        )
        nf_rows.append(f"SELECT * FROM nf{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(nf_rows)


def distance_stats_sql(radius: int, q: float = 0.9, trials: int = 8,
                       r_max: int = 59, edges_sql: str | None = None) -> str:
    """Effective diameter (interpolated q-quantile of the NF curve,
    anf._interp_quantile) and average distance over reachable pairs
    (anf._avg_distance), from the same unrolled curve. Rounded to 4 dp:
    curve values differ between engines only by float summation order
    (~1e-9 relative), far inside the rounding grid."""
    ctes = _anf_ctes(radius, trials, r_max, edges_sql)
    pieces = []
    for t in range(int(radius) + 1):
        ctes.append(
            f"""c{t} AS MATERIALIZED (
              SELECT CAST({t} AS BIGINT) AS radius,
                     COALESCE(SUM(POW(2.0, sumr / {float(trials)}) / 0.77351), 0.0) AS nf
              FROM ({_anf_sumr_sql(f's{t}')}))"""
        )
        pieces.append(f"SELECT * FROM c{t}")
    ctes.append("curve AS MATERIALIZED (" + " UNION ALL ".join(pieces) + ")")
    ctes.append(
        f"""lastnf AS (SELECT nf AS nlast,
                  (SELECT nf FROM curve WHERE radius = 0) AS n0
           FROM curve WHERE radius = {int(radius)})"""
    )
    ctes.append(
        "lagged AS (SELECT radius, nf, LAG(nf) OVER (ORDER BY radius) AS prev FROM curve)"
    )
    ctes.append(
        f"""hit AS (SELECT l.radius, l.nf, l.prev FROM lagged l, lastnf t
           WHERE l.nf >= {float(q)} * t.nlast ORDER BY l.radius LIMIT 1)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT ROUND(CASE WHEN (SELECT nlast FROM lastnf) <= 0 THEN 0.0
             WHEN (SELECT radius FROM hit) = 0 THEN 0.0
             WHEN (SELECT nf FROM hit) = (SELECT prev FROM hit)
               THEN CAST((SELECT radius FROM hit) AS DOUBLE)
             ELSE (SELECT radius FROM hit) - 1
                  + ({float(q)} * (SELECT nlast FROM lastnf) - (SELECT prev FROM hit))
                    / ((SELECT nf FROM hit) - (SELECT prev FROM hit)) END, 4) AS eff_diam,
       ROUND(CASE WHEN (SELECT nlast - n0 FROM lastnf) <= 0 THEN 0.0
             ELSE (SELECT SUM(radius * (nf - prev)) FROM lagged WHERE radius >= 1)
                  / (SELECT nlast - n0 FROM lastnf) END, 4) AS avg_dist"""
    )


def hyperball_harmonic_sql(radius: int, trials: int = 8, r_max: int = 59,
                           edges_sql: str | None = None) -> str:
    """HyperBall harmonic twin (anf.hyperball_harmonic): per-vertex
    C_H = sum_t (est_t - est_{t-1})/t over the unrolled sketch rounds,
    written as a left-associated chain so the float accumulation order
    matches the Spark side's sequential per-round accumulator."""
    ctes = _anf_ctes(radius, trials, r_max, edges_sql)
    for t in range(int(radius) + 1):
        ctes.append(
            f"""b{t} AS MATERIALIZED (
              SELECT id, POW(2.0, sumr / {float(trials)}) / 0.77351 AS est
              FROM ({_anf_sumr_sql(f's{t}')}))"""
        )
    terms = " + ".join(
        f"(b{t}.est - b{t - 1}.est) / {float(t)}" for t in range(1, int(radius) + 1)
    )
    joins = "\n".join(
        f"JOIN b{t} ON b{t}.id = b0.id" for t in range(1, int(radius) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT b0.id, ROUND({terms}, 6) AS centrality
FROM b0
{joins}"""
    )


def _trust_chain_ctes(rounds: int, alpha: float, prefix: str,
                      mod: int, rem: int) -> list[str]:
    """Round CTEs for seed-personalized PageRank (TrustRank): reset
    vector p uniform over {id % mod == rem}, dangling vector = p,
    init rank = 1/N (matching pagerank()'s uniform nstart default).
    Assumes `verts`, `n`, `outdeg` CTEs already exist."""
    ctes = [
        f"""{prefix}ns AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM verts
            WHERE id % {mod} = {rem})""",
        f"""{prefix}0 AS MATERIALIZED (
            SELECT o.id, o.outdeg,
                   CASE WHEN o.id % {mod} = {rem}
                        THEN 1.0/(SELECT ns FROM {prefix}ns)
                        ELSE 0.0 END AS p,
                   1.0/(SELECT n FROM n) AS rank
            FROM outdeg o)""",
    ]
    for i in range(rounds):
        prev, cur = f"{prefix}{i}", f"{prefix}{i + 1}"
        ctes.append(
            f"""{prefix}d{i} AS MATERIALIZED (
                 SELECT COALESCE(SUM(rank), 0.0) * {alpha} AS ds
                 FROM {prev} WHERE outdeg = 0)"""
        )
        ctes.append(
            f"""{prefix}c{i} AS MATERIALIZED (
                 SELECT e.dst AS id, SUM(p.rank / p.outdeg) AS contrib
                 FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.outdeg, v.p,
                        (1.0 - {alpha}) * v.p
                        + (SELECT ds FROM {prefix}d{i}) * v.p
                        + {alpha} * COALESCE(c.contrib, 0.0) AS rank
                 FROM {prefix}0 v LEFT JOIN {prefix}c{i} c ON c.id = v.id)"""
        )
    return ctes


def _uniform_chain_ctes(rounds: int, alpha: float, prefix: str) -> list[str]:
    """Round CTEs for uniform PageRank, bit-matching pagerank_sql's
    arithmetic ((1-alpha)/n + ds/n, NOT (1-alpha)*p — pagerank()'s
    scalar fast path computes the former). Assumes `verts`, `n`,
    `outdeg` CTEs exist."""
    ctes = [
        f"""{prefix}0 AS MATERIALIZED (
            SELECT id, outdeg, 1.0/(SELECT n FROM n) AS rank FROM outdeg)""",
    ]
    for i in range(rounds):
        prev, cur = f"{prefix}{i}", f"{prefix}{i + 1}"
        ctes.append(
            f"""{prefix}d{i} AS MATERIALIZED (
                 SELECT COALESCE(SUM(rank), 0.0) * {alpha} AS ds
                 FROM {prev} WHERE outdeg = 0)"""
        )
        ctes.append(
            f"""{prefix}c{i} AS MATERIALIZED (
                 SELECT e.dst AS id, SUM(p.rank / p.outdeg) AS contrib
                 FROM edges e JOIN {prev} p ON p.id = e.src AND p.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.outdeg,
                        (1.0 - {alpha})/(SELECT n FROM n)
                        + (SELECT ds FROM {prefix}d{i})/(SELECT n FROM n)
                        + {alpha} * COALESCE(c.contrib, 0.0) AS rank
                 FROM {prefix}0 v LEFT JOIN {prefix}c{i} c ON c.id = v.id)"""
        )
    return ctes


_GRAPH_BASE_CTES = [
    "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
    "n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
    """outdeg AS MATERIALIZED (
        SELECT v.id, CAST(COUNT(e.src) AS DOUBLE) AS outdeg
        FROM verts v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id)""",
]


def trustrank_sql(rounds: int, alpha: float = 0.85, mod: int = 97,
                  rem: int = 1, graph_sql: str | None = None) -> str:
    """Unrolled TrustRank twin (trustrank.trustrank): personalized
    PageRank with the reset vector uniform over the SQL-reproducible
    seed rule {id % mod == rem} (the repo's landmark convention)."""
    ctes = [f"edges AS MATERIALIZED ({graph_sql or G1_SQL})"]
    ctes += _GRAPH_BASE_CTES
    ctes += _trust_chain_ctes(rounds, alpha, "t", mod, rem)
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, ROUND(rank, 6) AS trust FROM t{rounds}"""
    )


def spam_mass_sql(rounds: int, alpha: float = 0.85, mod: int = 97,
                  rem: int = 1, graph_sql: str | None = None) -> str:
    """Unrolled spam-mass twin (trustrank.spam_mass): uniform PageRank
    chain + TrustRank chain, relative spam mass = (PR - TR)/PR from the
    UNROUNDED chain values (matching the Spark side)."""
    ctes = [f"edges AS MATERIALIZED ({graph_sql or G1_SQL})"]
    ctes += _GRAPH_BASE_CTES
    ctes += _uniform_chain_ctes(rounds, alpha, "u")
    ctes += _trust_chain_ctes(rounds, alpha, "t", mod, rem)
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT u.id, ROUND(u.rank, 6) AS rank, ROUND(t.rank, 6) AS trust,
       ROUND((u.rank - t.rank) / u.rank, 6) AS spam_mass
FROM u{rounds} u JOIN t{rounds} t ON t.id = u.id"""
    )


# G3: directed supplier-sequence graph with real cycles — consecutive
# line items of the same order draw an edge between their suppliers,
# thinned by a deterministic modular rule (same convention as the %97
# landmark rule). At sf0.01: 100 vertices, ~1k edges, three nontrivial
# SCCs — the fixture for strongly-connected-component queries (G1 is
# bipartite and G2 symmetric, so every SCC there is a singleton).
G3_SQL = """
SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS src,
       CAST(b.l_suppkey AS BIGINT) AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
WHERE a.l_suppkey <> b.l_suppkey
  AND (a.l_suppkey * 7 + b.l_suppkey) % 9 = 0
"""


def g3_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linenumber"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .where(
            (F.col("a.l_suppkey") != F.col("b.l_suppkey"))
            & ((F.col("a.l_suppkey") * 7 + F.col("b.l_suppkey")) % 9 == 0)
        )
        .select(
            F.col("a.l_suppkey").cast("long").alias("src"),
            F.col("b.l_suppkey").cast("long").alias("dst"),
        )
        .distinct()
    )


def g3(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph.from_edges(g3_edges(spark, sf_dir), directed=True)


def scc_sql(graph_sql: str | None = None) -> str:
    """SCC twin via full transitive closure (recursive CTE — an
    INDEPENDENT formulation from the Spark side's trim/color/reach
    peeling): u, v strongly connected iff reach(u,v) AND reach(v,u);
    scc id = min mutual partner (incl. self)."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({graph_sql or G3_SQL}),
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
reach AS (
  SELECT src AS s, dst AS d FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.d),
mutual AS (
  SELECT a.s AS u, a.d AS v
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s)
SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc
FROM verts v LEFT JOIN mutual m ON m.u = v.id
GROUP BY v.id"""


def bowtie_sql(graph_sql: str | None = None) -> str:
    """Bow-tie twin (bowtie.bowtie) via the same transitive closure as
    scc_sql: CORE = largest SCC (tie: min id), IN/OUT by closure
    membership, TUBE/TENDRIL from reachable-from-IN / reaches-OUT."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({graph_sql or G3_SQL}),
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
reach AS (
  SELECT src AS s, dst AS d FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.d),
mutual AS (
  SELECT a.s AS u, a.d AS v
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s),
sccs AS MATERIALIZED (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc
  FROM verts v LEFT JOIN mutual m ON m.u = v.id
  GROUP BY v.id),
core_id AS (
  SELECT scc FROM sccs GROUP BY scc
  ORDER BY COUNT(*) DESC, scc ASC LIMIT 1),
corev AS MATERIALIZED (
  SELECT id FROM sccs WHERE scc = (SELECT scc FROM core_id)),
bwd AS (SELECT DISTINCT r.s AS id FROM reach r JOIN corev c ON r.d = c.id),
fwd AS (SELECT DISTINCT r.d AS id FROM reach r JOIN corev c ON r.s = c.id),
inn AS MATERIALIZED (
  SELECT id FROM bwd WHERE id NOT IN (SELECT id FROM corev)),
outt AS MATERIALIZED (
  SELECT id FROM fwd WHERE id NOT IN (SELECT id FROM corev)),
fromin AS (
  SELECT id FROM inn
  UNION SELECT DISTINCT r.d FROM reach r JOIN inn i ON r.s = i.id),
toout AS (
  SELECT id FROM outt
  UNION SELECT DISTINCT r.s FROM reach r JOIN outt o ON r.d = o.id)
SELECT v.id,
  CASE WHEN v.id IN (SELECT id FROM corev) THEN 'CORE'
       WHEN v.id IN (SELECT id FROM inn) THEN 'IN'
       WHEN v.id IN (SELECT id FROM outt) THEN 'OUT'
       WHEN v.id IN (SELECT id FROM fromin)
            AND v.id IN (SELECT id FROM toout) THEN 'TUBE'
       WHEN v.id IN (SELECT id FROM fromin)
            OR v.id IN (SELECT id FROM toout) THEN 'TENDRIL'
       ELSE 'DISCONNECTED' END AS region
FROM verts v"""


# G4: the bow-tie fixture — chain edges thinned by parity-asymmetric
# rules so the Broder regions all materialize at sf0.01 (CORE 33,
# IN 17, OUT 8, TUBE 24, TENDRIL 10, DISCONNECTED 7): an even-even
# mesh forms the core, odd->even feeders the IN side, even->odd drains
# the OUT side, and a sparse odd-odd lattice supplies tubes/tendrils.
G4_SQL = """
SELECT DISTINCT CAST(a.l_suppkey AS BIGINT) AS src,
       CAST(b.l_suppkey AS BIGINT) AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
WHERE a.l_suppkey <> b.l_suppkey AND (
     (a.l_suppkey % 2 = 0 AND b.l_suppkey % 2 = 0
      AND (a.l_suppkey * 7 + b.l_suppkey) % 3 = 0)
  OR (a.l_suppkey % 2 = 1 AND b.l_suppkey % 2 = 0 AND a.l_suppkey % 11 = 3)
  OR (a.l_suppkey % 2 = 0 AND b.l_suppkey % 2 = 1 AND b.l_suppkey % 13 = 1)
  OR (a.l_suppkey % 2 = 1 AND b.l_suppkey % 2 = 1
      AND (a.l_suppkey * 3 + b.l_suppkey) % 53 = 2))
"""


def g4_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linenumber"
    )
    a, b = li.alias("a"), li.alias("b")
    sa, sb = F.col("a.l_suppkey"), F.col("b.l_suppkey")
    rule = (
        ((sa % 2 == 0) & (sb % 2 == 0) & ((sa * 7 + sb) % 3 == 0))
        | ((sa % 2 == 1) & (sb % 2 == 0) & (sa % 11 == 3))
        | ((sa % 2 == 0) & (sb % 2 == 1) & (sb % 13 == 1))
        | ((sa % 2 == 1) & (sb % 2 == 1) & ((sa * 3 + sb) % 53 == 2))
    )
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .where((sa != sb) & rule)
        .select(sa.cast("long").alias("src"), sb.cast("long").alias("dst"))
        .distinct()
    )


def g4(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph.from_edges(g4_edges(spark, sf_dir), directed=True)


def reciprocity_sql(graph_sql: str | None = None) -> str:
    """Per-node reciprocity twin (reciprocity.reciprocity): NX
    semantics, 2*|pred∩succ| / (|pred|+|succ|)."""
    return f"""
WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({graph_sql or G3_SQL})),
outs AS (SELECT src AS id, COUNT(*) AS o FROM edges GROUP BY src),
ins AS (SELECT dst AS id, COUNT(*) AS i FROM edges GROUP BY dst),
ov AS (
  SELECT e.src AS id, COUNT(*) AS ov
  FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
  GROUP BY e.src),
ids AS (SELECT id FROM outs UNION SELECT id FROM ins)
SELECT ids.id,
       ROUND(2.0 * COALESCE(ov.ov, 0)
             / (COALESCE(o.o, 0) + COALESCE(i.i, 0)), 6) AS reciprocity
FROM ids
LEFT JOIN outs o ON o.id = ids.id
LEFT JOIN ins i ON i.id = ids.id
LEFT JOIN ov ON ov.id = ids.id"""


def overall_reciprocity_sql(graph_sql: str | None = None) -> str:
    return f"""
WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({graph_sql or G3_SQL}))
SELECT ROUND(
  CAST((SELECT COUNT(*) FROM edges e
        JOIN edges r ON r.src = e.dst AND r.dst = e.src) AS DOUBLE)
  / (SELECT COUNT(*) FROM edges), 6) AS reciprocity"""


def condensation_sql(graph_sql: str | None = None) -> str:
    """SCC-DAG twin (reciprocity.condensation_edges): scc labels from
    the same transitive-closure formulation as scc_sql."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({graph_sql or G4_SQL}),
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
reach AS (
  SELECT src AS s, dst AS d FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.d),
mutual AS (
  SELECT a.s AS u, a.d AS v
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s),
sccs AS MATERIALIZED (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc
  FROM verts v LEFT JOIN mutual m ON m.u = v.id
  GROUP BY v.id)
SELECT DISTINCT su.scc AS scc_src, sv.scc AS scc_dst
FROM edges e
JOIN sccs su ON su.id = e.src
JOIN sccs sv ON sv.id = e.dst
WHERE su.scc <> sv.scc"""


def salsa_sql(rounds: int, graph_sql: str | None = None) -> str:
    """Unrolled SALSA twin (salsa.salsa): stochastic hub/authority
    power iteration — mass-conserving, so no normalization scalar and
    the rounds unroll exactly."""
    ctes = [
        f"edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({graph_sql or G3_SQL}))",
        """verts AS MATERIALIZED (
            SELECT DISTINCT id FROM (
              SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))""",
        """deg AS MATERIALIZED (
            SELECT v.id,
                   CAST((SELECT COUNT(*) FROM edges e WHERE e.dst = v.id)
                        AS DOUBLE) AS indeg,
                   CAST((SELECT COUNT(*) FROM edges e WHERE e.src = v.id)
                        AS DOUBLE) AS outdeg
            FROM verts v)""",
        """na AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS DOUBLE) AS na FROM deg WHERE indeg > 0)""",
        """a0 AS MATERIALIZED (
            SELECT id, indeg, outdeg,
                   CASE WHEN indeg > 0 THEN 1.0/(SELECT na FROM na)
                        ELSE 0.0 END AS a,
                   0.0 AS hub
            FROM deg)""",
    ]
    for i in range(rounds):
        prev, cur = f"a{i}", f"a{i + 1}"
        ctes.append(
            f"""h{i} AS MATERIALIZED (
                 SELECT e.src AS id, SUM(p.a / p.indeg) AS h
                 FROM edges e JOIN {prev} p ON p.id = e.dst AND p.indeg > 0
                 GROUP BY e.src)"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (
                 SELECT v.id, v.indeg, v.outdeg, v.a,
                        COALESCE(h.h, 0.0) AS hub
                 FROM {prev} v LEFT JOIN h{i} h ON h.id = v.id)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
                 SELECT e.dst AS id, SUM(w.hub / w.outdeg) AS na
                 FROM edges e JOIN w{i} w ON w.id = e.src AND w.outdeg > 0
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT v.id, v.indeg, v.outdeg,
                        COALESCE(c.na, 0.0) AS a, v.hub
                 FROM w{i} v LEFT JOIN c{i} c ON c.id = v.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, ROUND(a, 6) AS authority, ROUND(hub, 6) AS hub
FROM a{rounds}"""
    )


def ktruss_sql(k: int, rounds: int, graph_sql: str | None = None) -> str:
    """Unrolled k-truss twin (ktruss.k_truss): fixed `rounds` peel
    rounds over the canonical undirected edge set — choose rounds >=
    the fixture's peel depth so the unroll reaches the fixpoint the
    Spark side converges to."""
    thresh = int(k) - 2
    ctes = [
        f"""e0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
            FROM ({graph_sql or G4_SQL}) WHERE src <> dst)""",
    ]
    for i in range(rounds):
        prev, cur = f"e{i}", f"e{i + 1}"
        ctes.append(
            f"""s{i} AS MATERIALIZED (
                 SELECT src, dst FROM {prev}
                 UNION ALL SELECT dst, src FROM {prev})"""
        )
        ctes.append(
            f"""sup{i} AS MATERIALIZED (
                 SELECT w.src, w.dst, COUNT(*) AS sup FROM (
                   SELECT e.src, e.dst, a.dst AS w
                   FROM {prev} e JOIN s{i} a ON a.src = e.src) w
                 WHERE EXISTS (SELECT 1 FROM s{i} b
                               WHERE b.src = w.dst AND b.dst = w.w)
                 GROUP BY w.src, w.dst)"""
        )
        ctes.append(
            f"""{cur} AS MATERIALIZED (
                 SELECT e.src, e.dst FROM {prev} e
                 LEFT JOIN sup{i} s ON s.src = e.src AND s.dst = e.dst
                 WHERE COALESCE(s.sup, 0) >= {thresh})"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT src, dst FROM e{rounds}"""
    )


def cocitation_sql(min_common: int = 1, graph_sql: str | None = None,
                   coupling: bool = False) -> str:
    """Co-citation / bibliographic-coupling twin (cocitation.py):
    self-join on the shared endpoint, degree-normalized cosine and
    jaccard."""
    k, o = ("dst", "src") if coupling else ("src", "dst")
    return f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ({graph_sql or G1_SQL})),
deg AS MATERIALIZED (
  SELECT {o} AS u, CAST(COUNT(*) AS DOUBLE) AS du FROM edges GROUP BY {o}),
pairs AS MATERIALIZED (
  SELECT a.{o} AS u, b.{o} AS v, COUNT(*) AS common
  FROM edges a JOIN edges b ON a.{k} = b.{k} AND a.{o} < b.{o}
  GROUP BY a.{o}, b.{o}
  HAVING COUNT(*) >= {int(min_common)})
SELECT p.u, p.v, p.common,
       ROUND(p.common / sqrt(d1.du * d2.du), 6) AS cosine,
       ROUND(p.common / (d1.du + d2.du - p.common), 6) AS jaccard
FROM pairs p
JOIN deg d1 ON d1.u = p.u
JOIN deg d2 ON d2.u = p.v"""


def bipartite_sql(graph_sql: str | None = None) -> str:
    """Bipartite-components twin (bipartite.bipartite_components):
    undirected closure for components, recursive parity walk from each
    component root; a vertex reached at both parities marks its
    component non-bipartite."""
    return f"""
WITH RECURSIVE base AS MATERIALIZED ({graph_sql or G4_SQL}),
sym AS MATERIALIZED (
  SELECT src, dst FROM base UNION SELECT dst, src FROM base),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym),
reach AS (
  SELECT src AS s, dst AS d FROM sym
  UNION
  SELECT r.s, e.dst FROM reach r JOIN sym e ON e.src = r.d),
comp AS MATERIALIZED (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(r.d), v.id)) AS comp
  FROM verts v LEFT JOIN reach r ON r.s = v.id
  GROUP BY v.id),
par AS (
  SELECT id, 0 AS p FROM comp WHERE id = comp
  UNION
  SELECT e.dst AS id, 1 - par.p AS p
  FROM par JOIN sym e ON e.src = par.id),
bad AS MATERIALIZED (
  SELECT DISTINCT c.comp
  FROM par a JOIN par b ON b.id = a.id AND a.p = 0 AND b.p = 1
  JOIN comp c ON c.id = a.id)
SELECT c.comp, CAST(COUNT(*) AS BIGINT) AS n_vertices,
       c.comp NOT IN (SELECT comp FROM bad) AS is_bipartite
FROM comp c GROUP BY c.comp"""


def kmeans_sql(k: int, iters: int = 2) -> str:
    """Unrolled deterministic Lloyd k-means twin (kmeans.kmeans_assign)
    over the embeddings table: k-smallest-id init, argmin over
    (round(dist²,6), cid), element-wise mean updates, empty clusters
    keep their previous centroid."""
    d2 = ("ROUND(list_sum(list_transform(generate_series(1, len(e.v)),"
          " i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), 6)")
    ctes = [
        """emb AS MATERIALIZED (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings)""",
        f"""c0 AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
            FROM emb ORDER BY vec_id LIMIT {int(k)})""",
    ]
    for t in range(int(iters)):
        ctes.append(
            f"""a{t} AS MATERIALIZED (
                 SELECT vec_id, cid AS cluster FROM (
                   SELECT e.vec_id, c.cid,
                          ROW_NUMBER() OVER (
                            PARTITION BY e.vec_id
                            ORDER BY {d2}, c.cid) AS rn
                   FROM emb e CROSS JOIN c{t} c)
                 WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{t} AS MATERIALIZED (
                 SELECT s.cluster AS cid,
                        list(mv ORDER BY dim) AS cvec
                 FROM (
                   SELECT a.cluster, u.dim, AVG(u.val) AS mv
                   FROM a{t} a JOIN emb e ON e.vec_id = a.vec_id,
                        LATERAL (SELECT generate_subscripts(e.v, 1) AS dim,
                                        unnest(e.v) AS val) u
                   GROUP BY a.cluster, u.dim) s
                 GROUP BY s.cluster)"""
        )
        ctes.append(
            f"""c{t + 1} AS MATERIALIZED (
                 SELECT c.cid, COALESCE(m.cvec, c.cvec) AS cvec
                 FROM c{t} c LEFT JOIN m{t} m ON m.cid = c.cid)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT vec_id, cid AS cluster, d AS dist2 FROM (
  SELECT e.vec_id, c.cid, {d2} AS d,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {d2}, c.cid) AS rn
  FROM emb e CROSS JOIN c{int(iters)} c)
WHERE rn = 1"""
    )


def semantic_dedup_sql(k: int, iters: int = 2,
                       threshold: float = 0.95) -> str:
    """SemDeDup twin (kmeans.semantic_dedup): the kmeans_sql chain for
    cluster assignment, then per-cluster keep-first pruning — drop u
    iff some smaller-id v in the same cluster has cosine >= threshold."""
    base = kmeans_sql(k, iters)
    head, final = base.rsplit("\nSELECT vec_id, cid AS cluster", 1)
    cos = ("ROUND(list_sum(list_transform(generate_series(1, len(a.v)),"
           " i -> a.v[i] * b.v[i]))"
           " / (sqrt(list_sum(list_transform(a.v, x -> x * x)))"
           "    * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)")
    return (
        head
        + f""",
fin AS MATERIALIZED (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND(list_sum(list_transform(
                                generate_series(1, len(e.v)),
                                i -> (e.v[i] - c.cvec[i])
                                     * (e.v[i] - c.cvec[i]))), 6),
                              c.cid) AS rn
    FROM emb e CROSS JOIN c{int(iters)} c)
  WHERE rn = 1),
sims AS MATERIALIZED (
  SELECT fu.vec_id, MAX({cos}) AS max_sim
  FROM fin fu
  JOIN fin fv ON fv.cluster = fu.cluster AND fv.vec_id < fu.vec_id
  JOIN emb a ON a.vec_id = fu.vec_id
  JOIN emb b ON b.vec_id = fv.vec_id
  GROUP BY fu.vec_id)
SELECT f.vec_id, f.cluster,
       ROUND(COALESCE(s.max_sim, -1.0), 6) AS max_sim_smaller,
       COALESCE(s.max_sim, -1.0) < {float(threshold)} AS keep
FROM fin f LEFT JOIN sims s ON s.vec_id = f.vec_id"""
    )


def mis_sql(rounds: int, edges_sql: str | None = None) -> str:
    """Unrolled deterministic-Luby MIS (algorithms/mis.py) — fixed
    ``rounds``; vertices still active after the last round surface
    with NULL in_mis/round, exactly like the Spark fixed_rounds mode.
    The round key md5(id || ':' || r) || lpad(id, 20, '0') is the same
    string both engines build, so the match is bit-exact."""
    ctes = [
        f"eraw AS MATERIALIZED ({edges_sql if edges_sql is not None else G2_SQL})",
        """e AS MATERIALIZED (
            SELECT src, dst FROM (
              SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)
            WHERE src <> dst)""",
        "a0 AS MATERIALIZED (SELECT src AS id FROM eraw UNION SELECT dst FROM eraw)",
    ]
    parts = []
    for r in range(1, rounds + 1):
        prev = f"a{r - 1}"
        ctes.append(
            f"""p{r} AS MATERIALIZED (
              SELECT id, md5(CAST(id AS VARCHAR) || ':{r}')
                     || lpad(CAST(id AS VARCHAR), 20, '0') AS k
              FROM {prev})"""
        )
        ctes.append(
            f"""n{r} AS MATERIALIZED (
              SELECT e.dst AS id, MIN(p.k) AS nk
              FROM e JOIN p{r} p ON p.id = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
              SELECT p.id FROM p{r} p LEFT JOIN n{r} n USING (id)
              WHERE n.nk IS NULL OR p.k < n.nk)"""
        )
        ctes.append(
            f"""x{r} AS MATERIALIZED (
              SELECT DISTINCT e.dst AS id
              FROM e JOIN w{r} w ON e.src = w.id
                     JOIN {prev} a ON a.id = e.dst)"""
        )
        ctes.append(
            f"""a{r} AS MATERIALIZED (
              SELECT id FROM {prev}
              EXCEPT (SELECT id FROM w{r} UNION SELECT id FROM x{r}))"""
        )
        parts.append(
            f"SELECT id, TRUE AS in_mis, CAST({r} AS INT) AS round FROM w{r}"
        )
        parts.append(
            f"SELECT id, FALSE AS in_mis, CAST({r} AS INT) AS round FROM x{r}"
        )
    parts.append(
        f"SELECT id, CAST(NULL AS BOOLEAN) AS in_mis,"
        f" CAST(NULL AS INT) AS round FROM a{rounds}"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(parts)


_STRUCT_CTES = """eraw AS MATERIALIZED ({edges_sql}),
e AS MATERIALIZED (
    SELECT src, dst FROM (
      SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)
    WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS id FROM eraw UNION SELECT dst FROM eraw),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)"""


def avg_neighbor_degree_sql(edges_sql: str | None = None) -> str:
    """Twin of algorithms/structure.average_neighbor_degree."""
    return (
        "WITH "
        + _STRUCT_CTES.format(
            edges_sql=edges_sql if edges_sql is not None else G2_SQL
        )
        + """,
        annd AS MATERIALIZED (
            SELECT e.src AS id, SUM(dd.d) / COUNT(*) AS avg_nbr_deg
            FROM e JOIN deg dd ON dd.id = e.dst GROUP BY e.src)
        SELECT v.id, COALESCE(a.avg_nbr_deg, 0.0) AS avg_nbr_deg
        FROM verts v LEFT JOIN annd a USING (id)"""
    )


def degree_connectivity_sql(edges_sql: str | None = None) -> str:
    """Twin of algorithms/structure.average_degree_connectivity."""
    return (
        "WITH "
        + _STRUCT_CTES.format(
            edges_sql=edges_sql if edges_sql is not None else G2_SQL
        )
        + """
        SELECT CAST(ds.d AS BIGINT) AS degree, SUM(dt.d) / COUNT(*) AS knn
        FROM e JOIN deg ds ON ds.id = e.src
               JOIN deg dt ON dt.id = e.dst
        GROUP BY ds.d"""
    )


def rich_club_sql(edges_sql: str | None = None) -> str:
    """Twin of algorithms/structure.rich_club_coefficient —
    suffix-sum windows over the two degree histograms, forward-filled
    to every k in 0..maxdeg−1 via correlated min-threshold picks."""
    return (
        "WITH "
        + _STRUCT_CTES.format(
            edges_sql=edges_sql if edges_sql is not None else G2_SQL
        )
        + """,
        emin AS MATERIALIZED (
            SELECT LEAST(ds.d, dt.d) AS md, COUNT(*) AS me
            FROM e JOIN deg ds ON ds.id = e.src
                   JOIN deg dt ON dt.id = e.dst
            WHERE e.src < e.dst
            GROUP BY LEAST(ds.d, dt.d)),
        dh AS MATERIALIZED (SELECT d, COUNT(*) AS nd FROM deg GROUP BY d),
        n_gt AS MATERIALIZED (
            SELECT d - 1 AS k, SUM(nd) OVER (ORDER BY d DESC) AS n_k FROM dh),
        e_gt AS MATERIALIZED (
            SELECT md - 1 AS k, SUM(me) OVER (ORDER BY md DESC) AS e_k
            FROM emin),
        ks AS MATERIALIZED (
            SELECT unnest(range(0, (SELECT MAX(d) FROM deg))) AS k),
        filled AS MATERIALIZED (
            SELECT k.k,
              (SELECT n.n_k FROM n_gt n WHERE n.k >= k.k
               ORDER BY n.k LIMIT 1) AS n_k,
              (SELECT g.e_k FROM e_gt g WHERE g.k >= k.k
               ORDER BY g.k LIMIT 1) AS e_k
            FROM ks k)
        SELECT CAST(k AS BIGINT) AS k,
               ROUND(2.0 * COALESCE(e_k, 0) / (n_k * (n_k - 1)), 6) AS phi
        FROM filled WHERE COALESCE(n_k, 0) >= 2"""
    )


def eccentricity_sql(rounds: int) -> str:
    """Twin of algorithms/structure.eccentricity over undirected G2
    (per-component max finite pair distance per source)."""
    return f"""{_pair_bfs_ctes(rounds)}
SELECT s AS id, MAX(dist) AS eccentricity
FROM p{rounds} WHERE dist < 1e17 GROUP BY s
"""


def simrank_sql(rounds: int, c: float = 0.6) -> str:
    """Twin of algorithms/simrank.simrank(fixed_rounds=rounds) over
    the mod-5-trimmed directed G4 (both endpoints ≡ 0 mod 5 keeps the
    |V|² pair state tiny). Unrolled Jacobi updates of
    S(u,v) = C/(|I(u)||I(v)|)·Σ_{a∈I(u),b∈I(v)} S(a,b), diag 1."""
    ctes = [
        f"""ine AS MATERIALIZED (
  SELECT src, dst FROM ({G4_SQL})
  WHERE src <> dst AND src % 5 = 0 AND dst % 5 = 0)""",
        "sv AS MATERIALIZED (SELECT src AS id FROM ine UNION SELECT dst FROM ine)",
        "ind AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS ind FROM ine GROUP BY dst)",
        """prs AS MATERIALIZED (
  SELECT a.id AS u, b.id AS v FROM sv a CROSS JOIN sv b)""",
        """s0 AS MATERIALIZED (
  SELECT u, v, CASE WHEN u = v THEN 1.0 ELSE 0.0 END AS s FROM prs)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""s{i + 1} AS MATERIALIZED (
  SELECT p.u, p.v,
         CASE WHEN p.u = p.v THEN 1.0
              ELSE {c} * COALESCE(t.tot, 0.0)
                   / (COALESCE(iu.ind, 1) * COALESCE(iv.ind, 1)) END AS s
  FROM prs p
  LEFT JOIN (
    SELECT ea.dst AS u, eb.dst AS v, SUM(s.s ORDER BY s.s) AS tot
    FROM s{i} s
    JOIN ine ea ON ea.src = s.u
    JOIN ine eb ON eb.src = s.v
    WHERE s.s <> 0.0
    GROUP BY ea.dst, eb.dst) t ON t.u = p.u AND t.v = p.v
  LEFT JOIN ind iu ON iu.id = p.u
  LEFT JOIN ind iv ON iv.id = p.v)"""
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT u, v, ROUND(s, 6) AS s FROM s{rounds}")


def dagk_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic layered DAG over custkeys: arcs i -> 2i, 2i+1, 3i
    (targets capped at max custkey). Acyclic by construction (targets
    strictly larger), depth ~ log2(N)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"))
    mx = c.agg(F.max("id").alias("m"))
    t = c.crossJoin(F.broadcast(mx)).select("id", "m")
    parts = [
        t.select(F.col("id").alias("src"), (F.col("id") * 2).alias("dst"), "m"),
        t.select(F.col("id").alias("src"), (F.col("id") * 2 + 1).alias("dst"), "m"),
        t.select(F.col("id").alias("src"), (F.col("id") * 3).alias("dst"), "m"),
    ]
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return (u.where((F.col("dst") <= F.col("m"))
                    & (F.col("src") < F.col("dst")))  # drops 0->0
            .select("src", "dst").distinct())


DAGK_SQL = """
WITH ck AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
mx AS (SELECT MAX(id) AS m FROM ck)
SELECT DISTINCT src, dst FROM (
  SELECT id AS src, id * 2 AS dst FROM ck
  UNION ALL SELECT id, id * 2 + 1 FROM ck
  UNION ALL SELECT id, id * 3 FROM ck)
WHERE dst <= (SELECT m FROM mx) AND src < dst
"""


def dagk(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph.from_edges(dagk_edges(spark, sf_dir), directed=True)


def topo_generations_sql(rounds: int) -> str:
    """Twin of algorithms/dag.topological_generations over the DAGK
    graph — unrolled Kahn peel: per round the zero-in-degree vertices
    of the remainder take generation r. ``rounds`` must be > DAG
    depth (depth ~ log2(max custkey); 24 covers every test SF)."""
    ctes = [
        f"e0 AS MATERIALIZED ({DAGK_SQL})",  # nested WITH is valid in parens
        "v0 AS MATERIALIZED (SELECT src AS id FROM e0 UNION SELECT dst FROM e0)",
    ]
    selects = []
    for r in range(rounds):
        ctes.append(
            f"""g{r} AS MATERIALIZED (
  SELECT id FROM v{r} WHERE id NOT IN (SELECT dst FROM e{r}))"""
        )
        selects.append(
            f"SELECT id, CAST({r} AS BIGINT) AS generation FROM g{r}")
        ctes.append(
            f"""v{r + 1} AS MATERIALIZED (
  SELECT id FROM v{r} WHERE id NOT IN (SELECT id FROM g{r}))"""
        )
        ctes.append(
            f"""e{r + 1} AS MATERIALIZED (
  SELECT src, dst FROM e{r} WHERE src NOT IN (SELECT id FROM g{r}))"""
        )
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


def dag_longest_sql(rounds: int) -> str:
    """Twin of the DAGK longest-path length: unrolled max-plus
    relaxation (unit weights) — d_{r+1}(v) = max(d_r(v),
    max_in(d_r(u) + 1)); converges once rounds > depth."""
    ctes = [
        f"e AS MATERIALIZED ({DAGK_SQL})",  # nested WITH is valid in parens
        "dverts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "d0 AS MATERIALIZED (SELECT id, 0.0 AS d FROM dverts)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""d{r + 1} AS MATERIALIZED (
  SELECT v.id, GREATEST(v.d, COALESCE(m.cand, 0.0)) AS d
  FROM d{r} v LEFT JOIN (
    SELECT e.dst AS id, MAX(p.d + 1.0) AS cand
    FROM e JOIN d{r} p ON p.id = e.src GROUP BY e.dst) m
  ON m.id = v.id)"""
        )
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(MAX(d) AS BIGINT) AS longest,
       CAST(SUM(CASE WHEN d = (SELECT MAX(d) FROM d{rounds})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_longest_tails
FROM d{rounds}""")


def wiener_sql(rounds: int) -> str:
    """Twin of algorithms/structure.topological_indices over
    undirected G2 (Wiener / hyper-Wiener / Schultz / Gutman; +inf when
    disconnected)."""
    return f"""{_pair_bfs_ctes(rounds)},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
fin AS MATERIALIZED (
  SELECT s, id, dist FROM p{rounds} WHERE dist < 1e17 AND s <> id),
tot AS MATERIALIZED (
  SELECT COUNT(*) AS cnt, SUM(dist) AS sd,
         SUM(dist + dist * dist) AS sdd,
         SUM((da.deg + db.deg) * dist) AS ssch,
         SUM(da.deg * db.deg * dist) AS sgut
  FROM fin JOIN deg da ON da.id = fin.s JOIN deg db ON db.id = fin.id),
nn AS (SELECT COUNT(*) AS n FROM verts)
SELECT (cnt = n * (n - 1)) AS connected,
       CASE WHEN cnt = n * (n - 1) THEN ROUND(sd / 2, 6)
            ELSE CAST('inf' AS DOUBLE) END AS wiener,
       CASE WHEN cnt = n * (n - 1) THEN ROUND(sdd / 2, 6)
            ELSE CAST('inf' AS DOUBLE) END AS hyper_wiener,
       CASE WHEN cnt = n * (n - 1) THEN ROUND(ssch / 2, 6)
            ELSE CAST('inf' AS DOUBLE) END AS schultz,
       CASE WHEN cnt = n * (n - 1) THEN ROUND(sgut / 2, 6)
            ELSE CAST('inf' AS DOUBLE) END AS gutman
FROM tot CROSS JOIN nn"""


def global_efficiency_sql(rounds: int) -> str:
    """Twin of algorithms/structure.global_efficiency over undirected
    G2 (mean over ordered pairs of 1/d; unreachable pairs are 0)."""
    return f"""{_pair_bfs_ctes(rounds)},
nn AS (SELECT COUNT(*) AS n FROM verts)
SELECT ROUND(COALESCE(SUM(CASE WHEN dist < 1e17 AND s <> id
                          THEN 1.0 / dist ELSE 0 END), 0)
             / (SELECT n * (n - 1) FROM nn), 6) AS efficiency
FROM p{rounds}"""


def graph_extremes_sql(rounds: int) -> str:
    """Twin of algorithms/structure.graph_extremes."""
    return f"""{_pair_bfs_ctes(rounds)},
ecc AS MATERIALIZED (
    SELECT s AS id, MAX(dist) AS ecc
    FROM p{rounds} WHERE dist < 1e17 GROUP BY s)
SELECT MIN(ecc) AS radius, MAX(ecc) AS diameter,
       CAST(SUM(CASE WHEN ecc = (SELECT MIN(ecc) FROM ecc)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_center,
       CAST(SUM(CASE WHEN ecc = (SELECT MAX(ecc) FROM ecc)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_periphery
FROM ecc"""


def diameter_sweep_sql(rounds: int) -> str:
    """Twin of algorithms/paths.diameter_double_sweep over undirected
    G2 — two unrolled BFS chains; the second is seeded by the scalar
    subquery picking the farthest (max depth, min id) vertex of the
    first. ``rounds`` must exceed the diameter."""
    big = "1e17"
    ctes = [_G2_UND.strip()]
    for tag, src_expr in (
        ("a", "(SELECT MIN(id) FROM verts)"),
        ("b", "(SELECT id FROM fara)"),
    ):
        ctes.append(
            f"""{tag}0 AS MATERIALIZED (SELECT id,
              CASE WHEN id = {src_expr} THEN 0.0 ELSE 1e18 END AS dist
              FROM verts)"""
        )
        for i in range(rounds):
            prev, cur = f"{tag}{i}", f"{tag}{i + 1}"
            ctes.append(
                f"""{tag}m{i} AS MATERIALIZED (
                  SELECT e.dst AS id, MIN(p.dist + 1.0) AS cand
                  FROM und e JOIN {prev} p ON p.id = e.src AND p.dist < {big}
                  GROUP BY e.dst)"""
            )
            ctes.append(
                f"""{cur} AS MATERIALIZED (
                  SELECT p.id, LEAST(p.dist, COALESCE(m.cand, 1e18)) AS dist
                  FROM {prev} p LEFT JOIN {tag}m{i} m ON m.id = p.id)"""
            )
        if tag == "a":
            ctes.append(
                f"""fara AS MATERIALIZED (
                  SELECT id, CAST(dist AS BIGINT) AS ecc FROM a{rounds}
                  WHERE dist < {big}
                  ORDER BY dist DESC, id ASC LIMIT 1)"""
            )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT (SELECT MIN(id) FROM verts) AS start,
       (SELECT ecc FROM fara) AS ecc_start,
       (SELECT id FROM fara) AS far,
       CAST(MAX(dist) AS BIGINT) AS diameter_lb
FROM b{rounds} WHERE dist < {big}"""
    )


def boruvka_sql(rounds: int, edges_sql: str | None = None) -> str:
    """Unrolled deterministic Borůvka MSF (algorithms/msf.py) over
    weighted G2W — per round: struct-MIN pick keyed by component
    ((w,u,v) total order, cu/cv riding along), recursive-CTE
    min-label closure over the contracted component graph. With
    ``rounds`` ≥ ⌈log2 |V|⌉ the union of per-round picks IS the full
    forest (later rounds choose nothing)."""
    ctes, union = _boruvka_ctes(rounds, edges_sql)
    return (
        "WITH RECURSIVE " + ",\n".join(ctes)
        + f"\nSELECT u AS src, v AS dst, w FROM ({union})"
    )


def single_linkage_sql(
    threshold: float, rounds: int, edges_sql: str | None = None
) -> str:
    """Twin of algorithms/msf.single_linkage: components (min-label,
    recursive closure) of the ``rounds``-round Borůvka forest after
    cutting edges with w > threshold."""
    ctes, union = _boruvka_ctes(rounds, edges_sql)
    ctes.append(f"forest AS MATERIALIZED ({union})")
    ctes.append(
        f"""kept AS MATERIALIZED (
          SELECT u AS a, v AS b FROM forest WHERE w <= {threshold}
          UNION SELECT v, u FROM forest WHERE w <= {threshold})"""
    )
    ctes.append(
        """cl AS (
          SELECT id AS node, id AS lbl FROM verts
          UNION
          SELECT k.b, c.lbl FROM cl c JOIN kept k ON k.a = c.node)"""
    )
    return (
        "WITH RECURSIVE " + ",\n".join(ctes)
        + "\nSELECT node AS id, MIN(lbl) AS cluster FROM cl GROUP BY node"
    )


def _boruvka_ctes(
    rounds: int, edges_sql: str | None = None
) -> tuple[list[str], str]:
    ctes = [
        f"eraw AS MATERIALIZED ({edges_sql if edges_sql is not None else G2W_SQL})",
        """eu AS MATERIALIZED (
            SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, MIN(w) AS w
            FROM eraw WHERE src <> dst GROUP BY 1, 2)""",
        "verts AS MATERIALIZED (SELECT src AS id FROM eraw UNION SELECT dst FROM eraw)",
        "c0 AS MATERIALIZED (SELECT id, id AS comp FROM verts)",
    ]
    struct = "{'w': w, 'u': u, 'v': v, 'cu': cu, 'cv': cv}"
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        ctes.append(
            f"""x{r} AS MATERIALIZED (
              SELECT a.comp AS cu, b.comp AS cv, e.w, e.u, e.v
              FROM eu e JOIN {prev} a ON a.id = e.u
                        JOIN {prev} b ON b.id = e.v
              WHERE a.comp <> b.comp)"""
        )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
              SELECT c, MIN(s) AS s FROM (
                SELECT cu AS c, {struct} AS s FROM x{r}
                UNION ALL
                SELECT cv, {struct} FROM x{r}) GROUP BY c)"""
        )
        ctes.append(
            f"""ch{r} AS MATERIALIZED (
              SELECT DISTINCT s['u'] AS u, s['v'] AS v, s['w'] AS w,
                     s['cu'] AS cu, s['cv'] AS cv FROM p{r})"""
        )
        ctes.append(
            f"""g{r} AS MATERIALIZED (
              SELECT cu AS a, cv AS b FROM ch{r}
              UNION SELECT cv, cu FROM ch{r})"""
        )
        ctes.append(
            f"""cc{r} AS (
              SELECT comp AS node, comp AS lbl
              FROM (SELECT DISTINCT comp FROM {prev})
              UNION
              SELECT g.b, c.lbl FROM cc{r} c JOIN g{r} g ON g.a = c.node)"""
        )
        ctes.append(
            f"""rl{r} AS MATERIALIZED (
              SELECT node, MIN(lbl) AS lbl FROM cc{r} GROUP BY node)"""
        )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
              SELECT c.id, r.lbl AS comp
              FROM {prev} c JOIN rl{r} r ON r.node = c.comp)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT u, v, w FROM ch{r}" for r in range(1, rounds + 1)
    )
    return ctes, union


def label_spreading_sql(rounds: int, n_seeds: int = 4) -> str:
    """Unrolled Zhu-Ghahramani label spreading over undirected G1
    (twin of algorithms/spreading.py): seeds = the n_seeds smallest
    vertex ids, class = seed_rank % 2, two packed score columns."""
    ccols = ["s_0", "s_1"]

    def clamp(expr: str, c: int) -> str:
        return (
            f"CASE WHEN v.cls IS NOT NULL THEN"
            f" (CASE WHEN v.cls = {c} THEN 1.0 ELSE 0.0 END)"
            f" ELSE {expr} END"
        )

    ctes = [
        f"edges0 AS MATERIALIZED ({G1_SQL})",
        """sym AS MATERIALIZED (SELECT src, dst FROM edges0
                 UNION SELECT dst, src FROM edges0)""",
        """verts AS MATERIALIZED (
            SELECT DISTINCT id FROM (
              SELECT src AS id FROM edges0 UNION ALL SELECT dst FROM edges0))""",
        """deg AS MATERIALIZED (
            SELECT v.id, CAST(COUNT(s.src) AS DOUBLE) AS deg
            FROM verts v LEFT JOIN sym s ON s.src = v.id GROUP BY v.id)""",
        f"""seeds AS MATERIALIZED (
            SELECT id, (rn - 1) % 2 AS cls FROM (
              SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM verts)
            WHERE rn <= {int(n_seeds)})""",
        "base AS MATERIALIZED (SELECT d.id, d.deg, s.cls"
        " FROM deg d LEFT JOIN seeds s ON s.id = d.id)",
        "f0 AS MATERIALIZED (SELECT v.id, v.deg, v.cls, "
        + ", ".join(
            clamp("0.0", c) + f" AS {cc}" for c, cc in enumerate(ccols)
        )
        + " FROM base v)",
    ]
    for i in range(rounds):
        prev, cur = f"f{i}", f"f{i + 1}"
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT e.dst AS id, "
            + ", ".join(f"SUM(p.{cc}) AS {cc}" for cc in ccols)
            + f" FROM sym e JOIN {prev} p ON p.id = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"{cur} AS MATERIALIZED (SELECT v.id, v.deg, v.cls, "
            + ", ".join(
                clamp(
                    f"CASE WHEN v.deg > 0 THEN COALESCE(m.{cc}, 0.0) / v.deg"
                    f" ELSE 0.0 END",
                    c,
                )
                + f" AS {cc}"
                for c, cc in enumerate(ccols)
            )
            + f" FROM base v LEFT JOIN m{i} m ON m.id = v.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id,
       CAST(CASE WHEN GREATEST(s_0, s_1) > 0 THEN
            (CASE WHEN s_0 = GREATEST(s_0, s_1) THEN 0 ELSE 1 END)
       END AS BIGINT) AS label,
       ROUND(GREATEST(s_0, s_1), 6) AS score
FROM f{rounds}"""
    )


def quotient_sql(labels_sql: str, edges_sql: str | None = None) -> str:
    """Twin of algorithms/quotient.quotient_graph edges (self_loops
    dropped): label both endpoints with ``labels_sql``'s (id, label)
    and roll up multiplicities."""
    return f"""
WITH lab AS MATERIALIZED ({labels_sql}),
e AS MATERIALIZED ({edges_sql if edges_sql is not None else G2_SQL}),
t AS (
  SELECT ls.label AS src, ld.label AS dst
  FROM e JOIN lab ls ON ls.id = e.src
         JOIN lab ld ON ld.id = e.dst
  WHERE ls.label <> ld.label)
SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM t GROUP BY src, dst"""


def modularity_sql(labels_sql: str, edges_sql: str | None = None) -> str:
    """Newman modularity of the assignment produced by ``labels_sql``
    (any query yielding (id, label)) over the symmetrized simple
    graph — twin of algorithms/louvain.modularity (unweighted)."""
    ctes = [
        f"lab AS MATERIALIZED ({labels_sql})",
        f"eraw AS MATERIALIZED ({edges_sql if edges_sql is not None else G2_SQL})",
        """e AS MATERIALIZED (
            SELECT src, dst FROM (
              SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)
            WHERE src <> dst)""",
        "deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "m2 AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS m2 FROM e)",
        """dc AS MATERIALIZED (
            SELECT l.label, SUM(COALESCE(d.d, 0)) AS dc
            FROM lab l LEFT JOIN deg d ON d.id = l.id GROUP BY l.label)""",
        """intra AS MATERIALIZED (
            SELECT l1.label, CAST(COUNT(*) AS DOUBLE) AS ir
            FROM e JOIN lab l1 ON l1.id = e.src
                   JOIN lab l2 ON l2.id = e.dst
            WHERE l2.label = l1.label GROUP BY l1.label)""",
        """q AS MATERIALIZED (
            SELECT COALESCE(SUM(COALESCE(i.ir, 0) / (SELECT m2 FROM m2)
                   - POW(c.dc / (SELECT m2 FROM m2), 2)), 0) AS q
            FROM dc c LEFT JOIN intra i ON i.label = c.label)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
        SELECT (SELECT COUNT(DISTINCT label) FROM lab) AS n_communities,
               ROUND(q, 6) AS modularity FROM q"""
    )


def _degree_ctes(edges_sql: str | None, mode: str) -> list[str]:
    ends = {
        "in": "SELECT dst AS id FROM eraw",
        "out": "SELECT src AS id FROM eraw",
        "both": "SELECT src AS id FROM eraw UNION ALL SELECT dst AS id FROM eraw",
    }[mode]
    return [
        f"eraw AS MATERIALIZED ({edges_sql if edges_sql is not None else G1_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM eraw UNION SELECT dst FROM eraw)",
        f"""dd AS MATERIALIZED (
            SELECT id, COUNT(*) AS degree FROM ({ends}) GROUP BY id)""",
        """degs AS MATERIALIZED (
            SELECT v.id, CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree
            FROM verts v LEFT JOIN dd d USING (id))""",
    ]


def degree_histogram_sql(edges_sql: str | None = None, mode: str = "in") -> str:
    """Twin of algorithms/degree.degree_histogram."""
    return (
        "WITH " + ",\n".join(_degree_ctes(edges_sql, mode))
        + "\nSELECT degree, COUNT(*) AS cnt FROM degs GROUP BY degree"
    )


def powerlaw_alpha_sql(
    edges_sql: str | None = None, d_min: int = 2, mode: str = "in"
) -> str:
    """Twin of algorithms/degree.powerlaw_alpha (CSN discrete MLE)."""
    return (
        "WITH " + ",\n".join(_degree_ctes(edges_sql, mode))
        + f"""
        SELECT ROUND(1 + COUNT(*) / SUM(ln(degree / {d_min - 0.5})), 6)
                 AS alpha,
               COUNT(*) AS n_tail,
               CAST({d_min} AS BIGINT) AS d_min
        FROM degs WHERE degree >= {d_min}"""
    )


def _butterfly_pairs_cte(edges_sql: str | None) -> list[str]:
    return [
        f"""e AS MATERIALIZED (
            SELECT DISTINCT src, dst
            FROM ({edges_sql if edges_sql is not None else G1_SQL}))""",
        """pairs AS MATERIALIZED (
            SELECT a.src AS u, b.src AS v, COUNT(*) AS w
            FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
            GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
    ]


def butterflies_sql(edges_sql: str | None = None) -> str:
    """Per-src-vertex butterfly counts (algorithms/butterfly.py) —
    b(u) = Σ_v C(w_uv, 2) over same-side pairs sharing w ≥ 2
    neighbors; every src vertex present with 0 default."""
    ctes = _butterfly_pairs_cte(edges_sql) + [
        """contrib AS MATERIALIZED (
            SELECT u AS id, CAST(w * (w - 1) / 2 AS BIGINT) AS b FROM pairs
            UNION ALL
            SELECT v, CAST(w * (w - 1) / 2 AS BIGINT) FROM pairs)""",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
        SELECT v.id, CAST(COALESCE(SUM(c.b), 0) AS BIGINT) AS butterflies
        FROM verts v LEFT JOIN contrib c USING (id) GROUP BY v.id"""
    )


def butterfly_stats_sql(edges_sql: str | None = None) -> str:
    """Global butterfly stats twin: B, L3 (length-3 paths counted at
    their middle edge) and the Robins–Alexander cc = 4B/L3."""
    ctes = _butterfly_pairs_cte(edges_sql) + [
        """b AS MATERIALIZED (
            SELECT CAST(COALESCE(SUM(CAST(w * (w - 1) / 2 AS BIGINT)), 0)
                        AS BIGINT) AS n_butterflies FROM pairs)""",
        "d1 AS MATERIALIZED (SELECT src, COUNT(*) AS du FROM e GROUP BY src)",
        "d2 AS MATERIALIZED (SELECT dst, COUNT(*) AS dx FROM e GROUP BY dst)",
        """l3 AS MATERIALIZED (
            SELECT CAST(COALESCE(SUM(CAST((du - 1) * (dx - 1) AS BIGINT)), 0)
                        AS BIGINT) AS n_paths3
            FROM e JOIN d1 USING (src) JOIN d2 USING (dst))""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
        SELECT n_butterflies, n_paths3,
               ROUND(CASE WHEN n_paths3 > 0
                          THEN 4.0 * n_butterflies / n_paths3
                          ELSE 0.0 END, 6) AS bipartite_cc
        FROM b, l3"""
    )


def coloring_sql(rounds: int, edges_sql: str | None = None) -> str:
    """Unrolled Jones–Plassmann greedy coloring
    (algorithms/coloring.py) — fixed ``rounds``; vertices still
    uncolored after the last round surface with NULL color/round,
    exactly like the Spark fixed_rounds mode. The STATIC priority
    md5(id) || lpad(id, 20, '0') is the same string both engines
    build; the mex is computed by anti-joining candidate colors
    0..r-1 (colors assigned in round r are provably ≤ r-1) against
    the colored-neighbor set, so the match is bit-exact."""
    ctes = [
        f"eraw AS MATERIALIZED ({edges_sql if edges_sql is not None else G2_SQL})",
        """e AS MATERIALIZED (
            SELECT src, dst FROM (
              SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)
            WHERE src <> dst)""",
        "a0 AS MATERIALIZED (SELECT src AS id FROM eraw UNION SELECT dst FROM eraw)",
        """p AS MATERIALIZED (
            SELECT id, md5(CAST(id AS VARCHAR))
                   || lpad(CAST(id AS VARCHAR), 20, '0') AS k
            FROM a0)""",
        """c0 AS MATERIALIZED (
            SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INT) AS color,
                   CAST(NULL AS INT) AS round WHERE FALSE)""",
    ]
    for r in range(1, rounds + 1):
        prev = f"a{r - 1}"
        ctes.append(
            f"""n{r} AS MATERIALIZED (
              SELECT e.dst AS id, MIN(p.k) AS nk
              FROM e JOIN {prev} a ON a.id = e.src
                     JOIN p ON p.id = e.src
              GROUP BY e.dst)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
              SELECT a.id FROM {prev} a JOIN p USING (id)
              LEFT JOIN n{r} n USING (id)
              WHERE n.nk IS NULL OR p.k < n.nk)"""
        )
        ctes.append(
            f"""m{r} AS MATERIALIZED (
              SELECT w.id, CAST(MIN(cd.c) AS INT) AS color,
                     CAST({r} AS INT) AS round
              FROM w{r} w CROSS JOIN (SELECT unnest(range(0, {r})) AS c) cd
              WHERE NOT EXISTS (
                SELECT 1 FROM e JOIN c{r - 1} cl ON cl.id = e.src
                WHERE e.dst = w.id AND cl.color = cd.c)
              GROUP BY w.id)"""
        )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
              SELECT * FROM c{r - 1} UNION ALL SELECT * FROM m{r})"""
        )
        ctes.append(
            f"""a{r} AS MATERIALIZED (
              SELECT id FROM {prev} EXCEPT SELECT id FROM w{r})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, color, round FROM c{rounds}"
        + f"\nUNION ALL\nSELECT id, CAST(NULL AS INT), CAST(NULL AS INT)"
        f" FROM a{rounds}"
    )
