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
def pagerank_sql(rounds: int, alpha: float = 0.85) -> str:
    """Unrolled NetworkX-semantics PageRank over G1 (SURVEY.md §2.4.1)."""
    ctes = [
        f"edges AS MATERIALIZED ({G1_SQL})",
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
SELECT id, ROUND(rank, 6) AS rank FROM r{rounds}"""
    )


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


def kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peel loop over G2 (extra rounds past the fixpoint are
    no-ops, so `rounds` only needs to exceed the peel depth)."""
    ctes = [f"e0 AS MATERIALIZED (SELECT src, dst FROM ({G2_SQL}) WHERE src <> dst)"]
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
