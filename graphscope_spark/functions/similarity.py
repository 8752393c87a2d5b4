"""Similarity search over embedding columns (array<float>).

- cosine(a, b)        — built-in expression (zip_with + aggregate in
                        double precision; JVM-side, no Python)
- knn_cosine          — brute-force top-k (the exact baseline)
- knn_ivf             — IVF-style: restrict candidates to the query's
                        coarse partition (any partition column; label
                        works as a stand-in for a kmeans assignment)
- lsh_hyperplane_*    — random-hyperplane (SimHash-for-vectors) LSH
                        bucketing as the web-scale candidate generator

Scale notes: brute-force is O(|Q|·|C|) — fine for |Q| small or as the
verify stage after IVF/LSH candidate generation. The LSH signs come
from a deterministic hash of (plane, dim) so buckets are reproducible
with no stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    candidates: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k (query_id, vec_id, cos) by brute-force cosine.

    queries: DataFrame(query_id, qvec). Deterministic tie-break on
    vec_id. exclude_self drops the candidate whose id EQUALS the
    query id (right when queries are drawn from the embedding table,
    which is the common self-join usage; pass False when query ids
    and vector ids are separate namespaces).

    candidates restricts the pair space; three shapes accepted:
    - (qid_col, id_col) rows: per-query candidate pairs — equi-joins
      on both keys, never a cross join (the IVF/LSH scale path);
    - ('a', 'b') rows (lsh_candidate_pairs output): symmetric id
      pairs, expanded to per-query pairs in both directions;
    - (id_col[, vec_col]) rows: a global candidate SUBSET — still a
      query × subset cross join, only for small verified subsets.
    """
    if candidates is None:
        # the no-candidates path broadcasts the FULL embedding table —
        # the documented small-baseline/verify use. Guard it: a large
        # table here would be a driver-killing broadcast, and the right
        # tool is the bucketed path.
        cap = 200_000
        if embeddings.limit(cap + 1).count() > cap:
            raise ValueError(
                f"knn_cosine without `candidates` broadcasts the whole "
                f"embedding table (> {cap:,} rows found); use knn_ivf() "
                "or lsh_candidate_pairs() to generate a bounded "
                "candidate set, then pass it as `candidates`"
            )
    emb_n = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__cn"))
    q = queries.withColumn("__qn", norm(F.col(qvec_col)))
    ccols = set(candidates.columns) if candidates is not None else set()
    if candidates is None:
        crossed = q.join(F.broadcast(emb_n),
                         F.col(qid_col) != F.col(id_col) if exclude_self
                         else F.lit(True))
    elif {qid_col, id_col} <= ccols or {"a", "b"} <= ccols:
        if {qid_col, id_col} <= ccols:
            pairs = candidates.select(qid_col, id_col)
        else:
            # symmetric (a, b) pairs: candidate in both directions
            pairs = (candidates.select(F.col("a").alias(qid_col),
                                       F.col("b").alias(id_col))
                     .unionByName(candidates.select(
                         F.col("b").alias(qid_col),
                         F.col("a").alias(id_col))))
        crossed = pairs.join(emb_n, id_col).join(q, qid_col)
        if exclude_self:
            crossed = crossed.where(F.col(qid_col) != F.col(id_col))
    else:
        if id_col not in ccols:
            raise ValueError(
                f"candidates must carry ({qid_col},{id_col}), (a,b), or "
                f"{id_col!r} columns; got {sorted(ccols)}")
        sub = (candidates if vec_col in ccols else
               candidates.select(id_col).join(embeddings, id_col)).select(
            F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__cn"))
        crossed = q.join(sub,
                         F.col(qid_col) != F.col(id_col) if exclude_self
                         else F.lit(True))
    scored = crossed.select(
        qid_col,
        id_col,
        (
            dot(F.col(qvec_col), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
        ).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
    out_col: str = "qvec_i8",
) -> DataFrame:
    """Per-vector symmetric scalar quantization of an embedding column
    to signed `bits`-bit ints (default int8): q_i = round(x_i / s *
    (2^(bits-1)-1)) with s = max|x_i| per vector; an all-zero vector
    quantizes to zeros. Adds (out_col: array<int>, out_col+'_scale').

    Scale story: int8 cuts the shuffled candidate payload 4x vs
    float32 (the dominant byte cost of a kNN verify stage at 100 TB),
    and per-vector scales cancel in cosine, so quantized search needs
    NO dequantization — see knn_quantized. Pure codegen (transform /
    aggregate higher-order functions), zero shuffle."""
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col)
    s = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x))
    q = F.when(
        s == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            v, lambda x: F.round(x.cast("double") / s * F.lit(qmax))
            .cast("int")),
    )
    return embeddings.withColumn(out_col, q).withColumn(
        f"{out_col}_scale", F.round(s, 6))


def knn_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    candidates: DataFrame | None = None,
    bits: int = 8,
) -> DataFrame:
    """knn_cosine over scalar-quantized vectors: both sides quantize
    per-vector (symmetric, `bits`-bit), cosine runs on the INT vectors
    directly — per-vector scales cancel in cosine, so the only error
    is rounding (recall vs exact is tested, not assumed). Same output
    shape and tie-break as knn_cosine."""
    emb_q = quantize_embeddings(embeddings, vec_col, bits, "__q").select(
        F.col(id_col), F.col("__q").alias(vec_col))
    qs_q = quantize_embeddings(queries, qvec_col, bits, "__q").select(
        F.col(qid_col), F.col("__q").alias(qvec_col))
    if candidates is None or vec_col not in candidates.columns:
        cand_q = candidates  # pair / id-only shapes pass through
    else:
        cand_q = quantize_embeddings(candidates, vec_col, bits, "__q") \
            .select(F.col(id_col), F.col("__q").alias(vec_col))
    return knn_cosine(emb_q, qs_q, k, id_col, vec_col, qid_col, qvec_col,
                      candidates=cand_q)


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    partition_col: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    qpart_col: str = "qpart",
) -> DataFrame:
    """IVF-style ANN: candidates share the query's coarse partition
    (inverted-file list). The join shuffles on the partition key only —
    this is the 100 TB path (brute force verifies within the list)."""
    cand = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(partition_col).alias("__part"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    crossed = queries.withColumn("__qn", norm(F.col(qvec_col))).join(
        cand,
        (F.col(qpart_col) == F.col("__part")) & (F.col(qid_col) != F.col(id_col)),
    )
    scored = crossed.select(
        qid_col,
        id_col,
        (
            dot(F.col(qvec_col), F.col(vec_col)) / (F.col("__qn") * F.col("__cn"))
        ).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col(qid_col),
            F.col(id_col),
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def hyperplane_signs(num_planes: int, dim: int) -> list[list[float]]:
    """±1 component matrix for num_planes deterministic hyperplanes:
    sign(p, d) = parity of md5(f"{p}|{d}")'s first byte. Plain md5 so
    any engine (Spark, DuckDB, NumPy) reproduces the exact planes with
    no stored model — same portability rule as the minhash family
    (dedup.py)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{p}|{d}".encode()).digest()[0] % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def lsh_hyperplane_bucket(
    df: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id_col, bucket): sign-concatenation bucket over num_planes
    deterministic ±1 hyperplanes (hyperplane_signs). The sign matrix is
    folded into the plan as literals — Catalyst constant-folds it, the
    projection stays whole-stage-codegen array math."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplane_signs(num_planes, dim)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        signs = F.array(*[F.lit(s) for s in planes[p]])
        proj = dot(F.col(vec_col), signs)
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket * 2 + bit
    return df.select(F.col(id_col), bucket.alias("bucket"))


def lsh_hyperplane_bands(
    df: DataFrame,
    num_planes: int = 8,
    num_bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id_col, band, bucket): one bucket per band, band b using planes
    [b·num_planes, (b+1)·num_planes) of the global deterministic family
    — the OR-construction (multiple hash tables): more bands → higher
    recall, more candidates. One pass over the data; all bands' dot
    products fold into a single codegen projection."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplane_signs(num_bands * num_planes, dim)
    buckets = []
    for b in range(num_bands):
        bucket = F.lit(0).cast("long")
        for p in range(b * num_planes, (b + 1) * num_planes):
            signs = F.array(*[F.lit(s) for s in planes[p]])
            proj = dot(F.col(vec_col), signs)
            bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            bucket = bucket * 2 + bit
        buckets.append(bucket)
    return df.select(
        F.col(id_col), F.posexplode(F.array(*buckets)).alias("band", "bucket")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    num_planes: int = 8,
    num_bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b) candidate pairs sharing any band's LSH bucket. The join
    shuffles on (band, bucket) — bounded by bucket sizes, never the
    full pair space."""
    b = lsh_hyperplane_bands(df, num_planes, num_bands, id_col, vec_col)
    l = b.select(F.col(id_col).alias("a"), "band", "bucket")
    r = b.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def embedding_near_dup_exact(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cos >= t).

    Brute-force O(n²) cosine — the verify stage / small-table baseline.
    At web scale run `lsh_candidate_pairs` first and verify only the
    candidates: same output contract, shuffle bounded by bucket sizes."""
    # norms are computed ONCE per row (n array-folds), not once per
    # pair (n² folds) — the dominant cost in the naive plan
    l = df.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    r = df.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        l.join(r, F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias(
                "cos"
            ),
        )
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    num_bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed near-dup: hyperplane buckets generate candidates,
    exact cosine verifies — the 100 TB path (approximate: pairs that
    collide in no band are missed; raise num_bands to trade recall for
    candidate volume, num_planes for the opposite)."""
    cand = lsh_candidate_pairs(df, num_planes, num_bands, id_col, vec_col)
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cosine(F.col("__va"), F.col("__vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )
