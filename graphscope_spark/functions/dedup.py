"""Deduplication suite for large-scale corpus curation:

- exact_dedup            — hash-groupBy on md5(text)
- shingles               — word n-gram shingling (lead-window, built-in)
- ngram_jaccard_pairs    — n-gram Jaccard similarity pairs
- minhash_signatures /
  minhash_lsh_pairs      — MinHash + banded LSH candidate pairs
- simhash64              — 64-bit SimHash (the one pandas-UDF kernel)
- dedup_lines            — C4-style global line-level dedup + doc reassembly

Scale notes (100 TB corpus):
- shingling & minhash are per-row map work — no shuffle, codegen'd;
- the LSH bucket join shuffles only (band, bucket-key) pairs — the
  classic trick that replaces the O(n²) similarity join;
- the Jaccard pair join is quadratic per shared shingle — at scale,
  use it only downstream of LSH candidates (ngram_jaccard_pairs takes
  an optional candidate DataFrame for exactly that).

MinHash uses md5-hex strings as the hash universe (lexicographic min),
NOT a custom integer hash: md5 exists verbatim in every SQL engine, so
signatures are reproducible bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups: (h md5, keep_id = min doc_id, n copies)."""
    return docs.groupBy(F.md5(text_col).alias("h")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n")
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id_col, sh string).

    Uses posexplode + lead windows so the shingle set is identical to
    the SQL-oracle formulation (string_split + lead)."""
    tok = docs.select(
        F.col(id_col), F.posexplode(F.split(text_col, " ")).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = tok.select(
        F.col(id_col),
        F.concat_ws("|", *parts).alias("sh"),
        parts[-1].alias("last"),
    ).where(F.col("last").isNotNull())
    return sh.select(id_col, "sh").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(a, b, jaccard) for doc pairs with n-gram Jaccard ≥ threshold.

    candidates: optional (a, b) DataFrame (e.g. LSH output) to restrict
    the quadratic join — mandatory at corpus scale. The restriction is
    pushed BELOW the shingle self-join (semi-join of the shingle table
    to the docs appearing in any candidate pair): a boilerplate shingle
    shared corpus-wide must never enumerate corpus² pair rows before
    the candidate filter. The result is eagerly materialized so the
    shingle cache can be released before returning."""
    from graphscope_spark.superstep import _CKPT_LEVEL

    sh = shingles(docs, n, text_col, id_col)
    if candidates is not None:
        cids = (candidates.select(F.col("a").alias(id_col))
                .unionByName(candidates.select(F.col("b").alias(id_col)))
                .distinct())
        sh = sh.join(cids, id_col, "left_semi")
    sh = sh.cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    pairs = (
        a.join(b, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        pairs = pairs.join(candidates.select("a", "b").distinct(), ["a", "b"], "left_semi")
    out = (
        pairs.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # materialize before releasing the shingle cache (returning the
    # lazy plan would leak sh for the application lifetime — or
    # recompute shingling twice per action if unpersisted lazily)
    out = out.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    sh.unpersist()
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, seed, mh): MinHash signature rows. Hash family:
    h_seed(sh) = md5(seed || '|' || sh) compared lexicographically —
    engine-portable and deterministic."""
    spark = docs.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    sh = shingles(docs, n, text_col, id_col)
    return (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(
            F.min(
                F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("sh")))
            ).alias("mh")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs (a, b) that collide in ≥1 LSH band.

    Bands of `band_size` rows; band key = md5 of the concatenated
    signature slice. Only (band, key) groups shuffle — never doc pairs.
    """
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    bands = (
        sig.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("seed"), F.col("mh")))
                        ),
                        lambda s: s["mh"],
                    ),
                    ",",
                )
            ).alias("bkey")
        )
    )
    a = bands.select(F.col(id_col).alias("a"), "band", "bkey")
    b = bands.select(F.col(id_col).alias("b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def fuzzy_dedup(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end fuzzy deduplication: the canonical corpus-curation
    pipeline (LSH candidates → Jaccard verify → duplicate-cluster
    closure → canonical representative).

    1. MinHash + banded LSH proposes candidate pairs (bucketed — only
       (band, bkey) groups shuffle, never doc pairs);
    2. n-gram Jaccard verifies candidates against `threshold`
       (quadratic work restricted to the LSH output);
    3. verified pairs form a duplicate graph; connected components
       (hash-min WCC over the engine's own LinkGraph) glue transitive
       near-dups — A~B, B~C ⇒ {A,B,C} one cluster even if A,C never
       collided;
    4. every doc maps to keep_id = min doc_id of its cluster
       (singletons map to themselves).

    Returns (id_col, keep_id). Scale: stages 1-2 are the bucketed
    plans documented above; stage 3's WCC input is only the verified
    pair set (≪ corpus size), so the superstep loop runs on a graph
    orders of magnitude smaller than the corpus.
    """
    from graphscope_spark.algorithms.wcc import wcc
    from graphscope_spark.graph import LinkGraph

    cand = minhash_lsh_pairs(docs, num_hashes, band_size, n, text_col, id_col)
    verified = ngram_jaccard_pairs(
        docs, n, threshold, text_col, id_col, candidates=cand
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    if id_type in ("tinyint", "smallint", "int", "bigint"):
        all_ids = docs.select(F.col(id_col).cast("long").alias("id"))
        g = LinkGraph.from_edges(
            verified.select("a", "b"), vertices=all_ids, directed=False,
            src="a", dst="b",
        )
        comp = wcc(g)  # (id, comp) — comp = min id in cluster
        return comp.select(F.col("id").alias(id_col),
                           F.col("comp").alias("keep_id"))
    # non-numeric ids (url/uuid strings): WCC needs long vertex keys,
    # so run it over xxhash64(id) and map the component back to
    # keep_id = min ORIGINAL id per cluster (a blind cast('long')
    # would null every vertex and silently dedup nothing)
    vid = lambda c: F.xxhash64(F.col(c).cast("string"))  # noqa: E731
    idmap = docs.select(F.col(id_col), vid(id_col).alias("id")).distinct()
    g = LinkGraph.from_edges(
        verified.select(vid("a").alias("a"), vid("b").alias("b")),
        vertices=idmap.select("id"), directed=False, src="a", dst="b",
    )
    joined = wcc(g).join(idmap, "id")
    keep = joined.groupBy("comp").agg(F.min(id_col).alias("keep_id"))
    return joined.join(keep, "comp").select(F.col(id_col), "keep_id")


def _simhash64_py(text: str | None) -> int | None:
    """64-bit SimHash over whitespace tokens with md5 token hashes —
    signed int64 (Spark LongType has no unsigned)."""
    if text is None:
        return None
    acc = [0] * 64
    for tok in text.split(" "):
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """Arrow-batched SimHash (bit mixing is not SQL-expressible)."""
    return text.map(_simhash64_py)


def simhash_buckets(
    docs: DataFrame, prefix_bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, simhash, bucket): bucket = top prefix_bits of the
    simhash — near-dups (small Hamming distance) usually share the
    prefix; bucket-join then verify with Hamming distance via
    bit_count(xor) (built-in)."""
    return docs.select(
        F.col(id_col),
        simhash64(F.col(text_col)).alias("simhash"),
    ).withColumn("bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    prefix_bits: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, hamming) pairs within max_hamming, candidate-generated by
    shared simhash prefix bucket (one shuffle on bucket)."""
    s = simhash_buckets(docs, prefix_bits, text_col, id_col)
    a = s.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "bucket")
    b = s.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def _array_shingles(text_col: str, n: int) -> F.Column:
    """Distinct word n-grams of a text column as ONE array expression —
    zero shuffle (unlike shingles(), which pays a per-doc window for
    its SQL-oracle twin formulation). Same values: split on single
    space, n-gram joined with '|'."""
    arr = F.split(text_col, " ")
    k = F.size(arr) - F.lit(n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws("|", F.slice(arr, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))  # sequence(1,0) would DESCEND
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: drop every doc sharing ANY word
    n-gram with the benchmark corpus (the GPT-3/PaLM-style 13-gram
    overlap rule; no reference counterpart — training-pipeline op).

    Scale shape: the benchmark (eval sets — tiny vs the corpus) folds
    to a distinct-shingle table that is BROADCAST; the corpus streams
    through explode → broadcast hash semi-join with NO corpus shuffle;
    only the matched doc-id set (small) shuffles for the anti-join.
    Shingling is a pure array expression (no window)."""
    bsh = (
        benchmark.select(F.explode(_array_shingles(bench_text_col, n)).alias("sh"))
        .where(F.col("sh") != "")
        .distinct()
    )
    hits = (
        docs.select(F.col(id_col), F.explode(_array_shingles(text_col, n)).alias("sh"))
        .join(F.broadcast(bsh), "sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(hits, id_col, "left_anti")


def dedup_lines(
    docs: DataFrame,
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_empty: bool = False,
) -> DataFrame:
    """C4-style global line-level exact dedup: across the whole corpus
    keep only the FIRST occurrence of every distinct line (ordered by
    (doc_id, position)), drop every other occurrence, and reassemble
    each document from its surviving lines in original order (C4 dedups
    three-sentence spans the same way; `delim` picks the span unit —
    no reference counterpart, training-pipeline op).

    Returns (id_col, text_col deduped, lines_kept, lines_orig); docs
    whose every line was seen earlier come back with text='' and
    lines_kept=0 unless ``drop_empty``.

    Scale shape (100 TB corpus): one posexplode (row count = total
    lines, inherent), ONE hash aggregate on md5(line) (map-side
    combined min-struct — boilerplate mega-lines collapse in the map
    phase, no skew blowup), one co-partitioned join back on the line
    hash (1 match per row, no fan-out), one per-doc hash aggregate for
    reassembly. No windows — a global row_number() window would have
    the same semantics but no partial aggregation.
    """
    import re

    pat = re.escape(delim)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat, -1)).alias("pos", "line"),
    ).withColumn("lkey", F.md5("line"))
    first = lines.groupBy("lkey").agg(
        F.min(F.struct(id_col, "pos")).alias("__first")
    )
    kept = lines.join(first, "lkey").where(
        (F.col(id_col) == F.col(f"__first.{id_col}"))
        & (F.col("pos") == F.col("__first.pos"))
    )
    out = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("__ls"),
            F.count("*").alias("lines_kept"),
        )
        .select(
            id_col,
            F.concat_ws(delim, F.transform("__ls", lambda s: s["line"])).alias(
                text_col
            ),
            "lines_kept",
        )
    )
    orig = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), pat, -1)).cast("long").alias("lines_orig"),
    )
    how = "inner" if drop_empty else "left"
    res = orig.join(out, id_col, how)
    if not drop_empty:
        res = res.select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("lines_kept", F.lit(0)).alias("lines_kept"),
            "lines_orig",
        )
    else:
        res = res.select(id_col, text_col, "lines_kept", "lines_orig")
    return res


def remove_boilerplate(
    docs: DataFrame,
    max_df: int = 2,
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style boilerplate-line removal: drop every line that
    occurs in MORE than ``max_df`` distinct documents (nav bars, cookie
    banners, footers repeat across a site's pages; real content does
    not), then reassemble each document from its surviving lines in
    original order. Unlike :func:`dedup_lines` (first occurrence wins,
    later dropped), a boilerplate line is dropped EVERYWHERE, and an
    intra-doc repeat of a rare line survives in full. No reference
    counterpart — training-pipeline op.

    Returns (id_col, text_col, lines_kept, lines_orig).

    Scale shape (100 TB corpus): one posexplode, one hash aggregate on
    md5(line) computing the distinct-doc frequency (count(distinct)
    shuffles (lkey, doc_id) pairs — bounded by total lines, partial
    dedup map-side), one co-partitioned join back, one per-doc
    reassembly aggregate. Same two-shuffle shape as dedup_lines.
    """
    import re

    pat = re.escape(delim)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat, -1)).alias("pos", "line"),
    ).withColumn("lkey", F.md5("line"))
    rare = (
        lines.groupBy("lkey")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("lkey")
    )
    kept = lines.join(rare, "lkey")
    out = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("__ls"),
            F.count("*").alias("lines_kept"),
        )
        .select(
            id_col,
            F.concat_ws(delim, F.transform("__ls", lambda s: s["line"])).alias(
                text_col
            ),
            "lines_kept",
        )
    )
    orig = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), pat, -1)).cast("long").alias("lines_orig"),
    )
    return orig.join(out, id_col, "left").select(
        id_col,
        F.coalesce(text_col, F.lit("")).alias(text_col),
        F.coalesce("lines_kept", F.lit(0)).alias("lines_kept"),
        "lines_orig",
    )


def dedup_substrings(
    docs: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = " ",
) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — ExactSubstr): every token
    span of >= ``min_len`` tokens that occurs more than once anywhere
    in the corpus is removed from all but its first occurrence, and
    documents are reassembled from the surviving tokens.

    The paper builds one suffix array over the concatenated corpus —
    inherently single-machine. This is the distributed re-expression:
    a duplicated span of length R >= L is exactly a run of R-L+1
    duplicated length-L windows, so emitting the md5 rolling window
    hash of EVERY L-token window and grouping on it finds the same
    spans. First occurrence = lexicographic min (doc_id, pos) per
    window hash, so the keeper is deterministic and engine-portable
    (md5 over the delim-joined window exists verbatim in DuckDB).

    Plan shape (the 100 TB story): one explode to ~n_tokens window
    rows, ONE hash shuffle on the window hash (count + arg-min
    keeper per hash — partial aggregation applies), one groupBy doc
    collecting that doc's removed window starts, one join back to the
    corpus; token removal is a positional higher-order filter inside
    codegen. Everything is linear in corpus tokens — no suffix array,
    no global sort.

    Returns (id, n_tokens, n_dup_windows, n_removed_tokens,
    clean_text).
    """
    L = int(min_len)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    n = F.size(words)
    idx = F.when(n >= L, F.sequence(F.lit(0), n - L)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    wins = (
        docs.select(
            F.col(id_col),
            words.alias("__w"),
            F.explode(idx).alias("pos"),
        )
        .select(
            id_col,
            "pos",
            F.md5(F.array_join(F.slice(F.col("__w"), F.col("pos") + 1, L),
                               delim)).alias("h"),
        )
    )
    # per-hash: how many occurrences, and which one is first
    agg = wins.groupBy("h").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct(id_col, "pos")).alias("first"),
    )
    removed = (
        wins.join(agg.where(F.col("cnt") > 1), "h")
        .where(
            (F.col(id_col) != F.col(f"first.{id_col}"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select(id_col, "pos")
    )
    marks = removed.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__marks"),
        F.count("*").alias("n_dup_windows"),
    )
    base = docs.select(F.col(id_col), words.alias("__w"))
    joined = base.join(marks, id_col, "left").select(
        id_col,
        "__w",
        F.coalesce(F.col("__marks"), F.expr("array()").cast("array<int>"))
        .alias("__marks"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
    )
    # token i survives iff no removed window [p, p+L) covers it
    kept = F.filter(
        F.col("__w"),
        lambda w, i: ~F.exists(
            F.col("__marks"), lambda p: (i >= p) & (i < p + L)
        ),
    )
    return joined.select(
        id_col,
        F.size("__w").cast("long").alias("n_tokens"),
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_removed_tokens"),
        F.array_join(kept, delim).alias("clean_text"),
    )


def keep_best(
    df: DataFrame,
    keys: list[str],
    score,
    tiebreak: str,
) -> DataFrame:
    """Keep the single best row per key group — the 'url dedup' /
    'recrawl dedup' step of a CC-style pipeline (many captures of one
    canonical url → keep the highest-quality capture).

    best = max (score, tiebreak) lexicographically; ``score`` is a
    column name or Column expression, ``tiebreak`` a column name that
    is unique per row within a group (doc id, warc offset) so the
    winner is total-order deterministic regardless of partitioning.

    Plan: ONE map-side-combinable hash aggregate — max over
    struct(score, tiebreak, row) — never a window: the classic
    row_number()-over-key formulation sorts every group, this
    reduces each group to a single running max per partition before
    the shuffle (hub keys cost O(partitions), not O(group)).
    """
    sc = F.col(score) if isinstance(score, str) else score
    packed = F.struct(
        sc.alias("_s"),
        F.col(tiebreak).alias("_t"),
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
    )
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.max(packed).alias("_best"))
        .select("_best._row.*")
    )
