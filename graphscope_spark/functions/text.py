"""Text analysis over document tables (SURVEY.md graft additions):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything here is built-in-expression only (no Python in the row
path): tokenization is `split(text, ' ')`, ratios are length
arithmetic, the language heuristic is a stopword-lexicon join. At
100 TB these all compile to whole-stage-codegen scans with no shuffle
except the lexicon join (broadcast) and explicit groupBys.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lexicon for the n-gram/stopword heuristic.
LANG_LEXICON: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para"],
}

STOPWORDS_EN = LANG_LEXICON["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — single space, matching ANSI
    string_split semantics (empty tokens preserved) so SQL oracles
    reproduce it exactly."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def normalize_text(text: Column | str,
                   strip_punct: bool = True,
                   collapse_ws: bool = True,
                   lower: bool = True) -> Column:
    """CCNet-style normalization applied before dedup/fingerprinting:
    lowercase, strip punctuation/symbol characters, collapse runs of
    whitespace, trim. Pure codegen (three regexp passes in one
    projection, no UDF); every rule has an exact DuckDB twin
    (lower / regexp_replace with the same POSIX classes), so
    normalized-text dedup keys are engine-portable. Deliberately no
    unicode NFC (Spark SQL has no built-in; a pandas-UDF pass would
    put Python in the hottest pipeline stage — documented out)."""
    c = F.col(text) if isinstance(text, str) else text
    if lower:
        c = F.lower(c)
    if strip_punct:
        c = F.regexp_replace(c, r"[\p{P}\p{S}]", "")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token statistics: n_tokens, n_chars, avg_token_len."""
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            (F.length(text_col) - F.size(t) + 1) / F.size(t), 6
        ).alias("avg_token_len"),
    )


def _quality_exprs(text_col: str) -> dict[str, Column]:
    """The quality kernel as raw Column expressions (shared by
    quality_score and corpus_filter so the filter computes them in the
    SAME scan as the fingerprint)."""
    length = F.length(text_col).cast("double")
    # letters only — counting spaces as "alphabetic" would score an
    # all-whitespace document 1.0
    alpha = F.length(
        F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")).cast("double")
    tok = tokens(text_col)
    stop_hits = F.size(
        F.filter(tok, lambda w: w.isin(STOPWORDS_EN))
    ).cast("double")
    # non-empty tokens: ANSI split preserves empties, but a run of
    # spaces is not words (a 10-space doc must fail len_ok, not pass)
    n_tok = F.size(F.filter(tok, lambda w: w != F.lit(""))).cast("double")
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000),
                    F.lit(1.0)).otherwise(F.lit(0.0))
    return {
        "alpha_ratio": F.round(alpha_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality": F.round((alpha_ratio + stop_ratio + len_ok) / 3.0, 6),
    }


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, alpha ratio, stopword ratio,
    and a combined [0,1] score (C4/Gopher-style length+symbol filters).
    """
    q = _quality_exprs(text_col)
    return docs.select(
        F.col(id_col),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["quality"].alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-lexicon language ID: explode tokens, join the (token →
    lang) lexicon (broadcast), argmax hit count per doc; 'und' when no
    lexicon token appears. Deterministic ties: smallest lang code."""
    spark = docs.sparkSession
    lex_rows = [(w, lang) for lang, ws in LANG_LEXICON.items() for w in ws]
    lex = spark.createDataFrame(lex_rows, "tok string, cand string")
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hits = (
        tok.join(F.broadcast(lex), "tok")
        .groupBy(id_col, "cand")
        .agg(F.count("*").alias("hits"))
    )
    # argmax hits with smallest-lang tie-break = min over (−hits, cand).
    best = hits.groupBy(id_col).agg(
        F.min(F.struct((-F.col("hits")).alias("neg"), F.col("cand").alias("c"))).alias("m")
    ).select(F.col(id_col), F.col("m.c").alias("predicted_lang"))
    return docs.select(id_col).join(best, id_col, "left").select(
        F.col(id_col), F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang")
    )


def repetition_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics (Gopher-style repetition filters):
    dup_token_ratio = 1 − |distinct tokens| / |tokens|, and
    dup_bigram_ratio over consecutive token bigrams. All higher-order
    array functions — whole-stage codegen, zero shuffle, zero Python.

    Bigrams via zip_with(tokens, tail): the final element pairs the
    last token with NULL, F.concat propagates the NULL, and the filter
    drops it — leaving exactly n−1 bigrams.
    """
    tok = tokens(text_col)
    n = F.size(tok).cast("double")
    ndist = F.size(F.array_distinct(tok)).cast("double")
    bigs = F.filter(
        F.zip_with(
            tok,
            F.slice(tok, 2, F.size(tok)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    nb = F.size(bigs).cast("double")
    nbdist = F.size(F.array_distinct(bigs)).cast("double")
    return docs.select(
        F.col(id_col),
        F.size(tok).cast("long").alias("n_tokens"),
        F.round(
            F.when(n > 0, 1.0 - ndist / n).otherwise(F.lit(0.0)), 6
        ).alias("dup_token_ratio"),
        F.round(
            F.when(nb > 0, 1.0 - nbdist / nb).otherwise(F.lit(0.0)), 6
        ).alias("dup_bigram_ratio"),
    )


def corpus_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
) -> DataFrame:
    """End-to-end training-corpus filter: token-length bounds +
    quality threshold + exact-dedup keep-first (min doc_id per md5
    fingerprint, computed among the *kept* docs). The composition a
    100 TB pretraining pipeline runs before near-dup: fingerprint,
    token count and quality are all projections of ONE codegen scan
    (no stat-join shuffle), then one hash-agg on fp for keep-first."""
    kept = docs.select(
        F.col(id_col),
        F.md5(text_col).alias("fp"),
        token_count(text_col).alias("n_tokens"),
        _quality_exprs(text_col)["quality"].alias("quality"),
    ).where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    first = kept.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return kept.join(first, [id_col, "fp"]).select(
        id_col, "fp", "n_tokens", "quality"
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the text plus shape
    stats — the join key for cross-snapshot dedup at scale."""
    return docs.select(
        F.col(id_col),
        F.md5(text_col).alias("fp"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
    )


def pack_shards(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to contiguous fixed-token-budget shards (LLM
    pretraining shard assembly; no reference counterpart —
    training-pipeline op). Returns (id_col, n_tokens, shard).

    Semantics (exactly SQL-twinnable): documents are laid out in the
    deterministic order (md5(id), id); shard = floor(exclusive running
    token sum / budget) — i.e. the shard where each doc's span BEGINS.

    Scale shape — a distributed prefix sum, NOT one global window:
    range-partition + sort by the order key (pinned via eager
    localCheckpoint so both phases see identical partitions), phase 1
    aggregates one token total per partition (≤ P rows to the driver,
    exclusive-prefixed there), phase 2 is an Arrow-batched per-partition
    cumsum seeded with the partition's offset (TaskContext partition id
    → broadcast offset). A plain `sum() over (order by ...)` window
    would funnel the corpus through ONE task; this streams each
    partition independently."""
    import pandas as pd
    from pyspark import TaskContext

    from graphscope_spark.superstep import _CKPT_LEVEL

    budget = int(budget_tokens)
    if budget <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget}")
    spark = docs.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    d = docs.select(
        F.col(id_col),
        # NULL text counts 0 tokens: a null n_tokens would poison the
        # pandas cumsum (NaN -> astype(int64) raises) and the partition
        # totals below
        F.coalesce(token_count(text_col), F.lit(0)).alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__key"),
    )
    d = (
        d.repartitionByRange(P, "__key", id_col)
        .sortWithinPartitions("__key", id_col)
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    totals = {
        r["pid"]: r["tot"]
        for r in d.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    offsets, run = {}, 0
    for pid in range(max(totals, default=-1) + 1):
        offsets[pid] = run
        run += int(totals.get(pid) or 0)
    off_bc = spark.sparkContext.broadcast(offsets)

    def cumsum(batches):
        ctx = TaskContext.get()
        run = off_bc.value.get(ctx.partitionId() if ctx else 0, 0)
        for b in batches:
            start = run + b["n_tokens"].cumsum() - b["n_tokens"]
            run += int(b["n_tokens"].sum())
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_tokens": b["n_tokens"],
                    "shard": (start // budget).astype("int64"),
                }
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return d.mapInPandas(
        cumsum, f"{id_col} {id_type}, n_tokens long, shard long")


# PII patterns (pii_redact). Deterministic, unambiguous shapes chosen
# so Java-regex (Spark) and RE2 (DuckDB) replace identically: the
# email/IP/phone forms below have no overlapping or nested matches.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction (standard webtext-pipeline scrub, e.g. what C4 /
    CCNet-style corpora apply before release): replace emails, IPv4
    addresses and NNN-NNN-NNNN phone numbers with typed placeholder
    tokens and count each category. No reference counterpart —
    training-pipeline op.

    Order matters and is fixed: emails first (an email never contains
    an IP/phone once replaced), then IPs, then phones — the DuckDB twin
    applies the same order. Pure codegen regexp expressions, zero
    shuffle, zero Python.

    Returns (id_col, text_col redacted, n_emails, n_ips, n_phones).
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).cast("long")
    t1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4_RE), 0)).cast("long")
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), 0)).cast("long")
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        t3.alias(text_col),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, "Scaling Language
    Models", Appendix A — the rule set most later corpora reuse):
    per-document booleans for each published rule plus the combined
    ``keep`` flag, default thresholds as published.

    words = non-empty whitespace-split tokens; lines = newline splits.
    Rules: word count in [50, 100k]; mean word length in [3, 10];
    '#'/'...'-to-word symbol ratio <= 0.1; <= 90% of lines starting
    with a bullet; <= 30% ending with an ellipsis; >= 80% of words
    containing an alphabetic char; >= 2 of the 8 required English
    stopwords present.

    One codegen projection over the scan — every rule is a
    length/regexp/higher-order-array expression with a bit-matching
    DuckDB twin; no shuffle, no Python, so at 100 TB this fuses into
    the same pass as fingerprint/quality/lang-id."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    # divisors guarded with greatest(.,1): ANSI mode evaluates both
    # sides of the `n > 0 &` conjunctions, so a bare /n_words throws
    # DIVIDE_BY_ZERO on empty docs even though the guard forces False
    mean_wl = sum_word_len.cast("double") / F.greatest(n_words, F.lit(1))
    hashes = F.length(text_col) - F.length(F.regexp_replace(text_col, "#", ""))
    ellipses = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3 + (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "…", ""))
    )
    symbol_ratio = (hashes + ellipses).cast("double") / F.greatest(n_words, F.lit(1))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*")
            | l.startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    req = ["the", "be", "to", "of", "and", "that", "have", "with"]
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in req]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    scored = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("ok_words"),
        (
            (n_words > 0)
            & (mean_wl >= min_mean_word_len)
            & (mean_wl <= max_mean_word_len)
        ).alias("ok_mean_word_len"),
        ((n_words > 0) & (symbol_ratio <= max_symbol_ratio)).alias("ok_symbols"),
        (
            (n_lines == 0)
            | (bullet_lines.cast("double") / F.greatest(n_lines, F.lit(1)) <= max_bullet_frac)
        ).alias("ok_bullets"),
        (
            (n_lines == 0)
            | (ellipsis_lines.cast("double") / F.greatest(n_lines, F.lit(1)) <= max_ellipsis_frac)
        ).alias("ok_ellipsis"),
        (
            (n_words > 0)
            & (alpha_words.cast("double") / F.greatest(n_words, F.lit(1)) >= min_alpha_word_frac)
        ).alias("ok_alpha"),
        (stop_hits >= min_stopword_hits).alias("ok_stopwords"),
    )
    return scored.withColumn(
        "keep",
        F.col("ok_words") & F.col("ok_mean_word_len") & F.col("ok_symbols")
        & F.col("ok_bullets") & F.col("ok_ellipsis") & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )


def c4_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    bad_phrases: tuple = ("lorem ipsum",),
    drop_line_words: tuple = ("javascript",),
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, JMLR §2.2 — the
    colossal-clean-crawled-corpus heuristics; ref parity: the
    reference's web-text story stops at extraction, this is the
    published downstream cleaning the same corpus feeds).

    Line level (a line is kept iff ALL hold):
      * ends in a terminal punctuation mark: ``.``, ``!``, ``?``
        or closing quote ``"``;
      * has >= ``min_words_per_line`` whitespace words;
      * contains none of ``drop_line_words`` (case-insensitive; the
        paper drops any line with the word "javascript").
    Page level: drop the page if fewer than ``min_lines`` kept lines,
    if any of ``bad_phrases`` occurs (case-insensitive; paper:
    "lorem ipsum"), or if the page contains a curly brace ``{``.
    The paper's Wikipedia-citation-marker rule is source-specific and
    omitted; its bad-words list is pluggable via ``bad_phrases``.

    Returns (id, n_lines, n_kept_lines, ok_lines, ok_no_bad_phrase,
    ok_no_brace, keep, clean_text) where clean_text re-joins the kept
    lines with ``\\n``.

    One codegen projection (split / higher-order array filters /
    regexp), zero shuffle — at scale this fuses into the same scan
    pass as gopher_rules/quality/lang-id. Exact DuckDB twin in
    ``__spark_entry__.oracle_sql()['c4_rules']``.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )

    def _line_ok(l: Column) -> Column:
        terminal = (
            l.endswith(".") | l.endswith("!") | l.endswith("?")
            | l.endswith('"')
        )
        nwords = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
        ok = terminal & (nwords >= F.lit(int(min_words_per_line)))
        # C4 (Raffel et al. 2020) drops lines containing the WORD, not
        # the substring ('javascripted' must survive) — word boundaries.
        for w in drop_line_words:
            ok = ok & ~F.lower(l).rlike(
                r"\b" + _re.escape(w.lower()) + r"\b")
        return ok

    kept = F.filter(lines, _line_ok)
    lower_text = F.lower(F.col(text_col))
    no_bad = F.lit(True)
    for p in bad_phrases:
        no_bad = no_bad & ~lower_text.contains(p.lower())
    no_brace = ~F.col(text_col).contains("{")
    scored = docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        (F.size(kept) >= F.lit(int(min_lines))).alias("ok_lines"),
        no_bad.alias("ok_no_bad_phrase"),
        no_brace.alias("ok_no_brace"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    return scored.withColumn(
        "keep",
        F.col("ok_lines") & F.col("ok_no_bad_phrase") & F.col("ok_no_brace"),
    )
