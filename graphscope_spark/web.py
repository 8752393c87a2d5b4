"""URL canonicalization and host-level webgraph rollup.

The Common-Crawl link-graph path (north rule): page-level (src_url,
dst_url) edges roll up to the host-level webgraph — the artifact CC
itself publishes (crawl host/domain graphs, reversed-host naming) and
the input unit for domain-level PageRank / centrality. The reference
builds its web graphs the same way: extract links, hash vertices,
aggregate (SURVEY.md §2.1; ref analytical_engine loader path).

Every kernel here is a pure Catalyst column expression (regexp /
array higher-order functions) — zero Python in the hot path, folds
into the scan projection, and is reproducible verbatim by the DuckDB
oracle (regexp_extract group semantics and list_filter/list_sort match
Spark's).

Canonicalization rules (deterministic, order matters):
1. lowercase scheme and authority (never the path),
2. strip the fragment,
3. strip the scheme-default port (http:80, https:443),
4. drop tracking params (utm_*, fbclid, gclid, msclkid), sort the
   survivors bytewise, drop the '?' when none survive,
5. strip one trailing slash unless the path is exactly '/'.
Unparseable inputs (no scheme://) pass through unchanged.

`registered_domain` uses the last-two-labels heuristic — a public
suffix list (publicsuffix.org) is the production swap-in (broadcast
join against the PSL table); the heuristic keeps the kernel
expression-only and is exact for .com/.org/.net-style corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme :// authority path [?query] [#fragment]
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
# tracking params dropped by canonicalize_url (key with or without =value)
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL column (rules in the module docstring)."""
    u = _col(url)
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, URL_RE, 2))
    path = F.regexp_extract(u, URL_RE, 3)
    query = F.regexp_extract(u, URL_RE, 4)
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.when(F.length(path) > 1, F.regexp_replace(path, "/$", "")).otherwise(
        path
    )
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE),
    )
    qs = F.concat_ws("&", F.array_sort(params))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_host(url: Column | str) -> Column:
    """Lowercased hostname of a URL column, any port stripped; '' when
    the URL has no scheme://authority."""
    auth = F.lower(F.regexp_extract(_col(url), URL_RE, 2))
    return F.regexp_replace(auth, ":[0-9]+$", "")


def registered_domain(host: Column | str) -> Column:
    """Last-two-labels registered domain ('news.bbc.com' → 'bbc.com');
    single-label hosts pass through. PSL swap-in point documented in
    the module docstring."""
    h = _col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2))
    ).otherwise(h)


def reverse_host(host: Column | str) -> Column:
    """Common-Crawl reversed-host notation ('www.example.com' →
    'com.example.www') — the sort key CC's host graph uses so a
    domain's subdomains cluster under range partitioning."""
    return F.concat_ws(".", F.reverse(F.split(_col(host), r"\.")))


def filter_urls(
    df: DataFrame,
    blocked_domains: "DataFrame | list[str]",
    url_col: str = "url",
    level: str = "domain",
) -> DataFrame:
    """Drop rows whose URL's host/registered-domain is on a blocklist —
    the CC/CCNet URL-filter stage that runs before any content work.

    blocked_domains: a list of literal domains (folded into ONE
    codegen isin/NOT filter — zero shuffle, the right call for the
    usual 10^3-10^5-entry blocklist) or a DataFrame with a `domain`
    column (broadcast LEFT ANTI join — the blocklist is always tiny
    next to 10^12 pages, so broadcasting is correct at any corpus
    scale). ``level``: 'domain' (registered domain) | 'host'.
    """
    key = {"host": url_host, "domain": lambda c: registered_domain(url_host(c))}
    if level not in key:
        raise ValueError(f"level must be host|domain, got {level!r}")
    k = key[level](url_col)
    if isinstance(blocked_domains, DataFrame):
        b = blocked_domains.select(F.col("domain").alias("__bd")).distinct()
        return (df.join(F.broadcast(b), k == F.col("__bd"), "left_anti"))
    return df.where(~k.isin([str(d) for d in blocked_domains]))


def host_graph(
    page_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    level: str = "host",
    drop_self: bool = False,
) -> DataFrame:
    """Roll page-level URL edges up to the (src_host, dst_host,
    n_links) host webgraph. ``level``: 'host' | 'domain' (registered
    domain) | 'reversed_host' (CC naming). ``drop_self`` removes
    intra-host links (CC's graphs exclude them).

    Scale shape: host extraction folds into the scan projection
    (codegen, zero shuffle); the rollup is ONE map-side-combined hash
    aggregate — hub hosts (power-law fan-in) collapse to partial
    counts before the shuffle, so no salting is needed here. The
    output graph is orders of magnitude smaller than the page graph
    (CC: ~10^8 hosts vs ~10^12 pages) and feeds LinkGraph.from_edges
    directly.
    """
    key = {
        "host": lambda c: url_host(c),
        "domain": lambda c: registered_domain(url_host(c)),
        "reversed_host": lambda c: reverse_host(url_host(c)),
    }
    if level not in key:
        raise ValueError(f"level must be host|domain|reversed_host, got {level!r}")
    k = key[level]
    e = page_edges.select(
        k(src_col).alias("src_host"), k(dst_col).alias("dst_host")
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))


# ----------------------------------------------------------------------
# robots.txt (Robots Exclusion Protocol)
# ----------------------------------------------------------------------
def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """(host, agent, allow boolean, prefix, rule_len) rules parsed from
    raw robots.txt bodies — original-1994-REP prefix semantics (RFC
    9309 wildcard/'$' patterns are a documented non-goal; the swap-in
    is a regex-compile of `prefix`). Grammar handled: comments (#),
    blank/garbage lines, case-insensitive directive keys, groups =
    consecutive User-agent lines followed by Allow/Disallow lines
    (every rule binds to ALL agents of its group, per the RFC).

    Pure Catalyst: one posexplode over split-lines, a lag+running-sum
    window PER HOST to assign group ids (robots bodies are small and
    per-host — thousands of lines at most — so the per-host window
    never concentrates more than one host's file in a task), then an
    agents⋈rules join within (host, group). An empty Disallow value
    ("Disallow:") means allow-all and produces no rule row, per the
    REP."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(body_col), F.lit("")), "\n"))
        .alias("ln", "raw"),
    ).select(
        "host", "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    kv = lines.select(
        "host", "ln",
        F.lower(F.trim(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
        .alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("ln")
    grouped = kv.withColumn(
        "__new",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("__new").over(w))

    agents = (
        grouped.where(F.col("key") == "user-agent")
        .select("host", "grp", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    rules = grouped.where(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host", "grp",
        (F.col("key") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    return (
        agents.join(rules, ["host", "grp"])
        .select(
            "host", "agent", "allow", "prefix",
            F.length("prefix").alias("rule_len"),
        )
        .distinct()
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """urls + (host, path, allowed boolean): REP matching of each URL
    against parsed rules for `agent`. Semantics (RFC 9309 §2.2.1):
    if ANY group names the specific agent, only those groups apply to
    its hosts; otherwise the '*' groups; longest matching prefix wins,
    allow on equal length; no matching rule (or no robots.txt for the
    host) ⇒ allowed.

    Shape: the URL corpus is scanned ONCE — one host join against the
    effective-rules table (materialized here via eager localCheckpoint:
    the parse's per-host windows would otherwise be re-derived in each
    of its three consuming branches, and the table is host-keyed and
    tiny next to the corpus) and one max(struct(rule_len, allow))
    hash aggregate (the cdlp tie-break pattern — unmatched rows
    aggregate to NULL and default allowed, so there is no second scan
    or join-back)."""
    from graphscope_spark.superstep import _CKPT_LEVEL

    a = agent.lower()
    spec = rules.where(F.col("agent") == a)
    if a != "*":
        spec_hosts = spec.select("host").distinct()
        star = rules.where(F.col("agent") == "*").join(
            spec_hosts, "host", "left_anti"
        )
        eff = spec.unionByName(star)
    else:
        eff = spec
    eff = eff.select("host", "allow", "prefix", "rule_len").localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL
    )

    u = urls.select(
        F.col(url_col).alias("url"),
        url_host(url_col).alias("host"),
        F.when(F.regexp_extract(url_col, URL_RE, 3) == "", "/")
        .otherwise(F.regexp_extract(url_col, URL_RE, 3))
        .alias("path"),
    )
    matched = F.col("prefix").isNotNull() & F.col("path").startswith(
        F.col("prefix")
    )
    return (
        u.join(eff, "host", "left")
        .groupBy("url", "host", "path")
        .agg(F.max(F.when(matched, F.struct("rule_len", "allow"))).alias("m"))
        .select(
            "url", "host", "path",
            F.coalesce(F.col("m.allow"), F.lit(True)).alias("allowed"),
        )
    )


def crawl_schedule(
    urls: DataFrame,
    url_col: str = "url",
    priority: Column | None = None,
    delay_sec: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: one fetch slot per
    host per ``delay_sec`` (the crawler etiquette CC itself follows —
    per-host rate limiting), assigned deterministically.

    slot(u) = rank of u within its host's frontier, ordered by
    ``priority`` (default: a deterministic md5 draw — an unbiased
    shuffle that is restart-stable and engine-portable, same family as
    sampling.py) then url; fetch_at = slot * delay_sec.

    Scale shape: ONE window partitioned by host. Host cardinality is
    huge (the partition key spreads), per-host groups are politeness-
    bounded in practice; ``max_per_host`` truncates mega-host groups
    (slot >= cap dropped) — the frontier a crawler would defer to the
    next cycle anyway. No global window, no driver state.
    """
    u = _col(url_col)
    host = url_host(u)
    if priority is None:
        # ascending draw == priority order; 15 hex chars, portable
        priority = F.conv(
            F.substring(F.md5(F.concat(F.lit("crawl|"), u)), 1, 15), 16, 10
        ).cast("long")
    w = Window.partitionBy("host").orderBy(F.col("_pri"), F.col(url_col))
    out = (
        urls.select(
            u.alias(url_col), host.alias("host"), priority.alias("_pri")
        )
        .where(F.col("host") != "")
        .withColumn("slot", F.row_number().over(w) - F.lit(1))
    )
    if max_per_host is not None:
        out = out.where(F.col("slot") < int(max_per_host))
    return out.select(
        url_col,
        "host",
        "slot",
        (F.col("slot") * F.lit(float(delay_sec))).alias("fetch_at"),
    )
