"""Host-level corpus controls — URL blocklist filtering and per-host
rollup statistics.

The domain-hygiene step every web-corpus pipeline runs (RefinedWeb /
CCNet ship UT1-style blocklists; C4 filtered on bad-word domains):
drop every page whose host — or any parent domain of it — appears on a
blocklist, and summarize the surviving corpus per registrable host so
curators can rank/spot-check domains.

Pinned semantics:

- the HOST of a url is the authority with any userinfo prefix removed
  (up to the LAST ``@``, the WHATWG rule) and the ``:port`` suffix
  removed, ASCII-lowercased, ONE trailing dot stripped (the
  ``spam.example.`` FQDN spelling is the same DNS name — a classic
  blocklist-evasion form); bracketed IPv6 literals keep their colons
  (``[2001:db8::1]``). NOTE this is a stricter fold than
  ops/robots.py's host key (which keeps userinfo and non-default
  ports by design — robots.txt scope is the full origin); urls with
  no ``scheme://authority`` have no host and are NEVER matched by a
  blocklist (kept) but aggregate under host NULL in ``host_stats``;
- a blocklist entry blocks the exact host AND every subdomain of it
  (``example.com`` blocks ``a.b.example.com``); entries are folded
  the same way (lowercase, full ASCII-whitespace trim — CRLF-read
  files arrive with ``\\r`` tails — one trailing dot stripped) and
  entries that fold to '' are dropped, so a blank blocklist line can
  never block anything;
- subdomain matching is implemented by exploding each url's host into
  its DOT-SUFFIX CHAIN (``a.b.c`` → ``a.b.c``, ``b.c``, ``c``) and
  equi-joining the chain against the blocklist — a plain broadcastable
  semi-join instead of a non-equi "ends-with" join (which would plan a
  nested loop). The chain length is bounded by the label count of one
  host, and ``LABEL_CAP`` bounds hostile thousand-dot hosts.

Scale shape: the blocklist is small by construction (MBs) —
``filter_blocklist`` broadcasts it into a left-anti join evaluated
map-side; no shuffle of the corpus. ``host_stats`` is one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["url_host", "host_suffixes", "filter_blocklist",
           "host_stats", "frontier_batches", "duckdb_url_host_sql",
           "host_dup_stats", "duckdb_host_dup_sql",
           "coverage_audit", "duckdb_coverage_sql"]

#: max labels considered from the right when expanding suffix chains —
#: a hostile 10k-dot host must not explode into 10k rows per url
LABEL_CAP = 16

#: userinfo strips to the LAST '@' of the authority (greedy, the
#: WHATWG rule — 'a@b@c' hosts at 'c'); the host is a bracketed IPv6
#: literal (colons kept) or runs to the first ':' (port) otherwise
_HOST_RE = r"(?i)^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?(\[[^/?#\]]*\]|[^/?#:@]*)"

#: full ASCII whitespace trim set for blocklist entries (CRLF-read
#: files carry '\r' tails that a space-only trim would keep)
_WS_TRIM = " \t\n\x0b\f\r"


def url_host(url):
    """Lowercased host of ``url`` (column expr), one trailing dot
    stripped; NULL when the url has no ``scheme://authority``."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    h = F.regexp_replace(h, r"\.\z", "")
    return F.when(h != "", h)


def host_suffixes(host):
    """Dot-suffix chain of ``host`` (column expr):
    ``a.b.c`` → ``['a.b.c', 'b.c', 'c']``, capped at the LAST
    ``LABEL_CAP`` labels (matching deeper than that is meaningless for
    a blocklist of registrable domains)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    start = F.greatest(F.lit(1), n - F.lit(LABEL_CAP) + 1)
    return F.transform(
        F.sequence(start, n),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def filter_blocklist(pages: DataFrame, blocklist: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Pages whose host matches no blocklist entry (exact or as a
    subdomain). ``blocklist`` has one ``host`` column; it is folded,
    deduped, and broadcast.

    Plan shape: the hit set is computed on a URL-COLUMN-ONLY pass
    (explode suffixes → broadcast semi-join, all map-side), then
    anti-joined back against the full pages — two scans of the pages
    source, but the first is pruned to one string column and the hit
    set is small, so AQE broadcasts it and the final anti-join is
    map-side too; the full-width corpus rows never shuffle. (A
    single-pass per-row ``array_intersect`` against a literal list
    would rebuild the blocklist hash per row — worse for real UT1-size
    lists.)"""
    blocked = (
        blocklist.select(
            F.regexp_replace(
                F.lower(F.btrim(F.col("host"), F.lit(_WS_TRIM))),
                r"\.\z", "",
            ).alias("b_host")
        )
        .where(F.col("b_host") != "")
        .distinct()
    )
    expanded = pages.select(url_col).withColumn(
        "_suffix",
        F.explode(host_suffixes(url_host(F.col(url_col)))),
    )
    hit = expanded.join(
        F.broadcast(blocked),
        expanded["_suffix"] == blocked["b_host"],
        "left_semi",
    ).select(url_col)
    return pages.join(hit, url_col, "left_anti")


def host_stats(pages: DataFrame, url_col: str = "url",
               payload_col: str = "html") -> DataFrame:
    """Per-host corpus rollup: ``(host, n_pages, n_bytes)`` — the
    ranking input for domain curation. ``host`` is NULL for
    authority-less urls."""
    return (
        pages.groupBy(url_host(F.col(url_col)).alias("host"))
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum(F.octet_length(payload_col)).cast("long").alias("n_bytes"),
        )
    )


def frontier_batches(urls: DataFrame, per_host: int = 8,
                     url_col: str = "url") -> DataFrame:
    """Politeness batching for a crawl frontier: ``(url, host,
    batch)`` where no batch holds more than ``per_host`` urls of the
    same host — batch b is fetchable concurrently while touching each
    origin at most ``per_host`` times. Urls are ranked within their
    host by url string (deterministic under any partitioning);
    ``batch = (rank-1) div per_host``. Authority-less urls group
    under host NULL (one politeness bucket — they resolve nowhere).

    Scale shape: ONE host-partitioned window. Ranking inside a host
    is inherently sequential (politeness is a per-origin constraint),
    so a mega-host is one window partition — bounded by that host's
    own url count, the same frame every per-host scheduler carries."""
    if per_host < 1:
        raise ValueError("per_host must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(url_col)
    return (
        urls.select(F.col(url_col), url_host(F.col(url_col)).alias("host"))
        .withColumn("_rn0", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("batch", F.expr(f"_rn0 div {int(per_host)}"))
        .drop("_rn0")
    )


def duckdb_url_host_sql(u: str) -> str:
    """DuckDB expression mirroring :func:`url_host` on url expression
    ``u`` — the host pattern is IMPORTED (single source, no lockstep
    copy), trailing-dot strip uses \\z per the cross-dialect rule."""
    hraw = (
        f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', 1)), "
        f"'\\.\\z', '')"
    )
    return f"(CASE WHEN {hraw} != '' THEN {hraw} END)"


def host_dup_stats(pages: DataFrame, url_col: str = "url",
                   text_col: str = "text") -> DataFrame:
    """Within-host duplication rollup — the template/infrastructure
    duplication signal (cross-host reuse is ops/syndication.py's
    job): ``(host, n_pages, n_distinct, n_dup_pages, dup_ppm)``
    where ``n_dup_pages`` counts pages whose md5(text) appears >= 2
    times ON THE SAME HOST and ``dup_ppm`` = 1e6 * n_dup_pages div
    n_pages. A host near 1e6 is a parked/mirror/session-id domain —
    quota and frontier inputs read this.

    Scale shape: digests shuffle, bodies don't (the crawl_delta
    rule); two map-side-combinable groupBys, (host, digest) then
    host."""
    per = (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.md5(F.col(text_col)).alias("digest"),
        )
        .groupBy("host", "digest")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = per.groupBy("host").agg(
        F.sum("_n").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("_n") >= 2, F.col("_n")).otherwise(0))
        .cast("long").alias("n_dup_pages"),
    )
    return agg.select(
        "host", "n_pages", "n_distinct", "n_dup_pages",
        F.expr("1000000 * n_dup_pages div n_pages").alias("dup_ppm"),
    )


def duckdb_host_dup_sql(pages_rel: str, url_col: str = "url",
                        text_col: str = "text") -> str:
    """Full DuckDB mirror of :func:`host_dup_stats`."""
    host = duckdb_url_host_sql(url_col)
    return f"""
        WITH per AS (
          SELECT {host} AS host, md5({text_col}) AS digest,
                 COUNT(*) AS n
          FROM {pages_rel} GROUP BY 1, 2)
        SELECT host,
               CAST(SUM(n) AS BIGINT) AS n_pages,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)
                    AS BIGINT) AS n_dup_pages,
               1000000 * CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)
                              AS BIGINT) // CAST(SUM(n) AS BIGINT)
                 AS dup_ppm
        FROM per GROUP BY host"""


def coverage_audit(listed: DataFrame, crawled: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Sitemap-vs-crawl coverage per host: ``(host, n_listed,
    n_crawled, n_both, n_missing, n_stray)`` — the crawl-ops
    dashboard row (``n_missing`` = listed but never fetched drives
    frontier seeding; ``n_stray`` = fetched but unlisted flags
    crawler traps and orphan content).

    Pinned: both inputs are DISTINCT url sets (duplicates collapse);
    the host is the url_host fold of each url; a full-outer url
    equi-join marries the sets, then ONE host groupBy."""
    li = listed.select(F.col(url_col).alias("u")).distinct() \
        .withColumn("_l", F.lit(1))
    cr = crawled.select(F.col(url_col).alias("u")).distinct() \
        .withColumn("_c", F.lit(1))
    j = li.join(cr, "u", "full_outer").select(
        url_host(F.col("u")).alias("host"),
        F.coalesce("_l", F.lit(0)).alias("_l"),
        F.coalesce("_c", F.lit(0)).alias("_c"),
    )
    return j.groupBy("host").agg(
        F.sum("_l").cast("long").alias("n_listed"),
        F.sum("_c").cast("long").alias("n_crawled"),
        F.sum(F.expr("_l * _c")).cast("long").alias("n_both"),
        F.sum(F.expr("_l * (1 - _c)")).cast("long").alias("n_missing"),
        F.sum(F.expr("_c * (1 - _l)")).cast("long").alias("n_stray"),
    )


def duckdb_coverage_sql(listed_rel: str, crawled_rel: str,
                        url_col: str = "url") -> str:
    """Full DuckDB mirror of :func:`coverage_audit`."""
    host = duckdb_url_host_sql("u")
    return f"""
        WITH _cov_li AS (
          SELECT DISTINCT {url_col} AS u FROM {listed_rel}),
        _cov_cr AS (
          SELECT DISTINCT {url_col} AS u FROM {crawled_rel}),
        _cov_m AS (
          SELECT COALESCE(_cov_li.u, _cov_cr.u) AS u,
                 CASE WHEN _cov_li.u IS NULL THEN 0 ELSE 1 END AS l,
                 CASE WHEN _cov_cr.u IS NULL THEN 0 ELSE 1 END AS c
          FROM _cov_li FULL OUTER JOIN _cov_cr
            ON _cov_li.u = _cov_cr.u),
        j AS (SELECT {host} AS host, l, c FROM _cov_m)
        SELECT host, CAST(SUM(l) AS BIGINT) AS n_listed,
               CAST(SUM(c) AS BIGINT) AS n_crawled,
               CAST(SUM(l * c) AS BIGINT) AS n_both,
               CAST(SUM(l * (1 - c)) AS BIGINT) AS n_missing,
               CAST(SUM(c * (1 - l)) AS BIGINT) AS n_stray
        FROM j GROUP BY host"""


def subdomain_stats(
    urls: DataFrame,
    url_col: str = "url",
    min_hosts: int = 10,
    explosion_milli: int = 900,
    psl_rules=None,
) -> DataFrame:
    """Subdomain-explosion audit per registered domain — the
    crawler-trap signal wildcard-DNS spam farms trip (every URL on a
    fresh ``<random>.example.com`` host): ``(registered_domain,
    n_hosts, n_urls, max_labels, host_ratio_milli, explosion)``.

    Pinned semantics: hosts via the WHATWG fold (:func:`url_host`),
    registered domains via the plan-time PSL chain
    (ops/psl.registered_domain_col — hosts that ARE a public suffix
    or unparseable fold out as NULL and are dropped);
    ``host_ratio_milli = (1000 * n_hosts) div n_urls`` (non-negative
    exact); ``explosion`` iff ``n_hosts >= min_hosts`` and the ratio
    >= ``explosion_milli`` — near-one ratio means almost every URL
    invents a new host.

    Scale shape: host + registered-domain are shuffle-free column
    expressions; ONE groupBy(registered_domain) carries all four
    aggregates (count_distinct is the only expansion).
    """
    from hickoryspark.ops.psl import registered_domain_col

    host = url_host(F.col(url_col))
    rd = registered_domain_col(host, psl_rules)
    labels = F.size(F.split(host, r"\.")).cast("long")
    base = urls.select(
        rd.alias("registered_domain"),
        host.alias("_h"),
        labels.alias("_labels"),
    ).where(F.col("registered_domain").isNotNull())
    return (
        base.groupBy("registered_domain")
        .agg(
            F.count_distinct("_h").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.max("_labels").alias("max_labels"),
        )
        .select(
            "registered_domain", "n_hosts", "n_urls", "max_labels",
            F.expr("(1000 * n_hosts) div n_urls").cast("long")
            .alias("host_ratio_milli"),
        )
        .withColumn(
            "explosion",
            (F.col("n_hosts") >= min_hosts)
            & (F.col("host_ratio_milli") >= explosion_milli),
        )
    )
