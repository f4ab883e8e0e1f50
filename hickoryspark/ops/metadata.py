"""Page-level metadata extraction — title / meta / canonical / lang.

The head-section complement to the link extractor: one row per page
with its ``<title>`` text, declared charset, ``meta`` description,
OpenGraph title/description, ``link rel=canonical`` target and
``<html lang>`` — the fields a crawl index, dedup-by-canonical pass,
or language router reads before touching body content.

Pure JVM-side DataFrame program over the exploded node table
(spark/nodes_table.py): a filter to the handful of head-ish node
shapes, then ONE ``groupBy(url)`` with conditional aggregates — a
single shuffle, and a co-partitioned (shuffle-free) one when the node
table is bucketed by url at cluster scale. No Python in the path.

Field semantics (fixed so oracles can reproduce them):

- ``title``: the concatenation of all text children of HEAD-scoped
  ``<title>`` elements (parent is ``<head>``) in document order — the
  parser's RCDATA rule yields one text child per title; multiple
  head titles concatenate. SVG ``<title>`` descriptions and stray
  body-level titles are excluded (document.title semantics exclude
  them by namespace; the node table tracks no namespace, so the
  head-parent scope is the pinned equivalent).
- ``charset``: first ``<meta charset=...>`` value in document order,
  lowercased (labels are ASCII case-insensitive, WHATWG encoding §4.2).
- ``meta_description`` / ``og_title`` / ``og_description``: first
  matching ``<meta name=...>`` / ``<meta property=...>`` content in
  document order; name/property match ASCII case-insensitively.
- ``canonical``: first ``<link>`` whose ``rel`` token list (split on
  ASCII whitespace, matched case-insensitively) contains
  ``canonical``; value is its ``href`` as written.
- ``html_lang``: the ``lang`` attribute of the first ``<html>``
  element, as written (BCP 47 tags compare case-insensitively but
  are not case-normalized on extraction).
- ``meta_robots``: first ``<meta name="robots">`` content in document
  order, as written (directive tokenization — noindex/nofollow — is
  the caller's policy; ops/links.py handles the per-anchor rel side).
- ``n_meta``: count of all ``<meta>`` elements on the page.

Every "first in document order" is a ``min(struct(pre_ord, value))``
aggregate — deterministic under any partitioning, no window needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

#: Java-regex ASCII whitespace class (NOT \s — the engines' pinned
#: tokenization rule, see css.py ~= and select.py cls). Shared with
#: ops/links.py's rel_nofollow so the two rel-token matchers can
#: never desynchronize.
ASCII_WS_RE = "[ \\t\\n\\x0B\\f\\r]+"
_ASCII_WS = ASCII_WS_RE

METADATA_COLS = [
    "url", "title", "charset", "meta_description", "og_title",
    "og_description", "canonical", "html_lang", "meta_robots", "n_meta",
]


def _first(cond: Column, value: Column) -> Column:
    """Value of the first (document-order) row satisfying cond; NULL
    when none — min over (pre_ord, value) structs, nulls excluded."""
    return F.min(F.when(cond & value.isNotNull(),
                        F.struct(F.col("pre_ord"), value.alias("v"))))["v"]


def page_metadata(nodes: DataFrame) -> DataFrame:
    """node table → one metadata row per url (single shuffle)."""
    a = F.col("attrs")
    is_elem = F.col("type") == TYPE_ELEMENT
    is_meta = is_elem & (F.col("tag") == "meta")
    is_link = is_elem & (F.col("tag") == "link")
    # head-scope needs the GRANDPARENT of the text node, which no row
    # carries — so collect head-title element ids and title texts as
    # two aggregates over the same shuffle and intersect them after
    is_head_title = (
        is_elem
        & (F.col("tag") == "title")
        & (F.col("parent_tag") == "head")
        & (F.col("parent_type") == TYPE_ELEMENT)
    )
    title_text = (F.col("type") == TYPE_TEXT) & (
        F.col("parent_tag") == "title"
    ) & (F.col("parent_type") == TYPE_ELEMENT)
    rel_tokens = F.filter(
        F.split(F.lower(F.coalesce(a["rel"], F.lit(""))), _ASCII_WS),
        lambda t: t != "",
    )

    # prune to the rows any aggregate can use BEFORE the shuffle —
    # title elements + texts, metas, links, and the html element
    pruned = nodes.where(
        title_text
        | is_head_title
        | is_meta
        | is_link
        | (is_elem & (F.col("tag") == "html"))
    ).select("url", "node_id", "parent_id", "pre_ord", "type", "tag",
             "parent_tag", "parent_type", "attrs", "text")

    agged = pruned.groupBy("url").agg(
        F.collect_list(
            F.when(is_head_title, F.col("node_id"))
        ).alias("_title_ids"),
        F.collect_list(
            F.when(title_text,
                   F.struct(F.col("pre_ord"), F.col("parent_id"),
                            F.col("text")))
        ).alias("_title_texts"),
        F.lower(_first(is_meta, a["charset"])).alias("charset"),
        _first(is_meta & (F.lower(a["name"]) == "description"),
               a["content"]).alias("meta_description"),
        _first(is_meta & (F.lower(a["property"]) == "og:title"),
               a["content"]).alias("og_title"),
        _first(is_meta & (F.lower(a["property"]) == "og:description"),
               a["content"]).alias("og_description"),
        _first(is_link & F.array_contains(rel_tokens, "canonical"),
               a["href"]).alias("canonical"),
        _first(is_elem & (F.col("tag") == "html"), a["lang"])
        .alias("html_lang"),
        _first(is_meta & (F.lower(a["name"]) == "robots"),
               a["content"]).alias("meta_robots"),
        F.sum(F.when(is_meta, 1).otherwise(0)).cast("long").alias("n_meta"),
    )
    title = F.array_join(
        F.transform(
            F.array_sort(
                F.filter(
                    F.col("_title_texts"),
                    lambda s: F.array_contains(
                        F.col("_title_ids"), s["parent_id"]
                    ),
                )
            ),
            lambda s: s["text"],
        ),
        "",
    )
    return agged.withColumn("title", title).select(*METADATA_COLS)


#: ASCII whitespace characters trimmed around robots-meta directives
#: (the same class ASCII_WS_RE matches)
_DIRECTIVE_TRIM = " \t\n\x0b\f\r"


def robots_directive_tokens(content: Column) -> Column:
    """The robots-meta directive token array — comma-split,
    ASCII-ws-trimmed, lowercased, NULL → empty. SINGLE SOURCE for
    :func:`meta_robots_flags` and ops/optout.py."""
    return F.transform(
        F.split(F.lower(F.coalesce(content, F.lit(""))), ","),
        lambda t: F.btrim(t, F.lit(_DIRECTIVE_TRIM)),
    )


def meta_robots_flags(meta: DataFrame,
                      col: str = "meta_robots") -> DataFrame:
    """Adds boolean ``noindex`` / ``nofollow`` columns parsed from the
    as-written robots meta content per the Google/Bing robots-meta
    rules: comma-separated directives, each ASCII-whitespace-trimmed
    and compared case-insensitively; ``none`` means noindex AND
    nofollow; a NULL / absent content is indexable and followable
    (the crawler default — robots meta is opt-out). Unknown
    directives are ignored. Pure column expressions; composes with
    ``page_metadata`` output (``df.where(~F.col("noindex"))`` is the
    corpus-admission filter every index pipeline runs)."""
    toks = robots_directive_tokens(F.col(col))

    def has(d: str) -> Column:
        return F.array_contains(toks, d)

    return meta.withColumn(
        "noindex", has("noindex") | has("none")
    ).withColumn("nofollow", has("nofollow") | has("none"))


def canonical_targets(meta: DataFrame, url_col: str = "url",
                      canonical_col: str = "canonical") -> DataFrame:
    """Adds ``canonical_target``: the page's canonical dedup key — the
    declared ``rel=canonical`` href resolved against the page url
    (ops/links.resolve_href handles relative and dot-segment forms)
    and normalized (ops/urls.normalize_url), falling back to the
    page's own normalized url when no canonical is declared. Pure
    column expressions; composes directly over ``page_metadata``."""
    from hickoryspark.ops.links import resolve_href
    from hickoryspark.ops.urls import normalize_url

    u, c = F.col(url_col), F.col(canonical_col)
    # normalize ONCE over the branch result — normalize(when(...)) and
    # when(normalize, normalize) are equivalent, and the single
    # application keeps the (large) regexp program out of the 64 KB
    # codegen cliff when callers compose further expressions
    target = normalize_url(F.when(c.isNull(), u).otherwise(
        resolve_href(u, c)
    ))
    return meta.withColumn("canonical_target", target)


def canonical_clusters(meta: DataFrame, url_col: str = "url",
                       canonical_col: str = "canonical") -> DataFrame:
    """Canonical-URL cluster rollup: ``(canonical_target, n_pages,
    n_self)`` — the rel=canonical dedup step an index pipeline runs
    before content dedup. ``n_self`` counts pages whose own normalized
    url IS the target (the cluster has an in-corpus representative;
    clusters with ``n_self = 0`` point at an uncrawled canonical).

    Scale shape: one map-side project then ONE groupBy with map-side
    partial aggregation — no join, no window; a mega-cluster key is
    just one cheap count group. Codegen note (r6): resolve_href's
    dot-segment fold now runs once, eagerly, at the top level of its
    expression (ops/links.py), so stages composing it — including the
    normalize∘resolve column here — fit the 64 KB whole-stage-codegen
    budget and compile (guarded by tests/test_links.py with
    codegen.fallback=false); canonical_targets still applies
    normalize_url once over the branch result rather than per
    branch."""
    from hickoryspark.ops.urls import normalize_url

    with_t = canonical_targets(meta, url_col, canonical_col)
    is_self = (
        F.col("canonical_target") == normalize_url(F.col(url_col))
    ).cast("int")
    return (
        with_t.select("canonical_target", is_self.alias("_self"))
        .groupBy("canonical_target")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum("_self").cast("long").alias("n_self"),
        )
    )


def extract_hreflang(nodes: DataFrame) -> DataFrame:
    """``(url, alt_pos, hreflang, href, resolved)`` — one row per
    ``<link>`` whose ``rel`` token list contains ``alternate`` (the
    page_metadata token rule: ASCII-ws split, case-insensitive) AND
    that carries both ``hreflang`` and ``href`` — the multilingual
    page-graph every cross-lingual corpus builder joins on.
    ``hreflang`` is emitted as written (BCP 47 tags compare
    case-insensitively; normalization is the caller's policy),
    ``resolved`` is ops/links.resolve_href(url, href), ``alt_pos`` is
    the 1-based document-order position among the page's alternates.
    One url window; no joins."""
    from hickoryspark.ops.links import resolve_href
    from pyspark.sql import Window

    a = F.col("attrs")
    rel_tokens = F.filter(
        F.split(F.lower(F.coalesce(a["rel"], F.lit(""))), _ASCII_WS),
        lambda t: t != "",
    )
    alts = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & (F.col("tag") == "link")
        & F.array_contains(rel_tokens, "alternate")
        & a["hreflang"].isNotNull()
        & a["href"].isNotNull()
    ).select(
        "url",
        F.col("pre_ord").alias("_ord"),
        a["hreflang"].alias("hreflang"),
        a["href"].alias("href"),
    )
    w = Window.partitionBy("url").orderBy("_ord")
    return alts.select(
        "url",
        F.row_number().over(w).cast("long").alias("alt_pos"),
        "hreflang",
        "href",
        resolve_href(F.col("url"), F.col("href")).alias("resolved"),
    )


def hreflang_symmetry(nodes: DataFrame) -> DataFrame:
    """Reciprocity audit over the hreflang alternate graph:
    ``(url, target, reciprocal)`` — Google's hreflang rule is that
    annotations must be RECIPROCAL (if A lists B, B must list A back
    or A's annotation is ignored); one-way edges are the audit
    finding.

    Pinned semantics: edges are DISTINCT (normalize_url(page),
    normalize_url(resolved)) pairs from :func:`extract_hreflang`
    (several hreflang tags to one target count once); self edges
    (page listing itself — standard and trivially reciprocal) are
    excluded; ``reciprocal`` is 1 when the reversed pair exists.

    Codegen note: normalize∘resolve composes ONCE per key (the
    canonical_targets stance). One key-shuffle family: distinct, then
    a self equi-join on the swapped pair."""
    from hickoryspark.ops.urls import normalize_url

    alts = extract_hreflang(nodes)
    edges = alts.select(
        normalize_url(F.col("url")).alias("src"),
        normalize_url(F.col("resolved")).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()

    back = edges.select(F.col("dst").alias("b_src"),
                        F.col("src").alias("b_dst"))
    return (
        edges.join(
            back,
            (edges["src"] == back["b_src"])
            & (edges["dst"] == back["b_dst"]),
            "left",
        )
        .select(
            F.col("src").alias("url"), F.col("dst").alias("target"),
            F.col("b_src").isNotNull().cast("long").alias("reciprocal"),
        )
    )


#: leading-delay prefix of a refresh content value: ws* digits
#: (fraction tolerated and ignored) — rows whose content doesn't
#: start this way are INVALID and dropped (the WHATWG shared
#: declarative refresh steps fail without leading digits)
_REFRESH_DELAY_RE = "^[ \\t\\n\\x0B\\f\\r]*([0-9]+)"
#: the post-delay tail: separator [;,] then optional url= (any case,
#: ws-tolerant) then the rest. \\z + [\\s\\S] per the repo's
#: Java-regex ∩ RE2 rule (newline-bearing attr values).
_REFRESH_TARGET_RE = (
    "^[ \\t\\n\\x0B\\f\\r]*[0-9]+(?:\\.[0-9]*)?[ \\t\\n\\x0B\\f\\r]*"
    "[;,][ \\t\\n\\x0B\\f\\r]*"
    "(?:[Uu][Rr][Ll][ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*)?"
    "([\\s\\S]*)\\z"
)


def meta_refresh(nodes: DataFrame) -> DataFrame:
    """``(url, meta_pos, delay_secs, target, resolved)`` — one row per
    valid ``<meta http-equiv=refresh>``: the third redirect carrier
    next to HTTP 3xx (ops/http.py) and ``rel=canonical``; feed the
    edges to ops/crawlgraph.resolve_redirects like the others.

    Pinned parse (a WHATWG "shared declarative refresh steps" subset,
    reproduced by the gate oracle): ``http-equiv`` matches
    ``refresh`` ASCII-ws-trimmed case-insensitively; ``content`` must
    open with ws* digits (the delay; a fraction is ignored) or the
    row is dropped; a ``[;,]`` separator then optional ``url=`` (any
    case) introduces the target; a target wrapped in a MATCHING
    ``'``/``"`` pair is unwrapped, otherwise it is ws-trimmed; empty
    target → NULL (a delay-only refresh reloads the page — still a
    crawl signal, so the row is kept). ``meta_pos`` is the 1-based
    document-order position among the page's valid refreshes
    (browsers honor the first — ``meta_pos = 1``). Pure Catalyst,
    one url window, no joins."""
    from hickoryspark.ops.links import resolve_href
    from pyspark.sql import Window

    a = F.col("attrs")
    metas = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & (F.col("tag") == "meta")
        & (F.lower(F.btrim(F.coalesce(a["http-equiv"], F.lit("")),
                           F.lit(" \t\n\x0b\f\r"))) == "refresh")
        & a["content"].isNotNull()
        & (F.regexp_extract(a["content"], _REFRESH_DELAY_RE, 1) != "")
    ).select(
        "url",
        F.col("pre_ord").alias("_ord"),
        F.regexp_extract(a["content"], _REFRESH_DELAY_RE, 1)
        .cast("long").alias("delay_secs"),
        F.regexp_extract(a["content"], _REFRESH_TARGET_RE, 1).alias("_raw"),
    )
    raw = F.col("_raw")
    unq = F.when(
        raw.rlike("^\"[\\s\\S]*\"\\z") | raw.rlike("^'[\\s\\S]*'\\z"),
        F.substring(raw, 2, F.length(raw) - 2),
    ).otherwise(F.btrim(raw, F.lit(" \t\n\x0b\f\r")))
    target = F.nullif(unq, F.lit(""))
    w = Window.partitionBy("url").orderBy("_ord")
    return metas.select(
        "url",
        F.row_number().over(w).cast("long").alias("meta_pos"),
        "delay_secs",
        target.alias("target"),
        F.when(target.isNotNull(),
               resolve_href(F.col("url"), target)).alias("resolved"),
    )


def duplicate_titles(meta: DataFrame, min_pages: int = 2) -> DataFrame:
    """SEO/template-hygiene rollup over ``page_metadata`` output: one
    row per (host, title) shared by at least ``min_pages`` DISTINCT
    urls — duplicated titles mark boilerplate templates, soft-404
    farms, and pagination families worth collapsing before indexing.

    Pinned semantics: the host is ops/hosts.url_host's WHATWG fold
    (hostless urls drop); the match key is the title AS EXTRACTED
    (page_metadata already pins first-in-doc-order head titles);
    NULL/empty titles never cluster; ``first_url`` is the smallest
    member url.

    Scale shape: ONE (host, title) groupBy, map-side combinable; the
    threshold filters at the aggregation — no self-join, no window."""
    from hickoryspark.ops.hosts import url_host

    keyed = meta.select(
        url_host(F.col("url")).alias("host"),
        F.col("title"), F.col("url"),
    ).where(
        F.col("host").isNotNull()
        & F.col("title").isNotNull() & (F.col("title") != "")
    )
    return (
        keyed.groupBy("host", "title")
        .agg(
            F.count_distinct("url").cast("long").alias("n_pages"),
            F.min("url").alias("first_url"),
        )
        .where(F.col("n_pages") >= min_pages)
    )
