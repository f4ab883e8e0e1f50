"""Link-graph extraction over the exploded node table.

The crawl-side consumer of the selector engine: every ``<a href>``
becomes an edge row (doc url -> resolved target) with its anchor text
and document-order position — the input to PageRank-style host graphs,
frontier scheduling, and anchor-text training corpora.

Pure JVM-side DataFrame program (no Python in the path): anchors are a
filter on the node table, anchor text is a url-local equi-join of the
anchors' DIRECT text children (same (url, parent_id) pattern as
sel_find_in_text in selectors_rel.py), resolution is string expressions
over the page url. At 100 TB the node table is bucketed by url
(spark/nodes_table.py materialize_nodes), which makes the text join
co-partitioned and shuffle-free; the only remaining shuffle is the
per-url window for link_pos, which shares the same url partitioning.

URL resolution (the template + common-crawl dominant cases, after
RFC 3986 §4.2/§5.3):
- scheme-qualified (``scheme:...``): kept as-is;
- protocol-relative (``//host/path``): page scheme + href;
- host-relative (``/path``): page origin + href;
- fragment-only (``#f``): page url (sans fragment) + href;
- query-only (``?q``): page url sans query/fragment + href;
- path-relative (anything else): page url sans query/fragment
  truncated to its last path ``/`` + href.

Host-relative and path-relative targets get RFC 3986 §5.2.4
dot-segment removal (ops.urls.remove_dot_segments) applied to the
resolved path — exactly the branches ``urllib.parse.urljoin`` folds,
which the hypothesis fuzz (tests/test_links.py) grades against with
dot-segments INCLUDED. Scheme-qualified and network-path refs keep
their path as written (CPython's documented RFC deviation), and
query/fragment/empty refs keep the base path as written; compose with
ops.urls.normalize_url when those must canonicalize too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

# authority ends at "/", "?", or "#" — [^/]+ alone would swallow
# the query string of a path-less url (https://h?k=x/y)
_ORIGIN_RE = r"(?i)^([a-z][a-z0-9+.-]*://[^/?#]+)"
# RFC 3986: a relative reference cannot contain ':' before its first
# '/' — any scheme-qualified href (https://, MAILTO:, tel:) is kept
_ABS_RE = r"(?i)^[a-z][a-z0-9+.-]*:"
#: url has a path component (a '/' after the authority) — only then is
#: truncate-to-last-slash a valid base; an origin-only homepage url
#: ('https://ex.test') would otherwise lose its host to the regex
_HAS_PATH_RE = r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]+/"


def resolve_href(url, href):
    """Absolute target URL for ``href`` found on page ``url``
    (column expressions)."""
    from hickoryspark.ops.urls import let_

    # let-bound at every composition point (see ops/urls.let_): the
    # raw inputs — often heavy expressions themselves — embed ONCE,
    # and the whole body is evaluated by the lazy interpreted
    # evaluator, so per-branch work (incl. the dot-segment fold) runs
    # only for the rows that take the branch.
    return let_(
        url, lambda ru: let_(href, lambda rh: _resolve_body(ru, rh))
    )


def _resolve_body(raw_url, raw_href):
    from hickoryspark.ops.urls import (
        _UNSAFE_RE, let_, remove_dot_segments)

    # WHATWG/CPython URL preprocessing: ASCII tab/newlines are removed
    # from BOTH sides before classification (urljoin, the fuzz oracle,
    # strips them — and an href like '\n//cdn/x' must classify as
    # protocol-relative, so the strip precedes the when-chain). The
    # RAW inputs are kept for CPython's empty-href early-exit, which
    # runs BEFORE its strip and returns the base verbatim.
    url = F.regexp_replace(raw_url, _UNSAFE_RE, "")
    href = F.regexp_replace(raw_href, _UNSAFE_RE, "")
    scheme = F.regexp_extract(url, r"(?i)^([a-z][a-z0-9+.-]*:)", 1)
    origin = F.regexp_extract(url, _ORIGIN_RE, 1)
    no_frag = F.regexp_replace(url, r"#[\s\S]*", "")
    no_query = F.regexp_replace(url, r"[?#][\s\S]*", "")
    # base dir computed on the query/fragment-stripped url: a '/'
    # inside the query must not become the truncation point
    base = F.when(
        no_query.rlike(_HAS_PATH_RE),
        F.regexp_replace(no_query, r"/[^/]*\z", "/"),
    ).otherwise(F.concat(no_query, F.lit("/")))  # origin-only page url
    # The dot-segment fold applies to exactly two branches (host- and
    # path-relative — the ones urljoin folds). History: emitting the
    # fold's 51-step regexp program INSIDE each branch duplicated it
    # and blew the 64 KB whole-stage-codegen method budget (r5
    # verdict); the first r6 fix ran it ONCE and EAGERLY at expression
    # top level (``array(unfolded, folded)[idx]``) so the stage
    # compiled — at the cost of executing the fold's path split for
    # every row and of a ~33 KB expression tree that multiplied
    # catastrophically when callers composed further expressions over
    # the result (normalize∘resolve reached 2.58 MB / 49,895 regexp
    # nodes). Current shape: the whole body is let-bound (see
    # ops/urls.let_ — higher-order functions are CodegenFallback, so
    # the body runs in the LAZY interpreted evaluator with no 64 KB
    # cliff), which lets the fold sit back inside a plain when():
    # selected per row, executed only for the two fold branches, and
    # remove_dot_segments' contains('/.') gate still skips the
    # program on clean paths. ONE branch spec drives BOTH chains
    # (value chain + fold-flag chain), so the branch decision cannot
    # desync: a future branch edit changes condition, value, and fold
    # flag together. Branch notes: a truly empty href is CPython
    # urljoin's `if not url: return base` early-exit — base VERBATIM
    # (before any stripping); an href that strips to empty ('\n')
    # parses as an empty relative ref instead: base sans fragment
    # (RFC 3986 §4.4).
    branches = [
        (raw_href == "", raw_url, False),
        (href == "", no_frag, False),
        (href.startswith("//"), F.concat(scheme, href), False),
        (href.rlike(_ABS_RE), href, False),
        (href.startswith("/"), F.concat(origin, href), True),
        (href.startswith("#"), F.concat(no_frag, href), False),
        (href.startswith("?"), F.concat(no_query, href), False),
    ]
    other_val, other_fold = F.concat(base, href), True
    unfolded = F.when(branches[0][0], branches[0][1])
    folds = F.when(branches[0][0], F.lit(branches[0][2]))
    for cond, val, fold in branches[1:]:
        unfolded = unfolded.when(cond, val)
        folds = folds.when(cond, F.lit(fold))
    unfolded = unfolded.otherwise(other_val)
    folds = folds.otherwise(F.lit(other_fold))
    return let_(
        unfolded,
        lambda x: F.when(folds, remove_dot_segments(x)).otherwise(x),
    )


def extract_links(
    nodes: DataFrame,
    pre_partitioned: bool = False,
    subtree_text: bool = False,
    honor_base: bool = False,
) -> DataFrame:
    """Node table -> one row per ``<a href>``:
    (url, link_pos, href, resolved, anchor_text, rel_nofollow).

    ``link_pos`` is the anchor's 1-based document-order position within
    its page; ``anchor_text`` concatenates the anchor's DIRECT text
    children in document order ('' when none — matches the reference's
    find-in-text notion of direct content, select.cljc:283-295, not a
    subtree text flatten).

    ``subtree_text=True`` instead concatenates ALL text-node
    descendants of the anchor in document order (``<a><b>Click</b></a>``
    yields 'Click', not '') — what an anchor-text training corpus
    wants. Implemented as the same url-local join with the
    ``pre_ord``/``subtree_end`` interval residual instead of the
    parent equi-key (the descendant_rel pattern, selectors_rel.py —
    url-equi join, never a nested-loop). Comment data strings inside
    an anchor count as text here, matching the zipper walk.

    ``rel_nofollow``: whether the anchor's ``rel`` token list (split
    on ASCII whitespace, matched case-insensitively — the same token
    rule ops/metadata.py applies to ``link rel``) contains
    ``nofollow``; a crawler drops these edges before frontier
    admission (REP's per-link complement to robots.txt).

    ``pre_partitioned``: set True when ``nodes`` is already
    hash-partitioned/bucketed by url (materialize_nodes) — the explicit
    url repartition is then skipped (a user repartition always lowers
    to a shuffle, even over an identically-partitioned child).

    ``honor_base=True`` resolves hrefs against the page's WHATWG
    effective base: the FIRST (tree-order) ``<base href>`` element's
    href, itself resolved against the page url (so relative base
    hrefs compose), falling back to the page url when absent. ALL
    refs — including query/fragment-only — resolve against the
    effective base, i.e. ``urljoin(effective_base, href)`` semantics
    (WHATWG's empty-href-means-document-URL nuance is not modeled;
    default False preserves the page-url-only behavior the literal
    edge-list oracles pin). Codegen note: the base resolution runs in
    the tiny per-page aggregate's OWN stage, so no stage ever inlines
    resolve_href's regex program twice (CLAUDE.md invariant).
    """
    anchors = (
        nodes.where(
            (F.col("type") == TYPE_ELEMENT)
            & (F.col("tag") == "a")
            & F.col("attrs")["href"].isNotNull()
        )
        .select(
            "url",
            F.col("node_id").alias("a_id"),
            F.col("pre_ord").alias("a_ord"),
            F.col("subtree_end").alias("a_end"),
            F.col("attrs")["href"].alias("href"),
            F.col("attrs")["rel"].alias("rel"),
        )
    )
    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"),
        F.col("parent_id").alias("t_parent"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    if subtree_text:
        membership = (texts["t_ord"] > anchors["a_ord"]) & (
            texts["t_ord"] <= anchors["a_end"]
        )
    else:
        membership = anchors["a_id"] == texts["t_parent"]
    joined = anchors.join(
        texts, (anchors["url"] == texts["t_url"]) & membership, "left"
    )
    if not pre_partitioned:
        # ONE url shuffle serves both the per-anchor aggregation (url
        # is a prefix of its grouping keys — subset satisfaction) and
        # the link_pos window; without it Catalyst plans two exchanges
        joined = joined.repartition("url")
    atext = (
        joined
        .groupBy("url", "a_id", "a_ord", "href", "rel")
        .agg(
            F.array_join(
                # struct sort orders by the first field: document order
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("t_ord", "t_text"))
                    ),
                    lambda s: s["t_text"],
                ),
                "",
            ).alias("anchor_text")
        )
    )
    if honor_base:
        bases = (
            nodes.where(
                (F.col("type") == TYPE_ELEMENT)
                & (F.col("tag") == "base")
                & F.col("attrs")["href"].isNotNull()
            )
            .groupBy("url")
            .agg(
                F.min(
                    F.struct(
                        F.col("pre_ord").alias("o"),
                        F.col("attrs")["href"].alias("h"),
                    )
                )["h"].alias("_base_href")
            )
            # resolved HERE, in the aggregate's own stage — the join
            # below is a stage barrier, so the final projection holds
            # only ONE resolve_href program (codegen-limit rule)
            .select(
                "url",
                resolve_href(F.col("url"), F.col("_base_href"))
                .alias("_eff_base"),
            )
        )
        atext = atext.join(bases, "url", "left")
        res_base = F.coalesce(F.col("_eff_base"), F.col("url"))
    else:
        res_base = F.col("url")
    w = Window.partitionBy("url").orderBy("a_ord")
    return atext.select(
        "url",
        F.row_number().over(w).cast("long").alias("link_pos"),
        "href",
        resolve_href(res_base, F.col("href")).alias("resolved"),
        "anchor_text",
        F.array_contains(
            F.split(F.lower(F.coalesce(F.col("rel"), F.lit(""))),
                    ASCII_WS_RE),
            "nofollow",
        ).alias("rel_nofollow"),
    )


def aggregate_anchors(links: DataFrame,
                      anchor_cap: int | None = 64) -> DataFrame:
    """Per-target inlink profile over ``extract_links`` edge rows:
    ``(target, n_links, n_pages, anchors)`` — the anchor-text corpus
    view (what a page is *called* by the pages that link to it).

    - ``n_links``: total edges pointing at the target;
    - ``n_pages``: DISTINCT referring page urls;
    - ``anchors``: the distinct anchor texts in lexicographic order,
      ``'|'``-joined, capped at the ``anchor_cap`` lexicographically
      smallest (``None`` = exact/unbounded).

    Scale shape: ONE linear pipeline over ONE shuffle — an explicit
    ``repartition(target)``, one partition-local sort serving both
    window functions (their orderings are prefix-compatible), and one
    final groupBy. Deliberately NOT the counts-join-anchors two-branch
    form: a diamond over the expensive ``links`` lineage re-executes
    the whole upstream parse per branch (the two exchanges column-
    prune differently, so ReuseExchange never fires), and the equi-join
    makes Catalyst infer ``isnotnull(target)`` and push the caller's
    entire ``resolved`` expression (resolve_href's regex program) down
    into the anchor filter — evaluating it twice and overflowing
    whole-stage codegen's 64 KB method limit. The anchor list is the
    unbounded-group-frame hazard (a homepage linked by millions of
    pages), so the cap is applied AT AGGREGATION — each row's anchor
    contributes only when it is the group's first occurrence
    (row_number==1 over (target, anchor)) AND within the cap
    (dense_rank over target ordered by anchor), so ``collect_list``
    never holds more than ``anchor_cap`` strings — the same rule
    ops/dedup.py pins for group members, never a post-hoc slice.
    """
    base = links.select(
        F.col("resolved").alias("target"), "url", "anchor_text"
    ).repartition("target")
    # pre-aggregate to (target, url, anchor) grain BEFORE the windows:
    # the map-side partial combine collapses repeated edges, so the
    # window sort sees distinct triples, not raw edge rows (a homepage
    # linked by millions of pages with the same 'Home' anchor funnels
    # distinct urls, not every edge, through its window task — the
    # residual per-target funnel is the exact-contract floor, same as
    # ops/dedup.py's group windows)
    g1 = base.groupBy("target", "url", "anchor_text").agg(
        F.count("*").alias("n_e")
    )
    w_first = Window.partitionBy("target", "anchor_text").orderBy("url")
    w_rank = Window.partitionBy("target").orderBy("anchor_text")
    in_cap = F.lit(True) if anchor_cap is None else (
        F.dense_rank().over(w_rank) <= anchor_cap
    )
    flagged = g1.select(
        "target", "url", "n_e",
        F.when(
            (F.row_number().over(w_first) == 1) & in_cap,
            F.col("anchor_text"),
        ).alias("contrib"),
    )
    return flagged.groupBy("target").agg(
        F.sum("n_e").cast("long").alias("n_links"),
        F.count_distinct("url").cast("long").alias("n_pages"),
        F.array_join(
            F.array_sort(F.collect_list("contrib")), "|"
        ).alias("anchors"),
    )


def link_domains(links: DataFrame, psl_rules=None) -> DataFrame:
    """Per-page outlink domain profile over ``extract_links`` edge
    rows: ``(url, n_links, n_internal, n_external, n_domains)`` — the
    boilerpipe-adjacent structure signal (a page whose links all leave
    its own registered domain is a link farm / aggregator; one whose
    links never leave is navigation-heavy).

    Pinned semantics: ``n_internal`` counts edges whose RESOLVED
    target's registered domain (ops/psl.py plan-time rules; pass
    ``psl_rules`` to override DEFAULT_RULES) equals the page's own;
    edges with no resolvable host or no registered domain (relative
    targets never occur post-resolve; opaque schemes do) count as
    ``n_external``; ``n_domains`` = distinct non-NULL target domains.

    Scale shape: pure column exprs on the edge rows + ONE url groupBy
    (map-side combinable; no window, no join — the page's own domain
    is derived per row from the url column already on the edge)."""
    from hickoryspark.ops.hosts import url_host
    from hickoryspark.ops.psl import registered_domain_col

    page_dom = registered_domain_col(url_host(F.col("url")), psl_rules)
    tgt_dom = registered_domain_col(
        url_host(F.col("resolved")), psl_rules)
    internal = tgt_dom.isNotNull() & page_dom.isNotNull() & (
        tgt_dom == page_dom
    )
    return (
        links.select(
            "url",
            internal.alias("_int"),
            tgt_dom.alias("_dom"),
        )
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.sum(F.col("_int").cast("long")).cast("long")
            .alias("n_internal"),
            F.sum((~F.col("_int")).cast("long")).cast("long")
            .alias("n_external"),
            F.count_distinct("_dom").cast("long").alias("n_domains"),
        )
    )


def anchor_text_profile(links: DataFrame) -> DataFrame:
    """Per-TARGET anchor aggregation over ``extract_links`` edge rows
    — the classic web-graph ranking signal (anchor text pointing AT a
    page describes it better than the page itself; search engines and
    anchor-text corpora both consume this rollup):
    ``(target, n_links, n_source_pages, n_anchors, top_anchor,
    top_count)``.

    Pinned semantics: ``target`` = the RESOLVED edge target (compose
    with ops.urls.normalize_url upstream for canonical keys);
    ``n_links`` counts every edge (callers drop rel_nofollow rows
    first if building a follow-only corpus); ``n_source_pages`` =
    distinct source urls; ``n_anchors`` = distinct NON-EMPTY anchor
    texts; ``top_anchor`` = the most frequent non-empty anchor text,
    ties broken by the lexicographically smallest — NULL (top_count
    0) when every anchor is empty.

    Scale shape: two bounded aggregations — (target, anchor) counts,
    then one min(struct(-cnt, anchor)) per target (the tie rule IS
    the struct order; no window, no rank, no per-target frame) —
    joined to the per-target totals on the same key. Hot targets
    (every page links '/about') stay one row per distinct anchor
    after the first map-side combine, so skew is bounded by anchor
    vocabulary, not in-degree."""
    base = links.select(
        F.col("resolved").alias("target"), "url", "anchor_text")
    totals = base.groupBy("target").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.count_distinct("url").cast("long").alias("n_source_pages"),
    )
    per_anchor = (
        base.where(F.col("anchor_text") != "")
        .groupBy("target", "anchor_text")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tops = per_anchor.groupBy("target").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"),
                       F.col("anchor_text").alias("a"))).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
    )
    return (
        totals.join(tops, "target", "left")
        .select(
            "target", "n_links", "n_source_pages",
            F.coalesce(F.col("n_anchors"), F.lit(0).cast("long"))
            .alias("n_anchors"),
            F.col("m.a").alias("top_anchor"),
            F.coalesce(-F.col("m.nc"), F.lit(0)).cast("long")
            .alias("top_count"),
        )
    )
