"""Site-template boilerplate detection — cross-page text-frequency
thresholding (the "template detection" family: Gibson/Punera/Tomkins
WWW'05 "The volume and evolution of web page templates"; CleanEval's
duplicated-boilerplate notion; CCNet does the same at paragraph level).

A text block that appears VERBATIM on a large fraction of a host's
pages (nav labels, footers, cookie banners, sidebars) is template
chrome, not content. Per (host, text):

    is_boiler  ⇔  n_pages >= min_pages  AND  n_pages >= min_frac * host_pages

``strip_boilerplate`` then reassembles each page's residual text in
document order — the corpus-level complement to the single-page
structural signals in ops/textstats.link_density.

Scale design (100 TB):
- The shuffle key is ``(host, md5(text))`` and the shuffled rows carry
  DIGESTS, never bodies (the crawl_delta lesson) — the flags frame is
  one row per distinct (host, digest).
- Frequencies use a two-stage exact distinct-count (groupBy
  (host, sig, url) then (host, sig)), so map-side partial aggregation
  absorbs within-page repeats before anything crosses the wire.
- ``host_pages`` is one tiny row per host, joined without a hint —
  AQE broadcasts it at runtime.
- The final doc-order reassembly is ONE url shuffle
  (sort_array(collect_list(struct(pre_ord, text)))).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hickoryspark.nodes import TYPE_TEXT
from hickoryspark.ops.hosts import url_host


def page_text_nodes(nodes: DataFrame) -> DataFrame:
    """(url, host, pre_ord, text) rows for the visible text nodes of
    the exploded node table (spark/nodes_table.py): text-type nodes
    with non-empty trimmed text, excluding script/style rawtext (their
    text is always a DIRECT child, so the parent check is exact) and
    the ENTIRE subtree of every <template> element (template content
    never renders; a template's descendants can be elements, so a
    parent-only check would leak e.g. <template><li>text — excluded
    via the url-local pre-order interval anti-join, the same pattern
    as descendant_rel). A NULL parent_tag (detached/document-level
    text) is kept explicitly — three-valued ~isin would drop it."""
    # template-subtree membership WITHOUT a second pass over the parse
    # lineage (an interval anti-join against a template frame derived
    # from the same uncached nodes would re-execute the mapInPandas
    # parse): node is inside a template iff some PRECEDING template's
    # subtree_end reaches it — a running max over one url window, so
    # the parse runs once and the cost is the url shuffle the
    # boilerplate path pays anyway.
    w = (
        Window.partitionBy("url")
        .orderBy("pre_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tpl_end = F.max(
        F.when(F.col("tag") == "template", F.col("subtree_end"))
    ).over(w)
    flagged = nodes.select(
        "url", "pre_ord", "type", "parent_tag", "text",
        tpl_end.alias("_tpl_end"),
    )
    visible = flagged.where(
        (F.col("type") == TYPE_TEXT)
        & ~F.coalesce(
            F.col("parent_tag").isin("script", "style"), F.lit(False)
        )
        & (F.trim(F.col("text")) != "")
        & (
            F.col("_tpl_end").isNull()
            | (F.col("_tpl_end") < F.col("pre_ord"))
        )
    )
    return visible.select(
        "url", url_host(F.col("url")).alias("host"), "pre_ord", "text"
    )


def boilerplate_flags(
    texts: DataFrame, min_pages: int = 3, min_frac: float = 0.3
) -> DataFrame:
    """(host, sig, n_pages, host_pages, is_boiler) per distinct
    (host, text-digest). ``texts`` must carry (url, host, text);
    thresholds: on at least ``min_pages`` distinct pages AND at least
    ``min_frac`` of the host's pages (both, so tiny hosts don't flag
    everything and giant hosts don't keep their nav)."""
    sigs = texts.select("host", "url", F.md5("text").alias("sig"))
    freq = (
        sigs.groupBy("host", "sig", "url").agg(F.lit(1).alias("_one"))
        .groupBy("host", "sig")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    host_pages = (
        sigs.select("host", "url").distinct()
        .groupBy("host").agg(F.count(F.lit(1)).alias("host_pages"))
    )
    return freq.join(host_pages, "host").select(
        "host", "sig", "n_pages", "host_pages",
        (
            (F.col("n_pages") >= min_pages)
            & (F.col("n_pages").cast("double")
               >= min_frac * F.col("host_pages"))
        ).alias("is_boiler"),
    )


def strip_boilerplate(
    texts: DataFrame, min_pages: int = 3, min_frac: float = 0.3
) -> DataFrame:
    """(url, kept_text, n_kept, n_boiler): each page's text nodes with
    host-template boilerplate removed, residual concatenated in
    document order (space-joined). Pages whose every text node is
    boilerplate still emit a row (empty kept_text) — a page must never
    silently vanish from the corpus."""
    flags = boilerplate_flags(texts, min_pages, min_frac)
    marked = (
        texts.withColumn("sig", F.md5("text"))
        .join(flags.select("host", "sig", "is_boiler"), ["host", "sig"])
    )
    # boiler rows enter the aggregate as NULL, which collect_list
    # SKIPS — the frame is bounded to kept nodes BEFORE aggregation
    # (the dedup group-frame lesson), so a 99%-template page costs
    # its content size, not its page size
    kept = F.sort_array(
        F.collect_list(
            F.when(
                ~F.col("is_boiler"),
                F.struct(F.col("pre_ord"), F.col("text")),
            )
        )
    )
    return (
        marked.groupBy("url")
        .agg(
            F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boiler"),
            kept.alias("_kept"),
        )
        .select(
            "url",
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s["text"]), " "
            ).alias("kept_text"),
            "n_kept",
            "n_boiler",
        )
    )


def dom_fingerprints(nodes: DataFrame) -> DataFrame:
    """Structural page fingerprint for TEMPLATE CLUSTERING — two pages
    share a fingerprint iff their ELEMENT structure is identical
    (texts and attributes ignored): ``(url, fingerprint)``, the md5
    of the PRE-ORDER ``(tag, depth)`` sequence. The shape-based
    complement of the text-frequency template detection above (pages
    with rotated copy but one layout cluster together; SEO template
    farms and pagination families collapse).

    Two exactness pins (both review-caught):
    - the hash covers the pre-order SEQUENCE, not a sorted multiset —
      a multiset cannot tell which sibling subtree a node hangs under
      (two divs where the <p> sits in the first vs the second
      collide), while pre-order (tag, depth) uniquely determines the
      tree shape;
    - each token is SELF-DELIMITING (``len(tag):tag:depth;``) — tag
      names may legally contain any separator byte, so a joined
      string without length prefixes is ambiguous under hostile tag
      names.

    Scale shape: one url groupBy whose collect frame is bounded by a
    single page's own element count (the per-url agg rule); ordering
    and hashing are row-local array ops. Exact equality — no banding,
    no recall question."""
    from hickoryspark.nodes import TYPE_ELEMENT

    tok = F.concat_ws(
        "", F.length("tag").cast("string"), F.lit(":"), F.col("tag"),
        F.lit(":"), F.col("depth").cast("string"), F.lit(";"))
    elems = nodes.where(F.col("type") == TYPE_ELEMENT).select(
        "url", F.struct(F.col("pre_ord"), tok.alias("t")).alias("_s"))
    seq = F.transform(
        F.array_sort(F.collect_list("_s")), lambda s: s["t"])
    return elems.groupBy("url").agg(
        F.md5(F.encode(F.array_join(seq, ""), "UTF-8"))
        .alias("fingerprint")
    )


def template_cluster_sizes(nodes: DataFrame) -> DataFrame:
    """Distribution view over :func:`dom_fingerprints`:
    ``(cluster_size, n_clusters)`` — how many structural templates
    exist at each page count. The audit number a crawl engineer reads
    first (one giant cluster = a template farm / one shared shell)."""
    fps = dom_fingerprints(nodes)
    clusters = fps.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"))
