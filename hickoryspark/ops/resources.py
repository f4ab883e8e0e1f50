"""Page-requisite resource extraction — the fetch-graph complement to
ops/links.py's navigation edges.

A rendering crawler (and any third-party/tracker audit) needs the
full set of subresources a page pulls in: scripts, stylesheets,
frames, images, media, plugins. The reference engine has no
equivalent; this extends the §2 surface the same way ops/links.py
does for anchors, as one pure JVM-side DataFrame program over the
exploded node table.

Pinned semantics (so the closed-form gate oracle can reproduce them):

- a resource row is an element from the table below carrying its
  carrier attribute (NULL attribute -> no row; an EMPTY string value
  still emits a row — this is an extraction, not a fetcher, and the
  resolve rule for '' is the links.py base rule):

    ``script[src]``->script, ``img[src]``->image, ``iframe[src]``->
    frame, ``embed[src]``->embed, ``object[data]``->object,
    ``video[src]``/``audio[src]``/``source[src]``->media,
    ``link[href]``->stylesheet|icon|preload by its ``rel`` tokens;

- ``link`` participates only when its ``rel`` token list (split on
  ASCII whitespace, matched case-insensitively — the ops/metadata.py
  token rule) contains one of ``stylesheet``/``icon``/``preload``;
  ONE row per element, kind = the FIRST match in that priority order
  (a ``rel="stylesheet icon"`` is a stylesheet);
- ``img[srcset]`` without ``src`` emits NO row here — srcset
  candidate mining is ops/media.extract_images' job;
- ``res_pos`` is the 1-based document-order position among the
  page's resource rows;
- ``resolved`` = ops/links.resolve_href(url, src) — the CPython
  urljoin-pinned rule, dot-segments folded;
- ``res_host`` = ops/hosts.url_host(resolved) (WHATWG host fold;
  NULL for schemeless/data:/mailto: targets);
- ``third_party`` (int 1/0): res_host differs from the PAGE's host
  under the same fold; NULL when either host is NULL. The host
  compare is the folded string only — no PSL collapse; compose with
  ops/psl.registered_domain when "same site" (not "same host") is
  the audit boundary.

Spark shape: one filter + projection over the node table, then a
single url window for res_pos — ONE url shuffle total (plan-guarded
in tests/test_plan_shapes.py). resolve_href's regex program exceeds
the 64 KB whole-stage-codegen limit (CLAUDE.md invariant): the
projection stage runs interpreted, correctly, at regex-dominated
cost — same cost class as extract_links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.hosts import host_suffixes, url_host
from hickoryspark.ops.links import resolve_href
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["extract_resources", "SRC_TAGS", "LINK_KINDS",
           "tracker_audit", "duckdb_tracker_sql"]

#: tags whose resource carrier is the ``src`` attribute, -> kind
SRC_TAGS = {
    "script": "script",
    "img": "image",
    "iframe": "frame",
    "embed": "embed",
    "video": "media",
    "audio": "media",
    "source": "media",
}

#: rel tokens that make a <link href> a resource row, in priority
#: order (first match wins when several tokens are present)
LINK_KINDS = ("stylesheet", "icon", "preload")


def _rel_tokens(rel_col) -> "F.Column":
    return F.split(F.lower(F.coalesce(rel_col, F.lit(""))), ASCII_WS_RE)


def extract_resources(
    nodes: DataFrame, pre_partitioned: bool = False
) -> DataFrame:
    """Node table -> one row per subresource reference:
    (url, res_pos, kind, src, resolved, res_host, third_party).

    ``pre_partitioned``: set True when ``nodes`` is already
    hash-partitioned/bucketed by url (materialize_nodes) — the res_pos
    window then reuses the existing partitioning.
    """
    attrs = F.col("attrs")
    tag = F.col("tag")

    src_kind = F.create_map(
        *[F.lit(x) for kv in SRC_TAGS.items() for x in kv]
    )[tag]
    carrier = F.when(
        src_kind.isNotNull(), attrs["src"]
    ).when(tag == "object", attrs["data"]).when(
        tag == "link", attrs["href"]
    )
    toks = _rel_tokens(attrs["rel"])
    link_kind = F.coalesce(
        *[
            F.when(F.array_contains(toks, k), F.lit(k))
            for k in LINK_KINDS
        ]
    )
    kind = F.when(src_kind.isNotNull(), src_kind).when(
        tag == "object", F.lit("object")
    ).when(tag == "link", link_kind)

    rows = (
        nodes.where(F.col("type") == TYPE_ELEMENT)
        .select(
            "url",
            F.col("pre_ord").alias("r_ord"),
            kind.alias("kind"),
            carrier.alias("src"),
        )
        .where(F.col("kind").isNotNull() & F.col("src").isNotNull())
    )
    if not pre_partitioned:
        rows = rows.repartition("url")
    resolved = resolve_href(F.col("url"), F.col("src"))
    w = Window.partitionBy("url").orderBy("r_ord")
    out = rows.select(
        "url",
        F.row_number().over(w).cast("long").alias("res_pos"),
        "kind",
        "src",
        resolved.alias("resolved"),
    )
    res_host = url_host(F.col("resolved"))
    page_host = url_host(F.col("url"))
    return out.select(
        "url",
        "res_pos",
        "kind",
        "src",
        "resolved",
        res_host.alias("res_host"),
        F.when(
            res_host.isNull() | page_host.isNull(), F.lit(None)
        )
        .otherwise((res_host != page_host).cast("int"))
        .alias("third_party"),
    )


#: W3C Mixed Content kinds: optionally-blockable ("passive") vs
#: blockable ("active") — images and media may load with a warning,
#: everything else (script/stylesheet/frame/object/embed/preload) is
#: blocked outright by browsers
PASSIVE_KINDS = ("image", "media", "icon")


def mixed_content(resources: DataFrame) -> DataFrame:
    """Per-page mixed-content + third-party audit rollup over
    :func:`extract_resources` rows: ``(url, n_resources,
    n_mixed_active, n_mixed_passive, n_third_party)``.

    Pinned semantics: a resource is MIXED iff the page url's scheme is
    ``https`` and the resolved resource url's scheme is ``http``
    (schemes = the text before the first ``:``, ASCII-lowercased; a
    resolved value with no ``:`` has no scheme and is never mixed —
    protocol-relative refs resolve to the page scheme upstream, so
    they never flag). Active vs passive follows ``PASSIVE_KINDS``
    (the W3C optionally-blockable set). ``n_third_party`` counts rows
    with ``third_party = 1`` (NULL hosts excluded by definition).
    Pages with zero resource rows don't appear — LEFT JOIN from a
    page universe to zero-fill, as the gate query does.

    Scale shape: one url groupBy over the already-extracted rows
    (which end url-partitioned), nothing else.
    """
    scheme = lambda c: F.when(
        F.instr(c, ":") > 0, F.lower(F.substring_index(c, ":", 1))
    )
    is_mixed = F.coalesce(
        (scheme(F.col("url")) == "https")
        & (scheme(F.col("resolved")) == "http"),
        F.lit(False),
    )
    passive = F.col("kind").isin(*PASSIVE_KINDS)
    return resources.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_resources"),
        F.sum((is_mixed & ~passive).cast("long")).cast("long")
        .alias("n_mixed_active"),
        F.sum((is_mixed & passive).cast("long")).cast("long")
        .alias("n_mixed_passive"),
        F.sum(
            F.coalesce(F.col("third_party"), F.lit(0)).cast("long")
        ).cast("long").alias("n_third_party"),
    )


#: W3C SRI hash-expression: algo prefix + base64 value ("options" —
#: the ?-suffix the spec reserves — are accepted and ignored)
_SRI_TOKEN_RE = r"\A(?:sha256|sha384|sha512)-[A-Za-z0-9+/]+={0,2}(?:\?[\x21-\x7e]*)?\z"


def sri_audit(nodes: DataFrame) -> DataFrame:
    """Per-page Subresource-Integrity coverage audit:
    ``(url, n_ext_scripts, n_sri_scripts, n_stylesheets,
    n_sri_styles, n_invalid_integrity)``.

    Pinned semantics:

    - external scripts are ``script[src]``; stylesheets are ``link``
      with ``href`` whose ``rel`` token list (ASCII-ws split,
      case-insensitive) contains ``stylesheet``;
    - an element is SRI-COVERED iff its ``integrity`` attribute
      (ASCII-ws token list) contains at least one token matching the
      W3C hash-expression grammar, algo matched case-insensitively:
      ``(sha256|sha384|sha512)-<base64>[?options]``;
    - ``n_invalid_integrity`` counts elements OF EITHER KIND whose
      integrity attribute is present (even ``''``) but carries NO
      valid token — the misconfiguration the audit exists to find
      (browsers treat those as "no valid metadata" and, with a CSP
      require-sri-for, block).

    Scale shape: one narrow filter + one url groupBy, pure JVM.
    """
    elems = nodes.where(F.col("type") == TYPE_ELEMENT)
    a = F.col("attrs")
    rel_toks = F.transform(
        F.split(F.coalesce(a["rel"], F.lit("")), ASCII_WS_RE),
        lambda t: F.lower(t),
    )
    is_script = (F.col("tag") == "script") & a["src"].isNotNull()
    is_style = (
        (F.col("tag") == "link")
        & a["href"].isNotNull()
        & F.array_contains(rel_toks, "stylesheet")
    )
    sri_ok = F.exists(
        F.split(F.coalesce(a["integrity"], F.lit("")), ASCII_WS_RE),
        lambda t: F.lower(t).rlike(_SRI_TOKEN_RE),
    )
    has_integrity = a["integrity"].isNotNull()
    rows = elems.where(is_script | is_style).select(
        "url",
        is_script.cast("long").alias("s"),
        (is_script & sri_ok).cast("long").alias("ss"),
        is_style.cast("long").alias("c"),
        (is_style & sri_ok).cast("long").alias("cs"),
        (has_integrity & ~sri_ok).cast("long").alias("bad"),
    )
    return rows.groupBy("url").agg(
        F.sum("s").cast("long").alias("n_ext_scripts"),
        F.sum("ss").cast("long").alias("n_sri_scripts"),
        F.sum("c").cast("long").alias("n_stylesheets"),
        F.sum("cs").cast("long").alias("n_sri_styles"),
        F.sum("bad").cast("long").alias("n_invalid_integrity"),
    )


def tracker_audit(resources: DataFrame,
                  trackers: DataFrame) -> DataFrame:
    """Per-page third-party tracker exposure — the privacy-audit
    rollup over :func:`extract_resources` rows (or any frame with
    ``url``/``res_host``): ``(url, n_requests, n_tracker,
    tracker_milli, has_tracker)``.

    ``trackers`` is a one-column ``host`` list of known tracker
    registrable domains (EasyPrivacy-style); a resource matches by
    the SAME dot-suffix-chain rule as the UT1 host blocklist
    (ops/hosts.host_suffixes — ``cdn.ads.ex`` matches ``ads.ex``),
    entries lowercased with one trailing dot stripped. NULL-host
    resources count in ``n_requests`` (they were requested) but can
    never match.

    Scale shape: resource rows collapse to (url, res_host) counts
    FIRST (map-side combinable — no row identity anywhere, so
    nothing partition-dependent exists to pin), the distinct host
    grain suffix-explodes into a broadcast semi-join against the
    tiny tracker list, and the matched groups' counts sum back.
    Same cost class as host_blocklist."""
    from hickoryspark.ops.hosts import _WS_TRIM

    t = (
        trackers.select(
            F.regexp_replace(
                F.lower(F.btrim(F.col("host"), F.lit(_WS_TRIM))),
                r"\.\z", ""
            ).alias("t_host"))
        .where(F.col("t_host") != "")
        .distinct()
    )
    per = resources.groupBy("url", "res_host").agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    exp = per.where(F.col("res_host").isNotNull()).select(
        "url", "res_host",
        F.explode(host_suffixes(F.col("res_host"))).alias("_s"))
    matched = (
        exp.join(F.broadcast(t), exp["_s"] == t["t_host"],
                 "left_semi")
        .select("url", "res_host").distinct()
    )
    totals = per.groupBy("url").agg(
        F.sum("_n").cast("long").alias("n_requests"))
    nt = (
        per.join(matched, ["url", "res_host"])
        .groupBy(F.col("url").alias("_hu"))
        .agg(F.sum("_n").cast("long").alias("n_tracker"))
    )
    return (
        totals.join(nt, totals["url"] == nt["_hu"], "left")
        .select(
            "url", "n_requests",
            F.coalesce(F.col("n_tracker"), F.lit(0)).cast("long")
            .alias("n_tracker"),
            F.expr("(1000 * coalesce(n_tracker, 0)) div n_requests")
            .cast("long").alias("tracker_milli"),
            (F.coalesce(F.col("n_tracker"), F.lit(0)) > 0)
            .cast("long").alias("has_tracker"),
        )
    )


def duckdb_tracker_sql(resources_rel: str, tracker_hosts: list[str],
                       label_cap: int = 16) -> str:
    """DuckDB mirror of :func:`tracker_audit` over a resource
    relation exposing (url, res_host); ``tracker_hosts`` is the
    literal list."""
    # entry normalization mirrors the Spark side EXACTLY (the
    # hosts.py blocklist rule): trim the ASCII-ws class only, fold
    # case, strip at most ONE trailing dot; '' entries drop.
    # Entries are ASCII by contract (EasyPrivacy-style lists).
    norm = []
    for h in tracker_hosts:
        e = h.strip(" \t\n\x0b\f\r").lower()
        if e.endswith("."):
            e = e[:-1]
        if e:
            norm.append(e)
    if not norm:
        raise ValueError("tracker_hosts must contain a non-empty "
                         "entry (empty VALUES is invalid SQL)")
    t = ", ".join(f"('{e}')" for e in sorted(set(norm)))
    return f"""
        WITH tk_per AS (
          SELECT url, res_host, CAST(COUNT(*) AS BIGINT) AS n
          FROM {resources_rel} GROUP BY url, res_host
        ), tk_t(t_host) AS (VALUES {t}),
        tk_exp AS (
          SELECT url, res_host, unnest(list_transform(
            range(GREATEST(1, len(string_split(res_host, '.'))
                              - {int(label_cap)} + 1),
                  len(string_split(res_host, '.')) + 1),
            i -> array_to_string(string_split(res_host, '.')[i:], '.')
          )) AS s
          FROM tk_per WHERE res_host IS NOT NULL
        ), tk_hit AS (
          SELECT DISTINCT url, res_host FROM tk_exp
          WHERE s IN (SELECT t_host FROM tk_t)
        ), tk_tot AS (
          SELECT url, CAST(SUM(n) AS BIGINT) AS n_requests
          FROM tk_per GROUP BY url
        ), tk_n AS (
          SELECT p.url, CAST(SUM(p.n) AS BIGINT) AS n_tracker
          FROM tk_per p JOIN tk_hit h
            ON p.url = h.url AND p.res_host = h.res_host
          GROUP BY p.url)
        SELECT t.url, t.n_requests,
               CAST(COALESCE(n.n_tracker, 0) AS BIGINT) AS n_tracker,
               CAST((1000 * COALESCE(n.n_tracker, 0)) // t.n_requests
                    AS BIGINT) AS tracker_milli,
               CAST(CASE WHEN COALESCE(n.n_tracker, 0) > 0
                         THEN 1 ELSE 0 END AS BIGINT) AS has_tracker
        FROM tk_tot t LEFT JOIN tk_n n ON t.url = n.url"""
