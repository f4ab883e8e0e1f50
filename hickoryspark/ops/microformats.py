"""Microformats2 extraction — the fourth structured-data carrier.

Completes the structured-data matrix next to JSON-LD
(ops/structured.extract_jsonld), microdata (extract_microdata), and
RDFa Lite (extract_rdfa): microformats2 (h-card / h-entry / h-feed …)
carries entities in CLASS tokens rather than dedicated attributes and
is the dominant format on the indie web (microformats.org/wiki/h-card
is public spec knowledge; no parser code consulted).

Pinned mf2 subset (oracle-reproducible):

- a ROOT (item) is any element whose ``class`` contains at least one
  token matching ``h-[a-z0-9-]+`` (ASCII-whitespace split, tokens
  case-SENSITIVE — ``H-CARD`` is not a root); ``item_idx`` is the
  0-based document-order index of roots on the page; ``item_types``
  is the space-joined h-* tokens in attribute order;
- a PROPERTY is any element with at least one class token matching
  ``(p|u|dt|e)-[a-z0-9-]+``; one output row per property token;
  ownership is the NEAREST STRICTLY-CONTAINING root — property
  elements outside every root drop;
- a property element that is ITSELF a root is a NESTED ITEM (mf2
  composition): ``value`` NULL, ``nested_item`` = its ``item_idx``;
- ``value`` resolution per kind (for non-nested properties):
  ``u-*`` → ``href`` when the element is ``a``/``area``/``link`` and
  carries one, else ``src`` when present, else subtree text;
  ``dt-*`` → the ``datetime`` attribute when present, else subtree
  text; ``p-*`` / ``e-*`` → subtree text (descendant text nodes
  concatenated in document order; e-* HTML re-serialization and the
  spec's implied name/url/photo properties are waived — recorded in
  COVERAGE.md);
- ``prop_kind`` is the prefix (``p``/``u``/``dt``/``e``),
  ``prop_name`` the token after it; ``prop_pos`` is the 0-based
  (document order, token order) index among the owning item's rows.

Spark shape: identical to extract_rdfa — url-local interval joins
(root ownership + subtree text for the rows that need it) plus one
url window for item/property indexing; co-partitioned end-to-end on
a url-bucketed node table, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["extract_microformats"]

_ROOT_RE = r"\Ah-[a-z0-9-]+\z"
_PROP_RE = r"\A(p|u|dt|e)-[a-z0-9-]+\z"
_URL_TAGS = ("a", "area", "link")


def extract_microformats(nodes: DataFrame) -> DataFrame:
    """node table → ``(url, item_idx, item_types, prop_kind,
    prop_name, prop_pos, value, nested_item)`` property rows."""
    a = F.col("attrs")
    classed = nodes.where(
        (F.col("type") == TYPE_ELEMENT) & a["class"].isNotNull()
    ).select(
        "url", "pre_ord", "subtree_end", "tag",
        F.filter(F.split(a["class"], ASCII_WS_RE),
                 lambda t: t != "").alias("toks"),
        a["href"].alias("href"), a["src"].alias("src"),
        a["datetime"].alias("datetime"),
    )
    h_toks = F.filter(F.col("toks"), lambda t: t.rlike(_ROOT_RE))
    p_toks = F.filter(F.col("toks"), lambda t: t.rlike(_PROP_RE))
    classed = classed.select(
        "*", h_toks.alias("h_toks"), p_toks.alias("p_toks"))

    roots = classed.where(F.size("h_toks") > 0).select(
        "url",
        F.col("pre_ord").alias("r_ord"),
        F.col("subtree_end").alias("r_end"),
        F.array_join("h_toks", " ").alias("item_types"),
    )
    w_items = Window.partitionBy("url").orderBy("r_ord")
    roots = roots.withColumn(
        "item_idx", (F.row_number().over(w_items) - 1).cast("int"))

    u_resolved = (
        (F.col("tag").isin(*_URL_TAGS) & F.col("href").isNotNull())
        | F.col("src").isNotNull()
    )
    props = classed.where(F.size("p_toks") > 0).select(
        "url",
        F.col("pre_ord").alias("p_ord"),
        F.col("subtree_end").alias("p_end"),
        "tag", "p_toks", "href", "src", "datetime",
        (F.size("h_toks") > 0).alias("is_nested"),
        u_resolved.alias("u_resolved"),
    )
    needs_text = ~F.col("is_nested") & F.exists(
        F.col("p_toks"),
        lambda t: (
            t.startswith("p-") | t.startswith("e-")
            | (t.startswith("u-") & ~F.col("u_resolved"))
            | (t.startswith("dt-") & F.col("datetime").isNull())
        ),
    )
    props = props.withColumn("needs_text", needs_text)

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    need = props.where(F.col("needs_text"))
    stext = (
        need.join(
            texts,
            (need["url"] == texts["t_url"])
            & (texts["t_ord"] > need["p_ord"])
            & (texts["t_ord"] <= need["p_end"]),
            "left",
        )
        .groupBy("url", "p_ord")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("t_ord", "t_text"))),
                    lambda s: s["t_text"],
                ),
                "",
            ).alias("subtree_text")
        )
    )
    props = props.join(stext, ["url", "p_ord"], "left")

    owned = (
        props.join(
            roots,
            (props["url"] == roots["url"])
            & (roots["r_ord"] < props["p_ord"])
            & (props["p_ord"] <= roots["r_end"]),
        )
        .drop(roots["url"])
        .groupBy("url", "p_ord")
        .agg(
            F.max(F.struct("r_ord", "item_idx", "item_types"))
            .alias("owner"),
            F.first("p_toks").alias("p_toks"),
            F.first("tag").alias("tag"),
            F.first("href").alias("href"),
            F.first("src").alias("src"),
            F.first("datetime").alias("datetime"),
            F.first("is_nested").alias("is_nested"),
            F.first("subtree_text").alias("subtree_text"),
        )
    )

    nested = roots.select(
        "url",
        F.col("r_ord").alias("p_ord"),
        F.col("item_idx").alias("nested_item"),
    )
    kind = F.substring_index(F.col("prop_tok"), "-", 1)
    link_href = F.when(F.col("tag").isin(*_URL_TAGS), F.col("href"))
    value = (
        F.when(kind == "u",
               F.coalesce(link_href, "src", "subtree_text", F.lit("")))
        .when(kind == "dt",
              F.coalesce("datetime", "subtree_text", F.lit("")))
        .otherwise(F.coalesce("subtree_text", F.lit("")))
    )
    rows = (
        owned.join(nested, ["url", "p_ord"], "left")
        .select(
            "url", "p_ord", "tag", "href", "src", "datetime",
            "subtree_text",
            F.col("owner")["item_idx"].alias("item_idx"),
            F.col("owner")["item_types"].alias("item_types"),
            F.posexplode("p_toks").alias("tok_pos", "prop_tok"),
            "is_nested",
            F.when(F.col("is_nested"), F.col("nested_item"))
            .cast("int").alias("nested_item"),
        )
        .select(
            "url", "p_ord", "tok_pos", "item_idx", "item_types",
            kind.alias("prop_kind"),
            F.expr("substring(prop_tok, length(substring_index("
                   "prop_tok, '-', 1)) + 2)").alias("prop_name"),
            F.when(F.col("is_nested"), F.lit(None).cast("string"))
            .otherwise(value).alias("value"),
            "nested_item",
        )
    )
    w_props = Window.partitionBy("url", "item_idx").orderBy(
        "p_ord", "tok_pos")
    return rows.select(
        "url", "item_idx", "item_types", "prop_kind", "prop_name",
        (F.row_number().over(w_props) - 1).cast("int").alias("prop_pos"),
        "value", "nested_item",
    )
