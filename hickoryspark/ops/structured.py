"""Structured-data extraction — schema.org JSON-LD blocks.

The structured-annotation complement to ops/metadata.py: every
``<script type="application/ld+json">`` block on a page becomes one
row carrying the raw JSON payload, a validity flag, and caller-chosen
fields pulled out with JSONPath — the inputs an entity-extraction or
knowledge-graph pipeline reads (articles, products, breadcrumbs)
without touching page markup.

Spark-first shape: script elements and their rawtext payloads are both
plain rows of the exploded node table (spark/nodes_table.py — the
parse already happened once), so this is a url-local equi-join between
the ``<script>`` element rows (which carry the ``type`` attr) and
their text children, plus ONE url window for the per-page block index.
Field extraction is ``get_json_object`` — JVM-side Jackson, no Python
anywhere in the operator, and malformed JSON degrades to NULL fields
(never a task failure; untrusted web input). At cluster scale with the
node table bucketed by url both the join and the window are
co-partitioned.

Semantics (fixed so oracles can reproduce them):

- A block row is emitted per ld+json script element WITH a text child;
  an empty ``<script ...></script>`` has nothing to parse and yields
  no row. The WHATWG tokenizer's rawtext rule guarantees at most one
  text child per script.
- ``type`` matching: attribute value ASCII-lowercased and trimmed of
  ASCII whitespace must equal ``application/ld+json`` exactly (no MIME
  parameter parsing — a parameterized type is not matched).
- ``script_pos``: 0-based document-order index among the page's
  MATCHED blocks.
- ``is_valid``: whether the payload parses as JSON (the root ``$``
  probe); invalid payloads keep their raw text and NULL fields.
- Field paths use ``get_json_object`` syntax — bracket form for keys
  with special characters (``$['@type']``), dotted for nesting
  (``$.author.name``), ``[i]`` for arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

JSONLD_MIME = "application/ld+json"

#: ASCII whitespace trim set (HTML attribute values; NOT Unicode .strip())
_ASCII_WS_CHARS = " \t\n\x0b\f\r"

#: the schema.org fields most pipelines read; gate queries and callers
#: can pass their own {column: jsonpath} map
DEFAULT_JSONLD_FIELDS = {
    "jsonld_type": "$['@type']",
    "name": "$.name",
    "headline": "$.headline",
    "author_name": "$.author.name",
    "date_published": "$.datePublished",
}


#: HTML microdata value source per element tag (spec §5.2.4 "property
#: value"): these tags read an ATTRIBUTE; every other tag reads the
#: element's subtree text. ``time`` falls back to subtree text when
#: its ``datetime`` attribute is absent.
_MD_ATTR_TAGS = {
    "meta": "content",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
    "a": "href", "area": "href", "link": "href",
    "object": "data",
    "data": "value", "meter": "value",
}


def extract_microdata(nodes: DataFrame) -> DataFrame:
    """HTML microdata (itemscope/itemprop) → flat property rows:
    ``(url, item_idx, itemtype, prop_name, prop_pos, prop_value,
    nested_item)``.

    The markup-annotation complement to ``extract_jsonld`` — the other
    way schema.org entities ship on real pages. Semantics pinned for
    the oracles:

    - an ITEM is any element carrying ``itemscope`` (presence test —
      the attribute is valueless); ``item_idx`` is its 0-based
      document-order index within the page; ``itemtype`` is the
      ``itemtype`` attribute verbatim (NULL when absent);
    - a PROPERTY is any element carrying ``itemprop``; the attribute
      splits on ASCII whitespace into one row per token (an
      ``itemprop=""`` yields no rows); each property belongs to its
      NEAREST ancestor item (strictly containing — an element with
      both attributes is a property of the item above it, never of
      itself); properties outside every item are dropped (``itemref``
      indirection is out of scope, recorded in COVERAGE.md);
    - ``prop_pos``: 0-based (document order, then token order) index
      among the owning item's property rows;
    - ``prop_value``: per the spec's tag table (``meta``→content,
      media tags→src, ``a``/``area``/``link``→href, ``object``→data,
      ``data``/``meter``→value, ``time``→datetime with subtree-text
      fallback, everything else→subtree text, i.e. all descendant
      text nodes concatenated in document order); a missing value
      attribute reads as ``''`` (spec), never NULL;
    - a property that is itself an item (``itemscope`` + ``itemprop``)
      gets ``prop_value`` NULL and ``nested_item`` = its own
      ``item_idx`` (the structural edge a KG loader follows).

    Spark shape: every join and window is url-local — item indexing is
    one url window; ownership is a url-equi join with the
    ``pre_ord``/``subtree_end`` interval residual (the descendant_rel
    pattern) reduced by ``max(struct(...))`` to the nearest ancestor;
    subtree text is the same interval join against text rows,
    restricted to the properties whose tag actually reads text. With
    the node table bucketed by url all of it is co-partitioned.
    """
    elems = nodes.where(F.col("type") == TYPE_ELEMENT)
    a = F.col("attrs")
    items = elems.where(a["itemscope"].isNotNull()).select(
        "url",
        F.col("pre_ord").alias("i_ord"),
        F.col("subtree_end").alias("i_end"),
        a["itemtype"].alias("itemtype"),
    )
    w_items = Window.partitionBy("url").orderBy("i_ord")
    items = items.withColumn(
        "item_idx", (F.row_number().over(w_items) - 1).cast("int")
    )

    # <time> reads its datetime attr WITHOUT the ''-coalesce: when the
    # attr is absent the NULL falls through to the subtree-text branch
    attr_val = F.when(F.col("tag") == "time", a["datetime"]).otherwise(
        F.lit(None).cast("string")
    )
    for tag, attr in _MD_ATTR_TAGS.items():
        attr_val = F.when(F.col("tag") == tag,
                          F.coalesce(a[attr], F.lit(""))).otherwise(attr_val)
    props = elems.where(a["itemprop"].isNotNull()).select(
        "url",
        F.col("pre_ord").alias("p_ord"),
        F.col("subtree_end").alias("p_end"),
        a["itemprop"].alias("itemprop"),
        a["itemscope"].isNotNull().alias("is_nested"),
        attr_val.alias("attr_value"),
        # subtree text is needed unless an attribute fully determines
        # the value: nested items are NULL, attr tags read the attr;
        # <time> keeps the text join alive for its missing-datetime
        # fallback
        (
            a["itemscope"].isNull()
            & ~F.col("tag").isin(*_MD_ATTR_TAGS)
        ).alias("needs_text"),
    )

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

    # nearest strictly-containing item: max i_ord among ancestors
    owned = (
        props.join(
            items,
            (props["url"] == items["url"])
            & (items["i_ord"] < props["p_ord"])
            & (props["p_ord"] <= items["i_end"]),
        )
        .drop(items["url"])
        .groupBy("url", "p_ord")
        .agg(
            F.max(F.struct("i_ord", "item_idx", "itemtype")).alias("owner"),
            F.first("itemprop").alias("itemprop"),
            F.first("is_nested").alias("is_nested"),
            F.first("attr_value").alias("attr_value"),
            F.first("subtree_text").alias("subtree_text"),
        )
    )

    nested = items.select(
        "url",
        F.col("i_ord").alias("p_ord"),
        F.col("item_idx").alias("nested_item"),
    )
    rows = (
        owned.join(nested, ["url", "p_ord"], "left")
        .select(
            "url",
            "p_ord",
            F.col("owner")["item_idx"].alias("item_idx"),
            F.col("owner")["itemtype"].alias("itemtype"),
            F.posexplode(
                F.filter(
                    F.split(F.col("itemprop"), ASCII_WS_RE),
                    lambda t: t != "",
                )
            ).alias("tok_pos", "prop_name"),
            F.when(F.col("is_nested"), F.lit(None).cast("string"))
            .otherwise(
                F.coalesce("attr_value", "subtree_text", F.lit(""))
            )
            .alias("prop_value"),
            F.when(F.col("is_nested"), F.col("nested_item"))
            .cast("int")
            .alias("nested_item"),
        )
    )
    w_props = Window.partitionBy("url", "item_idx").orderBy(
        "p_ord", "tok_pos"
    )
    return rows.select(
        "url", "item_idx", "itemtype", "prop_name",
        (F.row_number().over(w_props) - 1).cast("int").alias("prop_pos"),
        "prop_value", "nested_item",
    )


def extract_jsonld(
    nodes: DataFrame, fields: dict[str, str] | None = None
) -> DataFrame:
    """node table → (url, script_pos, is_valid, raw_json, <fields...>).

    One url-local equi-join (script element ↔ its text child) + one
    url window; all expression work is JVM-side.
    """
    if fields is None:
        fields = DEFAULT_JSONLD_FIELDS
    a = F.col("attrs")
    scripts = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & (F.col("tag") == "script")
        & (
            F.lower(F.btrim(F.coalesce(a["type"], F.lit("")), F.lit(_ASCII_WS_CHARS)))
            == JSONLD_MIME
        )
    ).select("url", F.col("node_id").alias("script_id"), "pre_ord")
    payloads = nodes.where(
        (F.col("type") == TYPE_TEXT)
        & (F.col("parent_type") == TYPE_ELEMENT)
        & (F.col("parent_tag") == "script")
    ).select("url", F.col("parent_id").alias("script_id"),
             F.col("text").alias("raw_json"))

    blocks = scripts.join(payloads, ["url", "script_id"])
    w = Window.partitionBy("url").orderBy("pre_ord")
    return blocks.select(
        "url",
        (F.row_number().over(w) - 1).cast("int").alias("script_pos"),
        F.get_json_object("raw_json", "$").isNotNull().alias("is_valid"),
        "raw_json",
        *[
            F.get_json_object("raw_json", path).alias(col)
            for col, path in fields.items()
        ],
    )


def extract_rdfa(nodes: DataFrame) -> DataFrame:
    """RDFa Lite (typeof/property/vocab) → flat property rows:
    ``(url, subject_idx, rdf_type, vocab, prop_name, prop_pos,
    prop_value, nested_subject)`` — the third structured-data carrier
    next to :func:`extract_microdata` and :func:`extract_jsonld`.

    Pinned RDFa-Lite subset (oracle-reproducible; CURIE/prefix
    resolution and document-level subjects are out of scope, tokens
    kept verbatim — recorded in COVERAGE.md):

    - a SUBJECT is any element carrying ``typeof`` (presence test);
      ``subject_idx`` is its 0-based document-order index on the
      page; ``rdf_type`` is the attribute verbatim;
    - ``vocab``: the value of the NEAREST ancestor-or-self element
      with a non-empty (post-ASCII-trim) ``vocab`` attribute, NULL
      when none — the Lite inheritance rule;
    - a PROPERTY is any element carrying ``property``; the attribute
      splits on ASCII whitespace into one row per token; ownership is
      the NEAREST STRICTLY-CONTAINING subject (an element with both
      ``typeof`` and ``property`` is — per RDFa chaining — a property
      of the subject ABOVE it whose value is its own subject:
      ``prop_value`` NULL, ``nested_subject`` = its ``subject_idx``);
      properties outside every subject are dropped;
    - ``prop_value`` precedence (the Lite processing order):
      ``@content`` if present, else ``@href``, else ``@src``, else
      subtree text (all descendant text nodes in document order);
    - ``prop_pos``: 0-based (document order, token order) index among
      the owning subject's property rows.

    Spark shape: identical to extract_microdata — url-local interval
    joins (vocab inheritance + subject ownership + subtree text) and
    one url window; co-partitioned end-to-end on a url-bucketed node
    table.
    """
    elems = nodes.where(F.col("type") == TYPE_ELEMENT)
    a = F.col("attrs")
    subjects = elems.where(a["typeof"].isNotNull()).select(
        "url",
        F.col("pre_ord").alias("s_ord"),
        F.col("subtree_end").alias("s_end"),
        a["typeof"].alias("rdf_type"),
    )
    w_subj = Window.partitionBy("url").orderBy("s_ord")
    subjects = subjects.withColumn(
        "subject_idx", (F.row_number().over(w_subj) - 1).cast("int")
    )

    vtrim = F.regexp_replace(
        F.regexp_replace(a["vocab"], r"\A[ \t\n\x0b\f\r]+", ""),
        r"[ \t\n\x0b\f\r]+\z", "",
    )
    vocabs = elems.where(
        a["vocab"].isNotNull() & (vtrim != "")
    ).select(
        F.col("url").alias("v_url"),
        F.col("pre_ord").alias("v_ord"),
        F.col("subtree_end").alias("v_end"),
        vtrim.alias("vocab"),
    )
    # ancestor-OR-SELF: v_ord <= s_ord (a subject element may carry
    # its own vocab), nearest = max v_ord
    subj_v = (
        subjects.join(
            vocabs,
            (subjects["url"] == vocabs["v_url"])
            & (vocabs["v_ord"] <= subjects["s_ord"])
            & (subjects["s_ord"] <= vocabs["v_end"]),
            "left",
        )
        .groupBy("url", "s_ord")
        .agg(
            F.first("s_end").alias("s_end"),
            F.first("rdf_type").alias("rdf_type"),
            F.first("subject_idx").alias("subject_idx"),
            F.max(F.struct("v_ord", "vocab"))["vocab"].alias("vocab"),
        )
    )

    props = elems.where(a["property"].isNotNull()).select(
        "url",
        F.col("pre_ord").alias("p_ord"),
        F.col("subtree_end").alias("p_end"),
        a["property"].alias("property"),
        a["typeof"].isNotNull().alias("is_nested"),
        F.coalesce(a["content"], a["href"], a["src"]).alias("attr_value"),
        (
            a["typeof"].isNull()
            & a["content"].isNull()
            & a["href"].isNull()
            & a["src"].isNull()
        ).alias("needs_text"),
    )

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
            subj_v,
            (props["url"] == subj_v["url"])
            & (subj_v["s_ord"] < props["p_ord"])
            & (props["p_ord"] <= subj_v["s_end"]),
        )
        .drop(subj_v["url"])
        .groupBy("url", "p_ord")
        .agg(
            F.max(
                F.struct("s_ord", "subject_idx", "rdf_type", "vocab")
            ).alias("owner"),
            F.first("property").alias("property"),
            F.first("is_nested").alias("is_nested"),
            F.first("attr_value").alias("attr_value"),
            F.first("subtree_text").alias("subtree_text"),
        )
    )

    nested = subjects.select(
        "url",
        F.col("s_ord").alias("p_ord"),
        F.col("subject_idx").alias("nested_subject"),
    )
    rows = (
        owned.join(nested, ["url", "p_ord"], "left")
        .select(
            "url",
            "p_ord",
            F.col("owner")["subject_idx"].alias("subject_idx"),
            F.col("owner")["rdf_type"].alias("rdf_type"),
            F.col("owner")["vocab"].alias("vocab"),
            F.posexplode(
                F.filter(
                    F.split(F.col("property"), ASCII_WS_RE),
                    lambda t: t != "",
                )
            ).alias("tok_pos", "prop_name"),
            F.when(F.col("is_nested"), F.lit(None).cast("string"))
            .otherwise(
                F.coalesce("attr_value", "subtree_text", F.lit(""))
            )
            .alias("prop_value"),
            F.when(F.col("is_nested"), F.col("nested_subject"))
            .cast("int")
            .alias("nested_subject"),
        )
    )
    w_props = Window.partitionBy("url", "subject_idx").orderBy(
        "p_ord", "tok_pos"
    )
    return rows.select(
        "url", "subject_idx", "rdf_type", "vocab", "prop_name",
        (F.row_number().over(w_props) - 1).cast("int").alias("prop_pos"),
        "prop_value", "nested_subject",
    )


#: the JSON-LD fields structured_union unpivots into property rows
#: (jsonld_type becomes the entity type, not a property)
_UNION_JSONLD_PROPS = ["name", "headline", "author_name",
                       "date_published"]


def structured_union(nodes: DataFrame) -> DataFrame:
    """All three structured-data carriers in ONE schema:
    ``(url, carrier, entity_idx, entity_type, prop_name, prop_pos,
    prop_value)`` — the KG-loader view (schema.org entities regardless
    of how the page shipped them).

    Pinned mapping:

    - microdata: entity = item (``item_idx``/``itemtype``); property
      rows as :func:`extract_microdata` emits them (nested-item edge
      rows keep prop_value NULL);
    - rdfa: entity = subject (``subject_idx``/``rdf_type``); same;
    - jsonld: entity = VALID script block (``script_pos``; type =
      the block's ``@type``); properties are the non-NULL extracted
      default fields (name, headline, author_name, date_published)
      in that order, ``prop_pos`` re-based over the kept ones;
      invalid blocks contribute no rows.

    Three independent url-local programs unioned by name — no new
    shuffle beyond what the carriers already do.
    """
    md = extract_microdata(nodes).select(
        "url", F.lit("microdata").alias("carrier"),
        F.col("item_idx").cast("long").alias("entity_idx"),
        F.col("itemtype").alias("entity_type"),
        "prop_name", F.col("prop_pos").cast("long").alias("prop_pos"),
        "prop_value",
    )
    rd = extract_rdfa(nodes).select(
        "url", F.lit("rdfa").alias("carrier"),
        F.col("subject_idx").cast("long").alias("entity_idx"),
        F.col("rdf_type").alias("entity_type"),
        "prop_name", F.col("prop_pos").cast("long").alias("prop_pos"),
        "prop_value",
    )
    pairs = F.filter(
        F.array(*[
            F.struct(F.lit(p).alias("n"), F.col(p).alias("v"))
            for p in _UNION_JSONLD_PROPS
        ]),
        lambda s: s["v"].isNotNull(),
    )
    jl = (
        extract_jsonld(nodes).where(F.col("is_valid"))
        .select(
            "url", F.lit("jsonld").alias("carrier"),
            F.col("script_pos").cast("long").alias("entity_idx"),
            F.col("jsonld_type").alias("entity_type"),
            F.posexplode(pairs).alias("prop_pos", "_p"),
        )
        .select(
            "url", "carrier", "entity_idx", "entity_type",
            F.col("_p.n").alias("prop_name"),
            F.col("prop_pos").cast("long").alias("prop_pos"),
            F.col("_p.v").alias("prop_value"),
        )
    )
    return md.unionByName(rd).unionByName(jl)
