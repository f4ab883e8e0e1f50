"""Code-block extraction — ``<pre>`` blocks for code training corpora.

Code-LM pipelines (The Stack, StarCoder-style) mine web pages for
fenced/preformatted code: the ``<pre>`` subtree preserves whitespace
verbatim (the tokenizer never collapses text-node content, and the
WHATWG LF-after-``<pre>`` skip is already applied at parse time,
treebuilder.py:806), so concatenating its text nodes in document
order reproduces the block's source text exactly, minus markup. The
reference engine has no equivalent op; the extraction is the same
url-local interval-join program as ``extract_links(subtree_text=
True)`` (ops/links.py).

Pinned semantics (oracle-reproducible):

- one row per ``<pre>`` element, ``block_pos`` = 1-based document
  order within its page; ``code`` = all text-node descendants joined
  in document order ('' when none). Comment data strings inside the
  block count as text — they are string children in the hickory node
  shape and walk as text nodes (the anchor-subtree rule, ops/links).
  Nested ``<pre>`` inside ``<pre>`` (tag soup) yields BOTH rows, the
  outer containing the inner's text.
- ``lang`` = the highlighter token: the FIRST ``<code>`` descendant's
  ``class`` is probed for a ``language-X`` / ``lang-X`` token (ASCII-
  whitespace token split, prefix matched case-insensitively, value
  lowercased); a first code element WITHOUT a token (even classless)
  falls back to the ``<pre>``'s own class, else NULL. "First wins"
  is positional, not "first with a token" — highlight.js puts the
  token on the one real code child, and a stray token on a LATER
  code sibling must not reattribute the block.
- ``n_lines`` = LF count + 1 ('' → 0), ``n_chars`` = char length.

Scale shape: one url repartition serves the interval join, the
aggregation, and the block_pos window (the extract_links exchange-
reuse pattern); everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["extract_code_blocks", "LANG_TOKEN_RE"]

#: first language-X / lang-X token in a class list (ASCII-ws split,
#: case-insensitive prefix); group 1 = the raw language value
LANG_TOKEN_RE = (
    r"(?i)(?:^|[ \t\n\x0B\f\r])(?:language|lang)-"
    r"([^ \t\n\x0B\f\r]+)"
)


def _lang_token(cls):
    tok = F.lower(F.regexp_extract(cls, LANG_TOKEN_RE, 1))
    return F.when(tok != "", tok)


def extract_code_blocks(
    nodes: DataFrame, pre_partitioned: bool = False
) -> DataFrame:
    """Node table -> one row per ``<pre>``:
    (url, block_pos, lang, code, n_lines, n_chars).

    ``pre_partitioned``: set True when ``nodes`` is already
    hash-partitioned/bucketed by url (materialize_nodes) — skips the
    explicit url repartition."""
    pres = nodes.where(
        (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "pre")
    ).select(
        "url",
        F.col("node_id").alias("p_id"),
        F.col("pre_ord").alias("p_ord"),
        F.col("subtree_end").alias("p_end"),
        F.col("attrs")["class"].alias("p_class"),
    )
    # ONE member relation (text nodes + code elements) -> ONE interval
    # join; a text row carries m_text, a code row carries m_class
    # (coalesced to '' so a classless first code element still wins
    # the positional min)
    members = (
        nodes.where(
            (F.col("type") == TYPE_TEXT)
            | ((F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "code"))
        )
        .select(
            F.col("url").alias("m_url"),
            F.col("pre_ord").alias("m_ord"),
            F.when(F.col("type") == TYPE_TEXT, F.col("text"))
            .alias("m_text"),
            F.when(
                F.col("type") == TYPE_ELEMENT,
                F.coalesce(F.col("attrs")["class"], F.lit("")),
            ).alias("m_class"),
        )
    )
    joined = pres.join(
        members,
        (pres["url"] == members["m_url"])
        & (members["m_ord"] > pres["p_ord"])
        & (members["m_ord"] <= pres["p_end"]),
        "left",
    )
    if not pre_partitioned:
        # one url shuffle serves the join, the per-pre aggregation
        # (url is a grouping-key prefix) and the block_pos window
        joined = joined.repartition("url")
    agg = joined.groupBy("url", "p_id", "p_ord", "p_class").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("m_text").isNotNull(),
                               F.struct("m_ord", "m_text"))
                    )
                ),
                lambda s: s["m_text"],
            ),
            "",
        ).alias("code"),
        F.min(
            F.when(F.col("m_class").isNotNull(),
                   F.struct("m_ord", "m_class"))
        )["m_class"].alias("_first_code_class"),
    )
    lang = F.coalesce(
        _lang_token(F.coalesce(F.col("_first_code_class"), F.lit(""))),
        _lang_token(F.coalesce(F.col("p_class"), F.lit(""))),
    )
    n_lines = F.when(
        F.col("code") == "", F.lit(0)
    ).otherwise(
        F.size(F.split(F.col("code"), "\n", -1))
    ).cast("long")
    w = Window.partitionBy("url").orderBy("p_ord")
    return agg.select(
        "url",
        F.row_number().over(w).cast("long").alias("block_pos"),
        lang.alias("lang"),
        "code",
        n_lines.alias("n_lines"),
        F.length("code").cast("long").alias("n_chars"),
    )


#: normalization for clone keys: per-line trailing blanks dropped,
#: leading/trailing whitespace (incl. newlines) trimmed. Java ∩ RE2
#: portable (explicit class, no $); btrim exists on both engines.
_CLONE_TRIM = " \t\n\r"


def code_clone_groups(blocks: DataFrame, min_pages: int = 2) -> DataFrame:
    """Cross-page duplicate code blocks — boilerplate snippet
    detection for code-corpus dedup (the same install command /
    license header / tracking snippet pasted across a site should be
    ONE training example, not thousands).

    Input: ``extract_code_blocks`` rows. Key = md5 of the normalized
    code (per-line trailing blanks dropped, ends trimmed). Output one
    row per clone group appearing on >= ``min_pages`` DISTINCT pages:
    ``(code_md5, n_blocks, n_pages, first_url, n_chars)`` with
    ``first_url`` the lexicographically smallest url and ``n_chars``
    the normalized length.

    Scale shape: one groupBy on the digest — group state is four
    scalars (the member list is never collected).
    """
    norm = F.expr(
        "btrim(regexp_replace(code, '[ \\t]+\\n', '\\n'), ' \\t\\n\\r')")
    keyed = blocks.select(
        F.md5(norm).alias("code_md5"),
        F.length(norm).cast("long").alias("n_chars"),
        "url",
    )
    return (
        keyed.groupBy("code_md5")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.countDistinct("url").cast("long").alias("n_pages"),
            F.min("url").alias("first_url"),
            F.min("n_chars").alias("n_chars"),
        )
        .where(F.col("n_pages") >= min_pages)
        .select("code_md5", "n_blocks", "n_pages", "first_url", "n_chars")
    )


def duckdb_clone_norm_sql(expr: str) -> str:
    """DuckDB mirror of the clone normalization (same pattern/trim)."""
    return ("trim(regexp_replace(" + expr +
            ", '[ \t]+\n', chr(10), 'g'), ' ' || chr(9) || chr(10) || "
            "chr(13))")
