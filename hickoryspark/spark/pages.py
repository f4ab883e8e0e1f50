"""Deterministic synthetic ``pages`` table + its DuckDB mirror.

The driver mandates the input relation
``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING)`` (BASELINE.json ``input_hint``). No pages parquet is
shipped, so we synthesize it — with **pure Spark built-ins, no UDF** —
from the driver's ``documents`` table (`/root/testdata/sf*/
documents.parquet`). Because the generation is a closed-form SQL
expression, the exact same construction is mirrored in DuckDB SQL
(``DUCKDB_PAGES_CTE``), which gives every downstream query an
independent oracle: the oracle re-derives the expected answer from the
generation parameters without ever parsing HTML.

Page template (single line, no inter-tag whitespace, parser-canonical
so that ``render(parse(html)) == html`` byte-for-byte):

    <!DOCTYPE html><html><head><title>doc{id}</title>
    <meta charset="utf-8"></head><body><!--nav-->
    [PRE_BLOCK[variant]  — adversarial boilerplate, see below]
    <div id="main" class="content article"><h1 class="headline">{source}</h1>
    <p class="para">{chunk_1}</p> ... <p class="para">{chunk_np}</p>
    [<a href="https://ex.test/{id}" class="ref">more</a>  if doc_id even]
    </div><div class="footer boilerplate"><p class="fine">copyright {source}</p>
    <a href="/x/../about">about</a></div>
    [POST_BLOCK[variant]]</body></html>

Round 5 adds dot-segment hrefs (the footer '/x/../about' everywhere,
variant 2's path-relative '../m3') and nested anchor markup (variant
3's l5 anchor holds 'l<b>5</b>'), exercising RFC 3986 folding and
direct-vs-subtree anchor text through the link extractor. These are
attribute/inline changes chosen so ONLY variant-3 node counts shift
(+1 element, +1 text) — the per-variant oracle deltas were re-derived
and are enforced by tools/independent_oracle_check.py.

Generation parameters (all derivable from scalar columns):
  np       = n_chars % 5 + 2          (number of <p class="para"> blocks)
  has_link = doc_id % 2 == 0
  variant  = doc_id % 4               (adversarial boilerplate mix)
  chunk_i  = tokens[ (i-1)*ntok//np + 1 .. i*ntok//np ]  (1-based, space-joined)

Adversarial template variants (constant strings — NAV_TABLE / NAV_TREE
/ LINK_FOOTER below — shared verbatim with the DuckDB mirror, so both
sides stay byte-identical by construction):
  variant 0: the plain page (no extra blocks)
  variant 1: nested-table boilerplate nav before div#main (exercises
             the WHATWG table-in-cell nesting path)
  variant 2: deep <ul><li> nav tree before div#main (depth 13 chains)
  variant 3: link-dense footer div appended after the normal footer

Every variant block is prunable boilerplate for the extractor
(class nav / class menu are PRUNE_CLASSES; the link footer's text is
100% anchor text, scoring 0), so the north-rule extraction contract
``main_text == source || ' ' || text`` holds over the mixed corpus.
Blocks use single-attribute elements only, so the hiccup render
(sorted attrs) equals the hickory render on them and the
convert_hiccup_render oracle keeps its two fixed rewrites.

Chunks partition the token list in order, so the concatenation of the
paragraph texts joined with single spaces is byte-identical to
``documents.text`` — the extraction byte-identity contract
(BASELINE.json north_rule) becomes oracle-checkable as
``source || ' ' || text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: epoch seconds of 2025-07-25T00:00:00Z — fixed warc_ts base (FIXTURES.md A)
WARC_TS_BASE = 1753401600

#: variant 1 — nested-table nav (a <table> inside a <td>, the WHATWG
#: in-cell nesting case; explicit <tbody> keeps it parser-canonical)
NAV_TABLE = (
    '<div class="nav"><table><tbody><tr><td><table><tbody><tr><td>'
    '<a href="/t1">t1</a></td></tr></tbody></table></td><td>'
    '<a href="/t2">t2</a></td></tr></tbody></table></div>'
)
#: variant 2 — deep nav tree (3-level nested list, max node depth 10);
#: m3 is PATH-RELATIVE with a dot-segment (round-5: '../' hrefs are
#: everywhere on the real web — resolve_href must fold it, so the
#: resolved edge is source-independent: https://ex.test/m3)
NAV_TREE = (
    '<ul class="menu"><li><a href="/m1">m1</a><ul><li><a href="/m2">m2</a>'
    '<ul><li><a href="../m3">m3</a></li></ul></li></ul></li></ul>'
)
#: variant 3 — link-dense footer (unpruned div candidate whose text is
#: 100% anchor text → extraction score 0 — in_anchor propagates through
#: the nested <b>, so l5's markup child stays link text); the nested
#: markup makes direct vs subtree anchor text observable ('l' vs 'l5')
LINK_FOOTER = (
    '<div class="links footer2"><a href="/l1">l1</a><a href="/l2">l2</a>'
    '<a href="/l3">l3</a><a href="/l4">l4</a><a href="/l5">l<b>5</b></a></div>'
)

#: (pre_main, post_footer) block per variant — index with doc_id % 4
VARIANT_BLOCKS: list[tuple[str, str]] = [
    ("", ""),
    (NAV_TABLE, ""),
    (NAV_TREE, ""),
    ("", LINK_FOOTER),
]


def _chunk(toks: Column, ntok: Column, np_: Column, i: Column) -> Column:
    """Tokens of paragraph i (1-based), space-joined.

    Integer arithmetic via floor() is exact here: products are < 2^40,
    far inside float64's exact-integer range.
    """
    lo = F.floor(((i - 1) * ntok) / np_).cast("int")  # 0-based exclusive start
    hi = F.floor((i * ntok) / np_).cast("int")
    return F.array_join(F.slice(toks, lo + 1, hi - lo), " ")


def pages_from_documents(documents: DataFrame, with_params: bool = False) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages DataFrame.

    Pure built-in expressions: Catalyst folds the whole construction
    into one projection over the parquet scan (no shuffle, no UDF).
    ``with_params`` additionally keeps (doc_id, np, has_link, n_chars)
    for tests.
    """
    toks = F.split(F.col("text"), " ")
    ntok = F.size(toks)
    np_ = (F.col("n_chars") % 5 + 2).cast("int")
    has_link = F.col("doc_id") % 2 == 0
    variant = (F.col("doc_id") % 4).cast("int")
    pre_block = F.element_at(
        F.array(*[F.lit(pre) for pre, _ in VARIANT_BLOCKS]), variant + 1
    )
    post_block = F.element_at(
        F.array(*[F.lit(post) for _, post in VARIANT_BLOCKS]), variant + 1
    )
    paras = F.array_join(
        F.transform(
            F.sequence(F.lit(1), np_),
            lambda i: F.concat(
                F.lit('<p class="para">'), _chunk(toks, ntok, np_, i), F.lit("</p>")
            ),
        ),
        "",
    )
    link = F.when(
        has_link,
        F.concat(
            F.lit('<a href="https://ex.test/'),
            F.col("doc_id"),
            F.lit('" class="ref">more</a>'),
        ),
    ).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>doc"),
        F.col("doc_id"),
        F.lit('</title><meta charset="utf-8"></head><body><!--nav-->'),
        pre_block,
        F.lit('<div id="main" class="content article"><h1 class="headline">'),
        F.col("source"),
        F.lit("</h1>"),
        paras,
        link,
        F.lit('</div><div class="footer boilerplate"><p class="fine">copyright '),
        F.col("source"),
        F.lit('</p><a href="/x/../about">about</a></div>'),
        post_block,
        F.lit("</body></html>"),
    )
    cols = [
        F.concat(F.lit("https://ex.test/"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(WARC_TS_BASE) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang").alias("lang"),
    ]
    if with_params:
        cols += [
            F.col("doc_id"),
            np_.alias("np"),
            has_link.alias("has_link"),
            variant.alias("variant"),
            F.col("n_chars"),
        ]
    return documents.select(*cols)


#: DuckDB CTE mirroring the generation, for oracle SQL. Exposes per-doc
#: generation parameters + the reconstructed html string + chunk list.
#: ``documents`` is a pre-registered view in the driver's DuckDB. The
#: variant blocks are interpolated from the SAME Python constants the
#: Spark generator uses, so the two sides cannot drift.
DUCKDB_PAGES_CTE = f"""
WITH gen AS (
  SELECT doc_id,
         'https://ex.test/' || source || '/' || doc_id AS url,
         source, text, lang, n_chars,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS ntok,
         (n_chars % 5 + 2)::INT AS np,
         (doc_id % 2 = 0) AS has_link,
         (doc_id % 4)::INT AS variant
  FROM documents
), pages AS (
  SELECT *,
         list_transform(range(1, np + 1),
           i -> array_to_string(
                  list_slice(toks, ((i-1)*ntok)//np + 1, (i*ntok)//np), ' ')
         ) AS chunks,
         '<!DOCTYPE html><html><head><title>doc' || doc_id ||
         '</title><meta charset="utf-8"></head><body><!--nav-->' ||
         (['', '{NAV_TABLE}', '{NAV_TREE}', ''])[variant + 1] ||
         '<div id="main" class="content article"><h1 class="headline">' ||
         source || '</h1>' ||
         array_to_string(list_transform(range(1, np + 1),
           i -> '<p class="para">' || array_to_string(
                  list_slice(toks, ((i-1)*ntok)//np + 1, (i*ntok)//np), ' ')
                || '</p>'), '') ||
         CASE WHEN has_link
              THEN '<a href="https://ex.test/' || doc_id || '" class="ref">more</a>'
              ELSE '' END ||
         '</div><div class="footer boilerplate"><p class="fine">copyright ' ||
         source || '</p><a href="/x/../about">about</a></div>' ||
         (['', '', '', '{LINK_FOOTER}'])[variant + 1] ||
         '</body></html>' AS html
  FROM gen
)
"""


def spread_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose source has fewer splits
    than the session's parallelism (guide §2.5 "input skew": the sf
    parquet inputs are ONE file = one partition, so every narrow
    pipeline over them — page synthesis, tokenize+minhash, mapInPandas
    scoring — otherwise runs single-core). Scale-adaptive: a properly
    split table (>= parallelism splits, the 100 TB case) passes
    through untouched, so this never *adds* a shuffle at design scale.
    Round-robin is deterministic under retry (sortBeforeRepartition is
    on by default) and value-neutral: no operator downstream of a
    documents/pages scan depends on partition placement or intra-
    partition order (verified by the full oracle parity sweep).

    Caveat (known, accepted): the probe reads the PRE-AQE partition
    count, so a COMPUTED frame ending in a shuffle reports the static
    shuffle-partition count and no-ops here even though AQE may
    coalesce that exchange at runtime — i.e. this helper reliably
    fixes under-parallel *file scans* (its purpose); computed inputs
    keep their r5 behavior. The .rdd probe costs one plan conversion
    per call (no job)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_documents(spark, sf_dir: str) -> DataFrame:
    return spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def load_pages(spark, sf_dir: str, with_params: bool = False) -> DataFrame:
    return pages_from_documents(load_documents(spark, sf_dir), with_params=with_params)
