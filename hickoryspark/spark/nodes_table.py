"""mapInPandas parse → flat node table ("shredded DOM", SURVEY.md §1.4(2)).

Each page's HTML is parsed once by the from-scratch HTML5 parser
(hickoryspark.html) and exploded into one row per hickory node with
pre-order interval labels: node B is a descendant of A iff
``A.pre_ord < B.pre_ord <= A.subtree_end`` — the boundary the reference
computes in ``after-subtree`` (/root/reference/src/cljc/hickory/
select.cljc:101-113). Every hickory selector then becomes a relational
predicate / window / join over this table (see selectors_rel.py).

Scale notes: the explode is embarrassingly parallel (one page → its
own rows, no shuffle); downstream structural joins are *url-local*, so
at cluster scale the table should be written bucketed by ``url`` to
make every selector join a co-partitioned (shuffle-free) join. Arrow
batches carry ~128 pages (session.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from hickoryspark.html.charset import decode_html
from hickoryspark.html.core import parse, as_hickory
from hickoryspark.nodes import Doc, flatten, TYPE_ELEMENT

NODES_SCHEMA = (
    "url string, node_id int, parent_id int, pre_ord int, subtree_end int, "
    "sib_pos int, elem_sib_pos int, n_elems_left int, depth int, type tinyint, tag string, "
    "attrs map<string,string>, text string, "
    "parent_type tinyint, parent_tag string, n_elem_sibs int"
)

_COLS = [
    "url", "node_id", "parent_id", "pre_ord", "subtree_end", "sib_pos",
    "elem_sib_pos", "n_elems_left", "depth", "type", "tag", "attrs", "text",
    "parent_type", "parent_tag", "n_elem_sibs",
]


def doc_rows(url: str, doc: Doc) -> dict[str, list]:
    """Column lists for one parsed document (pre_ord == node_id)."""
    n = doc.n
    par = doc.parent.tolist()
    types = doc.types.tolist()
    tags = doc.tags
    nelem = doc.n_elem_children.tolist()
    out: dict[str, list] = {}
    out["url"] = [url] * n
    out["node_id"] = list(range(n))
    out["parent_id"] = par
    out["pre_ord"] = out["node_id"]
    out["subtree_end"] = doc.subtree_end.tolist()
    out["sib_pos"] = doc.sib_pos.tolist()
    out["elem_sib_pos"] = doc.elem_sib_pos.tolist()
    out["n_elems_left"] = doc.n_elems_left.tolist()
    out["depth"] = doc.depth.tolist()
    out["type"] = types
    out["tag"] = list(tags)
    out["attrs"] = list(doc.attrs)
    out["text"] = list(doc.texts)
    out["parent_type"] = [types[p] if p >= 0 else None for p in par]
    out["parent_tag"] = [tags[p] if p >= 0 else None for p in par]
    out["n_elem_sibs"] = [nelem[p] if p >= 0 else 0 for p in par]
    return out


def _parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {c: [] for c in _COLS}
    for url, html in zip(batch["url"], batch["html"]):
        try:
            if html is None:
                html = ""
            elif isinstance(html, (bytes, bytearray, memoryview)):
                html = decode_html(html)  # BOM/meta sniff + cp1252 fallback
            doc = flatten(as_hickory(parse(html)))
        except Exception:
            # keep the job alive (mirror extract_batch): a failed page
            # contributes a lone DOCUMENT row so it stays countable
            # downstream instead of silently vanishing
            doc = flatten({"type": "document", "content": None})
        rows = doc_rows(url, doc)
        for c in _COLS:
            cols[c].extend(rows[c])
    return pd.DataFrame(cols)


def explode_nodes(pages_df):
    """pages(url, html, ...) → node table DataFrame.

    Column-prunes to (url, html) before the Python exchange so the Arrow
    transfer never carries unused page columns.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _parse_batch(b)

    return pages_df.select("url", "html").mapInPandas(gen, NODES_SCHEMA)


def materialize_nodes(pages_df, path: str, num_buckets: int = 256):
    """Parse once, query many: write the exploded node table bucketed
    by ``url`` so every structural selector join/window over it is
    co-partitioned (no shuffle at query time).

    Bucketing via saveAsTable needs a metastore; the portable
    equivalent used here is hash-repartition on url + sortWithinPartitions
    (url, pre_ord) — readers get url-clustered, document-ordered row
    groups, and AQE-era Spark still avoids wide shuffles for url-keyed
    joins between tables written with the same layout. At design scale
    on Iceberg, declare ``bucket(url, N)`` partitioning instead and the
    co-location is metadata-enforced.
    """
    nodes = explode_nodes(pages_df)
    (
        nodes.repartition(num_buckets, "url")
        .sortWithinPartitions("url", "pre_ord")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
