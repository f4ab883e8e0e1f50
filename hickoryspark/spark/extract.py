"""Main-content extraction (boilerplate strip) — the north-star job.

Deterministic DOM heuristics per BASELINE.json north_star: tag
whitelist of candidate blocks, boilerplate pruning by tag + class
keywords, link-density-aware text scoring. The selector vocabulary is
the same algebra as hickory.select (class/tag predicates over the
flat node arrays); rendering of the extracted span reuses the byte-
exact renderer (hickoryspark.html.render, reference
/root/reference/src/cljc/hickory/render.cljc:16-63).

Algorithm (fixed, documented so the oracle can reproduce it):
1. Parse html → flat Doc (pre-order SoA arrays).
2. Prune: any element whose tag ∈ PRUNE_TAGS or whose class tokens
   intersect PRUNE_CLASSES removes its whole subtree.
3. Candidates: elements with tag ∈ BLOCK_TAGS that survive pruning.
4. Score: own_text = total length of text-node content in the
   candidate's subtree, excluding text under <a> and pruned subtrees.
5. Winner: max own_text; ties → smallest subtree; ties → first in
   document order. (The smallest-subtree tiebreak picks the most
   specific container, e.g. div#main over body.)
6. main_text = the winner's surviving non-anchor text nodes in
   pre-order, each stripped; empties dropped; joined with " ".
   main_html = hickory render of the winner subtree (unpruned).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from hickoryspark.html.charset import decode_html
from hickoryspark.html.core import parse, as_hickory
from hickoryspark.html.render import hickory_to_html
from hickoryspark.nodes import Doc, flatten, TYPE_ELEMENT, TYPE_TEXT

BLOCK_TAGS = frozenset({"div", "article", "main", "section", "body", "td"})
PRUNE_TAGS = frozenset(
    {"script", "style", "nav", "aside", "header", "footer", "noscript", "form"}
)
PRUNE_CLASSES = frozenset(
    {"footer", "boilerplate", "nav", "navbar", "sidebar", "comment", "comments",
     "advert", "ad", "banner", "menu"}
)

EXTRACT_SCHEMA = (
    "url string, main_text string, main_html string, "
    "n_nodes int, n_candidates int, main_text_len int, parse_error string"
)


def _class_tokens(attrs) -> set[str]:
    if not attrs:
        return set()
    c = attrs.get("class")
    if not c:
        return set()
    return {t for t in c.lower().split() if t}


def extract_doc(doc: Doc) -> tuple[str, str, int]:
    """Returns (main_text, main_html, n_candidates) for one parsed Doc.

    Hot path: the per-node sweeps run over plain Python lists — scalar
    indexing into NumPy arrays is ~10x slower than list indexing.
    """
    n = doc.n
    types = doc.types.tolist()
    parent = doc.parent.tolist()
    subtree_end = doc.subtree_end.tolist()
    tags = doc.tags
    texts = doc.texts

    # pruned[i]: node i or an ancestor is boilerplate. Pre-order sweep:
    # parent index < child index, so one forward pass suffices.
    pruned = [False] * n
    in_anchor = [False] * n
    for i in range(n):
        p = parent[i]
        if p >= 0:
            pruned[i] = pruned[p]
            in_anchor[i] = in_anchor[p]
        if types[i] == TYPE_ELEMENT:
            tag = tags[i]
            if not pruned[i] and (
                tag in PRUNE_TAGS or (_class_tokens(doc.attrs[i]) & PRUNE_CLASSES)
            ):
                pruned[i] = True
            if tag == "a":
                in_anchor[i] = True

    # own text length per node's subtree, excluding pruned + anchor text:
    # one reverse pre-order sweep rolls child contributions up to parents.
    own = [0] * n
    for i in range(n):
        if types[i] == TYPE_TEXT and not pruned[i] and not in_anchor[i]:
            # comment content rows are TEXT children of a comment node;
            # they are not rendered text — skip them in scoring too
            p = parent[i]
            if p >= 0 and types[p] != TYPE_ELEMENT:
                continue
            t = texts[i]
            if t:
                own[i] = len(t.strip())
    for i in range(n - 1, 0, -1):
        p = parent[i]
        if p >= 0:
            own[p] += own[i]

    best = -1
    best_key = None
    n_cand = 0
    for i in range(n):
        if types[i] != TYPE_ELEMENT or pruned[i]:
            continue
        if tags[i] not in BLOCK_TAGS:
            continue
        n_cand += 1
        key = (-own[i], subtree_end[i] - i, i)
        if best < 0 or key < best_key:
            best, best_key = i, key
    if best < 0:
        return "", "", 0

    pieces: list[str] = []
    end = subtree_end[best]
    for j in range(best, end + 1):
        if types[j] == TYPE_TEXT and not pruned[j] and not in_anchor[j]:
            # comment content rows are TEXT children of a comment node;
            # exclude them from extracted text
            p = parent[j]
            if p >= 0 and types[p] != TYPE_ELEMENT:
                continue
            t = (texts[j] or "").strip()
            if t:
                pieces.append(t)
    main_html = hickory_to_html(doc.node(best))
    return " ".join(pieces), main_html, n_cand


def extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    urls, texts, htmls, nns, ncs, lens, errs = [], [], [], [], [], [], []
    for url, html in zip(batch["url"], batch["html"]):
        urls.append(url)
        try:
            if html is None:
                html = ""  # same policy as nodes_table: empty document
            elif isinstance(html, (bytes, bytearray, memoryview)):
                html = decode_html(html)  # BOM/meta sniff + cp1252 fallback
            doc = flatten(as_hickory(parse(html)))
            mt, mh, nc = extract_doc(doc)
            texts.append(mt)
            htmls.append(mh)
            nns.append(doc.n)
            ncs.append(nc)
            lens.append(len(mt))
            errs.append(None)
        except Exception as e:  # keep the job alive; count the failure
            texts.append(None)
            htmls.append(None)
            nns.append(0)
            ncs.append(0)
            lens.append(0)
            errs.append(f"{type(e).__name__}: {e}")
    return pd.DataFrame(
        {
            "url": urls,
            "main_text": texts,
            "main_html": htmls,
            "n_nodes": nns,
            "n_candidates": ncs,
            "main_text_len": lens,
            "parse_error": errs,
        }
    )


def extract_pages(pages_df):
    """pages(url, html, ...) → extraction results, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield extract_batch(b)

    return pages_df.select("url", "html").mapInPandas(gen, EXTRACT_SCHEMA)
