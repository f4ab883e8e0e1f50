"""Independent validation of the closed-form sel_* / node-stat / zip
oracles (round-3 verdict #3: de-circularize the per-variant deltas).

The gate's sel_* oracles are closed-form expressions over the page
generation parameters whose per-variant `_dv` deltas were originally
derived BY RUNNING THE ENGINE — making the driver's sel_* green
partially self-referential. This tool re-derives every count from
first principles:

- a fresh ~60-line STRICT parser (the template is parser-canonical —
  well-formed, no error recovery needed) builds a hickory-shaped tree
  (document / doctype / comment-with-data-child / element / text,
  matching reference core.clj:107-145 — note a comment's data is a
  STRING CHILD in `content`, so it walks as a text node);
- a fresh selector evaluator implements the reference semantics
  straight from /root/reference/src/cljc/hickory/select.cljc
  (nth-child counts ELEMENT siblings and requires an element parent,
  select walks every zipper loc including the document root, `not`
  matches non-element locs, ordered/ordered-adjacent chain walking);
- pages for every (variant, has_link, np) combination are generated
  through DUCKDB_PAGES_CTE (the shared DATA generator — input, not
  engine) and the real `oracle_sql()` formulas are evaluated in
  DuckDB, then compared against the independent evaluator's counts.

NOTHING from hickoryspark's parser/selector engine is imported — the
only repo imports are the page-template constants and the oracle SQL
strings under test.

Usage: python tools/independent_oracle_check.py   (exit 0 = all match)
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.spark.pages import DUCKDB_PAGES_CTE  # data, not engine

VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_TOKEN = re.compile(
    r"<!DOCTYPE[^>]*>"
    r"|<!--(.*?)-->"
    r"|</([a-zA-Z0-9]+)>"
    # attrs: key="v" | key='v' | key=bare | bare key (the session-4
    # gate variants use single-quoted and unquoted forms; the main
    # template stays all double-quoted)
    r"|<([a-zA-Z0-9]+)"
    r"((?:\s+[a-zA-Z-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\s>]+))?)*)\s*>"
    r"|([^<]+)",
    re.S,
)
_ATTR = re.compile(
    r"([a-zA-Z-]+)(?:=(\"[^\"]*\"|'[^']*'|[^\s>]+))?"
)


def _attr_value(raw):
    if raw is None:
        return ""
    if len(raw) >= 2 and raw[0] in "\"'" and raw[-1] == raw[0]:
        return raw[1:-1]
    return raw


def parse_strict(html: str) -> dict:
    """Strict parse of the parser-canonical page template into a
    hickory-shaped dict tree. Raises on anything unexpected — this is
    a validator for a fixed template, not a browser."""
    doc = {"type": "document", "tag": None, "attrs": {}, "children": []}
    stack = [doc]
    pos = 0
    for m in _TOKEN.finditer(html):
        if m.start() != pos:
            raise ValueError(f"unparsed gap at {pos}: {html[pos:pos+40]!r}")
        pos = m.end()
        tok = m.group(0)
        if tok.startswith("<!DOCTYPE"):
            stack[-1]["children"].append(
                {"type": "document-type", "tag": None, "attrs": {},
                 "children": []}
            )
        elif m.group(1) is not None:  # comment: data is a string CHILD
            stack[-1]["children"].append(
                {"type": "comment", "tag": None, "attrs": {},
                 "children": [m.group(1)]}
            )
        elif m.group(2) is not None:  # end tag
            if stack[-1].get("tag") != m.group(2).lower():
                raise ValueError(f"mismatched </{m.group(2)}>")
            stack.pop()
        elif m.group(3) is not None:  # start tag
            tag = m.group(3).lower()
            attrs = {k.lower(): _attr_value(v)
                     for k, v in _ATTR.findall(m.group(4) or "")}
            el = {"type": "element", "tag": tag, "attrs": attrs, "children": []}
            stack[-1]["children"].append(el)
            if tag not in VOID:
                stack.append(el)
        else:  # text
            stack[-1]["children"].append(m.group(5))
    if len(stack) != 1:
        raise ValueError(f"unclosed elements: {[n['tag'] for n in stack[1:]]}")
    return doc


class NodeView:
    """One zipper loc: a node (dict or text string) + its parent view +
    index among the parent's children."""

    __slots__ = ("node", "parent", "idx")

    def __init__(self, node, parent, idx):
        self.node, self.parent, self.idx = node, parent, idx

    @property
    def is_element(self):
        return isinstance(self.node, dict) and self.node["type"] == "element"

    @property
    def tag(self):
        return self.node["tag"] if isinstance(self.node, dict) else None

    @property
    def attrs(self):
        return self.node["attrs"] if isinstance(self.node, dict) else {}

    def siblings(self):
        return self.parent.node["children"] if self.parent else []

    def elem_pos_left(self):
        """1-based position among ELEMENT siblings (nth-child metric)."""
        sibs = self.siblings()
        return 1 + sum(
            1 for s in sibs[: self.idx]
            if isinstance(s, dict) and s["type"] == "element"
        )

    def elem_pos_right(self):
        sibs = self.siblings()
        return 1 + sum(
            1 for s in sibs[self.idx + 1:]
            if isinstance(s, dict) and s["type"] == "element"
        )

    def type_pos_left(self, tag):
        sibs = self.siblings()
        return 1 + sum(
            1 for s in sibs[: self.idx]
            if isinstance(s, dict) and s.get("tag") == tag
        )

    def type_pos_right(self, tag):
        sibs = self.siblings()
        return 1 + sum(
            1 for s in sibs[self.idx + 1:]
            if isinstance(s, dict) and s.get("tag") == tag
        )

    def left_elements(self):
        """Element siblings strictly left, nearest first (the
        left-of-node-type :element movement chain)."""
        sibs = self.siblings()
        out = [s for s in sibs[: self.idx]
               if isinstance(s, dict) and s["type"] == "element"]
        out.reverse()
        return out

    def right_elements(self):
        sibs = self.siblings()
        return [s for s in sibs[self.idx + 1:]
                if isinstance(s, dict) and s["type"] == "element"]

    def ancestors(self):
        """Parent chain, nearest first (zip/up movement), up to and
        including the document node."""
        p = self.parent
        while p is not None:
            yield p
            p = p.parent

    def direct_strings(self):
        if isinstance(self.node, dict):
            return [c for c in self.node["children"] if isinstance(c, str)]
        return []

    def descendants(self):
        """All nodes strictly below, pre-order (zip/next bounded to the
        subtree)."""
        if not isinstance(self.node, dict):
            return
        stack = list(reversed(self.node["children"]))
        while stack:
            n = stack.pop()
            yield n
            if isinstance(n, dict):
                stack.extend(reversed(n["children"]))


def walk(doc: dict):
    """Every zipper loc in pre-order (document root included; comment
    data strings included — zip/next descends into comment content)."""
    root = NodeView(doc, None, 0)
    out = []

    def rec(nv):
        out.append(nv)
        if isinstance(nv.node, dict):
            for i, c in enumerate(nv.node["children"]):
                rec(NodeView(c, nv, i))

    rec(root)
    return out


# -- selector predicates (reference select.cljc semantics) -----------------

def p_tag(t):
    return lambda nv: nv.tag == t


def p_class(c):
    def f(nv):
        cls = nv.attrs.get("class")
        # ASCII whitespace only — the reference splits with Java \s+
        # (select.cljc:241-251), which does NOT include U+00A0 etc.
        return cls is not None and c.lower() in [
            x.lower() for x in re.split(r"[ \t\n\x0b\f\r]+", cls) if x
        ]
    return f


def p_id(i):
    return lambda nv: nv.attrs.get("id", "").lower() == i.lower() \
        and "id" in nv.attrs


def p_attr(name, pred=None):
    def f(nv):
        if name not in nv.attrs:
            return False
        return pred(nv.attrs[name]) if pred else True
    return f


def p_element(nv):
    return nv.is_element


def p_element_child(nv):
    return nv.is_element and nv.parent is not None and nv.parent.is_element


def p_root(nv):
    return nv.tag == "html"


def p_node_type(t):
    return lambda nv: isinstance(nv.node, dict) and nv.node["type"] == t


def p_find_in_text(pattern):
    rx = re.compile(pattern)
    return lambda nv: any(rx.search(s) for s in nv.direct_strings())


def nth_stride(distance, n, c):
    if n == 0:
        return distance == c
    return (distance - c) % n == 0


def p_nth_child(n, c):
    return lambda nv: p_element_child(nv) and \
        nth_stride(nv.elem_pos_left(), n, c)


def p_nth_last_child(n, c):
    return lambda nv: p_element_child(nv) and \
        nth_stride(nv.elem_pos_right(), n, c)


def p_nth_of_type(n, c, tag):
    return lambda nv: p_element_child(nv) and nv.tag == tag and \
        nth_stride(nv.type_pos_left(tag), n, c)


def p_nth_last_of_type(n, c, tag):
    return lambda nv: p_element_child(nv) and nv.tag == tag and \
        nth_stride(nv.type_pos_right(tag), n, c)


def p_and(*sels):
    return lambda nv: all(s(nv) for s in sels)


def p_or(*sels):
    return lambda nv: any(s(nv) for s in sels)


def p_not(sel):
    return lambda nv: not sel(nv)


def p_el_not(sel):
    return lambda nv: nv.is_element and not sel(nv)


def p_child(*sels):
    """ordered-adjacent with zip/up over reversed selectors: the loc
    matches the LAST selector, its parent the previous, etc."""
    rev = list(reversed(sels))

    def f(nv):
        cur = nv
        for s in rev:
            if cur is None or not s(cur):
                return False
            cur = cur.parent
        return True
    return f


def p_has_child(sel):
    def f(nv):
        if not isinstance(nv.node, dict):
            return False
        return any(
            sel(NodeView(c, nv, i))
            for i, c in enumerate(nv.node["children"])
        )
    return f


def p_parent(*sels):
    """compose-unary has-child: and(s1, has-child(and(s2, ...)))."""
    if len(sels) == 1:
        return sels[0]
    return p_and(sels[0], p_has_child(p_parent(*sels[1:])))


def p_descendant(*sels):
    """ordered with zip/up over reversed selectors: loc matches last
    selector; remaining selectors match somewhere up the ancestry, in
    order."""
    rev = list(reversed(sels))

    def f(nv):
        if not rev[0](nv):
            return False
        idx = 1
        for anc in nv.ancestors():
            if idx >= len(rev):
                break
            if rev[idx](anc):
                idx += 1
        return idx >= len(rev)
    return f


def p_has_descendant(sel):
    def f(nv):
        if not isinstance(nv.node, dict):
            return False
        stack = [
            NodeView(c, nv, i) for i, c in enumerate(nv.node["children"])
        ]
        while stack:
            d = stack.pop()
            if sel(d):
                return True
            if isinstance(d.node, dict):
                stack.extend(
                    NodeView(c, d, i)
                    for i, c in enumerate(d.node["children"])
                )
        return False
    return f


def p_ancestor(*sels):
    if len(sels) == 1:
        return sels[0]
    return p_and(sels[0], p_has_descendant(p_ancestor(*sels[1:])))


def _sib_views(nv, before):
    """Element-sibling NodeViews left (nearest first) or right of nv."""
    sibs = nv.siblings()
    idx = [
        (i, s) for i, s in enumerate(sibs)
        if isinstance(s, dict) and s["type"] == "element"
        and ((i < nv.idx) if before else (i > nv.idx))
    ]
    views = [NodeView(s, nv.parent, i) for i, s in idx]
    if before:
        views.reverse()
    return views


def p_follow_adjacent(*sels):
    """ordered-adjacent over left-of-node-type :element, reversed."""
    rev = list(reversed(sels))

    def f(nv):
        chain = [nv] + _sib_views(nv, before=True)
        if len(chain) < len(rev):
            return False
        return all(s(c) for s, c in zip(rev, chain))
    return f


def p_precede_adjacent(*sels):
    def f(nv):
        chain = [nv] + _sib_views(nv, before=False)
        if len(chain) < len(sels):
            return False
        return all(s(c) for s, c in zip(sels, chain))
    return f


def _ordered_chain(first_ok, rest, chain):
    if not first_ok:
        return False
    idx = 0
    for c in chain:
        if idx >= len(rest):
            break
        if rest[idx](c):
            idx += 1
    return idx >= len(rest)


def p_follow(*sels):
    rev = list(reversed(sels))
    return lambda nv: _ordered_chain(
        rev[0](nv), rev[1:], _sib_views(nv, before=True)
    )


def p_precede(*sels):
    return lambda nv: _ordered_chain(
        sels[0](nv), list(sels[1:]), _sib_views(nv, before=False)
    )


# -- the gate's sel_* queries, re-expressed independently ------------------

SEL_PREDICATES = {
    "sel_tag": p_tag("p"),
    "sel_class": p_class("para"),
    "sel_id": p_id("MAIN"),
    "sel_attr": p_attr("href"),
    "sel_attr_pred": p_attr("href", lambda v: v.startswith("https")),
    "sel_any": p_element,
    "sel_element_child": p_element_child,
    "sel_root": p_root,
    "sel_node_type": p_node_type("comment"),
    "sel_find_in_text": p_find_in_text(r"\bspark\b"),
    "sel_nth_child": p_nth_child(2, 1),        # :odd
    "sel_nth_last_child": p_nth_last_child(2, 0),  # :even
    "sel_first_child": p_nth_child(0, 1),
    "sel_last_child": p_nth_last_child(0, 1),
    "sel_nth_of_type": p_nth_of_type(2, 1, "p"),
    "sel_nth_last_of_type": p_nth_last_of_type(2, 1, "p"),
    "sel_and": p_and(p_tag("p"), p_class("para")),
    "sel_or": p_or(p_tag("h1"), p_tag("a")),
    "sel_not": p_not(p_element),
    "sel_el_not": p_el_not(p_class("para")),
    "sel_child": p_child(p_tag("body"), p_tag("div"), p_tag("p")),
    "sel_has_child": p_has_child(p_tag("a")),
    "sel_parent": p_parent(p_tag("div"), p_tag("p")),
    "sel_descendant": p_descendant(p_tag("html"), p_tag("a")),
    "sel_has_descendant": p_has_descendant(p_tag("a")),
    "sel_ancestor": p_ancestor(p_tag("div"), p_tag("a")),
    "sel_follow_adjacent": p_follow_adjacent(p_tag("h1"), p_tag("p")),
    "sel_precede_adjacent": p_precede_adjacent(p_tag("h1"), p_tag("p")),
    "sel_follow": p_follow(p_tag("h1"), p_tag("a")),
    "sel_precede": p_precede(p_tag("p"), p_tag("a")),
    "sel_interp_combo": p_and(p_tag("p"), p_nth_child(2, 0)),
    "sel_interp_descendant": p_descendant(p_class("content"), p_tag("a")),
    # sel_css gates css.py's compilation of "body > div > p, h1 ~ a";
    # re-expressed here in THIS module's primitives (no css import —
    # the check stays independent of the front-end under test)
    "sel_css": p_or(
        p_child(p_tag("body"), p_tag("div"), p_tag("p")),
        p_follow(p_tag("h1"), p_tag("a")),
    ),
    # sel_css_has gates the round-5 pseudo additions
    # "p:has(~ a), td:has(+ td), a:has(b), tr:first-of-type" — the
    # four :has relative forms map to precede / precede-adjacent /
    # has-descendant and first-of-type to exact nth-of-type(0,1)
    "sel_css_has": p_or(
        p_precede(p_tag("p"), p_tag("a")),
        p_precede_adjacent(p_tag("td"), p_tag("td")),
        p_and(p_tag("a"), p_has_descendant(p_tag("b"))),
        p_nth_of_type(0, 1, "tr"),
    ),
}


def node_stats(doc):
    locs = walk(doc)
    n_nodes = len(locs)
    n_elements = sum(1 for nv in locs if nv.is_element)
    n_text = sum(1 for nv in locs if isinstance(nv.node, str))
    depth = {id(doc): 0}
    max_depth = 0
    for nv in locs[1:]:
        d = depth[id(nv.parent.node)] + 1
        if isinstance(nv.node, dict):
            depth[id(nv.node)] = d
        max_depth = max(max_depth, d)
    return {"n_nodes": n_nodes, "n_elements": n_elements,
            "n_text": n_text, "max_depth": max_depth}


def zip_stats(doc):
    locs = walk(doc)
    main = next(nv for nv in locs if nv.attrs.get("id") == "main")
    # subtree incl. main itself
    subtree = 1 + sum(1 for _ in main.descendants())
    n_paras = sum(
        1 for n in main.descendants()
        if isinstance(n, dict) and n.get("tag") == "p"
    )
    first_p = next(nv for nv in locs if nv.tag == "p")
    n_right = len(_sib_views(first_p, before=False)) + 1  # + move-to-None
    n_left = len(_sib_views(first_p, before=True)) + 1
    n_up = sum(1 for _ in first_p.ancestors()) + 1
    comment_pos = next(
        i for i, nv in enumerate(locs)
        if isinstance(nv.node, dict) and nv.node["type"] == "comment"
    )
    first_a = next(i for i, nv in enumerate(locs) if nv.tag == "a")
    return {
        "n_paras": n_paras, "subtree_nodes": subtree,
        "n_right": n_right, "n_left": n_left, "n_up": n_up,
        "comment_pos": comment_pos, "first_a_steps": first_a,
    }


def synth_documents(con):
    """Synthetic documents covering every (variant, has_link, np) combo
    plus 'spark'-token and source='spark' cases."""
    rows = []
    for doc_id in range(40):
        np_ = (doc_id // 8) + 2  # 2..6
        n_chars = np_ - 2  # np = n_chars % 5 + 2
        ntok = 2 * np_ + doc_id % 3
        toks = [f"w{doc_id}x{k}" for k in range(ntok)]
        if doc_id % 5 == 0:
            toks[ntok // 2] = "spark"  # word inside one chunk
        source = "spark" if doc_id % 7 == 0 else f"src{doc_id}"
        rows.append((doc_id, " ".join(toks), "en", source, n_chars))
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)


def main() -> int:
    import __spark_entry__ as E

    con = duckdb.connect()
    synth_documents(con)
    pages = con.execute(
        DUCKDB_PAGES_CTE
        + "SELECT doc_id, html, url, source FROM pages ORDER BY doc_id"
    ).fetchall()
    trees = {d: parse_strict(h) for d, h, _, _ in pages}
    urls = {d: u for d, _, u, _ in pages}
    sources = {d: s for d, _, _, s in pages}

    oracles = E.oracle_sql()
    failures = []

    for name, pred in SEL_PREDICATES.items():
        mine = {d: sum(1 for nv in walk(t) if pred(nv))
                for d, t in trees.items()}
        theirs = dict(con.execute(oracles[name]).fetchall())
        if mine != theirs:
            diff = {d: (mine[d], theirs.get(d)) for d in mine
                    if mine[d] != theirs.get(d)}
            print(f"FAIL {name}: (independent, oracle) diffs {diff}")
            failures.append(name)
        else:
            print(f"ok   {name}: {sum(mine.values())} total matches")

    stats = {d: node_stats(t) for d, t in trees.items()}
    rows = con.execute(oracles["parse_node_stats"]).fetchall()
    cols = [c[0] for c in con.execute(oracles["parse_node_stats"]).description]
    bad = []
    for r in rows:
        rec = dict(zip(cols, r))
        m = stats[rec["doc_id"]]
        for k in ("n_nodes", "n_elements", "n_text", "max_depth"):
            if m[k] != rec[k]:
                bad.append((rec["doc_id"], k, m[k], rec[k]))
    if bad:
        print(f"FAIL parse_node_stats: {bad[:8]}")
        failures.append("parse_node_stats")
    else:
        print("ok   parse_node_stats")

    # link_graph / link_anchor_subtree: anchors in document order with
    # direct-text / subtree-text anchor text and urljoin-resolved hrefs
    # (urllib.parse is the independent RFC 3986 resolver — it folds the
    # template's '../m3' and '/x/../about' dot segments), straight off
    # the independent tree
    from urllib.parse import urljoin

    def link_rows(d, t, subtree):
        rows = []
        for nv in walk(t):
            if nv.tag == "a" and "href" in nv.attrs:
                href = nv.attrs["href"]
                if subtree:
                    text = "".join(
                        s for s in nv.descendants() if isinstance(s, str)
                    )
                else:
                    text = "".join(nv.direct_strings())
                rows.append(
                    (d, len(rows) + 1, href, urljoin(urls[d], href), text)
                )
        return rows

    for lname, subtree in (("link_graph", False),
                           ("link_anchor_subtree", True)):
        mine = sorted(
            r for d, t in trees.items() for r in link_rows(d, t, subtree)
        )
        theirs = sorted(
            tuple(r) for r in con.execute(oracles[lname]).fetchall()
        )
        if mine != theirs:
            diff = [(a, b) for a, b in zip(mine, theirs) if a != b]
            print(f"FAIL {lname}: {diff[:5]} (counts {len(mine)} vs {len(theirs)})")
            failures.append(lname)
        else:
            print(f"ok   {lname}: {len(mine)} edges")

    # crawl_frontier: REP closed form x deduped canonical out-edges,
    # recomputed from the independent edge rows
    from collections import Counter

    frontier = Counter()
    for d, t in trees.items():
        if not (len(sources[d]) % 2 == 1 or str(d).startswith("2")):
            continue
        for target in {r[3] for r in link_rows(d, t, False)}:
            frontier[target] += 1
    theirs = sorted(
        tuple(r) for r in con.execute(oracles["crawl_frontier"]).fetchall()
    )
    mine = sorted(frontier.items())
    if mine != theirs:
        diff = [(a, b) for a, b in zip(mine, theirs) if a != b]
        print(f"FAIL crawl_frontier: {diff[:5]} "
              f"(counts {len(mine)} vs {len(theirs)})")
        failures.append("crawl_frontier")
    else:
        print(f"ok   crawl_frontier: {len(mine)} targets")

    zs = {d: zip_stats(t) for d, t in trees.items()}
    for name, keys in [
        ("zip_subtree_scan", ("n_paras", "subtree_nodes")),
        ("zip_pred_walk", ("n_right", "n_left", "n_up", "comment_pos")),
        ("zip_first_anchor", ("first_a_steps",)),
    ]:
        rows = con.execute(oracles[name]).fetchall()
        cols = [c[0] for c in con.execute(oracles[name]).description]
        bad = []
        for r in rows:
            rec = dict(zip(cols, r))
            for k in keys:
                if zs[rec["doc_id"]][k] != rec[k]:
                    bad.append((rec["doc_id"], k, zs[rec["doc_id"]][k], rec[k]))
        if bad:
            print(f"FAIL {name}: {bad[:8]}")
            failures.append(name)
        else:
            print(f"ok   {name}")

    check_session4_gates(con, oracles, failures)
    check_session4_arith(failures)

    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else " — all oracles independently derived"))
    return 1 if failures else 0


# ---------------------------------------------------------------------------
# Session-4 synthesized-variant gates: rebuild the SAME variant HTML
# the gate generators emit (data, not engine), parse with the strict
# parser, re-derive every output row from reference semantics, and
# compare against the oracle SQL. urljoin is the independent resolver.
# ---------------------------------------------------------------------------

def _s4_pages(doc_ids):
    """(doc_id -> html) for each session-4 HTML gate, duplicated
    verbatim from the __spark_entry__ generators."""
    ld, ip, hf, mn = {}, {}, {}, {}
    for d in doc_ids:
        v3, v4 = d % 3, d % 4
        body = (f"<p>hello</p><a href=x>nav<b>{d}</b></a>" if v3 == 0
                else f"<p>plain{d}</p>" if v3 == 1
                else "<a href=y><i>all</i></a>")
        ld[d] = (f"<html><head><title>t</title></head>"
                 f"<body>{body}</body></html>")
        if v4 == 0:
            body = (f"<figure><img src='/i/{d}.jpg' alt='pic {d}'>"
                    f"<figcaption>Cap <b>{d}</b></figcaption></figure>")
        elif v4 == 1:
            body = (f"<img srcset='/a{d}.jpg 1x, /b{d}.jpg 2x' "
                    "width='10' height='oops'>")
        elif v4 == 2:
            body = (f"<video src='v{d}.mp4'>"
                    f"<source srcset='s{d}.webm'></video>")
        else:
            body = f"<img src='../up/{d}.png' alt=''>"
        ip[d] = (f"<html><head><title>t</title></head>"
                 f"<body>{body}</body></html>")
        if v3 == 0:
            head = (f"<link rel='alternate' hreflang='en' href='/en/{d}'>"
                    f"<link rel='alternate' hreflang='fr' href='fr{d}'>")
        elif v3 == 1:
            head = ("<link rel='ALTERNATE stylesheet' "
                    f"hreflang='x-default' href='https://X.EX/{d}'>"
                    "<link rel='alternate' href='/nolang'>")
        else:
            head = ""
        hf[d] = (f"<html><head><title>t</title>{head}</head>"
                 "<body></body></html>")
        if v4 == 0:
            m = ""
        elif v4 == 1:
            m = '<meta name="robots" content="noindex">'
        elif v4 == 2:
            m = '<meta name="ROBOTS" content=" NOFOLLOW ,\tNoIndex ">'
        else:
            m = '<meta name="Robots" content="none">'
        mn[d] = (f"<html><head><title>t{d}</title>{m}</head>"
                 "<body><p>x</p></body></html>")
    return ld, ip, hf, mn


_AWS = " \t\n\x0b\f\r"


def _elems(node):
    """Pre-order element walk of a strict-parse tree."""
    for c in node["children"]:
        if isinstance(c, dict) and c["type"] == "element":
            yield c
            yield from _elems(c)


def check_session4_gates(con, oracles, failures):
    from urllib.parse import urljoin

    doc_ids = [r[0] for r in
               con.execute("SELECT doc_id FROM documents").fetchall()]
    ld_html, ip_html, hf_html, mn_html = _s4_pages(doc_ids)

    def compare(name, mine):
        theirs = sorted(
            tuple(r) for r in con.execute(oracles[name]).fetchall())
        mine = sorted(mine)
        if mine != theirs:
            diff = [(a, b) for a, b in zip(mine, theirs) if a != b][:4]
            only_m = [r for r in mine if r not in theirs][:2]
            only_t = [r for r in theirs if r not in mine][:2]
            print(f"FAIL {name}: diffs {diff} +{only_m} -{only_t} "
                  f"(counts {len(mine)} vs {len(theirs)})")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(mine)} rows (independent)")

    # link_density: text chars vs anchor-subtree chars
    rows = []
    for d, h in ld_html.items():
        t = parse_strict(h)
        text = anchor = 0

        def rec(n, in_a):
            nonlocal text, anchor
            for c in n["children"]:
                if isinstance(c, str):
                    text += len(c)
                    if in_a:
                        anchor += len(c)
                elif c["type"] == "element":
                    rec(c, in_a or c["tag"] == "a")

        rec(t, False)
        ppm = (1_000_000 * anchor) // text if text else 0
        rows.append((d, text, anchor, ppm))
    compare("link_density", rows)

    # image_pairs: media rows + nearest-figure captions
    def digit_prefix(v):
        m = re.match(r"([0-9]+)", v or "")
        return int(m.group(1)) if m else None

    def srcset_urls(v):
        out = []
        for cand in v.split(","):
            toks = [x for x in re.split(f"[{_AWS}]+", cand.strip(_AWS))
                    if x]
            if toks:
                out.append(toks[0])
        return "|".join(out)

    rows = []
    for d, h in ip_html.items():
        t = parse_strict(h)
        base = f"https://m.ex/p/{d}"

        def fig_caption(fig):
            texts = []

            def rec(n, in_fc):
                for c in n["children"]:
                    if isinstance(c, str):
                        if in_fc:
                            texts.append(c)
                    elif c["type"] == "element":
                        rec(c, in_fc or c["tag"] == "figcaption")

            rec(fig, False)
            return "".join(texts) if texts else None

        pos = 0

        def walk_media(n, figs):
            nonlocal pos
            for c in n["children"]:
                if not (isinstance(c, dict) and c["type"] == "element"):
                    continue
                a = c["attrs"]
                if c["tag"] in ("img", "video", "audio", "source") and (
                    "src" in a
                    or (c["tag"] in ("img", "source") and "srcset" in a)
                ):
                    pos += 1
                    src = a.get("src")
                    rows.append((
                        d, pos, c["tag"], src,
                        urljoin(base, src) if src is not None else None,
                        srcset_urls(a["srcset"]) if "srcset" in a else None,
                        a.get("alt"),
                        digit_prefix(a.get("width")),
                        digit_prefix(a.get("height")),
                        fig_caption(figs[-1]) if figs else None,
                    ))
                walk_media(
                    c, figs + [c] if c["tag"] == "figure" else figs)

        walk_media(t, [])
    compare("image_pairs", rows)

    # hreflang_alternates
    rows = []
    for d, h in hf_html.items():
        t = parse_strict(h)
        base = f"https://m.ex/p/{d}"
        pos = 0
        for el in _elems(t):
            a = el["attrs"]
            toks = [x.lower() for x in
                    re.split(f"[{_AWS}]+", a.get("rel", "")) if x]
            if (el["tag"] == "link" and "alternate" in toks
                    and "hreflang" in a and "href" in a):
                pos += 1
                rows.append((d, pos, a["hreflang"], a["href"],
                             urljoin(base, a["href"])))
    compare("hreflang_alternates", rows)

    # meta_noindex: first doc-order robots meta + directive parse
    rows = []
    for d, h in mn_html.items():
        t = parse_strict(h)
        content = None
        for el in _elems(t):
            if (el["tag"] == "meta"
                    and el["attrs"].get("name", "").lower() == "robots"
                    and "content" in el["attrs"]):
                content = el["attrs"]["content"]
                break
        toks = [x.strip(" \t\n\x0b\f\r").lower()
                for x in (content or "").split(",")]
        rows.append((d, content,
                     "noindex" in toks or "none" in toks,
                     "nofollow" in toks or "none" in toks))
    compare("meta_noindex", rows)




# ---------------------------------------------------------------------------
# Session-4 arithmetic gates (no HTML): re-derive host/frontier/
# canonical/wordfilter closed forms in fresh Python over a RICHER
# synthetic documents table (punctuated badwords, odd/even-length
# sources) than the gate corpus, so the fold arithmetic is graded on
# inputs the shipped parquet never exercises.
# ---------------------------------------------------------------------------

def _mini_normalize(u):
    """Independent implementation of the ops/urls.normalize_url pin:
    unsafe strip, scheme://host lowercase, RFC 3986 dot fold (stack
    form, CPython root-pop), default-port drop, fragment drop, utm/
    fbclid/gclid strip + separator tidy, one trailing slash drop."""
    import re as _re

    u = _re.sub(r"[\t\n\r]", "", u)
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", u)
    pre = m.group(1) if m else ""
    rest = u[len(pre):]
    pre = pre.lower()
    tm = _re.search(r"[?#]", rest)
    path, tail = (rest[:tm.start()], rest[tm.start():]) if tm else (rest, "")
    if "/." in path or path.startswith("."):
        out = []
        rooted = path.startswith("/")
        for seg in path.split("/"):
            if seg == ".":
                continue
            if seg == "..":
                if out and out[-1] not in ("", ".."):
                    out.pop()
                elif out and out[-1] == "":
                    out.pop()
            else:
                out.append(seg)
        path = "/".join(out)
        if rooted and not path.startswith("/"):
            path = "/" + path
        if path == "" and rooted:
            path = "/"
        if (u.endswith("/") or u.rstrip("/").endswith("/..")
                or u.endswith("/.")) and not path.endswith("/"):
            path += "/"
    u = pre + path + tail
    u = _re.sub(r"^(https://[^/?#]*):443(?=[/?#]|$)", r"\1", u)
    u = _re.sub(r"^(http://[^/?#]*):80(?=[/?#]|$)", r"\1", u)
    u = _re.sub(r"#.*$", "", u, flags=_re.S)
    for _ in range(8):
        u2 = _re.sub(r"([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*&?", r"\1", u)
        if u2 == u:
            break
        u = u2
    u = _re.sub(r"\?&", "?", u)
    u = _re.sub(r"[?&]$", "", u)
    u = _re.sub(r"(.)/$", r"\1", u)
    u = _re.sub(r"^([a-z][a-z0-9+.-]*://[^/?#]*)/$", r"\1", u)
    return u


def check_session4_arith(failures):
    import __spark_entry__ as E
    from urllib.parse import urljoin

    oracles = E.oracle_sql()
    con = duckdb.connect()
    docs = []
    for d in range(60):
        toks = [f"w{d}k{j}" for j in range(4)]
        if d % 4 == 0:
            toks.append("scan.")          # punct-adjacent badword
        if d % 4 == 1:
            toks.append('"MERGE",')       # quoted+comma, case-varied
        if d % 4 == 2:
            toks.append("scans")          # near-miss must NOT hit
        if d % 5 == 0:
            toks.append("...")            # pure punctuation token
        src = ("s" * (d % 5 + 2)) if d % 2 else f"even{d % 7}"
        docs.append((d, " ".join(toks), "en", src, d % 5))
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", docs)

    def compare(name, mine):
        theirs = sorted(
            tuple(r) for r in con.execute(oracles[name]).fetchall())
        mine = sorted(mine)
        if mine != theirs:
            only_m = [r for r in mine if r not in theirs][:3]
            only_t = [r for r in theirs if r not in mine][:3]
            print(f"FAIL {name} (arith): +{only_m} -{only_t} "
                  f"(counts {len(mine)} vs {len(theirs)})")
            failures.append(name + "/arith")
        else:
            print(f"ok   {name}: {len(mine)} rows (independent arith)")

    subs = {0: "", 1: "www.", 2: "a.b."}
    hosts = {d: (subs[d % 3] + s + ".ex").lower()
             for d, _, _, s, _ in docs}
    urls = {d: f"https://{subs[d % 3]}{s}.ex/p/{d}"
            for d, _, _, s, _ in docs}
    sources = {d: s for d, _, _, s, _ in docs}

    # host_blocklist: entries block host + subdomains via suffix chain
    entries = {f"b.{s}.ex" for s in sources.values()} | {
        f"{s}.ex" for s in sources.values() if len(s) % 2 == 0}

    def suffixes(h):
        labels = h.split(".")[-16:]
        return {".".join(labels[i:]) for i in range(len(labels))}

    kept = [(d, urls[d]) for d in hosts
            if not (suffixes(hosts[d]) & entries)]
    compare("host_blocklist", kept)

    # host_rollup
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for d, h in hosts.items():
        agg[h][0] += 1
        agg[h][1] += len(f"h{d}")
    compare("host_rollup", [(h, n, b) for h, (n, b) in agg.items()])

    # frontier_batches: per-host url rank -> batch div 4
    byhost = defaultdict(list)
    for d, u in urls.items():
        byhost[hosts[d]].append(u)
    rows = []
    for h, us in byhost.items():
        for i, u in enumerate(sorted(us)):
            rows.append((u, h, i // 4))
    compare("frontier_batches", rows)

    # canonical_clusters: independent resolve (urljoin) + normalize
    targets = {}
    for d in hosts:
        base = f"https://m.ex/p/{d}"
        v = d % 4
        if v == 0:
            t = _mini_normalize(base)
        elif v == 1:
            t = _mini_normalize(f"HTTPS://M.EX:443/c/{d % 10}?utm_source=x#f")
        elif v == 2:
            t = _mini_normalize(urljoin(base, f"/c/{d % 10}"))
        else:
            t = _mini_normalize(urljoin(base, f"x/../c/{d % 10}"))
        targets[d] = (t, t == _mini_normalize(base))
    cl = defaultdict(lambda: [0, 0])
    for t, is_self in targets.values():
        cl[t][0] += 1
        cl[t][1] += 1 if is_self else 0
    compare("canonical_clusters", [(t, n, s) for t, (n, s) in cl.items()])

    # word_filter: fold = lower + ASCII-ws split + edge-punct strip
    wl = {"scan", "merge", "zzznope"}

    def fold(tok):
        t = tok.lower()
        t = re.sub(r"^[^a-z0-9]+", "", t)
        return re.sub(r"[^a-z0-9]+$", "", t)

    rows = []
    for d, text, *_ in docs:
        toks = [fold(t) for t in re.split(r"[ \t\n\x0b\f\r]+", text) if t]
        hits = [t for t in toks if t and t in wl]
        rows.append((d, len(hits), min(hits) if hits else None,
                     not hits))
    compare("word_filter", rows)


if __name__ == "__main__":
    sys.exit(main())
