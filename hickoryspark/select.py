"""Selector combinator algebra over the flat node table.

Faithful re-expression of /root/reference/src/cljc/hickory/select.cljc:
a selector is a function ``Loc -> Loc | None`` (select.cljc:166-171 and
README.md:124-131); combinators are higher-order functions over
selectors. Arbitrary user functions compose, exactly as in the
reference (test/cljc/hickory/test/select.cljc:47-53).

A ``Loc`` is a cursor (doc, node-id) into a :class:`hickoryspark.nodes.Doc`;
zipper moves are O(1) pointer-array lookups. ``select`` is the full
pre-order scan driver (select.cljc:159-163); pre-order is the storage
order, so the scan is just ``range(n)``.

Name mapping (Python keywords avoided): and_/or_/not_ for and/or/not,
cls for class, id_ for id, any_ for any.
"""

from __future__ import annotations

import re as _re

from hickoryspark.html.core import as_hickory, parse as _parse  # noqa: F401
from hickoryspark.nodes import (
    TYPE_COMMENT,
    TYPE_DOCTYPE,
    TYPE_DOCUMENT,
    TYPE_ELEMENT,
    TYPE_TEXT,
    TYPE_NAMES,
    Doc,
    flatten,
)



class Loc:
    """Zipper cursor: (Doc, node id). Mirrors clojure.zip locs."""

    __slots__ = ("doc", "i")

    def __init__(self, doc: Doc, i: int) -> None:
        self.doc = doc
        self.i = i

    # node data accessors (cheap; no tree materialization)
    def type_name(self) -> str | None:
        return TYPE_NAMES[self.doc.types[self.i]]

    def tag(self) -> str | None:
        return self.doc.tags[self.i]

    def attrs(self) -> dict | None:
        return self.doc.attrs[self.i]

    def is_element(self) -> bool:
        return self.doc.types[self.i] == TYPE_ELEMENT

    def is_text(self) -> bool:
        return self.doc.types[self.i] == TYPE_TEXT

    def node(self):
        """Materialize the hickory node at this loc (like zip/node)."""
        return self.doc.node(self.i)

    # zipper moves (return Loc or None)
    def up(self):
        p = self.doc.parent[self.i]
        return Loc(self.doc, p) if p >= 0 else None

    def down(self):
        c = self.doc.first_child[self.i]
        return Loc(self.doc, c) if c >= 0 else None

    def left(self):
        p = self.doc.prev_sib[self.i]
        return Loc(self.doc, p) if p >= 0 else None

    def right(self):
        nx = self.doc.next_sib[self.i]
        return Loc(self.doc, nx) if nx >= 0 else None

    def next(self):
        """zip/next: pre-order successor; end sentinel after last node."""
        j = self.i + 1
        return Loc(self.doc, j) if j < self.doc.n else _EndLoc(self.doc)

    def prev(self):
        j = self.i - 1
        return Loc(self.doc, j) if j >= 0 else None

    def is_end(self) -> bool:
        return False

    def __eq__(self, other):
        return (
            isinstance(other, Loc)
            and not isinstance(other, _EndLoc)
            and other.doc is self.doc
            and other.i == self.i
        )

    def __hash__(self):
        return hash((id(self.doc), self.i))

    def __repr__(self):
        return f"Loc({self.i}:{self.type_name()}:{self.tag() or self.doc.texts[self.i]!r})"


class _EndLoc(Loc):
    """The [node :end] sentinel returned by zip/next past the last loc."""

    def __init__(self, doc: Doc) -> None:
        super().__init__(doc, doc.n)

    def is_end(self) -> bool:
        return True

    def next(self):
        return self

    def __eq__(self, other):
        return isinstance(other, _EndLoc) and other.doc is self.doc

    def __hash__(self):
        return hash((id(self.doc), "end"))


def _as_doc(tree) -> Doc:
    return tree if isinstance(tree, Doc) else flatten(tree)


# -- Utilities (select.cljc:16-113) ------------------------------------------


def until(f, val, pred):
    """select.cljc:16-24."""
    while True:
        val = f(val)
        if pred(val):
            return val


def count_until(f, val, pred) -> int:
    """select.cljc:26-35."""
    cnt = 0
    while not pred(val):
        val = f(val)
        cnt += 1
    return cnt


def next_pred(loc, pred):
    """select.cljc:37-43."""
    return until(lambda l: l.next(), loc, lambda l: l.is_end() or pred(l))


def prev_pred(loc, pred):
    """select.cljc:45-51."""
    return until(lambda l: l.prev() if l else None, loc, lambda l: l is None or pred(l))


def left_pred(loc, pred):
    """select.cljc:53-59."""
    return until(lambda l: l.left() if l else None, loc, lambda l: l is None or pred(l))


def right_pred(loc, pred):
    """select.cljc:61-67."""
    return until(
        lambda l: l.right() if l else None, loc, lambda l: l is None or pred(l)
    )


def up_pred(loc, pred):
    """select.cljc:69-75."""
    return until(lambda l: l.up() if l else None, loc, lambda l: l is None or pred(l))


def _type_code(node_type) -> int:
    name = str(node_type).lower().lstrip(":")
    for code, nm in TYPE_NAMES.items():
        if nm == name:
            return code
    return -1


def next_of_node_type(loc, node_type):
    """select.cljc:77-81."""
    code = _type_code(node_type)
    return next_pred(loc, lambda l: l.doc.types[l.i] == code if not l.is_end() else False)


def prev_of_node_type(loc, node_type):
    """select.cljc:83-87."""
    code = _type_code(node_type)
    return prev_pred(loc, lambda l: l.doc.types[l.i] == code)


def left_of_node_type(loc, node_type):
    """select.cljc:89-93 — previous sibling of the given node type."""
    code = _type_code(node_type)
    if code == TYPE_ELEMENT:
        p = loc.doc.prev_elem[loc.i]
        if p >= 0:
            return Loc(loc.doc, p)
        # prev_elem is only maintained for element rows; fall through for
        # non-element locs.
        if loc.is_element():
            return None
    return left_pred(loc, lambda l: l.doc.types[l.i] == code)


def right_of_node_type(loc, node_type):
    """select.cljc:95-99 — next sibling of the given node type."""
    code = _type_code(node_type)
    if code == TYPE_ELEMENT:
        nx = loc.doc.next_elem[loc.i]
        if nx >= 0:
            return Loc(loc.doc, nx)
        if loc.is_element():
            return None
    return right_pred(loc, lambda l: l.doc.types[l.i] == code)


def after_subtree(loc):
    """select.cljc:101-113 — first loc after this loc's subtree."""
    if loc.is_end():
        return loc
    j = loc.doc.subtree_end[loc.i] + 1
    return Loc(loc.doc, j) if j < loc.doc.n else _EndLoc(loc.doc)


# -- Select drivers (select.cljc:119-163) -------------------------------------


def select_next_loc(selector_fn, loc, next_fn=None, end_fn=None):
    """select.cljc:119-145."""
    if next_fn is None:
        next_fn = lambda l: l.next()  # noqa: E731
    if end_fn is None:
        end_fn = lambda l: l is None or l.is_end()  # noqa: E731
    while True:
        if end_fn(loc):
            return None
        if selector_fn(loc):
            return loc
        loc = next_fn(loc)


def select_locs(selector_fn, tree) -> list[Loc]:
    """select.cljc:147-157 — all locs matching, in document order."""
    doc = _as_doc(tree)
    out = []
    for i in range(doc.n):
        loc = Loc(doc, i)
        if selector_fn(loc):
            out.append(loc)
    return out


def select(selector_fn, tree) -> list:
    """select.cljc:159-163 — all matching hickory nodes, document order."""
    return [loc.node() for loc in select_locs(selector_fn, tree)]


# -- Selectors (select.cljc:173-428) ------------------------------------------


def node_type(t):
    """select.cljc:173-185 — :type equals arg, case-insensitive."""
    code = _type_code(t)

    def sel(loc):
        return loc if loc.doc.types[loc.i] == code else None

    return sel


def tag(t):
    """select.cljc:187-199 — :tag equals arg, case-insensitive."""
    tl = str(t).lstrip(":").lower()

    def sel(loc):
        node_tag = loc.doc.tags[loc.i]
        return loc if node_tag is not None and node_tag.lower() == tl else None

    return sel


def attr(attr_name, predicate=None):
    """select.cljc:201-230 — attrs contains key (lowercased name) and the
    optional predicate holds on the raw value."""
    key = str(attr_name).lstrip(":").lower()

    def sel(loc):
        attrs = loc.doc.attrs[loc.i]
        if attrs is not None and key in attrs:
            if predicate is None or predicate(attrs[key]):
                return loc
        return None

    return sel


def id_(x):
    """select.cljc:232-239 — case-insensitive id equality."""
    target = str(x).lstrip(":").lower()
    return attr("id", lambda v: v.lower() == target)


# the reference splits with Java's \s+, which is ASCII-only
# ([ \t\n\x0B\f\r] — java.util.regex.Pattern docs); Python's re \s is
# Unicode-aware, so a bare r"\s+" here would split on U+00A0 etc. and
# diverge from both the reference and the relational engine
_WS_SPLIT = _re.compile(r"[ \t\n\x0b\f\r]+")


def cls(class_name):
    """select.cljc:241-251 — class attr split on whitespace, lowercased,
    set-contains (named ``class`` in the reference)."""
    target = str(class_name).lstrip(":").lower()

    def pred(v: str) -> bool:
        return target in {c.lower() for c in _WS_SPLIT.split(v)}

    return attr("class", pred)


def any_(loc):
    """select.cljc:253-258 — the CSS '*' selector."""
    return loc if loc.doc.types[loc.i] == TYPE_ELEMENT else None


element = any_


def element_child(loc):
    """select.cljc:265-274 — element whose parent is also an element."""
    if loc.doc.types[loc.i] != TYPE_ELEMENT:
        return None
    p = loc.doc.parent[loc.i]
    return loc if p >= 0 and loc.doc.types[p] == TYPE_ELEMENT else None


def root(loc):
    """select.cljc:276-281 — :tag == :html."""
    return loc if loc.doc.tags[loc.i] == "html" else None


def find_in_text(pattern):
    """select.cljc:283-295 — some DIRECT string child matches the regex."""
    rex = _re.compile(pattern) if isinstance(pattern, str) else pattern

    def sel(loc):
        for text in loc.doc.direct_text(loc.i):
            if rex.search(text):
                return loc
        return None

    return sel


def n_moves_until(n, c, move, term_pred):
    """select.cljc:297-327 — the generalized an+b stride selector."""

    def sel(loc):
        distance = count_until(move, loc, term_pred)
        if n == 0:
            return loc if distance == c else None
        return loc if (distance - c) % n == 0 else None

    return sel


def _resolve_odd_even(c):
    if c == "odd" or c == ":odd":
        return 2, 1
    if c == "even" or c == ":even":
        return 2, 0
    return 0, c


def nth_of_type(n_or_c, c_or_typ=None, typ=None):
    """select.cljc:329-351 — (nk+c)th same-tag element child."""
    if typ is None:
        n, c = _resolve_odd_even(n_or_c)
        typ = c_or_typ
    else:
        n, c = n_or_c, c_or_typ
    typ_s = str(typ).lstrip(":")

    def sel(loc):
        if element_child(loc) is None or loc.doc.tags[loc.i] != typ_s:
            return None
        inner = n_moves_until(
            n,
            c,
            lambda l: left_pred(
                l, lambda x: x.doc.tags[x.i] == typ_s and x.is_element()
            ),
            lambda l: l is None,
        )
        return inner(loc)

    return sel


def nth_last_of_type(n_or_c, c_or_typ=None, typ=None):
    """select.cljc:353-375."""
    if typ is None:
        n, c = _resolve_odd_even(n_or_c)
        typ = c_or_typ
    else:
        n, c = n_or_c, c_or_typ
    typ_s = str(typ).lstrip(":")

    def sel(loc):
        if element_child(loc) is None or loc.doc.tags[loc.i] != typ_s:
            return None
        inner = n_moves_until(
            n,
            c,
            lambda l: right_pred(
                l, lambda x: x.doc.tags[x.i] == typ_s and x.is_element()
            ),
            lambda l: l is None,
        )
        return inner(loc)

    return sel


def nth_child(n_or_c, c=None):
    """select.cljc:377-393 — (nk+c)th element child (1-based; text and
    comment siblings are invisible to the count)."""
    if c is None:
        n, c = _resolve_odd_even(n_or_c)
    else:
        n = n_or_c

    def sel(loc):
        if element_child(loc) is None:
            return None
        # distance under left-of-node-type :element until nil == the
        # 1-based element sibling position (precomputed).
        distance = int(loc.doc.elem_sib_pos[loc.i])
        if n == 0:
            return loc if distance == c else None
        return loc if (distance - c) % n == 0 else None

    return sel


def nth_last_child(n_or_c, c=None):
    """select.cljc:396-412."""
    if c is None:
        n, c = _resolve_odd_even(n_or_c)
    else:
        n = n_or_c

    def sel(loc):
        if element_child(loc) is None:
            return None
        p = loc.doc.parent[loc.i]
        distance = int(
            loc.doc.n_elem_children[p] - loc.doc.elem_sib_pos[loc.i] + 1
        )
        if n == 0:
            return loc if distance == c else None
        return loc if (distance - c) % n == 0 else None

    return sel


def first_child(loc):
    """select.cljc:414-420."""
    return loc if element_child(loc) and nth_child(1)(loc) else None


def last_child(loc):
    """select.cljc:422-428."""
    return loc if element_child(loc) and nth_last_child(1)(loc) else None


# -- Combinators (select.cljc:434-723) ----------------------------------------


def and_(*selectors):
    """select.cljc:434-440."""

    def sel(loc):
        for s in selectors:
            if not s(loc):
                return None
        return loc

    return sel


def or_(*selectors):
    """select.cljc:442-448."""

    def sel(loc):
        for s in selectors:
            if s(loc):
                return loc
        return None

    return sel


def not_(selector):
    """select.cljc:450-456 — complement, on ANY node type."""

    def sel(loc):
        return None if selector(loc) else loc

    return sel


def el_not(selector):
    """select.cljc:458-466 — element AND not(selector)."""
    return and_(node_type("element"), not_(selector))


def compose_unary(unary_selector_fn, *selectors):
    """select.cljc:468-487."""
    rev = list(reversed(selectors))
    output = and_(rev[0])
    for s in rev[1:]:
        output = and_(s, unary_selector_fn(output))
    return output


def ordered_adjacent(move_fn, *selectors):
    """select.cljc:489-515 — chain with exactly-one-move steps; success is
    checked before a move to nil."""

    def sel(loc):
        curr = loc
        for s in selectors:
            if curr is None:
                return None
            nxt = s(curr)
            if not nxt:
                return None
            curr = move_fn(nxt)
        return loc

    return sel


def child(*selectors):
    """select.cljc:517-529 — CSS 'A > B': anchored at the LAST selector."""
    return ordered_adjacent(lambda l: l.up(), *reversed(selectors))


def has_child(selector):
    """select.cljc:531-549 — some direct child satisfies the selector."""

    def sel(loc):
        start = loc.down()
        if start is None:
            return None
        found = select_next_loc(
            selector, start, lambda l: l.right(), lambda l: l is None
        )
        return loc if found else None

    return sel


def parent(*selectors):
    """select.cljc:551-563 — top of a direct-child chain."""
    return compose_unary(has_child, *selectors)


def follow_adjacent(*selectors):
    """select.cljc:565-579 — CSS 'A + B' (selects B)."""
    return ordered_adjacent(
        lambda l: left_of_node_type(l, "element"), *reversed(selectors)
    )


def precede_adjacent(*selectors):
    """select.cljc:581-595 — mirror of follow-adjacent (selects A)."""
    return ordered_adjacent(lambda l: right_of_node_type(l, "element"), *selectors)


def ordered(move_fn, *selectors):
    """select.cljc:597-632 — chain with one-or-more-move steps; the first
    selector is anchored exactly."""

    def sel(loc):
        if not selectors[0](loc):
            return None
        curr = move_fn(loc)
        idx = 1
        while True:
            if idx >= len(selectors):
                return loc
            if curr is None:
                return None
            if selectors[idx](curr):
                idx += 1
            curr = move_fn(curr)

    return sel


def descendant(*selectors):
    """select.cljc:634-649 — CSS 'A B': anchored at the LAST selector."""
    return ordered(lambda l: l.up(), *reversed(selectors))


def has_descendant(selector):
    """select.cljc:651-678 — some node in the subtree satisfies the
    selector. O(subtree) like the reference, but interval-bounded."""

    def sel(loc):
        start = loc.down()
        if start is None:
            return None
        end_id = loc.doc.subtree_end[loc.i]
        doc = loc.doc
        for j in range(start.i, end_id + 1):
            if selector(Loc(doc, j)):
                return loc
        return None

    return sel


def ancestor(*selectors):
    """select.cljc:680-693 — top of a descendant chain."""
    return compose_unary(has_descendant, *selectors)


def follow(*selectors):
    """select.cljc:695-708 — CSS 'A ~ B' (selects B)."""
    return ordered(lambda l: left_of_node_type(l, "element"), *reversed(selectors))


def precede(*selectors):
    """select.cljc:710-723 — mirror of follow (selects A)."""
    return ordered(lambda l: right_of_node_type(l, "element"), *selectors)
