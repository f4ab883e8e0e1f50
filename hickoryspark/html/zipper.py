"""Functional zippers over hickory and hiccup forms.

Port of /root/reference/src/cljc/hickory/zip.cljc (backed by a generic
clojure.zip-style persistent zipper). In the engine proper, the node
table's pointer columns play the zipper role (SURVEY.md §1.4); this
module exists for API parity and for arbitrary user traversal of
in-memory trees.
"""

from __future__ import annotations


class ZipLoc:
    """A persistent zipper location: (node, path). Immutable."""

    __slots__ = ("node", "_lefts", "_parent", "_rights", "_fns", "_end")

    def __init__(self, node, lefts, parent, rights, fns, end=False) -> None:
        self.node = node
        self._lefts = lefts
        self._parent = parent
        self._rights = rights
        self._fns = fns
        self._end = end

    # fns = (branch?, children, make-node)

    def is_branch(self) -> bool:
        return self._fns[0](self.node)

    def children(self):
        return self._fns[1](self.node) or []

    def is_end(self) -> bool:
        return self._end

    def down(self):
        if not self.is_branch():
            return None
        kids = list(self.children())
        if not kids:
            return None
        return ZipLoc(kids[0], (), self, tuple(kids[1:]), self._fns)

    def up(self):
        if self._parent is None:
            return None
        new_children = list(self._lefts) + [self.node] + list(self._rights)
        make = self._fns[2]
        return ZipLoc(
            make(self._parent.node, new_children),
            self._parent._lefts,
            self._parent._parent,
            self._parent._rights,
            self._fns,
        )

    def left(self):
        if self._parent is None or not self._lefts:
            return None
        return ZipLoc(
            self._lefts[-1],
            self._lefts[:-1],
            self._parent,
            (self.node,) + self._rights,
            self._fns,
        )

    def right(self):
        if self._parent is None or not self._rights:
            return None
        return ZipLoc(
            self._rights[0],
            self._lefts + (self.node,),
            self._parent,
            self._rights[1:],
            self._fns,
        )

    def root(self):
        loc = self
        while True:
            up = loc.up()
            if up is None:
                return loc.node
            loc = up

    def next(self):
        """Pre-order successor; end sentinel after the last node."""
        if self._end:
            return self
        d = self.down()
        if d is not None:
            return d
        loc = self
        while loc is not None:
            r = loc.right()
            if r is not None:
                return r
            loc = loc.up()
        return ZipLoc(self.root(), (), None, (), self._fns, end=True)

    def prev(self):
        """Pre-order predecessor, or None at the root."""
        l = self.left()
        if l is None:
            return self.up()
        while True:
            d = l.down()
            if d is None:
                return l
            loc = d
            while loc.right() is not None:
                loc = loc.right()
            l = loc


def zipper(branch_fn, children_fn, make_fn, root) -> ZipLoc:
    return ZipLoc(root, (), None, (), (branch_fn, children_fn, make_fn))


def hickory_zip(root) -> ZipLoc:
    """zip.cljc:8-16 — zipper over hickory maps."""
    return zipper(
        lambda node: not isinstance(node, str),
        lambda node: node.get("content") if isinstance(node, dict) else None,
        lambda node, children: {**node, "content": list(children) if children else None},
        root,
    )


def _hiccup_children(node):
    """zip.cljc:26-35 — tolerate missing attr maps and node lists."""
    if isinstance(node, (list, tuple)) and node:
        if _is_form(node):
            if len(node) > 1 and isinstance(node[1], dict):
                return list(node[2:])
            return list(node[1:])
        return list(node)
    return None


def _is_form(node) -> bool:
    """A hiccup element vector starts with a tag (string), unlike a bare
    node-list."""
    return bool(node) and isinstance(node[0], str)


def _hiccup_make(node, children):
    """zip.cljc:40-50."""
    if isinstance(node, (list, tuple)) and _is_form(node):
        if len(node) > 1 and isinstance(node[1], dict):
            return list(node[:2]) + list(children)
        return [node[0]] + list(children)
    return list(children)


def hiccup_zip(root) -> ZipLoc:
    """zip.cljc:53-59 — zipper over hiccup forms (and form lists)."""
    return zipper(
        lambda node: isinstance(node, (list, tuple)),
        _hiccup_children,
        _hiccup_make,
        root,
    )
