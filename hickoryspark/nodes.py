"""Flat structure-of-arrays node table — the engine's core IR.

A parsed document is "shredded" into one row per hickory node with
pre-order interval labeling (SURVEY.md §1.4): node B is a descendant of
A iff ``A.id < B.id <= subtree_end[A]`` — the boundary computed by the
reference's ``after-subtree`` (/root/reference/src/cljc/hickory/
select.cljc:101-113). Pre-order id == storage index, so document-order
selection is a mask + flatnonzero.

The zipper (src/cljc/hickory/zip.cljc:8-16) maps to the pointer columns:
parent / first_child / next_sib / prev_sib (+ element-filtered sibling
pointers used by the nth-*/sibling selectors, select.cljc:77-99).

Note: comments are branch nodes in the reference zipper (branch? =
"not a string", zip.cljc:12), so a comment's text is a child TEXT row
here, exactly as zip/next visits it.
"""

from __future__ import annotations

import numpy as np

TYPE_DOCUMENT = 0
TYPE_DOCTYPE = 1
TYPE_ELEMENT = 2
TYPE_COMMENT = 3
TYPE_TEXT = 4

TYPE_NAMES = {
    TYPE_DOCUMENT: "document",
    TYPE_DOCTYPE: "document-type",
    TYPE_ELEMENT: "element",
    TYPE_COMMENT: "comment",
    TYPE_TEXT: "text",
}


class Doc:
    """Immutable flat view of one parsed document (or fragment root)."""

    __slots__ = (
        "n",
        "types",
        "tags",
        "attrs",
        "texts",
        "parent",
        "depth",
        "sib_pos",
        "elem_sib_pos",
        "n_elems_left",
        "n_elem_children",
        "subtree_end",
        "first_child",
        "next_sib",
        "prev_sib",
        "prev_elem",
        "next_elem",
    )

    def __init__(self, n: int) -> None:
        self.n = n
        self.types = np.zeros(n, dtype=np.int8)
        self.tags: list[str | None] = [None] * n
        self.attrs: list[dict | None] = [None] * n
        self.texts: list[str | None] = [None] * n
        self.parent = np.full(n, -1, dtype=np.int32)
        self.depth = np.zeros(n, dtype=np.int32)
        self.sib_pos = np.zeros(n, dtype=np.int32)
        self.elem_sib_pos = np.zeros(n, dtype=np.int32)  # 1-based, 0 = non-elem
        self.n_elems_left = np.zeros(n, dtype=np.int32)  # elem sibs strictly left
        self.n_elem_children = np.zeros(n, dtype=np.int32)
        self.subtree_end = np.zeros(n, dtype=np.int32)
        self.first_child = np.full(n, -1, dtype=np.int32)
        self.next_sib = np.full(n, -1, dtype=np.int32)
        self.prev_sib = np.full(n, -1, dtype=np.int32)
        self.prev_elem = np.full(n, -1, dtype=np.int32)
        self.next_elem = np.full(n, -1, dtype=np.int32)

    # -- tree reconstruction ------------------------------------------------

    def node(self, i: int):
        """Materialize the hickory node (dict tree / string) rooted at i."""
        t = self.types[i]
        if t == TYPE_TEXT:
            return self.texts[i]
        built: dict[int, object] = {}
        end = int(self.subtree_end[i])
        types = self.types[i : end + 1].tolist()
        parent = self.parent[i : end + 1].tolist()
        for j in range(i, end + 1):
            tj = types[j - i]
            if tj == TYPE_TEXT:
                node_j: object = self.texts[j]
            elif tj == TYPE_ELEMENT:
                node_j = {
                    "type": "element",
                    "attrs": dict(self.attrs[j]) if self.attrs[j] else None,
                    "tag": self.tags[j],
                    "content": [],
                }
            elif tj == TYPE_COMMENT:
                node_j = {"type": "comment", "content": []}
            elif tj == TYPE_DOCTYPE:
                node_j = {
                    "type": "document-type",
                    "attrs": dict(self.attrs[j]) if self.attrs[j] else None,
                }
            else:
                node_j = {"type": "document", "content": []}
            built[j] = node_j
            if j != i:
                built[parent[j - i]]["content"].append(node_j)  # type: ignore[index]
        for node_j in built.values():
            if isinstance(node_j, dict) and "content" in node_j and not node_j["content"]:
                node_j["content"] = None
        return built[i]

    def children(self, i: int) -> list[int]:
        out = []
        c = self.first_child[i]
        while c != -1:
            out.append(c)
            c = self.next_sib[c]
        return out

    def direct_text(self, i: int) -> list[str]:
        """Direct string children of node i (find-in-text's domain)."""
        out = []
        c = self.first_child[i]
        while c != -1:
            if self.types[c] == TYPE_TEXT:
                out.append(self.texts[c])
            c = self.next_sib[c]
        return out


def flatten(tree) -> Doc:
    """Flatten a hickory tree (dict / string) into a Doc, iteratively.

    Hot path: one pre-order pass over plain Python lists (per-node
    scalar writes into NumPy arrays are ~10x slower), converted to the
    Doc's int arrays once at the end.
    """
    types: list[int] = []
    tags: list = []
    attrs: list = []
    texts: list = []
    parent: list[int] = []
    sib_pos: list[int] = []
    elem_pos: list[int] = []
    elems_left: list[int] = []  # element siblings strictly to the left
    first_child: list[int] = []
    next_sib: list[int] = []
    prev_sib: list[int] = []
    prev_elem: list[int] = []
    next_elem: list[int] = []
    # per-node running child state (indexed by node id, filled on visit)
    last_sib: list[int] = []
    last_elem_child: list[int] = []
    sib_cnt: list[int] = []
    elem_cnt: list[int] = []

    work: list[tuple[object, int]] = [(tree, -1)]
    while work:
        node, p = work.pop()
        i = len(parent)
        parent.append(p)
        tags.append(None)
        attrs.append(None)
        texts.append(None)
        first_child.append(-1)
        next_sib.append(-1)
        prev_sib.append(-1)
        prev_elem.append(-1)
        next_elem.append(-1)
        last_sib.append(-1)
        last_elem_child.append(-1)
        sib_cnt.append(0)
        elem_cnt.append(0)
        if p >= 0:
            pos = sib_cnt[p]
            sib_pos.append(pos)
            sib_cnt[p] = pos + 1
            elems_left.append(elem_cnt[p])
            prev = last_sib[p]
            if prev != -1:
                next_sib[prev] = i
                prev_sib[i] = prev
            else:
                first_child[p] = i
            last_sib[p] = i
        else:
            sib_pos.append(0)
            elems_left.append(0)
        if isinstance(node, str):
            types.append(TYPE_TEXT)
            texts[i] = node
            elem_pos.append(0)
            continue
        ntype = node.get("type")
        if ntype == "element":
            types.append(TYPE_ELEMENT)
            tags[i] = node.get("tag")
            attrs[i] = node.get("attrs")
            if p >= 0:
                ec = elem_cnt[p] + 1
                elem_cnt[p] = ec
                elem_pos.append(ec)
                pe = last_elem_child[p]
                if pe != -1:
                    next_elem[pe] = i
                    prev_elem[i] = pe
                last_elem_child[p] = i
            else:
                elem_pos.append(0)
        else:
            elem_pos.append(0)
            if ntype == "comment":
                types.append(TYPE_COMMENT)
            elif ntype == "document-type":
                types.append(TYPE_DOCTYPE)
                attrs[i] = node.get("attrs")
            else:
                types.append(TYPE_DOCUMENT)
        content = node.get("content")
        if content:
            for child in reversed(content):
                work.append((child, i))

    n = len(parent)
    # depth: pre-order guarantees parent index < child index
    depth = [0] * n
    for i in range(1, n):
        depth[i] = depth[parent[i]] + 1
    # subtree_end: last pre-order index in each subtree, backward sweep
    end = list(range(n))
    for i in range(n - 1, 0, -1):
        p = parent[i]
        if end[p] < end[i]:
            end[p] = end[i]

    doc = Doc.__new__(Doc)
    doc.n = n
    doc.types = np.array(types, dtype=np.int8)
    doc.tags = tags
    doc.attrs = attrs
    doc.texts = texts
    doc.parent = np.array(parent, dtype=np.int32)
    doc.depth = np.array(depth, dtype=np.int32)
    doc.sib_pos = np.array(sib_pos, dtype=np.int32)
    doc.elem_sib_pos = np.array(elem_pos, dtype=np.int32)
    doc.n_elems_left = np.array(elems_left, dtype=np.int32)
    doc.n_elem_children = np.array(elem_cnt, dtype=np.int32)
    doc.subtree_end = np.array(end, dtype=np.int32)
    doc.first_child = np.array(first_child, dtype=np.int32)
    doc.next_sib = np.array(next_sib, dtype=np.int32)
    doc.prev_sib = np.array(prev_sib, dtype=np.int32)
    doc.prev_elem = np.array(prev_elem, dtype=np.int32)
    doc.next_elem = np.array(next_elem, dtype=np.int32)
    return doc
