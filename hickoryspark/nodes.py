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
        for j in range(i, self.subtree_end[i] + 1):
            tj = self.types[j]
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
                built[self.parent[j]]["content"].append(node_j)  # type: ignore[index]
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
    """Flatten a hickory tree (dict / string) into a Doc, iteratively."""
    # Pass 1: count nodes.
    n = 0
    stack = [tree]
    while stack:
        node = stack.pop()
        n += 1
        if isinstance(node, dict):
            content = node.get("content")
            if content:
                stack.extend(content)
    doc = Doc(n)
    # Pass 2: pre-order assignment. Stack holds (node, parent_id, depth,
    # sib_pos, elem_sib_pos, prev_sib_id_cell).
    idx = 0
    # Each stack entry: (node, parent_id, depth)
    work: list[tuple[object, int, int]] = [(tree, -1, 0)]
    # per-parent running sibling state, keyed by parent id
    last_sib: dict[int, int] = {}
    last_elem: dict[int, int] = {}
    sib_count: dict[int, int] = {}
    elem_count: dict[int, int] = {}
    while work:
        node, parent_id, depth = work.pop()
        i = idx
        idx += 1
        doc.parent[i] = parent_id
        doc.depth[i] = depth
        if parent_id >= 0:
            pos = sib_count.get(parent_id, 0)
            doc.sib_pos[i] = pos
            sib_count[parent_id] = pos + 1
            prev = last_sib.get(parent_id, -1)
            if prev != -1:
                doc.next_sib[prev] = i
                doc.prev_sib[i] = prev
            else:
                doc.first_child[parent_id] = i
            last_sib[parent_id] = i
        if isinstance(node, str):
            doc.types[i] = TYPE_TEXT
            doc.texts[i] = node
            doc.subtree_end[i] = i
            continue
        ntype = node.get("type")
        if ntype == "element":
            doc.types[i] = TYPE_ELEMENT
            doc.tags[i] = node.get("tag")
            doc.attrs[i] = node.get("attrs")
            if parent_id >= 0:
                ecnt = elem_count.get(parent_id, 0) + 1
                elem_count[parent_id] = ecnt
                doc.elem_sib_pos[i] = ecnt
                pe = last_elem.get(parent_id, -1)
                if pe != -1:
                    doc.next_elem[pe] = i
                    doc.prev_elem[i] = pe
                last_elem[parent_id] = i
        elif ntype == "comment":
            doc.types[i] = TYPE_COMMENT
        elif ntype == "document-type":
            doc.types[i] = TYPE_DOCTYPE
            doc.attrs[i] = node.get("attrs")
        else:
            doc.types[i] = TYPE_DOCUMENT
        content = node.get("content")
        if content:
            for child in reversed(content):
                work.append((child, i, depth))
        # depth of children is depth+1; fix: we pushed with same depth
    # Recompute depth properly (children pushed with parent depth above).
    par = doc.parent
    for i in range(1, n):
        doc.depth[i] = doc.depth[par[i]] + 1
    # subtree_end: last pre-order index in each subtree. Nodes are in
    # pre-order, so sweep backwards: end[i] = max over children or i.
    end = doc.subtree_end
    end[:] = np.arange(n, dtype=np.int32)
    for i in range(n - 1, 0, -1):
        p = par[i]
        if end[p] < end[i]:
            end[p] = end[i]
    # element-children counts
    for i in range(n):
        p = par[i]
        if p >= 0 and doc.types[i] == TYPE_ELEMENT:
            doc.n_elem_children[p] += 1
    return doc
