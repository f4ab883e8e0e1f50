"""hickory.select's combinator algebra as relational operators.

Reference semantics: /root/reference/src/cljc/hickory/select.cljc.
Here a *selector* is a function ``N -> DataFrame`` taking the node
table (nodes_table.NODES_SCHEMA) and returning the subset of rows it
matches — the relational analogue of the reference's
``loc -> loc | nil`` (select.cljc:166-171). ``select`` =
``sel(N).orderBy("pre_ord")`` since pre-order is the storage order
(select.cljc:159-163).

Physical notes (what Catalyst does with these):
- node-local selectors (tag/class/id/attr/nth-*) are pure Column
  predicates → pushed into the scan, whole-stage codegen.
- ``child``/``follow-adjacent`` are url-local *equi*-joins on
  (url, parent_id) / (url, parent_id, elem_sib_pos±1) → shuffle-free
  if the node table is bucketed by url, sort-merge otherwise.
- ``descendant``/``has-descendant`` are interval joins on the
  pre-order labels (A.pre_ord < B.pre_ord <= A.subtree_end) — we add
  the url equi-key so Spark plans a sort-merge/hash join on url with
  the interval as a residual, never a broadcast-nested-loop over the
  whole table. The reference's O(N·subtree) warning
  (select.cljc:655-658) does not apply.

Usage note: composite selectors reference the node table SEVERAL
times (anchor + per-level + final semi-join). If ``nodes`` is the lazy
output of explode_nodes, every reference re-runs the Python parse —
cache() it or query a materialize_nodes() parquet table (parse once,
query many; that table is also what you'd bucket by url at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import (
    TYPE_COMMENT,
    TYPE_DOCTYPE,
    TYPE_DOCUMENT,
    TYPE_ELEMENT,
    TYPE_TEXT,
)

_TYPE_CODES = {
    "document": TYPE_DOCUMENT,
    "document-type": TYPE_DOCTYPE,
    "element": TYPE_ELEMENT,
    "comment": TYPE_COMMENT,
    "text": TYPE_TEXT,
}

_KEY = ["url", "node_id"]


# -- node-local predicates (Column level) -----------------------------------

def p_node_type(t: str) -> Column:
    """select.cljc:173-185 — :type equality, case-insensitive name."""
    code = _TYPE_CODES[t.lower()]
    return _with_parent_form(
        F.col("type") == F.lit(code), F.col("parent_type") == F.lit(code)
    )


def p_tag(t: str) -> Column:
    """select.cljc:187-199 — tag equality, case-insensitive; leading
    ':' stripped exactly like the interpreter's keyword-style args."""
    tv = str(t).lstrip(":").lower()
    return _with_parent_form(
        F.col("tag") == F.lit(tv), F.col("parent_tag") == F.lit(tv)
    )


def p_attr(name: str, value_pred: Column | None = None) -> Column:
    """select.cljc:201-230 — attrs contains key (lowercased); optional
    predicate over the raw value, evaluated only when the key exists."""
    k = str(name).lstrip(":").lower()
    has = F.map_contains_key(F.col("attrs"), F.lit(k))
    if value_pred is None:
        return has
    return has & value_pred


def attr_value(name: str) -> Column:
    return F.col("attrs").getItem(str(name).lstrip(":").lower())


def p_id(x: str) -> Column:
    """select.cljc:232-239 — case-insensitive id equality."""
    return p_attr("id", F.lower(attr_value("id")) == F.lit(str(x).lstrip(":").lower()))


def p_class(c: str) -> Column:
    """select.cljc:241-251 — class attr split on \\s+, lowercased,
    set-contains."""
    classes = F.split(F.lower(attr_value("class")), r"\s+")
    return p_attr("class", F.array_contains(classes, str(c).lstrip(":").lower()))


def p_element() -> Column:
    """`any`/`element` — CSS * (select.cljc:253-263)."""
    return _with_parent_form(
        F.col("type") == F.lit(TYPE_ELEMENT),
        F.col("parent_type") == F.lit(TYPE_ELEMENT),
    )


def p_element_child() -> Column:
    """element whose parent is also an element (select.cljc:265-274).
    parent_type is materialized at explode time — no self-join."""
    return p_element() & (F.col("parent_type") == F.lit(TYPE_ELEMENT))


def p_root() -> Column:
    """:tag == :html (select.cljc:276-281)."""
    return F.col("tag") == F.lit("html")


def p_nth_child(n: int, c: int = 0) -> Column:
    """select.cljc:377-393 — (nk+c)'th element child, 1-based, counting
    only element siblings; guarded by element-child. elem_sib_pos is the
    rank the reference derives by walking left over element siblings."""
    n, c = _resolve_nth(n, c)
    pos = F.col("elem_sib_pos")
    return p_element_child() & _stride(pos, n, c)


def p_nth_last_child(n: int, c: int = 0) -> Column:
    """select.cljc:396-412 — counted from the right: n_elem_sibs is the
    parent's element-child count, materialized at explode."""
    n, c = _resolve_nth(n, c)
    pos = F.col("n_elem_sibs") - F.col("elem_sib_pos") + 1
    return p_element_child() & _stride(pos, n, c)


def p_first_child() -> Column:
    """select.cljc:414-420."""
    return p_element_child() & (F.col("elem_sib_pos") == 1)


def p_last_child() -> Column:
    """select.cljc:422-428."""
    return p_element_child() & (F.col("elem_sib_pos") == F.col("n_elem_sibs"))


def _stride(pos: Column, n: int, c: int) -> Column:
    """The CSS an+b arithmetic of n-moves-until (select.cljc:297-327):
    n == 0 → exact distance c; else (pos - c) ≡ 0 (mod n) with the
    match at or past c in the stride direction."""
    if n == 0:
        return pos == c
    # reference semantics (select.cljc:318-326): match iff
    # (pos - c) mod n == 0 — no direction constraint; pos < c matches
    # whenever the congruence holds, exactly like the interpreter.
    return (pos - c) % n == 0


def _resolve_nth(n, c):
    if n == "odd":
        return 2, 1
    if n == "even":
        return 2, 0
    return int(n), int(c)


# -- nth-of-type needs a same-tag sibling rank → window ---------------------

def with_type_rank(nodes: DataFrame) -> DataFrame:
    """Adds tag_sib_pos / n_tag_sibs: rank among same-tag element
    siblings (select.cljc:329-375). One url-local window — at scale
    this is a per-document sort, no cross-document shuffle when the
    table is url-bucketed."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("url", "parent_id", "tag").orderBy("sib_pos")
    elem = p_element()
    return (
        nodes.withColumn(
            "tag_sib_pos",
            F.when(elem, F.row_number().over(w)).otherwise(F.lit(0)),
        ).withColumn(
            "n_tag_sibs",
            F.when(elem, F.count("*").over(
                Window.partitionBy("url", "parent_id", "tag")
            )).otherwise(F.lit(0)),
        )
    )


def p_nth_of_type(n: int, c: int, tag: str) -> Column:
    """Requires with_type_rank. select.cljc:329-351. Tag comparison is
    case-SENSITIVE (reference keyword equality) — mirrors the
    interpreter's nth_of_type, which only strips a leading ':'."""
    n, c = _resolve_nth(n, c)
    return (
        p_element_child()
        & (F.col("tag") == str(tag).lstrip(":"))
        & _stride(F.col("tag_sib_pos"), n, c)
    )


def p_nth_last_of_type(n: int, c: int, tag: str) -> Column:
    n, c = _resolve_nth(n, c)
    pos = F.col("n_tag_sibs") - F.col("tag_sib_pos") + 1
    return (
        p_element_child()
        & (F.col("tag") == str(tag).lstrip(":"))
        & _stride(pos, n, c)
    )


# -- selector = N -> DataFrame ----------------------------------------------
#
# Pure-predicate fusion (r6 optimization, guide §2.4 "remove shuffles
# outright"): a selector lifted from a plain Column predicate is
# row-local, so combinators can apply it as a Filter on their
# accumulated output instead of materializing it separately and
# re-intersecting with a join. ``where`` returns a ``_PureSel`` that
# still behaves as the plain ``nodes -> DataFrame`` closure, but
# carries (a) the predicate for AND-fusion and (b), when the predicate
# was built by p_tag/p_node_type/p_element (columns the node table
# also materializes for the PARENT row), its parent-transposed form —
# which lets a two-level ``child_rel`` collapse to a single Filter.
# Row sets are provably identical: a left-semi join of N against
# {rows of N | pred IS TRUE} keeps exactly the rows where pred IS
# TRUE, which is what Filter keeps (NULL predicate rows drop on both
# paths); anti-join fusion negates with coalesce(pred, false) so NULL
# keeps the row, matching the join's key-absence semantics.


class _PureSel:
    """Selector lifted from a row-local Column predicate."""

    __slots__ = ("pred", "parent_form")

    def __init__(self, pred: Column):
        self.pred = pred
        # NB: Column.__getattr__ fabricates a field-extraction column
        # for ANY unknown attribute, so a plain getattr default never
        # fires — read the instance dict directly.
        self.parent_form = pred.__dict__.get("_hickory_parent_form")

    def __call__(self, nodes: DataFrame) -> DataFrame:
        return nodes.where(self.pred)


def _with_parent_form(pred: Column, parent_form: Column) -> Column:
    pred._hickory_parent_form = parent_form
    return pred


def where(pred: Column):
    """Lift a Column predicate to a relational selector."""
    return _PureSel(pred)


def sel_find_in_text(pattern: str):
    """select.cljc:283-295 — some *direct* string child matches the
    regex. Left-semi join of candidate parents against matching TEXT
    rows on (url, parent_id) — url-local equi-join."""

    def run(nodes: DataFrame) -> DataFrame:
        texts = (
            nodes.where(
                (F.col("type") == TYPE_TEXT) & F.col("text").rlike(pattern)
            )
            .select(F.col("url").alias("u"), F.col("parent_id").alias("p"))
            .distinct()
        )
        return nodes.join(
            texts,
            (nodes["url"] == texts["u"]) & (nodes["node_id"] == texts["p"]),
            "left_semi",
        )

    return run


def and_rel(*sels):
    """select.cljc:434-440 — intersection on the node key. Pure
    predicate operands fuse into Filters (identical row set: semi-join
    against {pred IS TRUE} == Filter(pred)); composite operands keep
    the left-semi join. All operands filter the SAME node table, so
    evaluating the composite ones first never changes the output rows
    or columns — it only decides which plan subtree provides them.
    Fully-pure conjunctions compose to one _PureSel so enclosing
    combinators (child_rel) can fuse further."""
    if all(isinstance(s, _PureSel) for s in sels):
        pred = sels[0].pred
        for s in sels[1:]:
            pred = pred & s.pred
        return _PureSel(pred)

    def run(nodes: DataFrame) -> DataFrame:
        pures = [s for s in sels if isinstance(s, _PureSel)]
        comps = [s for s in sels if not isinstance(s, _PureSel)]
        out = comps[0](nodes)
        for s in pures:
            out = out.where(s.pred)
        for s in comps[1:]:
            out = out.join(s(nodes).select(*_KEY), _KEY, "left_semi")
        return out

    return run


def or_rel(*sels):
    """select.cljc:442-448 — union-distinct on the node key. All-pure
    operands fuse to one OR Filter: a row is in the union iff some
    branch predicate IS TRUE, which is exactly when the OR is TRUE
    (TRUE|NULL = TRUE, NULL|FALSE = NULL → dropped on both paths),
    and the node table is unique-keyed so no distinct is needed."""
    if all(isinstance(s, _PureSel) for s in sels):
        pred = sels[0].pred
        for s in sels[1:]:
            pred = pred | s.pred
        return _PureSel(pred)

    def run(nodes: DataFrame) -> DataFrame:
        out = sels[0](nodes)
        for s in sels[1:]:
            out = out.unionByName(s(nodes))
        return out.dropDuplicates(_KEY)

    return run


def not_rel(sel):
    """select.cljc:450-456 — complement over *all* node types. A pure
    operand fuses to Filter(NOT coalesce(pred, false)): the anti-join
    keeps rows absent from {pred IS TRUE}, i.e. pred FALSE *or* NULL —
    coalesce makes the negation keep NULL rows too."""
    if isinstance(sel, _PureSel):
        return _PureSel(~F.coalesce(sel.pred, F.lit(False)))
    return lambda nodes: nodes.join(sel(nodes).select(*_KEY), _KEY, "left_anti")


def el_not_rel(sel):
    """select.cljc:458-466 — element AND not(sel)."""
    if isinstance(sel, _PureSel):
        return _PureSel(p_element() & ~F.coalesce(sel.pred, F.lit(False)))
    return lambda nodes: nodes.where(p_element()).join(
        sel(nodes).select(*_KEY), _KEY, "left_anti"
    )


def child_rel(*sels):
    """CSS `A > B > C` (select.cljc:517-529): anchored at the *last*
    selector; chained url-local equi-joins on parent_id.

    Two-level fusion: when the parent selector is a pure predicate
    over columns the node table ALSO materializes for the parent row
    (tag / type → parent_tag / parent_type), the whole chain is one
    Filter on the anchor — `div > p` becomes
    ``tag = 'p' AND parent_tag = 'div'`` with zero joins. Identical
    rows: the walk join matched anchors whose unique parent row
    satisfied the parent predicate; parent_tag/parent_type ARE that
    parent row's tag/type (NULL for the root, which the equi-join
    likewise never matched). Longer chains would need grandparent
    columns and keep the join walk."""
    if len(sels) == 2 and (
        isinstance(sels[0], _PureSel) and sels[0].parent_form is not None
    ):
        parent_form = sels[0].parent_form
        anchor = sels[1]
        if isinstance(anchor, _PureSel):
            return _PureSel(anchor.pred & parent_form)
        return lambda nodes: anchor(nodes).where(parent_form)

    def run_chain(nodes: DataFrame) -> DataFrame:
        # walk from the anchor upward, keeping (url, anchor_id, cur_parent)
        anchor = sels[-1](nodes).select(
            "url", F.col("node_id").alias("anchor_id"), F.col("parent_id").alias("cur")
        )
        cur = anchor
        for s in reversed(sels[:-1]):
            lvl = s(nodes).select(
                F.col("url").alias("u"),
                F.col("node_id").alias("m"),
                F.col("parent_id").alias("next_parent"),
            )
            cur = (
                cur.join(lvl, (cur["url"] == lvl["u"]) & (cur["cur"] == lvl["m"]))
                .select("url", "anchor_id", F.col("next_parent").alias("cur"))
            )
        matched = cur.select("url", F.col("anchor_id").alias("node_id")).distinct()
        return nodes.join(matched, _KEY, "left_semi")

    return run_chain


def has_child_rel(sel):
    """∃ direct child matching sel (select.cljc:531-549) — left-semi
    join on (url, parent_id)."""

    def run(nodes: DataFrame) -> DataFrame:
        kids = sel(nodes).select(
            F.col("url").alias("u"), F.col("parent_id").alias("p")
        ).distinct()
        return nodes.join(
            kids,
            (nodes["url"] == kids["u"]) & (nodes["node_id"] == kids["p"]),
            "left_semi",
        )

    return run


def parent_rel(*sels):
    """compose-unary has-child (select.cljc:551-563): selects the *top*
    of a direct-child chain."""
    out = sels[-1]
    for s in reversed(sels[:-1]):
        prev = out
        out = and_rel(s, has_child_rel(prev))
    return out


def descendant_rel(*sels):
    """CSS `A B C` (select.cljc:634-649): pre-order interval joins,
    anchored at the last selector. Equi-key url + interval residual."""

    def run(nodes: DataFrame) -> DataFrame:
        anchor = sels[-1](nodes).select(
            "url",
            F.col("node_id").alias("anchor_id"),
            F.col("pre_ord").alias("cur_pre"),
        )
        cur = anchor
        for s in reversed(sels[:-1]):
            anc = s(nodes).select(
                F.col("url").alias("u"),
                F.col("pre_ord").alias("a_pre"),
                F.col("subtree_end").alias("a_end"),
            )
            cur = (
                cur.join(
                    anc,
                    (cur["url"] == anc["u"])
                    & (anc["a_pre"] < cur["cur_pre"])
                    & (cur["cur_pre"] <= anc["a_end"]),
                )
                .select("url", "anchor_id", F.col("a_pre").alias("cur_pre"))
                .dropDuplicates(["url", "anchor_id", "cur_pre"])
            )
        matched = cur.select("url", F.col("anchor_id").alias("node_id")).distinct()
        return nodes.join(matched, _KEY, "left_semi")

    return run


def has_descendant_rel(sel):
    """∃ descendant matching sel (select.cljc:651-678) — interval
    semi-join; O(matches) not O(N·subtree)."""

    def run(nodes: DataFrame) -> DataFrame:
        d = sel(nodes).select(
            F.col("url").alias("u"), F.col("pre_ord").alias("d_pre")
        )
        return nodes.join(
            d,
            (nodes["url"] == d["u"])
            & (nodes["pre_ord"] < d["d_pre"])
            & (d["d_pre"] <= nodes["subtree_end"]),
            "left_semi",
        )

    return run


def ancestor_rel(*sels):
    """compose-unary has-descendant (select.cljc:680-693)."""
    out = sels[-1]
    for s in reversed(sels[:-1]):
        prev = out
        out = and_rel(s, has_descendant_rel(prev))
    return out


def _sibling_chain_rel(sels, anchor_last: bool, adjacent: bool):
    """Shared n-ary engine for follow/precede[-adjacent]
    (select.cljc:489-515 / 597-632 instantiated with element-sibling
    moves): anchored at the last (follow-*) or first (precede-*)
    selector, walking element siblings within (url, parent_id) via
    elem_sib_pos arithmetic. EVERY selector evaluates against the full
    node table, so composite selectors (has_child_rel etc.) compose
    correctly; the walk itself is a chain of url-local joins carrying
    (anchor_id, current position)."""
    if len(sels) == 1:
        # a 1-selector chain is just the selector (no move happens);
        # the anchor is NOT required to be an element (select.cljc
        # ordered-adjacent applies moves only BETWEEN selectors)
        return sels[0]
    chain = list(reversed(sels[:-1])) if anchor_last else list(sels[1:])
    anchor_sel = sels[-1] if anchor_last else sels[0]
    # moving left (toward earlier siblings) from a follow-anchor;
    # moving right from a precede-anchor
    if anchor_last:
        offset = (
            (lambda cur, s: s == cur - 1) if adjacent else (lambda cur, s: s < cur)
        )
    else:
        offset = (
            (lambda cur, s: s == cur + 1) if adjacent else (lambda cur, s: s > cur)
        )

    def run(nodes: DataFrame) -> DataFrame:
        # anchor may be ANY node type (left/right-of-node-type element
        # starts from wherever the anchor is): its VIRTUAL element
        # position makes the uniform +-1 arithmetic work — an element
        # uses its own rank; a text/comment node with k element
        # siblings to its left sits "between" ranks k and k+1.
        if anchor_last:  # moving left: nearest element left is at v-1
            vpos = F.when(p_element(), F.col("elem_sib_pos")).otherwise(
                F.col("n_elems_left") + 1
            )
        else:  # moving right: nearest element right is at v+1
            vpos = F.when(p_element(), F.col("elem_sib_pos")).otherwise(
                F.col("n_elems_left")
            )
        cur = anchor_sel(nodes).select(
            "url",
            F.col("node_id").alias("anchor_id"),
            F.col("parent_id").alias("par"),
            vpos.alias("cur"),
        )
        for s in chain:
            lvl = s(nodes).where(p_element()).select(
                F.col("url").alias("u"),
                F.col("parent_id").alias("p"),
                F.col("elem_sib_pos").alias("s_pos"),
            )
            cur = (
                cur.join(
                    lvl,
                    (cur["url"] == lvl["u"])
                    & (cur["par"] == lvl["p"])
                    & offset(cur["cur"], lvl["s_pos"]),
                )
                .select("url", "anchor_id", "par", F.col("s_pos").alias("cur"))
            )
        matched = cur.select("url", F.col("anchor_id").alias("node_id")).distinct()
        return nodes.join(matched, _KEY, "left_semi")

    return run


def follow_adjacent_rel(*sels):
    """CSS `A + B + ...` (select.cljc:565-579): selects the LAST
    element; each earlier selector matches the immediately-preceding
    element sibling."""
    return _sibling_chain_rel(sels, anchor_last=True, adjacent=True)


def precede_adjacent_rel(*sels):
    """mirror — selects the FIRST element of the adjacent chain
    (select.cljc:581-595)."""
    return _sibling_chain_rel(sels, anchor_last=False, adjacent=True)


def follow_rel(*sels):
    """CSS `A ~ B ~ ...` (select.cljc:695-708): selects the last
    element; earlier selectors match strictly-earlier element siblings
    in order, gaps allowed."""
    return _sibling_chain_rel(sels, anchor_last=True, adjacent=False)


def precede_rel(*sels):
    """mirror of follow — selects the first element (select.cljc:710-723)."""
    return _sibling_chain_rel(sels, anchor_last=False, adjacent=False)


def select_rel(sel, nodes: DataFrame) -> DataFrame:
    """Full select driver (select.cljc:159-163): document order."""
    return sel(nodes).orderBy("url", "pre_ord")
