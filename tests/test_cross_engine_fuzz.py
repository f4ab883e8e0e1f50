"""Seeded cross-engine fuzz: random DOMs x random selector programs —
the interpreter (select.py) and the relational engine (selectors_rel)
must produce IDENTICAL (url, pre-order) match sets. Deterministic
seed, so failures are reproducible; this is the CLAUDE.md
two-engines-agree invariant tested beyond the hand-written cases.
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = ["div", "p", "span", "a", "b", "ul", "li", "h1", "em"]
CLASSES = ["c1", "c2", "cool", "x"]
IDS = ["i1", "i2", "i3"]


def gen_table(rng: random.Random) -> str:
    """Messy table markup: unclosed rows/cells, stray text and elements
    inside table context (foster parenting), nested tables inside
    cells — the recovery paths the tree builder must keep in lockstep
    across both selector engines."""
    parts = ["<table>"]
    if rng.random() < 0.3:
        parts.append(rng.choice(["stray", "<b>oops", "<div>el</div>", " "]))
    for _ in range(rng.randint(1, 3)):
        parts.append(rng.choice(["<tr>", "<tr>", "<tbody><tr>"]))
        for _ in range(rng.randint(1, 3)):
            cell = rng.choice(["<td>", "<th>", '<td class="c1">'])
            content = rng.choice(
                ["x", "a&amp;b", "<span>s</span>", "<!--c-->",
                 "<table><tr><td>inner</td></tr></table>", ""]
            )
            parts.append(cell + content)
            if rng.random() < 0.5:
                parts.append("</td>" if cell.startswith("<td") else "</th>")
        if rng.random() < 0.4:
            parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def gen_foreign(rng: random.Random) -> str:
    """svg/math subtrees exercising the foreign-content tree shapes:
    plain foreign children, breakout tags, integration points holding
    HTML, self-closing foreign elements, and template blocks."""
    kind = rng.random()
    if kind < 0.25:
        body = "".join(
            rng.choice(["<circle/>", "<rect width='3'/>", "<g><path/></g>"])
            for _ in range(rng.randint(1, 3))
        )
        return f"<svg>{body}</svg>"
    if kind < 0.45:
        inner = rng.choice(
            ['<div class="c1">html</div>', "<p>para</p>",
             '<b id="main">x</b>', "words"]
        )
        return f"<svg><desc>{inner}</desc><circle/></svg>"
    if kind < 0.6:
        inner = rng.choice(['<ul><li class="c2">i</li></ul>', "<p>f</p>"])
        return f"<svg><foreignObject>{inner}</foreignObject></svg>"
    if kind < 0.75:
        # breakout: the div pops the svg
        return "<svg><metadata>m</metadata><div>broke out</div>"
    if kind < 0.9:
        return (
            "<math><mi>x</mi><mo>+</mo><mtext><b>bold</b></mtext>"
            "<annotation-xml encoding='text/html'><span>h</span>"
            "</annotation-xml></math>"
        )
    return rng.choice(
        ["<template><tr><td>t</td></tr></template>",
         "<template><p class='c1'>tp</p></template>"]
    )


def gen_html(rng: random.Random, max_depth: int = 4) -> str:
    def gen_node(depth: int) -> str:
        r = rng.random()
        if depth >= max_depth or r < 0.25:
            return rng.choice(["text", "spark words", " ", "x&y"])
        if r < 0.32:
            return "<!--note-->"
        if r < 0.40:
            return gen_table(rng)
        if r < 0.46:
            return gen_foreign(rng)
        tag = rng.choice(TAGS)
        attrs = ""
        if rng.random() < 0.4:
            attrs += f' class="{rng.choice(CLASSES)}"'
        if rng.random() < 0.2:
            attrs += f' id="{rng.choice(IDS)}"'
        kids = "".join(
            gen_node(depth + 1) for _ in range(rng.randint(0, 4))
        )
        return f"<{tag}{attrs}>{kids}</{tag}>"

    body = "".join(gen_node(1) for _ in range(rng.randint(1, 5)))
    return f"<html><head></head><body>{body}</body></html>"


def gen_selector_pairs(rng: random.Random):
    """One random selector as (relational, interpreter)."""
    import hickoryspark.select as S
    from hickoryspark.spark import selectors_rel as R

    w = R.where

    def atom():
        kind = rng.choice(["tag", "cls", "id", "type", "nth", "first", "any"])
        if kind == "tag":
            t = rng.choice(
                TAGS + ["table", "tr", "td", "tbody",
                        "svg", "circle", "desc", "foreignobject",
                        "mi", "template"]
            )
            return w(R.p_tag(t)), S.tag(t)
        if kind == "cls":
            c = rng.choice(CLASSES)
            return w(R.p_class(c)), S.cls(c)
        if kind == "id":
            i = rng.choice(IDS)
            return w(R.p_id(i)), S.id_(i)
        if kind == "type":
            t = rng.choice(["text", "comment", "element"])
            return w(R.p_node_type(t)), S.node_type(t)
        if kind == "nth":
            n, c = rng.choice([(2, 0), (2, 1), (3, 1), (0, 2)])
            return w(R.p_nth_child(n, c)), S.nth_child(n, c)
        if kind == "first":
            return w(R.p_first_child()), S.first_child
        return w(R.p_element()), S.any_

    def combo(depth: int):
        if depth <= 0 or rng.random() < 0.4:
            return atom()
        kind = rng.choice(
            ["and", "or", "not", "child", "desc", "has_child",
             "has_desc", "follow", "follow_adj", "precede"]
        )
        ra, ia = combo(depth - 1)
        rb, ib = combo(depth - 1)
        import hickoryspark.select as S2
        from hickoryspark.spark import selectors_rel as R2

        if kind == "and":
            return R2.and_rel(ra, rb), S2.and_(ia, ib)
        if kind == "or":
            return R2.or_rel(ra, rb), S2.or_(ia, ib)
        if kind == "not":
            return R2.not_rel(ra), S2.not_(ia)
        if kind == "child":
            return R2.child_rel(ra, rb), S2.child(ia, ib)
        if kind == "desc":
            return R2.descendant_rel(ra, rb), S2.descendant(ia, ib)
        if kind == "has_child":
            return R2.has_child_rel(ra), S2.has_child(ia)
        if kind == "has_desc":
            return R2.has_descendant_rel(ra), S2.has_descendant(ia)
        if kind == "follow":
            return R2.follow_rel(ra, rb), S2.follow(ia, ib)
        if kind == "follow_adj":
            return R2.follow_adjacent_rel(ra, rb), S2.follow_adjacent(ia, ib)
        return R2.precede_rel(ra, rb), S2.precede(ia, ib)

    return combo(2)


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="no spark env expected"
)
def test_cross_engine_fuzz():
    import hickoryspark.select as S
    from hickoryspark import parse, as_hickory
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.session import get_spark

    spark = get_spark(4, app_name="hickoryspark-fuzz", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(20260816)
    docs = {f"d{i}": gen_html(rng) for i in range(60)}
    pages = spark.createDataFrame(
        [(u, h.encode()) for u, h in docs.items()], "url string, html binary"
    )
    nodes = explode_nodes(pages).cache()
    nodes.count()
    trees = {u: as_hickory(parse(h)) for u, h in docs.items()}

    n_nonempty = 0
    for trial in range(24):
        rsel, isel = gen_selector_pairs(rng)
        got = {
            (r["url"], r["pre_ord"])
            for r in rsel(nodes).select("url", "pre_ord").collect()
        }
        expected = set()
        for u, tree in trees.items():
            for loc in S.select_locs(isel, tree):
                expected.add((u, loc.i))
        assert got == expected, f"trial {trial}: {got ^ expected}"
        if expected:
            n_nonempty += 1
    # the generator must actually exercise matches, not just empties
    assert n_nonempty >= 6
