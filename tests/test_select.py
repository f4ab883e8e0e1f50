"""Port of /root/reference/test/cljc/hickory/test/select.cljc (all deftests).

Exact match counts and node identities against the same two fixture
documents html1 (select.cljc:9-26) and html2 (:28-42).
"""

import re

import pytest

from hickoryspark import as_hickory, parse, parse_fragment
from hickoryspark import select as s
from hickoryspark.nodes import flatten
from hickoryspark.select import Loc

HTML1 = """<!DOCTYPE html>
    <!-- Comment 1 -->
    <html>
    <head></head>
    <body>
        <h1>Heading</h1>
        <p>Paragraph</p>
        <a href="http://example.com">Link</a>
        <div class="aclass bclass cool">
            <span disabled anotherattr="" thirdthing="44" id="attrspan" Capitalized="UPPERCASED">
                <div class="subdiv cool" id="deepestdiv">Div</div>
            </span>
            <!-- Comment 2 -->
            <span id="anid" class="line-feed-ahead cool">Span</span>
        </div>
    </body>
    </html>"""

HTML2 = """<!DOCTYPE html>
    <html>
    <head></head>
    <body>
        <p>Paragraph 1</p>
        <p>Paragraph 2</p>
        <p>Paragraph 3</p>
        <p>Paragraph 4</p>
        <p>Paragraph 5</p>
        <p>Paragraph 6</p>
        <p>Paragraph 7</p>
        <p>Paragraph 8</p>
    </body>
    </html>"""


def htree1():
    return as_hickory(parse(HTML1))


def htree2():
    return as_hickory(parse(HTML2))


def test_select_next_loc():
    # select.cljc:44-63
    doc = flatten(htree1())

    def find_comment(loc):
        return loc.type_name() == "comment"

    sel1 = s.select_next_loc(find_comment, Loc(doc, 0))
    assert sel1.type_name() == "comment"
    assert re.search(r"Comment 1", sel1.node()["content"][0])
    sel2 = s.select_next_loc(find_comment, sel1.next())
    assert sel2.type_name() == "comment"
    assert re.search(r"Comment 2", sel2.node()["content"][0])
    assert s.select_next_loc(find_comment, sel2.next()) is None


def test_select():
    # select.cljc:65-81
    htree = htree1()
    selection = s.select(lambda loc: loc.type_name() == "document-type", htree)
    assert len(selection) == 1 and selection[0]["type"] == "document-type"
    selection = s.select(lambda loc: loc.type_name() == "comment", htree)
    assert len(selection) == 2
    assert all(n["type"] == "comment" for n in selection)


def test_node_type():
    # select.cljc:87-98
    htree = htree1()
    selection = s.select(s.node_type("document-type"), htree)
    assert len(selection) == 1 and selection[0]["type"] == "document-type"
    selection = s.select(s.node_type("comment"), htree)
    assert len(selection) == 2 and all(n["type"] == "comment" for n in selection)


def test_tag():
    # select.cljc:100-116 — incl. case-insensitivity
    htree = htree1()
    for arg in ("h1", "H1"):
        selection = s.select(s.tag(arg), htree)
        assert len(selection) == 1 and selection[0]["tag"] == "h1"


def test_attr():
    # select.cljc:118-143
    htree = htree1()
    selection = s.select(s.attr("disabled"), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "attrspan"
    selection = s.select(s.attr("anotherattr"), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "attrspan"
    selection = s.select(s.attr("thirdthing", lambda v: v == "44"), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "attrspan"
    selection = s.select(
        s.attr("CAPITALIZED", lambda v: v.startswith("UPPER")), htree
    )
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "attrspan"
    selection = s.select(s.attr("notpresent", lambda v: v.startswith("never")), htree)
    assert selection == []


def test_id():
    # select.cljc:145-169
    htree = htree1()
    for arg in ("deepestdiv",):
        selection = s.select(s.id_(arg), htree)
        assert len(selection) == 1
        assert "deepestdiv" in selection[0]["attrs"]["id"]
    for arg in ("anid", "ANID"):
        selection = s.select(s.id_(arg), htree)
        assert len(selection) == 1
        assert "anid" in selection[0]["attrs"]["id"]


def test_class():
    # select.cljc:171-203
    htree = htree1()
    selection = s.select(s.cls("aclass"), htree)
    assert len(selection) == 1 and "aclass" in selection[0]["attrs"]["class"]
    selection = s.select(s.cls("cool"), htree)
    assert len(selection) == 3
    assert all("cool" in n["attrs"]["class"] for n in selection)
    selection = s.select(s.cls("Aclass"), htree)
    assert len(selection) == 1 and "aclass" in selection[0]["attrs"]["class"]
    selection = s.select(s.cls("line-feed-ahead"), htree)
    assert len(selection) == 1
    assert "line-feed-ahead" in selection[0]["attrs"]["class"]


def test_any():
    # select.cljc:205-210
    assert len(s.select(s.any_, htree1())) == 10


def test_element_child():
    # select.cljc:212-216
    assert len(s.select(s.element_child, htree1())) == 9


def test_root():
    # select.cljc:218-223
    selection = s.select(s.root, htree1())
    assert selection[0]["tag"] == "html"


def test_find_in_text():
    # select.cljc:225-245
    htree = htree1()
    selection = s.select(s.find_in_text(r"Heading"), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "h1"
    selection = s.select(s.find_in_text(r"Div"), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "div"
    locs = s.select_locs(
        s.child(s.tag("body"), s.find_in_text(r"Paragraph")), htree
    )
    assert len(locs) == 1
    assert locs[0].tag() == "p"
    assert locs[0].up().tag() == "body"
    selection = s.select(s.find_in_text(r"Paragraph"), htree2())
    assert len(selection) == 8 and all(n["tag"] == "p" for n in selection)


def test_n_moves_until():
    # select.cljc:247-256
    selection = s.select(
        s.and_(
            s.tag("div"),
            s.n_moves_until(0, 6, lambda l: l.up() if l else None, lambda l: l is None),
        ),
        htree1(),
    )
    assert selection[0]["attrs"]["id"] == "deepestdiv"


def test_nth_of_type():
    # select.cljc:258-264
    selection = s.select(s.nth_of_type(1, "body"), htree1())
    assert len(selection) == 1 and selection[0]["tag"] == "body"


def test_nth_last_of_type():
    # select.cljc:266-272
    selection = s.select(s.nth_last_of_type(1, "span"), htree1())
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "anid"


def test_nth_child():
    # select.cljc:274-315
    htree = htree1()
    selection = s.select(s.and_(s.tag("div"), s.nth_child(0, 1)), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "deepestdiv"
    selection = s.select(s.and_(s.tag("div"), s.nth_child(1, 1)), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.and_(s.tag("div"), s.nth_child("odd")), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "deepestdiv"
    selection = s.select(
        s.and_(s.node_type("element"), s.nth_child("even")), htree
    )
    assert len(selection) == 4 and selection[0]["type"] == "element"

    htree = htree2()
    selection = s.select(
        s.and_(s.node_type("element"), s.nth_child("even")), htree
    )
    assert len(selection) == 5
    assert all(n["tag"] in ("body", "p") for n in selection)
    selection = s.select(s.nth_child(3, 0), htree)
    assert len(selection) == 2 and all(n["tag"] == "p" for n in selection)
    selection = s.select(s.child(s.tag("body"), s.nth_child(3, 1)), htree)
    assert len(selection) == 3 and all(n["tag"] == "p" for n in selection)


def test_nth_last_child():
    # select.cljc:317-358
    htree = htree1()
    selection = s.select(s.and_(s.tag("div"), s.nth_last_child(0, 1)), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.and_(s.tag("div"), s.nth_last_child(1, 1)), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.and_(s.tag("div"), s.nth_last_child("odd")), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(
        s.and_(s.node_type("element"), s.nth_last_child("even")), htree
    )
    assert len(selection) == 4 and selection[0]["type"] == "element"

    htree = htree2()
    selection = s.select(
        s.and_(s.node_type("element"), s.nth_last_child("even")), htree
    )
    assert len(selection) == 5
    assert all(n["tag"] in ("head", "p") for n in selection)
    selection = s.select(s.nth_last_child(3, 0), htree)
    assert len(selection) == 2 and all(n["tag"] == "p" for n in selection)
    selection = s.select(s.child(s.tag("body"), s.nth_last_child(3, 1)), htree)
    assert len(selection) == 3 and all(n["tag"] == "p" for n in selection)


def test_first_child():
    # select.cljc:360-367
    selection = s.select(s.child(s.tag("div"), s.first_child), htree1())
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "attrspan"


def test_last_child():
    # select.cljc:369-376
    selection = s.select(s.child(s.tag("div"), s.last_child), htree1())
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "anid"


def test_and():
    # select.cljc:382-405
    htree = htree1()
    selection = s.select(s.and_(s.tag("div")), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.and_(s.tag("div"), s.cls("bclass")), htree)
    assert len(selection) == 1 and "bclass" in selection[0]["attrs"]["class"]
    selection = s.select(s.and_(s.cls("cool"), s.tag("span")), htree)
    assert len(selection) == 1 and selection[0]["attrs"]["id"] == "anid"
    selection = s.select(
        s.and_(s.cls("cool"), s.tag("span"), s.id_("attrspan")), htree
    )
    assert selection == []


def test_or():
    # select.cljc:407-424
    htree = htree1()
    selection = s.select(
        s.or_(s.tag("a"), s.cls("notpresent"), s.id_("nothere")), htree
    )
    assert len(selection) == 1 and all(n["tag"] == "a" for n in selection)
    selection = s.select(s.or_(s.tag("div")), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.or_(s.id_("deepestdiv"), s.cls("bclass")), htree)
    assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)


def _not_cool(n):
    cl = (n.get("attrs") or {}).get("class")
    return cl is None or "cool" not in cl


def test_not():
    # select.cljc:426-445
    htree = htree1()
    selection = s.select(
        s.and_(s.node_type("element"), s.not_(s.cls("cool"))), htree
    )
    assert len(selection) == 7
    assert all(n["type"] == "element" and _not_cool(n) for n in selection)
    selection = s.select(s.el_not(s.cls("cool")), htree)
    assert len(selection) == 7
    assert all(n["type"] == "element" and _not_cool(n) for n in selection)


def test_ordered_adjacent():
    # select.cljc:447-459
    selection = s.select(
        s.ordered_adjacent(
            lambda l: s.left_of_node_type(l, "element"),
            s.tag("body"),
            s.tag("head"),
        ),
        htree1(),
    )
    assert len(selection) == 1 and selection[0]["tag"] == "body"


def test_child():
    # select.cljc:461-499
    htree = htree1()
    assert s.select(s.child(s.el_not(s.any_)), htree) == []
    assert s.select(s.child(s.tag("html"), s.tag("div"), s.tag("span")), htree) == []
    selection = s.select(s.child(s.tag("body"), s.tag("div"), s.tag("span")), htree)
    assert len(selection) == 2 and all(n["tag"] == "span" for n in selection)
    selection = s.select(s.child(s.tag("div"), s.any_), htree)
    assert len(selection) == 2
    assert all(n["tag"] in ("span", "div") for n in selection)
    # doc string examples
    htree = as_hickory(parse('<div><span class="foo"><input disabled></input></span></div>'))
    selection = s.select(
        s.child(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert selection[0]["tag"] == "input"
    htree = as_hickory(
        parse('<div><span class="foo"><b><input disabled></input></b></span></div>')
    )
    assert (
        s.select(s.child(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree) == []
    )


HAS_CHILD_DOCS = [
    '<div id="outermost"><div><span id="innermost"></span></div></div>',
    '<div id="outermost"><div><span id="innermost"></span></div><span id="sib"></span></div>',
    '<div id="outermost"><span id="sib"></span><div><span id="innermost"></span></div></div>',
]


def test_has_child():
    # select.cljc:501-524
    for doc_src in HAS_CHILD_DOCS:
        htree = as_hickory(parse(doc_src))
        selection = s.select(s.has_child(s.id_("innermost")), htree)
        assert len(selection) == 1 and all(n["tag"] == "div" for n in selection)
        # descendant selector can peer up past the examined node
        selection = s.select(
            s.has_child(s.descendant(s.id_("outermost"), s.id_("innermost"))),
            htree,
        )
        assert len(selection) == 1 and all(n["tag"] == "div" for n in selection)
        assert s.select(s.has_child(s.tag("a")), htree) == []


def test_parent():
    # select.cljc:526-572
    htree = htree1()
    assert s.select(s.parent(s.el_not(s.any_)), htree) == []
    assert s.select(s.parent(s.tag("html"), s.tag("div"), s.tag("span")), htree) == []
    selection = s.select(s.parent(s.tag("body"), s.tag("div"), s.tag("span")), htree)
    assert len(selection) == 1 and all(n["tag"] == "body" for n in selection)
    selection = s.select(s.parent(s.tag("div"), s.any_), htree)
    assert len(selection) == 1 and all(n["tag"] == "div" for n in selection)
    selection = s.select(s.parent(s.any_, s.any_), htree)
    assert len(selection) == 4
    assert all(n["tag"] in ("html", "body", "div", "span") for n in selection)
    # doc string examples
    htree = as_hickory(parse('<div><span class="foo"><input disabled></input></span></div>'))
    selection = s.select(
        s.parent(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert selection[0]["tag"] == "div"
    htree = as_hickory(
        parse('<div><span class="foo"><b><input disabled></input></b></span></div>')
    )
    assert (
        s.select(s.parent(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree) == []
    )


def test_follow_adjacent():
    # select.cljc:574-594
    selection = s.select(s.follow_adjacent(s.tag("head"), s.tag("body")), htree1())
    assert len(selection) == 1 and selection[0]["tag"] == "body"
    htree = as_hickory(parse('<div>...</div><span class="foo">...</span>'))
    selection = s.select(s.follow_adjacent(s.tag("div"), s.cls("foo")), htree)
    assert selection[0]["tag"] == "span"
    htree = as_hickory(parse('<div>...</div><b>...</b><span class="foo">...</span>'))
    assert s.select(s.follow_adjacent(s.tag("div"), s.cls("foo")), htree) == []


def test_precede_adjacent():
    # select.cljc:596-617
    selection = s.select(s.precede_adjacent(s.tag("head"), s.tag("body")), htree1())
    assert len(selection) == 1 and selection[0]["tag"] == "head"
    htree = as_hickory(parse('<div>...</div><span class="foo">...</span>'))
    selection = s.select(s.precede_adjacent(s.tag("div"), s.cls("foo")), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "div"
    htree = as_hickory(parse('<div>...</div><b>...</b><span class="foo">...</span>'))
    assert s.select(s.precede_adjacent(s.tag("div"), s.cls("foo")), htree) == []


def test_ordered():
    # select.cljc:619-631
    selection = s.select(
        s.ordered(
            lambda l: s.left_of_node_type(l, "element"),
            s.tag("body"),
            s.tag("head"),
        ),
        htree1(),
    )
    assert len(selection) == 1 and selection[0]["tag"] == "body"


def test_descendant():
    # select.cljc:633-665
    htree = htree1()
    selection = s.select(s.descendant(s.tag("h1")), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "h1"
    selection = s.select(s.descendant(s.cls("cool"), s.tag("div")), htree)
    assert len(selection) == 1
    selection = s.select(s.descendant(s.tag("div"), s.any_), htree)
    assert len(selection) == 3
    # doc string examples
    htree = as_hickory(parse('<div><span class="foo"><input disabled></input></span></div>'))
    selection = s.select(
        s.descendant(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert len(selection) == 1 and selection[0]["tag"] == "input"
    htree = as_hickory(
        parse('<div><span class="foo"><b><input disabled></input></b></span></div>')
    )
    selection = s.select(
        s.descendant(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert len(selection) == 1 and selection[0]["tag"] == "input"


def test_has_descendant():
    # select.cljc:667-692
    for doc_src in HAS_CHILD_DOCS:
        htree = as_hickory(parse(doc_src))
        selection = s.select(
            s.and_(s.tag("div"), s.has_descendant(s.id_("innermost"))), htree
        )
        assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
        selection = s.select(
            s.and_(
                s.tag("div"),
                s.has_descendant(
                    s.descendant(s.id_("outermost"), s.tag("span"))
                ),
            ),
            htree,
        )
        assert len(selection) == 2 and all(n["tag"] == "div" for n in selection)
        assert s.select(s.has_descendant(s.tag("a")), htree) == []


def test_ancestor():
    # select.cljc:694-738
    htree = htree1()
    selection = s.select(s.ancestor(s.tag("h1")), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "h1"
    selection = s.select(s.ancestor(s.cls("cool"), s.tag("div")), htree)
    assert len(selection) == 1
    selection = s.select(s.ancestor(s.tag("div"), s.any_), htree)
    assert len(selection) == 1
    selection = s.select(s.ancestor(s.tag("span")), htree)
    assert len(selection) == 2
    selection = s.select(s.parent(s.any_, s.any_), htree)
    assert len(selection) == 4
    # doc string examples
    htree = as_hickory(parse('<div><span class="foo"><input disabled></input></span></div>'))
    selection = s.select(
        s.ancestor(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert len(selection) == 1 and selection[0]["tag"] == "div"
    htree = as_hickory(
        parse('<div><span class="foo"><b><input disabled></input></b></span></div>')
    )
    selection = s.select(
        s.ancestor(s.tag("div"), s.cls("foo"), s.attr("disabled")), htree
    )
    assert len(selection) == 1 and selection[0]["tag"] == "div"


def test_follow():
    # select.cljc:740-760
    selection = s.select(s.follow(s.tag("head"), s.tag("body")), htree1())
    assert len(selection) == 1 and selection[0]["tag"] == "body"
    htree = as_hickory(parse('<div>...</div><span class="foo">...</span>'))
    selection = s.select(s.follow(s.tag("div"), s.cls("foo")), htree)
    assert selection[0]["tag"] == "span"
    htree = as_hickory(parse('<div>...</div><b>...</b><span class="foo">...</span>'))
    selection = s.select(s.follow(s.tag("div"), s.cls("foo")), htree)
    assert selection[0]["tag"] == "span"


def test_precede():
    # select.cljc:762-783
    selection = s.select(s.precede(s.tag("head"), s.tag("body")), htree1())
    assert len(selection) == 1 and selection[0]["tag"] == "head"
    htree = as_hickory(parse('<div>...</div><span class="foo">...</span>'))
    selection = s.select(s.precede(s.tag("div"), s.cls("foo")), htree)
    assert len(selection) == 1 and selection[0]["tag"] == "div"
    htree = as_hickory(parse('<div>...</div><b>...</b><span class="foo">...</span>'))
    selection = s.select(s.precede(s.tag("div"), s.cls("foo")), htree)
    assert selection[0]["tag"] == "div"


def test_graceful_boundaries():
    # select.cljc:785-809
    hick = as_hickory(parse_fragment('<a><img href=""/></a>')[0])
    assert (
        s.select(s.child(s.follow_adjacent(s.tag("a"), s.tag("img"))), hick) == []
    )
    assert (
        s.select(
            s.child(s.follow_adjacent(s.tag("nonexistent"), s.tag("img"))), hick
        )
        == []
    )
    assert (
        s.select(
            s.child(s.follow_adjacent(s.tag("a"), s.tag("nonexistent"))), hick
        )
        == []
    )
    img = {"type": "element", "attrs": {"href": ""}, "tag": "img", "content": None}
    assert s.select(s.child(s.first_child), hick) == [img]
    assert s.select(s.child(s.last_child), hick) == [img]
