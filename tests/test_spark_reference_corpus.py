"""The reference's OWN test corpus through the DISTRIBUTED engine.

North-star contract (BASELINE.json): extracted/rendered output must be
byte-identical per url "across hickory.test.core round-trip cases and
hickory.test.select's full selector corpus". The pure-Python engine is
pinned to the reference by the golden-test ports (test_parse /
test_render / test_select); this module closes the loop by pushing the
same corpus through the Spark paths — Arrow-batched mapInPandas render
and the relational selector engine over the exploded node table — and
asserting they agree byte-for-byte / count-for-count.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_select import HTML1, HTML2  # reference select.cljc:9-42 fixtures

# render.cljc / core.cljc fixture documents (full documents only —
# fragments go through parse_fragment, exercised in test_render.py)
CORPUS = {
    "select1": HTML1,
    "select2": HTML2,
    "tagsoup": '<!DOCTYPE html><P><!--hi--><a href=foo id="bar">hi',  # render.cljc:11
    "void": "<html><head></head><body>Hi<br>There</body></html>",  # render.cljc:14
    "core1": "<a href=\"foo\">foo</a>",  # core.cljc:8
    "core2": '<a href="foo"><!-- comment --><div>bar</div></a>',  # core.cljc:46
    "entities": "<html><head></head><body>ABC&amp;&#x200b;DEF</body></html>",
    "doctype_public": (
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
        '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">'
        "<html><head></head><body></body></html>"
    ),  # render.cljc:30-36
    "truncated_close": "<html><head></head><body>Hi</body",  # render.cljc:43
    "pre_ws": "<html><head></head><body><pre>  ws  </pre> </body></html>",
}


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-refcorpus", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def corpus_pages(spark):
    rows = [(name, html.encode("utf-8")) for name, html in CORPUS.items()]
    return spark.createDataFrame(rows, "url string, html binary").cache()


def test_distributed_render_byte_identity(spark, corpus_pages):
    """Spark-path render bytes == pure-path render bytes (which the
    golden ports pin to the reference) for every corpus document."""
    import pandas as pd

    from hickoryspark import parse, as_hickory, hickory_to_html

    def gen(batches):
        for b in batches:
            if not len(b):
                continue
            out = [
                hickory_to_html(as_hickory(parse(bytes(h).decode("utf-8"))))
                for h in b["html"]
            ]
            yield pd.DataFrame({"url": b["url"], "rendered": out})

    got = {
        r["url"]: r["rendered"]
        for r in corpus_pages.mapInPandas(
            gen, "url string, rendered string"
        ).collect()
    }
    expected = {
        name: hickory_to_html(as_hickory(parse(html)))
        for name, html in CORPUS.items()
    }
    assert got == expected
    # spot-pin two reference goldens directly (render.cljc:11-15)
    assert got["tagsoup"] == (
        '<!DOCTYPE html><html><head></head><body><p><!--hi-->'
        '<a href="foo" id="bar">hi</a></p></body></html>'
    )
    assert got["void"] == "<html><head></head><body>Hi<br>There</body></html>"


def test_relational_selectors_on_reference_corpus(spark, corpus_pages):
    """Every selector family from select.cljc, evaluated RELATIONALLY
    on the exploded node table over the reference fixtures, must match
    the interpreter (itself pinned by the test_select ports)."""
    from pyspark.sql import functions as F

    import hickoryspark.select as S
    from hickoryspark import parse, as_hickory
    from hickoryspark.spark import selectors_rel as R
    from hickoryspark.spark.nodes_table import explode_nodes

    w = R.where
    cases = {
        "tag": (w(R.p_tag("span")), S.tag("span")),
        "class": (w(R.p_class("cool")), S.cls("cool")),
        "id": (w(R.p_id("attrspan")), S.id_("attrspan")),
        "attr": (w(R.p_attr("disabled")), S.attr("disabled")),
        "any": (w(R.p_element()), S.any_),
        "elem_child": (w(R.p_element_child()), S.element_child),
        "root": (w(R.p_root()), S.root),
        "nth2_1": (w(R.p_nth_child(2, 1)), S.nth_child(2, 1)),
        "nth_last": (w(R.p_nth_last_child(2, 0)), S.nth_last_child(2, 0)),
        "first": (w(R.p_first_child()), S.first_child),
        "last": (w(R.p_last_child()), S.last_child),
        "and": (
            R.and_rel(w(R.p_tag("div")), w(R.p_class("cool"))),
            S.and_(S.tag("div"), S.cls("cool")),
        ),
        "or": (
            R.or_rel(w(R.p_tag("a")), w(R.p_tag("span"))),
            S.or_(S.tag("a"), S.tag("span")),
        ),
        "el_not": (R.el_not_rel(w(R.p_tag("div"))), S.el_not(S.tag("div"))),
        "child": (
            R.child_rel(w(R.p_tag("body")), w(R.p_tag("div")), w(R.p_tag("span"))),
            S.child(S.tag("body"), S.tag("div"), S.tag("span")),
        ),
        "descendant": (
            R.descendant_rel(w(R.p_tag("body")), w(R.p_tag("div"))),
            S.descendant(S.tag("body"), S.tag("div")),
        ),
        "has_child": (R.has_child_rel(w(R.p_tag("span"))), S.has_child(S.tag("span"))),
        "has_desc": (
            R.has_descendant_rel(w(R.p_id("deepestdiv"))),
            S.has_descendant(S.id_("deepestdiv")),
        ),
        "follow_adj": (
            R.follow_adjacent_rel(w(R.p_tag("h1")), w(R.p_tag("p"))),
            S.follow_adjacent(S.tag("h1"), S.tag("p")),
        ),
        "follow": (
            R.follow_rel(w(R.p_tag("h1")), w(R.p_tag("a"))),
            S.follow(S.tag("h1"), S.tag("a")),
        ),
    }

    nodes = explode_nodes(corpus_pages).cache()
    rel = {
        name: {
            (r["url"], r["pre_ord"])
            for r in sel(nodes).select("url", "pre_ord").collect()
        }
        for name, (sel, _) in cases.items()
    }

    trees = {name: as_hickory(parse(html)) for name, html in CORPUS.items()}
    for name, (_, isel) in cases.items():
        expected = set()
        for url, tree in trees.items():
            for loc in S.select_locs(isel, tree):
                expected.add((url, loc.i))  # storage index IS pre-order
        assert rel[name] == expected, f"selector {name} diverges"


def test_cross_engine_regressions(spark):
    """Cases where the relational engine historically diverged from
    the interpreter: an+b stride with pos < c, composite selectors
    inside sibling combinators, and n-ary sibling chains."""
    import hickoryspark.select as S
    from hickoryspark import parse, as_hickory
    from hickoryspark.spark import selectors_rel as R
    from hickoryspark.spark.nodes_table import explode_nodes

    w = R.where
    docs = {
        "five": "<div><p>1</p><p>2</p><p>3</p><p>4</p><p>5</p></div>",
        "comp": '<div><p id="a">x</p><div id="b"><em>y</em></div>'
                '<span id="c">z</span></div>',
        # non-element siblings interleaved: text + comments between
        # elements exercise the virtual-position arithmetic
        "mixed": "<div><h1>t</h1><!--c-->text<p>y</p>tail</div>",
    }
    cases = {
        # (pos - c) % n == 0 must match BELOW c too: positions 1,3,5
        "stride_below_c": (
            R.and_rel(w(R.p_tag("p")), w(R.p_nth_child(2, 3))),
            S.and_(S.tag("p"), S.nth_child(2, 3)),
        ),
        # composite B selector in a sibling combinator evaluates
        # against the FULL node table, not the pre-filtered side
        "composite_sibling": (
            R.follow_adjacent_rel(w(R.p_tag("p")), R.has_child_rel(w(R.p_tag("em")))),
            S.follow_adjacent(S.tag("p"), S.has_child(S.tag("em"))),
        ),
        # n-ary chains: 3-selector follow / follow-adjacent
        "nary_follow": (
            R.follow_rel(w(R.p_tag("p")), w(R.p_tag("div")), w(R.p_tag("span"))),
            S.follow(S.tag("p"), S.tag("div"), S.tag("span")),
        ),
        "nary_adjacent": (
            R.follow_adjacent_rel(
                w(R.p_tag("p")), w(R.p_tag("div")), w(R.p_tag("span"))
            ),
            S.follow_adjacent(S.tag("p"), S.tag("div"), S.tag("span")),
        ),
        "nary_precede": (
            R.precede_rel(w(R.p_tag("p")), w(R.p_tag("div")), w(R.p_tag("span"))),
            S.precede(S.tag("p"), S.tag("div"), S.tag("span")),
        ),
        # NON-ELEMENT anchors: the reference's element-sibling moves
        # start from wherever the anchor loc is — text/comment anchors
        # must match (left/right-of-node-type element semantics)
        "text_anchor_follow_adj": (
            R.follow_adjacent_rel(w(R.p_tag("h1")), w(R.p_node_type("text"))),
            S.follow_adjacent(S.tag("h1"), S.node_type("text")),
        ),
        "comment_anchor_single": (
            R.follow_adjacent_rel(w(R.p_node_type("comment"))),
            S.follow_adjacent(S.node_type("comment")),
        ),
        "text_anchor_follow": (
            R.follow_rel(w(R.p_tag("h1")), w(R.p_node_type("text"))),
            S.follow(S.tag("h1"), S.node_type("text")),
        ),
        "text_anchor_precede": (
            R.precede_rel(w(R.p_node_type("text")), w(R.p_tag("p"))),
            S.precede(S.node_type("text"), S.tag("p")),
        ),
    }

    pages = spark.createDataFrame(
        [(k, v.encode()) for k, v in docs.items()], "url string, html binary"
    )
    nodes = explode_nodes(pages).cache()
    for name, (rsel, isel) in cases.items():
        got = {
            (r["url"], r["pre_ord"])
            for r in rsel(nodes).select("url", "pre_ord").collect()
        }
        expected = set()
        for url, html in docs.items():
            tree = as_hickory(parse(html))
            for loc in S.select_locs(isel, tree):
                expected.add((url, loc.i))
        assert got == expected, f"{name}: {got} != {expected}"
