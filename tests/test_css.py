"""CSS selector front-end (hickoryspark/css.py): parser, CSS-exact
An+B semantics, equivalence with hand-built selector algebra, and
interpreter-vs-relational cross-engine agreement."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hickoryspark.select as S
from hickoryspark import as_hickory, parse
from hickoryspark.css import CssError, css, parse_css

from tests.test_select import HTML1, HTML2  # reference select.cljc fixtures

TREES = {name: as_hickory(parse(h)) for name, h in
         {"select1": HTML1, "select2": HTML2}.items()}


def _matches(sel, trees=TREES):
    out = set()
    for name, tree in trees.items():
        for loc in S.select_locs(sel, tree):
            out.add((name, loc.i))
    return out


# ---------------------------------------------------------------------------
# equivalence with the hand-built algebra on the reference fixtures
# ---------------------------------------------------------------------------

EQUIV = [
    ("span", S.tag("span")),
    (".cool", S.cls("cool")),
    ("#attrspan", S.id_("attrspan")),
    ("[disabled]", S.attr("disabled")),
    ("*", S.element),
    ("div.cool", S.and_(S.tag("div"), S.cls("cool"))),
    ("body > div span",
     S.descendant(S.child(S.tag("body"), S.tag("div")), S.tag("span"))),
    ("h1 + p", S.follow_adjacent(S.tag("h1"), S.tag("p"))),
    ("h1 ~ a", S.follow(S.tag("h1"), S.tag("a"))),
    ("a, span", S.or_(S.tag("a"), S.tag("span"))),
    ("div:not(.cool)", S.and_(S.tag("div"), S.not_(S.cls("cool")))),
    (":not(div)", S.and_(S.element, S.not_(S.tag("div")))),
    ("span:first-child", S.and_(S.tag("span"), S.first_child)),
    ("span:last-child", S.and_(S.tag("span"), S.last_child)),
    ("span:nth-child(odd)", S.and_(S.tag("span"), S.nth_child(2, 1))),
    (":root", S.root),
    ("span:only-child",
     S.and_(S.tag("span"), S.and_(S.first_child, S.last_child))),
    ("span:only-of-type",
     S.and_(S.tag("span"), S.nth_of_type(0, 1, "span"),
            S.nth_last_of_type(0, 1, "span"))),
    # whitespace-insensitive combinator spelling
    ("body>div  span", S.descendant(
        S.child(S.tag("body"), S.tag("div")), S.tag("span"))),
]


#: fixture-empty selectors (every div in HTML1/2 has class cool;
#: no fixture element is an only-child/only-of-type span) —
#: equivalence still graded, just no non-empty guard
_EMPTY_OK = {"div:not(.cool)", "span:only-child", "span:only-of-type"}


@pytest.mark.parametrize("css_str,hand", EQUIV, ids=[c for c, _ in EQUIV])
def test_css_equivalent_to_hand_built(css_str, hand):
    got = _matches(css(css_str))
    assert got == _matches(hand), css_str
    if css_str not in _EMPTY_OK:
        assert got, f"{css_str} matched nothing — fixture drifted?"


def test_not_matches_only_elements():
    # a bare :not(div) compound is element-scoped in CSS; the raw
    # reference not_ would admit text/comment/document nodes
    raw_not = _matches(S.not_(S.tag("div")))
    scoped = _matches(css(":not(div)"))
    assert scoped < raw_not  # strictly fewer: non-elements excluded


# ---------------------------------------------------------------------------
# CSS-exact An+B (the reference stride is modular; CSS needs i >= 0)
# ---------------------------------------------------------------------------

TEN = as_hickory(parse(
    "<div>" + "".join(f'<p id="p{i}">x</p>' for i in range(1, 11)) + "</div>"
))


def _positions(css_str):
    out = set()
    for loc in S.select_locs(css(css_str), TEN):
        attrs = loc.doc.attrs[loc.i]
        if attrs and "id" in attrs and attrs["id"].startswith("p"):
            out.add(int(attrs["id"][1:]))
    return out


@pytest.mark.parametrize("css_str,expect", [
    ("p:nth-child(2n+5)", {5, 7, 9}),  # reference stride would add 1, 3
    ("p:nth-child(2n+1)", {1, 3, 5, 7, 9}),
    ("p:nth-child(odd)", {1, 3, 5, 7, 9}),
    ("p:nth-child(even)", {2, 4, 6, 8, 10}),
    ("p:nth-child(4)", {4}),
    ("p:nth-child(0n+4)", {4}),
    ("p:nth-child(-n+3)", {1, 2, 3}),
    ("p:nth-child(-2n+6)", {2, 4, 6}),
    ("p:nth-child(-n)", set()),  # B=0: no positive positions
    ("p:nth-child(3n)", {3, 6, 9}),
    ("p:nth-last-child(2n+4)", {1, 3, 5, 7}),  # from-end 4,6,8,10
    ("p:nth-of-type(3n+4)", {4, 7, 10}),
    ("p:nth-last-of-type(-n+2)", {9, 10}),
])
def test_nth_css_exact(css_str, expect):
    assert _positions(css_str) == expect, css_str


ONLY = as_hickory(parse(
    '<div><p id="p1">1</p><span id="s">s</span>'
    '<p id="p2">2</p><em id="e">e</em></div>'
))


@pytest.mark.parametrize("css_str,expect", [
    ("span:only-of-type", {"s"}),
    ("em:only-of-type", {"e"}),
    ("p:only-of-type", set()),
    ("p:only-child", set()),
])
def test_only_pseudos(css_str, expect):
    got = {loc.doc.attrs[loc.i]["id"]
           for loc in S.select_locs(css(css_str), ONLY)}
    assert got == expect, css_str


# ---------------------------------------------------------------------------
# :has / :is / :where / :empty / :first-of-type / :last-of-type
# ---------------------------------------------------------------------------

HASDOC_HTML = (
    '<div id="d1"><span id="s1">x</span><p id="p1"></p>'
    '<p id="p2"><!--c--></p><em id="e1">e</em></div>'
    '<div id="d2"><b id="b1">t</b><p id="p3"> </p></div>'
)
HASDOC = as_hickory(parse(HASDOC_HTML))


def _has_ids(sel):
    out = set()
    for loc in S.select_locs(sel, HASDOC):
        a = loc.doc.attrs[loc.i]
        if a and "id" in a:
            out.add(a["id"])
    return out


@pytest.mark.parametrize("css_str,expect", [
    # :empty — CSS-exact: comment child ignored (p2), whitespace text
    # child counts (p3 non-empty)
    ("p:empty", {"p1", "p2"}),
    ("span:not(:empty)", {"s1"}),
    ("div:has(span)", {"d1"}),
    ("div:has(> span)", {"d1"}),
    ("div:has(> b, > span)", {"d1", "d2"}),
    ("span:has(+ p)", {"s1"}),
    ("p:has(+ p)", {"p1"}),
    ("p:has(~ em)", {"p1", "p2"}),
    ("b:has(+ span)", set()),
    ("p:first-of-type", {"p1", "p3"}),
    ("p:last-of-type", {"p2", "p3"}),
    (":is(span, em)", {"s1", "e1"}),
    (":where(span, em)", {"s1", "e1"}),
    (":is(p:first-of-type, b)", {"p1", "p3", "b1"}),
    ("div:is(#d2)", {"d2"}),
    ("div:has(p:empty)", {"d1"}),
], ids=lambda v: v if isinstance(v, str) else None)
def test_has_is_empty_pseudos(css_str, expect):
    assert _has_ids(css(css_str)) == expect, css_str


EQUIV_HAS = [
    ("div:has(span)",
     S.and_(S.tag("div"), S.has_descendant(S.tag("span")))),
    ("div:has(> span)",
     S.and_(S.tag("div"), S.has_child(S.tag("span")))),
    ("span:has(+ p)",
     S.and_(S.tag("span"), S.precede_adjacent(S.element, S.tag("p")))),
    ("p:has(~ em)",
     S.and_(S.tag("p"), S.precede(S.element, S.tag("em")))),
    (":is(span, em)",
     S.and_(S.element, S.or_(S.tag("span"), S.tag("em")))),
    ("p:first-of-type", S.and_(S.tag("p"), S.nth_of_type(0, 1, "p"))),
    ("p:last-of-type", S.and_(S.tag("p"), S.nth_last_of_type(0, 1, "p"))),
]


@pytest.mark.parametrize("css_str,hand", EQUIV_HAS,
                         ids=[c for c, _ in EQUIV_HAS])
def test_has_equivalent_to_hand_built(css_str, hand):
    got = _has_ids(css(css_str))
    assert got == _has_ids(hand), css_str
    assert got, f"{css_str} matched nothing — fixture drifted?"


def test_nth_expansion_guard():
    with pytest.raises(CssError):
        css("p:nth-child(-n+100000)")
    with pytest.raises(CssError):
        css("p:nth-child(n+100000)")


def test_nth_guard_is_arithmetic_not_materialized():
    # review repro: the guard must fire BEFORE any term list is built —
    # a multi-GB expansion would MemoryError here instead of raising
    import time
    t0 = time.monotonic()
    with pytest.raises(CssError):
        css("p:nth-child(-n+2000000000)")
    with pytest.raises(CssError):
        css("p:nth-child(2n+2000000000)")
    assert time.monotonic() - t0 < 1.0


# ---------------------------------------------------------------------------
# attribute operators
# ---------------------------------------------------------------------------

ATTR_DOC = as_hickory(parse(
    '<div><a id="a1" href="x.html" lang="en-US" data-k="alpha beta">1</a>'
    '<a id="a2" href="y.php" lang="en" data-k="beta-max">2</a>'
    '<a id="a3" href="other.html" lang="fr">3</a>'
    '<a id="a4" href="p.html" data-k=" pad ">4</a></div>'
))


def _attr_ids(css_str):
    out = set()
    for loc in S.select_locs(css(css_str), ATTR_DOC):
        out.add(loc.doc.attrs[loc.i]["id"])
    return out


@pytest.mark.parametrize("css_str,expect", [
    ("[lang=en]", {"a2"}),
    ("[lang|=en]", {"a1", "a2"}),
    ('[href$=".html"]', {"a1", "a3", "a4"}),
    ("[href^=x]", {"a1"}),
    ("[data-k~=beta]", {"a1"}),  # whitespace-token match, not substring
    ("[data-k*=beta]", {"a1", "a2"}),
    ('[data-k="alpha beta"]', {"a1"}),
    ("[data-k]", {"a1", "a2", "a4"}),
    ('[href^=""]', set()),  # CSS: empty operand matches nothing
    ("[data-k~=pad]", {"a4"}),  # edge-padded value still tokenizes
    # review repro: empty ~= operand must match nothing (the padded
    # value's empty edge token would otherwise satisfy array_contains
    # on the relational side)
    ('[data-k~=""]', set()),
])
def test_attr_operators(css_str, expect):
    assert _attr_ids(css_str) == expect, css_str


# ---------------------------------------------------------------------------
# parser errors: unsupported constructs fail loud, never silently
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [
    "", "  ", ",a", "a,,b", "a >", "div::before", "p:hover",
    "[href", "[=x]", "p:nth-child()", "p:nth-child(2m+1)",
    "*:nth-of-type(2)", "*:only-of-type", ":not(", "a:not(b", "a b )",
    "p:nth-child(2n+1",
    # :is/:where/:has subset boundaries — complex selectors inside
    # raise, never silently mis-select
    ":is()", ":has()", ":is(a b)", ":is(a > b)", ":has(a b)",
    ":has(+ )", ":is(a,)", ":where(a,", "a:has(b", "*:first-of-type",
    "*:last-of-type",
])
def test_rejects_unsupported(bad):
    with pytest.raises(CssError):
        css(bad)


def test_parse_ast_shape():
    ast = parse_css("nav > a.x, *")
    assert ast[0] == "or" and len(ast[1]) == 2
    kind, head, chain = ast[1][0]
    assert kind == "chain" and head == [("tag", "nav")]
    assert chain == [(">", [("tag", "a"), ("class", "x")])]


# ---------------------------------------------------------------------------
# cross-engine: css() and css_rel() must agree node-for-node
# ---------------------------------------------------------------------------

CROSS = [
    "span", ".cool", "#attrspan", "[disabled]", "[id=attrspan]",
    "div.cool", "body > div span", "h1 + p", "h1 ~ a", "a, span",
    "div:not(.cool)", ":not(div)", "span:first-child",
    "p:nth-child(2n+5)", "p:nth-child(-n+3)", "span:nth-child(odd)",
    "span:nth-of-type(2)", "span:nth-last-of-type(2n+3)",
    "div > *:last-child", '[href^=f]', "body > div > p, h1 ~ a",
    # ~= lockstep repros: empty operand, edge-padded value, and a
    # NON-ASCII (U+00A0) separator that Java \s would not split on
    '[data-k~=""]', "[data-k~=x]", "[class~=m]", ".m",
    ":root", "a:only-child", "span:only-of-type", "em:only-of-type",
    # :has / :is / :empty family (the hasdoc fixture exercises comment
    # vs whitespace-text children and all four :has combinators)
    "p:empty", "span:not(:empty)", "div:has(span)", "div:has(> span)",
    "div:has(> b, > span)", "span:has(+ p)", "p:has(~ em)",
    "div:has(p:empty)", "p:first-of-type", "span:last-of-type",
    ":is(span, em)", ":where(div.cool, b)",
    # :not inside a branch forces the relational :is onto the
    # join-algebra path (is_cols returns None)
    ":is(span:not(.cool), em)", "div:is(.cool):has(span)",
]


def test_cross_engine_agreement():
    from hickoryspark.css import css_rel
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.session import get_spark

    spark = get_spark(4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = {
        "select1": HTML1,
        "select2": HTML2,
        "ten": "<div>" + "".join(
            f'<p id="p{i}">x</p>' for i in range(1, 11)) + "</div>",
        # class uses U+00A0: NOT a separator under the
        # Java/reference \\s, so neither engine may match '.m' here
        "pad": '<div><a data-k=" x" class="m n">t</a></div>',
        "only": '<div><p>1</p><span>s</span><p>2</p><em>e</em></div>',
        "hasdoc": HASDOC_HTML,
    }
    pages = spark.createDataFrame(
        [(n, h.encode("utf-8")) for n, h in docs.items()],
        "url string, html binary",
    ).cache()
    nodes = explode_nodes(pages).cache()
    trees = {n: as_hickory(parse(h)) for n, h in docs.items()}
    for s in CROSS:
        rel = {
            (r["url"], r["pre_ord"])
            for r in css_rel(s)(nodes).select("url", "pre_ord").collect()
        }
        interp = set()
        for name, tree in trees.items():
            for loc in S.select_locs(css(s), tree):
                interp.add((name, loc.i))
        assert rel == interp, f"css engines diverge on {s!r}"


# ---------------------------------------------------------------------------
# parser property: random ASTs render to strings that re-parse to the
# SAME AST (hypothesis over the full supported grammar)
# ---------------------------------------------------------------------------

def _render_simple(sm):
    k = sm[0]
    if k == "tag":
        return sm[1]
    if k == "universal":
        return "*"
    if k == "id":
        return "#" + sm[1]
    if k == "class":
        return "." + sm[1]
    if k == "attr":
        _, name, op, val = sm
        return f"[{name}]" if op is None else f'[{name}{op}"{val}"]'
    if k in ("first-child", "last-child", "only-child", "root",
             "only-of-type", "first-of-type", "last-of-type", "empty"):
        return ":" + k
    if k == "not":
        return ":not(" + _render_compound(sm[1]) + ")"
    if k == "is":
        return ":is(" + ", ".join(_render_compound(c) for c in sm[1]) + ")"
    if k == "has":
        return ":has(" + ", ".join(
            ("" if comb == " " else comb + " ") + _render_compound(c)
            for comb, c in sm[1]) + ")"
    # nth family: (name, A, B)
    _, A, B = sm
    return f":{k}({A}n{'+' if B >= 0 else '-'}{abs(B)})"


def _render_compound(simples):
    return "".join(_render_simple(s) for s in simples)


def _render_ast(ast):
    assert ast[0] == "or"
    outs = []
    for _, head, chain in ast[1]:
        s = _render_compound(head)
        for comb, comp in chain:
            s += (" " if comb == " " else f" {comb} ") + _render_compound(comp)
        outs.append(s)
    return ", ".join(outs)


def test_parser_roundtrips_generated_asts():
    from hypothesis import given, settings, strategies as st

    ident = st.sampled_from(["a", "div", "nav2", "x-y", "B_c"])
    value = st.sampled_from(["", "v", "two words", "a'b", ")", "~=", ","])
    nth = st.tuples(st.integers(-3, 3), st.integers(-2, 8))
    leaf = st.one_of(
        st.builds(lambda t: ("tag", t), ident),
        st.just(("universal",)),
        st.builds(lambda v: ("id", v), ident),
        st.builds(lambda v: ("class", v), ident),
        st.builds(lambda n: ("attr", n, None, None), ident),
        st.builds(lambda n, o, v: ("attr", n, o, v), ident,
                  st.sampled_from(["=", "~=", "|=", "^=", "$=", "*="]), value),
        st.sampled_from([("first-child",), ("last-child",),
                         ("only-child",), ("root",), ("empty",),
                         ("first-of-type",), ("last-of-type",)]),
        st.builds(lambda ab: ("nth-child", *ab), nth),
        st.builds(lambda ab: ("nth-last-child", *ab), nth),
    )
    # compound: optional tag first, then non-tag simples (parser rule);
    # :not nests one level with a single simple
    notp = st.builds(lambda s: ("not", [s]), leaf.filter(
        lambda s: s[0] != "tag"))

    def mk_compound(tag, rest):
        out = ([("tag", tag)] if tag else [])
        out += [s for s in rest if s[0] != "tag"]
        return out or [("universal",)]

    base_compound = st.builds(
        mk_compound,
        st.one_of(st.none(), ident),
        st.lists(st.one_of(leaf, notp), min_size=0, max_size=2),
    )
    # :is/:where branches and :has relative branches reuse the base
    # compound one level deep (the supported nesting)
    isp = st.builds(lambda cs: ("is", cs),
                    st.lists(base_compound, min_size=1, max_size=2))
    hasp = st.builds(
        lambda bs: ("has", bs),
        st.lists(st.tuples(st.sampled_from([" ", ">", "+", "~"]),
                           base_compound), min_size=1, max_size=2))

    compound = st.builds(
        mk_compound,
        st.one_of(st.none(), ident),
        st.lists(st.one_of(leaf, notp, isp, hasp), min_size=0, max_size=3),
    )
    complex_ = st.builds(
        lambda h, ch: ("chain", h, ch),
        compound,
        st.lists(st.tuples(st.sampled_from([" ", ">", "+", "~"]), compound),
                 min_size=0, max_size=3),
    )
    selector = st.builds(lambda cs: ("or", cs),
                         st.lists(complex_, min_size=1, max_size=3))

    @settings(max_examples=300, deadline=None)
    @given(selector)
    def check(ast):
        s = _render_ast(ast)
        assert parse_css(s) == ast, s

    check()
