"""Property tests (hypothesis): the parser must never crash on
arbitrary input, and render∘parse must be a canonicalization — i.e.
idempotent after one application (SURVEY.md §3.3: the reference's
invariant is parse∘render idempotence on hickory data, not source
preservation).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hickoryspark import as_hickory, hickory_to_html, parse

TAGS = ["div", "span", "em", "code", "section", "article", "b", "i"]
ATTR_NAMES = ["id", "class", "data-x", "title", "href"]

# "\r" is excluded: WHATWG input preprocessing normalizes CR to LF, so
# a literal CR in a rendered attribute/text is not representable in
# HTML source (browsers and jsoup behave the same).
attr_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r"),
    max_size=12,
)
text_content = st.text(
    alphabet=st.sampled_from(list("abc<>&\"' \né☃;#x26")), max_size=16
)


def _tree(children):
    return st.builds(
        lambda tag, attrs, kids: {
            "type": "element",
            "tag": tag,
            "attrs": attrs or None,
            "content": list(kids) or None,
        },
        st.sampled_from(TAGS),
        st.dictionaries(st.sampled_from(ATTR_NAMES), attr_values, max_size=3),
        st.lists(children, max_size=4),
    )


hickory_trees = st.recursive(
    text_content.filter(bool), _tree, max_leaves=20
)
# Root must be an element: a bare top-level text node is not
# representable in a full document (pre-<html> whitespace is dropped
# per the "initial" insertion mode).
hickory_root_trees = _tree(hickory_trees)


@given(hickory_root_trees)
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip_on_trees(tree):
    """For any nesting-safe hickory tree: render -> parse -> render is
    a fixed point (escaping and entity decoding cancel exactly)."""
    html1 = hickory_to_html(tree)
    reparsed = hickory_to_html(as_hickory(parse(html1)))
    again = hickory_to_html(as_hickory(parse(reparsed)))
    assert again == reparsed
    # the fragment itself survives inside the implied body
    assert html1 in reparsed


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_never_crashes_and_canonicalizes(s):
    """Arbitrary text: parse never raises; render∘parse is idempotent
    after one application (tag soup canonicalizes in one pass)."""
    once = hickory_to_html(as_hickory(parse(s)))
    twice = hickory_to_html(as_hickory(parse(once)))
    assert hickory_to_html(as_hickory(parse(twice))) == twice


@given(st.binary(max_size=120))
@settings(max_examples=150, deadline=None)
def test_parse_arbitrary_bytes(b):
    s = b.decode("utf-8", "replace")
    out = hickory_to_html(as_hickory(parse(s)))
    assert out.startswith("<") or out == ""


FOREIGN_SNIPPETS = st.sampled_from([
    "<svg><circle/><rect width='3'/></svg>",
    "<svg><g><path d='M0'/></g></svg>",
    "<svg><desc><b>h</b></desc><circle/></svg>",
    "<svg><foreignObject><p>f</p></foreignObject></svg>",
    "<svg><metadata>m</metadata><div>broke</div>",
    "<svg><title><b>t</b></title></svg>",
    "<svg><![CDATA[cd]]></svg>",
    "<math><mi>x</mi><mtext><b>y</b></mtext></math>",
    "<math><annotation-xml encoding='text/html'><span>a</span>"
    "</annotation-xml></math>",
    "<template><tr><td>c</td></tr></template>",
    "<template><p>t</p></template>",
])


@given(st.lists(FOREIGN_SNIPPETS, min_size=1, max_size=4), st.text(
    alphabet=st.sampled_from(list("ab <>&x")), max_size=10))
@settings(max_examples=150, deadline=None)
def test_foreign_content_roundtrip_idempotent(snips, filler):
    """Foreign-content/template documents: render∘parse stays a
    canonicalization (idempotent after one application)."""
    src = filler.join(snips)
    once = hickory_to_html(as_hickory(parse(src)))
    twice = hickory_to_html(as_hickory(parse(once)))
    assert hickory_to_html(as_hickory(parse(twice))) == twice


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_decode_html_never_raises(b):
    """Arbitrary bytes through the charset-sniffed boundary: decode
    and parse never raise."""
    from hickoryspark.html.charset import decode_html

    out = hickory_to_html(as_hickory(parse(decode_html(b))))
    assert out.startswith("<") or out == ""
