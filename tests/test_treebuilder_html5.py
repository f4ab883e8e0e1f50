"""WHATWG behaviors beyond the reference corpus: table structure
(implied tbody/tr/colgroup, caption closing, foster parenting, orphan
cells ignored) and misnested-formatting recovery (active formatting
elements + simplified adoption agency). Expected strings hand-derived
from the WHATWG spec ("in table" / "in body" insertion modes) — the
same recovery jsoup applies, so these pin real-world parity for
arbitrary Common-Crawl pages.
"""

import pytest

from hickoryspark import as_hickory, hickory_to_html, parse


def roundtrip(html: str) -> str:
    out = hickory_to_html(as_hickory(parse(html)))
    prefix = "<html><head></head><body>"
    suffix = "</body></html>"
    assert out.startswith(prefix) and out.endswith(suffix), out
    return out[len(prefix):-len(suffix)]


@pytest.mark.parametrize(
    "html,expected",
    [
        # implied <tbody> before <tr>
        (
            "<table><tr><td>a</td><td>b</td></tr></table>",
            "<table><tbody><tr><td>a</td><td>b</td></tr></tbody></table>",
        ),
        # implied tbody after an explicit thead
        (
            "<table><thead><tr><th>h</th></thead><tr><td>x</td></table>",
            "<table><thead><tr><th>h</th></tr></thead>"
            "<tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # implied <tr> before a bare <td>
        (
            "<table><td>x</td></table>",
            "<table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # <col> implies <colgroup>
        (
            '<table><col span="2"><tr><td>x</table>',
            '<table><colgroup><col span="2"></colgroup>'
            "<tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # <tr> closes an open <caption>
        (
            "<table><caption>cap<tr><td>x</table>",
            "<table><caption>cap</caption>"
            "<tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # foster parenting: stray text moves before the table
        (
            "<table>text<tr><td>x</table>",
            "text<table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # foster parenting: stray element moves before the table
        (
            "<table><div>oops</div><tr><td>x</td></table>",
            "<div>oops</div><table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # orphan table-structure tags outside any table are ignored
        ("<td>orphan</td>", "orphan"),
        ("<tr><th>h</th></tr>", "h"),
        # whitespace is allowed inside table structure (not fostered)
        (
            "<table> <tr><td>x</td></tr> </table>",
            "<table> <tbody><tr><td>x</td></tr> </tbody></table>",
        ),
        # a <table> opened inside a cell legally NESTS ("in cell" routes
        # it through "in body"; td/th block table scope) — it must NOT
        # close the outer table (WHATWG 13.2.4.2 table scope)
        (
            "<table><tr><td><table><tr><td>inner",
            "<table><tbody><tr><td>"
            "<table><tbody><tr><td>inner</td></tr></tbody></table>"
            "</td></tr></tbody></table>",
        ),
        # three levels deep, with trailing outer content after the
        # inner tables close
        (
            "<table><tr><td><table><tr><td><table><tr><td>deep"
            "</table></td></table>ok</td></tr></table>",
            "<table><tbody><tr><td><table><tbody><tr><td>"
            "<table><tbody><tr><td>deep</td></tr></tbody></table>"
            "</td></tr></tbody></table>ok</td></tr></tbody></table>",
        ),
        # a <table> in caption also nests (caption blocks table scope)
        (
            "<table><caption><table><tr><td>c",
            "<table><caption>"
            "<table><tbody><tr><td>c</td></tr></tbody></table>"
            "</caption></table>",
        ),
        # ... but in "in table" mode (no cell between), a nested <table>
        # start DOES close the open table and becomes its sibling
        (
            "<table><tr><td>x</td></tr><table><tr><td>y",
            "<table><tbody><tr><td>x</td></tr></tbody></table>"
            "<table><tbody><tr><td>y</td></tr></tbody></table>",
        ),
        # clear-the-stack-back-to-table-context: a fostered element
        # must NOT capture the subsequent table structure (the <b> is
        # popped when <tr> arrives; the table keeps its rows)
        (
            "<table><b>bold<tr><td>y</table>",
            "<b>bold</b><table><tbody><tr><td>y</td></tr></tbody></table>",
        ),
        (
            "<div><table><p>foster<tr><td>c</table></div>",
            "<div><p>foster</p>"
            "<table><tbody><tr><td>c</td></tr></tbody></table></div>",
        ),
        # consecutive unclosed rows become SIBLINGS, never nest
        (
            "<table><tr><td>a<tr><td>b</table>",
            "<table><tbody><tr><td>a</td></tr><tr><td>b</td></tr>"
            "</tbody></table>",
        ),
        # a second <tbody> closes the open row group (and its open row)
        (
            "<table><tbody><tr><td>a<tbody><tr><td>b</table>",
            "<table><tbody><tr><td>a</td></tr></tbody>"
            "<tbody><tr><td>b</td></tr></tbody></table>",
        ),
        # <td> closes the previous cell through its open subtree
        (
            "<table><tr><td><div><p>x<td>y</table>",
            "<table><tbody><tr><td><div><p>x</p></div></td><td>y</td>"
            "</tr></tbody></table>",
        ),
        # <tbody> closes an open caption (implied end, AFE marker kept)
        (
            "<table><caption>cap<tbody><tr><td>x</table>",
            "<table><caption>cap</caption>"
            "<tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # fostered text with a character reference decodes before the
        # table and re-escapes on render
        (
            "<table>a&amp;b<tr><td>x</table>",
            "a&amp;b<table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # text inside <tr> (before AND after the cell) is fostered
        (
            "<table><tr>mid<td>x</td>tail</tr></table>",
            "midtail<table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
    ],
)
def test_table_structure(html, expected):
    assert roundtrip(html) == expected


@pytest.mark.parametrize(
    "html,expected",
    [
        # RCDATA (<textarea>): entities decode, tags do NOT parse;
        # render re-escapes & < > "
        (
            "<textarea>&lt;div&gt; &amp; x</textarea>",
            "<textarea>&lt;div&gt; &amp; x</textarea>",
        ),
        (
            "<textarea><p>not parsed</p></textarea>",
            "<textarea>&lt;p&gt;not parsed&lt;/p&gt;</textarea>",
        ),
    ],
)
def test_rcdata_entities(html, expected):
    assert roundtrip(html) == expected


def test_rcdata_title_entities():
    from hickoryspark import as_hickory, hickory_to_html, parse

    # <title> is RCDATA in head; legacy named references without a
    # semicolon decode per WHATWG (the spec's own '&notit;' example
    # family: '&not' is consumed greedily, '&amp y' decodes too)
    out = hickory_to_html(as_hickory(parse(
        "<title>x &notarealentity; &amp y</title>"
    )))
    assert out == (
        "<html><head><title>x ¬arealentity; &amp; y</title></head>"
        "<body></body></html>"
    )


@pytest.mark.parametrize(
    "html,expected",
    [
        # classic misnesting: </b> before </i> — the i continues
        (
            "<b>bold<i>both</b>italic</i>",
            "<b>bold<i>both</i></b><i>italic</i>",
        ),
        # formatting survives an implicit <p> close
        (
            "<p><b>bold<p>still bold",
            "<p><b>bold</b></p><p><b>still bold</b></p>",
        ),
        # nested formatting reconstructs in order
        (
            "<p><em>a<strong>b<p>c",
            "<p><em>a<strong>b</strong></em></p><p><em><strong>c</strong></em></p>",
        ),
        # a new <a> closes an open <a> (no nesting, no reconstruction)
        (
            '<a href="1">one<a href="2">two',
            '<a href="1">one</a><a href="2">two</a>',
        ),
        # closing a closed formatting element is a no-op
        ("<b>x</b>plain</b>", "<b>x</b>plain"),
        # formatting inside a cell stays inside the cell (marker)
        (
            "<table><tr><td><b>cell</td><td>next</td></table>",
            "<table><tbody><tr><td><b>cell</b></td><td>next</td></tr>"
            "</tbody></table>",
        ),
        # Noah's ark: at most 3 identical re-opened entries
        (
            "<p><b><b><b><b>x<p>y",
            "<p><b><b><b><b>x</b></b></b></b></p><p><b><b><b>y</b></b></b></p>",
        ),
        # adoption agency with a furthest block: reparenting
        ("<b><p>para</b>after", "<b></b><p><b>para</b>after</p>"),
        ("<b>1<p>2</b>3</p>", "<b>1</b><p><b>2</b>3</p>"),
        # the WHATWG spec's own worked example (13.2.6.4.7)
        (
            "<b><div>x<i>y</b>z</i></div>",
            "<b></b><div><b>x<i>y</i></b><i>z</i></div>",
        ),
    ],
)
def test_formatting_recovery(html, expected):
    assert roundtrip(html) == expected


@pytest.mark.parametrize(
    "html,expected",
    [
        # rawtext end-tag search must not be confused by characters
        # whose lower() changes the string length (U+0130)
        (
            "<body><p>İ</p><script>var a=1;</script>after</body>",
            "<p>İ</p><script>var a=1;</script>after",
        ),
        # '<svg/>' self-closes (foreign root honors the flag)
        ("<svg/><p>hi</p>", "<svg></svg><p>hi</p>"),
        # the LF right after <pre>/<textarea> start tags is dropped
        (
            "<pre>\nfoo\nbar</pre><textarea>\nx</textarea>",
            "<pre>foo\nbar</pre><textarea>x</textarea>",
        ),
        # a second <a> runs the adoption agency, not a stack pop
        ("<a>1<p>2<a>3", "<a>1</a><p><a>2</a><a>3</a></p>"),
        # a nested <table> closes the open table (sibling order kept)
        (
            "<table><table><tr><td>x",
            "<table></table><table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # <form> in table context is inserted empty; rows stay in table
        (
            "<table><form><tr><td>x",
            "<table><form></form><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # form element pointer: nested <form> start tags are ignored
        ("<form><form><input></form></form>", "<form><input></form>"),
    ],
)
def test_whatwg_edge_behaviors(html, expected):
    assert roundtrip(html) == expected


def test_as_hiccup_accepts_fragment_list():
    from hickoryspark import as_hiccup, parse_fragment

    forms = as_hiccup(parse_fragment("x<div>y</div>"))
    assert forms == ["x", ["div", {}, "y"]]


def test_script_between_head_and_body_does_not_leak():
    # regression: in after-head mode, rawtext of a late in-head
    # container must stay inside it, not fall through into <body>
    out = hickory_to_html(
        as_hickory(parse("<html><head></head><script>var x=1;</script><p>hi</p></html>"))
    )
    assert out == (
        "<html><head><script>var x=1;</script></head>"
        "<body><p>hi</p></body></html>"
    )


def test_self_closing_ignored_on_html_elements():
    # WHATWG/jsoup: '/>' has no effect on non-void HTML elements
    assert roundtrip("<div/>content") == "<div>content</div>"
    assert roundtrip("<span/>a<b/>c") == "<span>a<b>c</b></span>"
    # script stays RAWTEXT even when written self-closing (a bare
    # leading <script/> belongs to <head> per the insertion modes)
    assert hickory_to_html(as_hickory(parse("<script/>x</script>"))) == (
        "<html><head><script>x</script></head><body></body></html>"
    )
    # ... but inside foreign content (svg/math) self-closing is honored
    assert roundtrip("<svg><circle></svg>after") == "<svg><circle></circle></svg>after"
    assert roundtrip("<svg><circle/><rect/></svg>") == (
        "<svg><circle></circle><rect></rect></svg>"
    )


@pytest.mark.parametrize(
    "html,expected",
    [
        # breakout: HTML-vocabulary start tags pop the foreign subtree
        ("<svg><div>break</div></svg>", "<svg></svg><div>break</div>"),
        ("<svg><metadata>m</metadata><p>out", "<svg><metadata>m</metadata></svg><p>out</p>"),
        # font breaks out only with color/face/size
        ("<svg><font color='red'>b</font></svg>", '<svg></svg><font color="red">b</font>'),
        ("<svg><font>stays</font></svg>", "<svg><font>stays</font></svg>"),
        # HTML integration points: children parse as HTML, no breakout
        (
            "<svg><foreignObject><div>h</div></foreignObject><circle/></svg>",
            "<svg><foreignobject><div>h</div></foreignobject><circle></circle></svg>",
        ),
        (
            "<svg><desc><table><tr><td>t</td></tr></table></desc></svg>",
            "<svg><desc><table><tbody><tr><td>t</td></tr></tbody></table></desc></svg>",
        ),
        # open <p> outside the IP is not closable from inside it
        (
            "<p><svg><desc><p>in</p></desc></svg>after",
            "<p><svg><desc><p>in</p></desc></svg>after</p>",
        ),
        # MathML text integration points
        (
            "<math><mi>x</mi><mtext><b>bold</b></mtext></math>",
            "<math><mi>x</mi><mtext><b>bold</b></mtext></math>",
        ),
        # annotation-xml html encoding holds HTML; svg child allowed
        (
            "<math><annotation-xml encoding='text/HTML'><p>h</p></annotation-xml></math>",
            '<math><annotation-xml encoding="text/HTML"><p>h</p></annotation-xml></math>',
        ),
        # foreign script children are markup, not RAWTEXT — and <b>
        # inside it breaks out of the svg entirely (WHATWG dispatch)
        (
            "<svg><script><b>m</b></script></svg>",
            "<svg><script></script></svg><b>m</b>",
        ),
        # table context: a stray svg is fostered before the table
        (
            "<table><svg><circle/></svg><tr><td>x</td></tr></table>",
            "<svg><circle></circle></svg><table><tbody><tr><td>x</td></tr></tbody></table>",
        ),
        # nested g/path structure survives with attributes
        (
            '<svg viewBox="0 0 4 4"><g><path d="M0"/></g></svg>',
            '<svg viewbox="0 0 4 4"><g><path d="M0"></path></g></svg>',
        ),
    ],
)
def test_foreign_content(html, expected):
    # tags/attrs appear lowercased: the reference applies
    # lower-case-keyword to BOTH in as-hickory (core.clj:111,140), so
    # Jsoup's camelCase adjustments are invisible in hickory form
    assert roundtrip(html) == expected


@pytest.mark.parametrize(
    "html,expected",
    [
        # ADVICE r3: an unclosed <svg> whose subtree was popped by a
        # breakout tag must not suppress RCDATA for the document tail —
        # the tokenizer's foreign counter resets on breakout like the
        # tree builder does
        (
            "<svg><div>x</div><textarea><i>t</i></textarea>after",
            "<svg></svg><div>x</div><textarea>&lt;i&gt;t&lt;/i&gt;</textarea>after",
        ),
        (
            "<svg><p>out</p><title><b>raw</b></title>",
            # breakout <p>; the later HTML <title> is RCDATA again
            # (head-less body context keeps it where it lands)
            "<svg></svg><p>out</p><title>&lt;b&gt;raw&lt;/b&gt;</title>",
        ),
        # but inside an integration point, breakout tags do NOT pop the
        # foreign subtree, so RCDATA stays suppressed for svg <title>
        (
            "<svg><foreignobject><div>h</div></foreignobject>"
            "<title><circle/></title></svg>",
            "<svg><foreignobject><div>h</div></foreignobject>"
            "<title><circle></circle></title></svg>",
        ),
        # closed foreign root resets the integration-point depth
        (
            "<svg><desc>d</desc></svg><svg><em>b</em></svg>"
            "<textarea><p>t</p></textarea>",
            "<svg><desc>d</desc></svg><svg></svg><em>b</em>"
            "<textarea>&lt;p&gt;t&lt;/p&gt;</textarea>",
        ),
        # review repro: a NESTED foreign root inside an IP popped by a
        # breakout tag must also resync (reset to the IP's depth, not
        # skipped) — the trailing HTML <title> is RCDATA again
        (
            "<svg><foreignobject><svg><div>x</div></foreignobject></svg>"
            "<title>a<b>c</b></title>",
            "<svg><foreignobject><svg></svg><div>x</div></foreignobject>"
            "</svg><title>a&lt;b&gt;c&lt;/b&gt;</title>",
        ),
        # review repro 2: closing an IP implicitly closes nested
        # foreign roots opened inside it — the foreign counter resets
        # to the depth recorded at IP open, so the tail is HTML again
        (
            "<svg><foreignobject><svg></foreignobject></svg>"
            "<title>a<b>c</b></title>",
            "<svg><foreignobject><svg></svg></foreignobject></svg>"
            "<title>a&lt;b&gt;c&lt;/b&gt;</title>",
        ),
        # ...while a breakout at the SAME depth as the IP still does
        # not pop it (svg <title> IP suppression preserved)
        (
            "<svg><title><div>x</div><circle/></title></svg>"
            "<textarea><i>t</i></textarea>",
            "<svg><title><div>x</div><circle></circle></title></svg>"
            "<textarea>&lt;i&gt;t&lt;/i&gt;</textarea>",
        ),
        # advice repro: a STRAY end tag naming a different IP element
        # (</title> while only a foreignObject is open) must not pop
        # the foreignObject's mark — the later breakout <div> would
        # otherwise reset foreign to 0 and the svg <title> would be
        # wrongly RCDATA (circle swallowed as text)
        (
            "<svg><foreignobject></title><div>x</div></foreignobject>"
            "<title><circle/></title></svg>",
            "<svg><foreignobject><div>x</div></foreignobject>"
            "<title><circle></circle></title></svg>",
        ),
    ],
)
def test_foreign_breakout_rcdata_resync(html, expected):
    assert roundtrip(html) == expected


@pytest.mark.parametrize(
    "html,expected",
    [
        # template contents stay children of the element (Jsoup has no
        # separate content fragment; hickory reads .childNodes) but
        # parse with template-bounded table rules: rows survive
        (
            "<body><template><tr><td>cell</td></tr></template>",
            "<template><tr><td>cell</td></tr></template>",
        ),
        ("<body><template><td>c</td><td>d</td></template>",
         "<template><td>c</td><td>d</td></template>"),
        ("<body><template><col></template>",
         "<template><col></template>"),
        # a template inside a table captures cells; the outer table
        # structure is unaffected
        (
            "<table><template><td>in</td></template><tr><td>real</td></tr></table>",
            "<table><template><td>in</td></template><tbody><tr><td>real</td></tr></tbody></table>",
        ),
        # clear-to-table-context must NOT pop through a template
        (
            "<table><template><table><tr><td>n</td></tr></table></template></table>",
            "<table><template><table><tbody><tr><td>n</td></tr></tbody></table></template></table>",
        ),
        # formatting inside a template does not leak (marker semantics)
        (
            "<body><template><b>x</template>plain",
            "<template><b>x</b></template>plain",
        ),
    ],
)
def test_template_contents(html, expected):
    assert roundtrip(html) == expected


def test_template_in_head_keeps_elements():
    out = hickory_to_html(as_hickory(parse(
        "<head><template><div>d</div></template></head><body>x</body>"
    )))
    assert out == (
        "<html><head><template><div>d</div></template></head>"
        "<body>x</body></html>"
    )


def test_cdata_foreign_vs_html():
    # HTML content: CDATA is a bogus comment (WHATWG); foreign
    # content: CDATA is text
    assert roundtrip("<div><![CDATA[x]]></div>") == "<div><!--[CDATA[x]]--></div>"
    assert roundtrip("<svg><![CDATA[text here]]></svg>") == "<svg>text here</svg>"
    assert roundtrip("<svg><![CDATA[a]]b]]></svg>") == "<svg>a]]b</svg>"
    assert roundtrip("<svg><![CDATA[]]></svg>") == "<svg></svg>"


def test_head_template_foreign_self_closing():
    # review regression: head-template svg children must go through
    # foreign dispatch (self-closing honored), same as body templates
    out = hickory_to_html(as_hickory(parse(
        "<head><template><svg><circle/><rect/></svg></template></head><body>x"
    )))
    assert out == (
        "<html><head><template><svg><circle></circle><rect></rect></svg>"
        "</template></head><body>x</body></html>"
    )


def test_svg_title_children_are_markup():
    # review regression: the RCDATA switch does not exist in foreign
    # content — svg <title> children parse as elements
    assert roundtrip("<svg><title><b>x</b></title></svg>") == (
        "<svg><title><b>x</b></title></svg>"
    )
    assert roundtrip("<svg><textarea>t</textarea></svg>") == (
        "<svg><textarea>t</textarea></svg>"
    )


def test_script_after_breakout_stays_rawtext():
    # breakout leaves foreign content even though svg is still open:
    # the html script must keep its RAWTEXT body verbatim
    assert roundtrip("<svg><div><script>if(a<b){}</script></div>") == (
        "<svg></svg><div><script>if(a<b){}</script></div>"
    )
