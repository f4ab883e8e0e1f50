"""HTML→Markdown (ops/markdown.py): the fixed dialect — blocks,
inline markers with boundary-whitespace movement, lists, quotes,
fences, pipe tables, transparency, hostile depth."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.html.core import as_hickory, parse
from hickoryspark.nodes import flatten
from hickoryspark.ops.markdown import markdown_doc


def md(html):
    return markdown_doc(flatten(as_hickory(parse(html))))


def test_headings_paragraphs_hr():
    assert md("<h1>T</h1><p>one</p><hr><h3>S</h3><p>two</p>") == (
        "# T\n\none\n\n---\n\n### S\n\ntwo"
    )


def test_inline_markers_and_boundary_whitespace():
    assert md("<p>o<b>k</b></p>") == "o**k**"
    assert md("<p>o<b> k </b>x</p>") == "o **k** x"
    assert md("<p>a <em>e</em> and <code>c()</code>.</p>") == (
        "a *e* and `c()`."
    )
    assert md("<p>empty <b>  </b>wrap</p>") == "empty wrap"


def test_links_and_images():
    assert md('<p><a href="https://x.test/">go</a></p>') == (
        "[go](https://x.test/)"
    )
    assert md("<p><a>no href</a></p>") == "no href"
    assert md('<p><img src="/i.png" alt="pic"> tail</p>') == (
        "![pic](/i.png) tail"
    )
    assert md('<p><img alt="no src">x</p>') == "x"


def test_lists_unordered_ordered_nested():
    assert md("<ul><li>a</li><li>b</li></ul>") == "- a\n- b"
    assert md("<ol><li>a</li><li>b</li></ol>") == "1. a\n2. b"
    assert md("<ul><li>outer<ul><li>inner</li></ul></li></ul>") == (
        "- outer\n  - inner"
    )


def test_blockquote_prefixes_every_line():
    assert md("<blockquote><p>a</p><p>b</p></blockquote>") == (
        "> a\n>\n> b"
    )


def test_pre_fence_verbatim_and_tick_escape():
    assert md("<pre>raw  x\n  indented</pre>") == (
        "```\nraw  x\n  indented\n```"
    )
    assert md("<pre>has ``` ticks</pre>") == "````\nhas ``` ticks\n````"


def test_br_survives_collapse():
    assert md("<p>l1<br>l2</p>") == "l1\nl2"


def test_pipe_table_with_header_separator():
    assert md(
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    ) == "| h1 | h2 |\n| --- | --- |\n| a | b |"


def test_table_without_header_row_has_no_separator():
    assert md("<table><tr><td>a</td><td>b</td></tr></table>") == (
        "| a | b |"
    )


def test_nested_table_renders_after_outer():
    out = md(
        "<table><tr><td>o <table><tr><td>i</td></tr></table></td>"
        "<td>b</td></tr></table>"
    )
    assert out == "| o | b |\n\n| i |"


def test_skip_script_style_head_comments():
    assert md(
        "<head><title>T</title><style>p{}</style></head>"
        "<body><script>x()</script><p>keep<!--no--></p></body>"
    ) == "keep"


def test_unknown_tags_transparent_containers_break_paragraphs():
    assert md("<p>a<span>b</span>c</p>") == "abc"
    assert md("a<div>b</div>c") == "a\n\nb\n\nc"


def test_hostile_depth_no_recursion_error():
    deep = "<div>" * 5000 + "<p>bottom</p>" + "</div>" * 5000
    assert md(deep) == "bottom"


def test_empty_and_garbage():
    assert md("") == ""
    assert md("<p>   </p><h2></h2>") == ""


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-markdown-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_to_markdown_spark_path(spark):
    from hickoryspark.ops.markdown import to_markdown

    pages = spark.createDataFrame(
        [("u1", "<h1>T</h1><p>x</p>"), ("u2", None)],
        "url string, html string",
    )
    rows = {r["url"]: r["markdown"] for r in to_markdown(pages).collect()}
    assert rows == {"u1": "# T\n\nx", "u2": ""}


def test_list_with_non_li_children_keeps_their_text():
    assert md("<ul><p>intro</p><li>item</li></ul>") == "intro\n- item"
    assert md("<ol><li>a</li>tail</ol>") == "1. a\ntail"
