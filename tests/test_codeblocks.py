"""Code-block extraction (ops/codeblocks.py): pinned semantics over
the real parser — LF-after-<pre> skip, comment-data-as-text, markup
stripping, positional first-code language attribution."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-codeblocks-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _blocks(spark, html: bytes):
    from hickoryspark.ops.codeblocks import extract_code_blocks
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", bytearray(html))],
                                  "url string, html binary")
    return sorted(
        (r["block_pos"], r["lang"], r["code"], r["n_lines"], r["n_chars"])
        for r in extract_code_blocks(explode_nodes(pages)).collect()
    )


def test_basic_language_and_whitespace(spark):
    got = _blocks(
        spark,
        b'<p>intro</p><pre><code class="language-python">def f():\n'
        b'    return 1</code></pre><p>outro</p>',
    )
    code = "def f():\n    return 1"
    assert got == [(1, "python", code, 2, len(code))]


def test_lf_skip_and_no_lang(spark):
    # WHATWG drops the LF right after <pre>; no code child -> lang
    # from the pre class only, here absent
    got = _blocks(spark, b"<pre>\nplain\n  indented</pre>")
    assert got == [(1, None, "plain\n  indented", 2, 16)]


def test_pre_class_fallback_and_positional_first(spark):
    # first code child is CLASSLESS: it wins the positional min, finds
    # no token, falls back to the pre's lang-js — the later
    # language-ts sibling must NOT reattribute the block
    got = _blocks(
        spark,
        b'<pre class="lang-js"><code>a</code>'
        b'<code class="language-ts">b</code></pre>',
    )
    assert got == [(1, "js", "ab", 1, 2)]


def test_markup_comment_and_multiple_blocks(spark):
    got = _blocks(
        spark,
        b'<pre><code class="LANGUAGE-Go">a()<b>bold</b>c</code></pre>'
        b"<pre><!--note-->x</pre>",
    )
    # case-insensitive prefix, lowercased value; markup stripped;
    # comment data counts as text (string-child node shape)
    assert got == [
        (1, "go", "a()boldc", 1, 8),
        (2, None, "notex", 1, 5),
    ]


def test_empty_pre_kept(spark):
    got = _blocks(spark, b"<pre></pre>")
    assert got == [(1, None, "", 0, 0)]


def test_single_url_shuffle_plan(spark):
    from hickoryspark.ops.codeblocks import extract_code_blocks
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("u", bytearray(b"<pre>x</pre>"))], "url string, html binary")
    df = extract_code_blocks(explode_nodes(pages))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # url-equi interval join, never a nested loop; every exchange is
    # keyed on the url (the full-width member/pre rows never reshuffle
    # on anything else — agg and window reuse the join partitioning)
    assert "BroadcastNestedLoopJoin" not in plan
    ex = [ln for ln in plan.splitlines()
          if "Exchange hashpartitioning" in ln]
    assert 1 <= len(ex) <= 2, plan
    assert all("url" in ln for ln in ex), plan
