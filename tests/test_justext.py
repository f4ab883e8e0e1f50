"""jusText-style block classification (ops/justext.py): feature math,
context-free rules in pinned order, two-pass neighbor revision,
maximal-block nesting, anchor density, nonrendered-text exclusion,
empty-block drop."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOP10 = "the of and to a in is it you that "  # 10 stopwords, 34 chars


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-justext-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages):
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.ops.justext import justext_blocks

    df = spark.createDataFrame(pages, "url string, html string")
    rows = justext_blocks(explode_nodes(df)).collect()
    return sorted(
        (r["url"], r["block_pos"], r["tag"], r["chars"], r["words"],
         r["stop_ppm"], r["link_ppm"], r["cf_class"], r["final_class"])
        for r in rows
    )


def test_article_smoothing(spark):
    # good, short, good -> the short inherits good from both sides
    html = (
        "<body>"
        f"<p>{STOP10 * 7}</p>"
        "<p>end note</p>"
        f"<p>{STOP10 * 7}</p>"
        "</body>"
    )
    rows = _run(spark, [("u", html)])
    assert [(r[1], r[2], r[7], r[8]) for r in rows] == [
        (1, "p", "good", "good"),
        (2, "p", "short", "good"),
        (3, "p", "good", "good"),
    ]
    # feature math on block 1: 7 reps, trailing space trimmed
    assert rows[0][3] == 34 * 7 - 1 and rows[0][4] == 70
    assert rows[0][5] == 1_000_000 and rows[0][6] == 0
    # block 2: 8 chars, 2 words, no stopwords
    assert rows[1][3:7] == (8, 2, 0, 0)


def test_nav_page_all_bad(spark):
    # anchor-only blocks are bad by link density; the sandwiched short
    # inherits bad from both sides
    html = (
        "<ul><li><a href=/a>Home menu item</a></li></ul>"
        "<p>m 3</p>"
        "<ul><li><a href=/b>Next menu item</a></li></ul>"
    )
    rows = _run(spark, [("u", html)])
    assert [(r[2], r[7], r[8]) for r in rows] == [
        ("li", "bad", "bad"),
        ("p", "short", "bad"),
        ("li", "bad", "bad"),
    ]
    assert rows[0][6] == 1_000_000  # every char is anchor text


def test_neargood_and_copyright(spark):
    # neargood next to a good block -> good; neargood between bads ->
    # bad; the copyright sign is bad regardless of length
    html = (
        f"<p>{STOP10 * 7}</p>"       # good
        f"<p>{STOP10 * 3}</p>"       # 101 chars, neargood -> good
        "<p>zqv1 zqv2 zqv3 zqv4 zqv5 zqv1 zqv2 zqv3 zqv4 zqv5 "
        "zqv1 zqv2 zqv3 zqv4 zqv5 zqv1 zqv2 zqv3 zqv4 zqv5</p>"  # bad
        f"<p>{STOP10 * 3}</p>"       # neargood, prev bad / next bad
        "<p>© 2024 Example Corp</p>"  # bad (copyright)
    )
    rows = _run(spark, [("u", html)])
    assert [(r[7], r[8]) for r in rows] == [
        ("good", "good"), ("neargood", "good"), ("bad", "bad"),
        ("neargood", "bad"), ("bad", "bad"),
    ]


def test_short_with_link_is_bad(spark):
    # < LENGTH_LOW with any anchor chars -> bad, not short
    html = f"<p>see <a href=/m>more</a></p><p>{STOP10 * 7}</p>"
    rows = _run(spark, [("u", html)])
    assert rows[0][7] == "bad" and rows[0][8] == "bad"


def test_inline_link_good_block(spark):
    # a long good paragraph keeps a small inline link below threshold
    html = f"<p>{STOP10 * 6}<a href=/m>more</a></p>"
    rows = _run(spark, [("u", html)])
    (_, _, _, chars, words, stop, link, cf, fin) = rows[0]
    assert chars == 208 and words == 61
    assert stop == 1_000_000 * 60 // 61
    assert link == 1_000_000 * 4 // 208
    assert cf == "good" and fin == "good"


def test_maximal_block_nesting(spark):
    # <li><p>..</p></li> is ONE li block; a lone short block with no
    # good/bad neighbor anywhere is bad at the edges
    html = "<ul><li><p>inner text here</p></li></ul>"
    rows = _run(spark, [("u", html)])
    assert len(rows) == 1
    assert rows[0][2] == "li" and rows[0][3] == 15
    assert rows[0][7] == "short" and rows[0][8] == "bad"


def test_nonrendered_and_empty_blocks(spark):
    # script/style text and comment data do not count; whitespace-only
    # and empty blocks are not emitted
    html = (
        "<p><script>var x = 'aaaaaaaaaaaaaaaaaaaa';</script></p>"
        "<p>   \t\n  </p>"
        "<p><!-- hidden comment words --></p>"
        f"<p>{STOP10 * 7}</p>"
    )
    rows = _run(spark, [("u", html)])
    assert len(rows) == 1 and rows[0][8] == "good"


def test_no_cross_product_plan(spark):
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.ops.justext import justext_blocks

    df = spark.createDataFrame(
        [("u", f"<p>{STOP10 * 7}</p>")], "url string, html string")
    out = justext_blocks(explode_nodes(df))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
