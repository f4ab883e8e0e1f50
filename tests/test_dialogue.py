"""Dialogue-turn mining (ops/dialogue.py): reply-tree lineage
(parent / root / depth), per-turn text ownership (a parent's text
excludes its replies), and the class-token contract."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-dialogue-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _turns(spark, html, url="u"):
    from hickoryspark.ops.dialogue import dialogue_turns
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame([(url, html)], "url string, html string")
    return sorted(
        (
            (r["depth"], r["author"], r["text"], r["parent_id"] is None,
             r["root_id"] == r["turn_id"])
            for r in dialogue_turns(explode_nodes(df)).collect()
        ),
        key=lambda t: (t[0], t[1] or "", t[2] or ""),
    )


def test_reply_tree_lineage_and_text_ownership(spark):
    rows = _turns(
        spark,
        "<html><body>"
        '<div class="comment" data-author="alice">hello there'
        '  <div class="comment" data-author="bob">hi alice'
        '    <div class="comment" data-author="alice">thanks</div>'
        "  </div>"
        "</div>"
        '<div class="comment" data-author="carol">new thread</div>'
        "<p>article text outside any turn</p>"
        "</body></html>",
    )
    assert rows == [
        (0, "alice", "hello there", True, True),
        (0, "carol", "new thread", True, True),
        (1, "bob", "hi alice", False, False),
        (2, "alice", "thanks", False, False),
    ]


def test_root_and_parent_ids_chain(spark):
    from hickoryspark.ops.dialogue import dialogue_turns
    from hickoryspark.spark.nodes_table import explode_nodes

    html = (
        "<html><body>"
        '<div class="comment">a<div class="comment">b'
        '<div class="comment">c</div></div></div>'
        "</body></html>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html string")
    out = {r["depth"]: r for r in
           dialogue_turns(explode_nodes(df)).collect()}
    assert out[1]["parent_id"] == out[0]["turn_id"]
    assert out[2]["parent_id"] == out[1]["turn_id"]
    assert out[1]["root_id"] == out[0]["turn_id"]
    assert out[2]["root_id"] == out[0]["turn_id"]


def test_exact_token_match_and_empty_turns(spark):
    rows = _turns(
        spark,
        "<html><body>"
        '<div class="commentary">not a turn</div>'
        '<div class="x comment y">tokenized ok</div>'
        '<div class="comment"></div>'  # empty turn keeps its row
        "</body></html>",
    )
    assert rows == [
        (0, None, None, True, True),
        (0, None, "tokenized ok", True, True),
    ]
