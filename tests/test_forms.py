"""HTML form extraction (ops/forms.py): method normalization, action
resolution, control ownership/order/type defaults, empty forms."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-forms-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(spark, html, url="https://f.ex/a/1"):
    from hickoryspark.ops.forms import extract_forms
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    out = extract_forms(explode_nodes(pages)).orderBy("form_pos", "ctl_pos")
    return [r.asDict() for r in out.collect()]


def test_basic_form_controls_in_order(spark):
    rows = _rows(
        spark,
        "<form method=' POST ' action='/submit'>"
        "<input name='q'><div><textarea name='msg'></textarea></div>"
        "<button>go</button></form>",
    )
    assert len(rows) == 3
    assert [r["ctl_pos"] for r in rows] == [1, 2, 3]
    assert all(r["method"] == "post" for r in rows)
    assert all(r["resolved_action"] == "https://f.ex/submit" for r in rows)
    assert rows[0]["ctl_tag"] == "input" and rows[0]["ctl_type"] == "text"
    assert rows[1]["ctl_tag"] == "textarea" and rows[1]["ctl_type"] == "textarea"
    assert rows[2]["ctl_tag"] == "button" and rows[2]["ctl_type"] == "submit"
    assert rows[0]["name"] == "q" and rows[2]["name"] is None


def test_method_default_and_invalid(spark):
    rows = _rows(spark, "<form method='PUT'><input></form>"
                        "<form><input></form>")
    assert rows[0]["method"] == "get" and rows[1]["method"] == "get"
    assert rows[0]["form_pos"] == 1 and rows[1]["form_pos"] == 2
    assert rows[0]["action"] is None and rows[0]["resolved_action"] is None


def test_action_dot_segments_and_input_type(spark):
    rows = _rows(
        spark,
        "<form action='../go'><input type=' CHECKBOX ' name='c' value='1'>"
        "<input type=''><select name='s'><option>x</option></select></form>",
    )
    assert rows[0]["resolved_action"] == "https://f.ex/go"
    assert rows[0]["ctl_type"] == "checkbox" and rows[0]["value"] == "1"
    assert rows[1]["ctl_type"] == "text"        # empty type -> default
    assert rows[2]["ctl_tag"] == "select" and rows[2]["ctl_type"] == "select"


def test_outside_controls_dropped_and_empty_form_row(spark):
    rows = _rows(
        spark,
        "<input name='stray'><form action='/a'></form>"
        "<form action='/b'><button type=' Reset '>r</button></form>",
    )
    assert len(rows) == 2
    empty = [r for r in rows if r["ctl_pos"] == 0]
    assert len(empty) == 1 and empty[0]["action"] == "/a"
    assert empty[0]["ctl_tag"] is None
    btn = [r for r in rows if r["ctl_pos"] == 1][0]
    assert btn["ctl_type"] == "reset" and btn["action"] == "/b"


def test_absolute_action_verbatim(spark):
    rows = _rows(spark, "<form action='https://other.ex/abs'><input></form>")
    assert rows[0]["resolved_action"] == "https://other.ex/abs"
