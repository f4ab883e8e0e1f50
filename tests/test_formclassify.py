"""Form classification (ops/forms.py classify_forms)."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = ("url string, form_pos long, method string, action string, "
          "resolved_action string, ctl_pos long, ctl_tag string, "
          "ctl_type string, name string, value string")


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-formclassify-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _row(url, fp, ctl_pos, tag=None, typ=None, name=None):
    return (url, fp, "get", None, f"https://f.ex/{url}", ctl_pos,
            tag, typ, name, None)


def _classify(spark, rows):
    from hickoryspark.ops.forms import classify_forms

    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(tuple(r) for r in classify_forms(df).collect())


def _mirror(rows):
    from hickoryspark.ops.forms import duckdb_form_classify_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r(url VARCHAR, form_pos BIGINT, method VARCHAR,"
        " action VARCHAR, resolved_action VARCHAR, ctl_pos BIGINT,"
        " ctl_tag VARCHAR, ctl_type VARCHAR, name VARCHAR,"
        " value VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?,?,?,?,?,?,?,?,?,?)", rows)
    got = con.execute(duckdb_form_classify_sql("r")).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def test_types_and_priority(spark):
    rows = [
        # login beats search hint
        _row("a", 1, 1, "input", "password"),
        _row("a", 1, 2, "input", "search"),
        # lone q text box -> search
        _row("b", 1, 1, "input", "text", "q"),
        _row("b", 1, 2, "button", "submit"),
        # two text boxes -> not search, email -> subscribe
        _row("c", 1, 1, "input", "text", "q"),
        _row("c", 1, 2, "input", "email"),
        # upload beats search
        _row("d", 1, 1, "input", "file"),
        _row("d", 1, 2, "input", "search"),
        # control-less form
        _row("e", 1, 0),
        # textarea-only with no hint -> other
        _row("f", 1, 1, "textarea", "textarea"),
    ]
    got = _classify(spark, rows)
    types = {r[0]: (r[4], r[5]) for r in got}
    assert types == {
        "a": (2, "login"), "b": (2, "search"), "c": (2, "subscribe"),
        "d": (2, "upload"), "e": (0, "other"), "f": (1, "other"),
    }
    assert got == _mirror(rows)


def test_page_profile(spark):
    from hickoryspark.ops.forms import page_form_profile

    rows = [
        _row("p", 1, 1, "input", "password"),
        _row("p", 2, 1, "input", "text", "s"),
        _row("q", 1, 0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["url"]: tuple(r)[1:] for r in
           page_form_profile(df).collect()}
    assert got == {"p": (2, 1, 1, 0, 0), "q": (1, 0, 0, 0, 0)}


def test_fuzz_vs_mirror(spark):
    rng = random.Random(21)
    types = ["text", "password", "email", "file", "search", "submit",
             "checkbox", None]
    names = ["q", "user", "Search", None]
    rows = []
    for u in range(8):
        for fp in range(1, rng.randint(2, 4)):
            n = rng.randint(0, 4)
            if n == 0:
                rows.append(_row(f"u{u}", fp, 0))
            for cp in range(1, n + 1):
                tag = rng.choice(["input", "button", "textarea",
                                  "select"])
                typ = (tag if tag in ("textarea", "select")
                       else rng.choice(types))
                rows.append(_row(f"u{u}", fp, cp, tag, typ,
                                 rng.choice(names)))
    assert _classify(spark, rows) == _mirror(rows)


def test_end_to_end_from_html(spark):
    from hickoryspark.ops.forms import classify_forms, extract_forms
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("https://s.ex/login",
          '<form action="/do"><input type=password name=pw>'
          "<input name=user></form>"
          '<form><input name=q><button>go</button></form>')],
        "url string, html string")
    got = {r["form_pos"]: r["form_type"] for r in
           classify_forms(extract_forms(explode_nodes(pages)))
           .collect()}
    assert got == {1: "login", 2: "search"}
