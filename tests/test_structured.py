"""JSON-LD extraction (ops/structured.py): type matching, block
indexing, validity degradation, field paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-structured-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _blocks(spark, html, url="https://ex.test/p", fields=None):
    from hickoryspark.ops.structured import extract_jsonld
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = extract_jsonld(explode_nodes(pages), fields)
    return sorted(rows.collect(), key=lambda r: r["script_pos"])


LD = '<script type="application/ld+json">'


def test_article_fields(spark):
    rows = _blocks(
        spark,
        LD + '{"@type":"Article","name":"N","headline":"H",'
             '"author":{"name":"Ann"},"datePublished":"2024-01-02"}'
        "</script>",
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["script_pos"] == 0 and r["is_valid"] is True
    assert r["jsonld_type"] == "Article"
    assert r["name"] == "N" and r["headline"] == "H"
    assert r["author_name"] == "Ann"
    assert r["date_published"] == "2024-01-02"


def test_type_matching_case_ws_and_params(spark):
    html = (
        '<script type=" Application/LD+JSON \t">{"name":"yes"}</script>'
        '<script type="application/ld+json; charset=utf-8">{"name":"no1"}'
        "</script>"
        '<script type="text/javascript">{"name":"no2"}</script>'
        '<script>{"name":"no3"}</script>'
    )
    rows = _blocks(spark, html)
    assert [r["name"] for r in rows] == ["yes"]


def test_block_index_is_document_order_of_matched_blocks(spark):
    html = (
        "<head>" + LD + '{"name":"first"}</script></head>'
        '<body><script>var x;</script>'
        + LD + '{"name":"second"}</script></body>'
    )
    rows = _blocks(spark, html)
    assert [(r["script_pos"], r["name"]) for r in rows] == [
        (0, "first"),
        (1, "second"),
    ]


def test_malformed_json_degrades_not_fails(spark):
    rows = _blocks(spark, LD + "{oops</script>" + LD + '{"name":"ok"}</script>')
    assert [(r["is_valid"], r["name"]) for r in rows] == [
        (False, None),
        (True, "ok"),
    ]
    assert rows[0]["raw_json"] == "{oops"


def test_empty_block_yields_no_row(spark):
    assert _blocks(spark, LD + "</script><p>x</p>") == []
    assert _blocks(spark, "<p>no scripts</p>") == []


def test_custom_fields_arrays_and_nesting(spark):
    rows = _blocks(
        spark,
        LD + '{"offers":{"price":"9.99"},"keywords":["k0","k1"]}</script>',
        fields={"price": "$.offers.price", "kw1": "$.keywords[1]"},
    )
    assert rows[0]["price"] == "9.99" and rows[0]["kw1"] == "k1"


def _rdfa(spark, html, url="https://ex.test/p"):
    from hickoryspark.ops.structured import extract_rdfa
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = extract_rdfa(explode_nodes(pages))
    return sorted(
        [(r["subject_idx"], r["rdf_type"], r["vocab"], r["prop_name"],
          r["prop_pos"], r["prop_value"], r["nested_subject"])
         for r in rows.collect()],
        key=lambda t: (t[0], t[4]),
    )


def test_rdfa_basic_and_value_precedence(spark):
    got = _rdfa(
        spark,
        '<div vocab=" https://schema.org/ " typeof="Person">'
        '<span property="name">Al<b>ice</b></span>'
        '<a property="url" href="/a">ignored</a>'
        '<meta property="role" content="eng">'
        '<img property="image" src="/i.png">'
        "</div>")
    assert got == [
        (0, "Person", "https://schema.org/", "name", 0, "Alice", None),
        (0, "Person", "https://schema.org/", "url", 1, "/a", None),
        (0, "Person", "https://schema.org/", "role", 2, "eng", None),
        (0, "Person", "https://schema.org/", "image", 3, "/i.png", None),
    ]


def test_rdfa_vocab_nearest_wins_and_absent(spark):
    got = _rdfa(
        spark,
        '<body vocab="https://outer/">'
        '<div typeof="A"><span property="p">x</span></div>'
        '<div vocab="https://inner/" typeof="B">'
        '<span property="q">y</span></div></body>'
        '<div typeof="C"><span property="r">z</span></div>')
    # third subject sits outside body? No — parser moves it into body,
    # so outer vocab applies; assert what the tree actually gives
    vocabs = {t[1]: t[2] for t in got}
    assert vocabs["A"] == "https://outer/"
    assert vocabs["B"] == "https://inner/"
    assert vocabs["C"] == "https://outer/"


def test_rdfa_chaining_and_outside_props_dropped(spark):
    got = _rdfa(
        spark,
        '<span property="orphan">dropped</span>'
        '<div typeof="T1"><div property="author" typeof="T2">'
        '<span property="name">B</span></div></div>')
    assert got == [
        (0, "T1", None, "author", 0, None, 1),
        (1, "T2", None, "name", 0, "B", None),
    ]


def test_rdfa_multi_token_property_and_empty(spark):
    got = _rdfa(
        spark,
        '<div typeof="T"><span property=" a  b ">v</span>'
        '<span property="">none</span></div>')
    assert got == [
        (0, "T", None, "a", 0, "v", None),
        (0, "T", None, "b", 1, "v", None),
    ]


def test_rdfa_content_beats_href_empty_subtree(spark):
    got = _rdfa(
        spark,
        '<div typeof="T"><a property="u" content="c" href="/h">t</a>'
        '<span property="e"></span></div>')
    assert got == [
        (0, "T", None, "u", 0, "c", None),
        (0, "T", None, "e", 1, "", None),
    ]
