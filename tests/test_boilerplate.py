"""Site-template boilerplate detection (ops/boilerplate.py): exact
threshold semantics on a synthetic corpus, doc-order reassembly,
all-boiler pages surviving, and qualitative behavior on the real
parsed page corpus (template nav/footer classified out, doc content
kept)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-boilerplate-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _texts(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, pre_ord int, text string"
    )


def test_flags_thresholds(spark):
    from hickoryspark.ops.boilerplate import boilerplate_flags

    rows = []
    # host A: 10 pages; 'NAV' on all, 'RARE' on 2, unique text on each
    for i in range(10):
        url = f"a/p{i}"
        rows += [(url, "a", 0, "NAV"), (url, "a", 2, f"content {i}")]
    rows += [("a/p0", "a", 1, "RARE"), ("a/p1", "a", 1, "RARE")]
    # host B: 2 pages sharing 'NAV' — under min_pages, never boiler
    rows += [("b/p0", "b", 0, "NAV"), ("b/p1", "b", 0, "NAV")]
    flags = boilerplate_flags(
        _texts(spark, rows), min_pages=3, min_frac=0.3
    ).collect()
    import hashlib

    sig = lambda t: hashlib.md5(t.encode()).hexdigest()
    by = {(r["host"], r["sig"]): r for r in flags}
    assert by[("a", sig("NAV"))]["is_boiler"] is True
    assert by[("a", sig("NAV"))]["n_pages"] == 10
    assert by[("a", sig("RARE"))]["is_boiler"] is False   # 2/10 < 0.3
    assert by[("a", sig("content 3"))]["is_boiler"] is False
    assert by[("b", sig("NAV"))]["is_boiler"] is False    # 2 < min_pages
    assert by[("b", sig("NAV"))]["host_pages"] == 2


def test_strip_doc_order_and_within_page_repeats(spark):
    from hickoryspark.ops.boilerplate import strip_boilerplate

    rows = []
    for i in range(5):
        url = f"h/p{i}"
        # NAV appears TWICE on page 0 (within-page repeat counts once
        # toward n_pages but both occurrences are stripped)
        rows += [(url, "h", 0, "NAV"),
                 (url, "h", 5, f"z{i}"),
                 (url, "h", 3, f"m{i}")]
    rows += [("h/p0", "h", 9, "NAV")]
    out = {r["url"]: r for r in strip_boilerplate(
        _texts(spark, rows), min_pages=3, min_frac=0.5).collect()}
    assert out["h/p0"]["kept_text"] == "m0 z0"   # doc order by pre_ord
    assert out["h/p0"]["n_boiler"] == 2          # both NAV occurrences
    assert out["h/p2"]["kept_text"] == "m2 z2"
    assert out["h/p2"]["n_kept"] == 2


def test_strip_all_boiler_page_survives(spark):
    from hickoryspark.ops.boilerplate import strip_boilerplate

    rows = []
    for i in range(4):
        rows.append((f"h/p{i}", "h", 0, "NAV"))
    rows.append(("h/p0", "h", 1, "only here"))
    out = {r["url"]: r for r in strip_boilerplate(
        _texts(spark, rows), min_pages=3, min_frac=0.5).collect()}
    assert out["h/p1"]["kept_text"] == "" and out["h/p1"]["n_kept"] == 0
    assert out["h/p0"]["kept_text"] == "only here"


def test_page_text_nodes_excludes_template_subtree(spark):
    """Template CONTENT never renders: text nested below <template>
    (whose direct parent is some inner element, not template itself)
    must be excluded; script/style rawtext too; ordinary text kept."""
    from hickoryspark.ops.boilerplate import page_text_nodes
    from hickoryspark.spark.nodes_table import explode_nodes

    html = ("<html><body><p>real content</p>"
            "<template><ul><li>Promo widget</li></ul></template>"
            "<script>var x = 'nope'</script>"
            "<style>.a{}</style>"
            "<div>more text</div></body></html>")
    pages = spark.createDataFrame(
        [("https://t.test/x", html.encode())], "url string, html binary"
    )
    texts = [r["text"] for r in
             page_text_nodes(explode_nodes(pages)).collect()]
    assert "real content" in texts and "more text" in texts
    assert not any("Promo" in t or "nope" in t or ".a{}" in t
                   for t in texts)


def test_real_pages_template_stripped_content_kept(spark):
    """On the real 4-variant page corpus: template chrome (shared nav
    labels) must classify out, and every page keeps text containing
    its doc's own words."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.boilerplate import page_text_nodes, strip_boilerplate
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_documents, load_pages

    pages = load_pages(spark, SF_DIR)
    texts = page_text_nodes(explode_nodes(pages))
    # 0.2 < the 1/4 variant-block share, so per-variant chrome flags too
    out = strip_boilerplate(texts, min_pages=3, min_frac=0.2)
    docs = load_documents(spark, SF_DIR).select(
        "doc_id", F.split("text", " ").getItem(0).alias("w0")
    )
    joined = (
        out.withColumn(
            "doc_id",
            F.regexp_extract("url", r"/(\d+)\z", 1).cast("long"),
        )
        .join(docs, "doc_id")
        .select("kept_text", "w0")
        .collect()
    )
    assert len(joined) == 500
    hits = sum(1 for r in joined if r["w0"] in r["kept_text"].split())
    # every doc's first word is doc text; template chrome never
    # contains it — all pages must keep their content
    assert hits == len(joined)


def test_real_pages_nav_block_is_flagged(spark):
    """The template's shared NAV/footer text nodes (present on every
    page of a host) must flag as boilerplate."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.boilerplate import (
        boilerplate_flags,
        page_text_nodes,
    )
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    import hashlib

    texts = page_text_nodes(explode_nodes(load_pages(spark, SF_DIR)))
    flags = boilerplate_flags(texts, min_pages=3, min_frac=0.2)
    sigs = [hashlib.md5(t.encode()).hexdigest() for t in ("t1", "m1", "l1")]
    chrome = flags.where(F.col("sig").isin(sigs)).collect()
    assert len(chrome) > 0
    assert all(r["is_boiler"] for r in chrome), chrome
    # every ~quarter-share variant block crossed the 0.2 threshold
    assert all(r["n_pages"] >= 0.2 * r["host_pages"] for r in chrome)


def test_page_text_nodes_parses_once(spark):
    """The template exclusion must not re-execute the parse lineage:
    exactly ONE mapInPandas (the explode) in the executed plan
    (regression: an interval anti-join against the same uncached
    nodes frame parsed every page twice)."""
    from hickoryspark.ops.boilerplate import page_text_nodes
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(
        [("https://t.test/1", b"<html><body><p>x</p></body></html>")],
        "url string, html binary",
    )
    df = page_text_nodes(explode_nodes(pages))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints the plan twice (Final + Initial) — count the final
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1
