"""Drive the /verify skill's flows end-to-end on the real pipeline
(tools/verify_flows.py [sf_dir]): page-generation parity vs DuckDB,
extraction byte-identity, pipeline resume, relational-vs-interpreter
selectors, the entry contract, and garbage probes. Exits non-zero on
any failure. Complements pytest (unit goldens) and tools/parity.py
(the driver-gate replica) by exercising the user-facing flow."""
import random
import sys
import tempfile

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import hickoryspark.select as S
from hickoryspark.html.core import as_hickory, parse
from hickoryspark.spark import selectors_rel as R
from hickoryspark.spark.extract import extract_pages
from hickoryspark.spark.nodes_table import explode_nodes
from hickoryspark.spark.pages import DUCKDB_PAGES_CTE, load_pages
from hickoryspark.spark.pipeline import run_extract
from hickoryspark.spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(8, shuffle_partitions=8)
    dec = lambda h: h.decode("utf-8") if isinstance(h, (bytes, bytearray)) else h

    pages = load_pages(spark, sf)
    sp = {r["url"]: dec(r["html"]) for r in pages.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    dk = {u: dec(h) for u, h in
          con.execute(DUCKDB_PAGES_CTE + "SELECT url, html FROM pages").fetchall()}
    assert sp == dk, "flow1 page generation parity FAILED"
    print("flow1 pages parity ok:", len(sp))

    ex = {r["url"]: r["main_text"] for r in extract_pages(pages).collect()}
    want = dict(con.execute(
        "SELECT url, source || ' ' || text FROM (SELECT *, "
        "'https://ex.test/' || source || '/' || doc_id AS url FROM documents)"
    ).fetchall())
    common = [u for u in ex if u in want]
    miss = [u for u in common if ex[u] != want[u]]
    assert common and not miss, f"flow2 byte-identity FAILED: {len(miss)}"
    print("flow2 byte-identity ok:", len(common))

    with tempfile.TemporaryDirectory() as td:
        m1 = run_extract(spark, pages, td + "/out")
        m2 = run_extract(spark, pages, td + "/out")
        assert m1["pages"] == len(sp) and m1["parse_errors"] == 0, m1
        assert m2["pages"] == 0, f"flow3 resume reprocessed pages: {m2}"
        print("flow3 resume ok: run1", m1, "run2", m2)

    nodes = explode_nodes(pages)
    sel = R.where(R.p_tag("a"))(nodes)
    rel = {r["url"]: r["n"]
           for r in sel.groupBy("url").agg(F.count("*").alias("n")).collect()}
    random.seed(0)
    for u in random.sample(sorted(sp), 10):
        n = len(S.select(S.tag("a"), as_hickory(parse(sp[u]))))
        assert rel.get(u, 0) == n, f"flow4 selector mismatch {u}"
    print("flow4 selector cross-engine ok")

    import __spark_entry__ as E
    print("flow5 entry rows:", E.entry(spark).count())

    probe = spark.createDataFrame(
        [("u1", "\x00\xff garbage <<<"), ("u2", ""), ("u3", "<b>" * 3000),
         ("u4", "<table><tr>" + "x " * 100000)],
        "url string, html string")
    pr = extract_pages(probe).collect()
    assert len(pr) == 4
    print("probes ok:", [(r["url"], r["parse_error"] is not None) for r in pr])
    spark.stop()
    print("VERIFY ALL OK")


if __name__ == "__main__":
    main()
