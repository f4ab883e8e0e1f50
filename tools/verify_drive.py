"""End-to-end verify drive (.claude/skills/verify flows 1-6 minus the
full parity sweep): pages parity vs DuckDB, extraction byte-identity,
pipeline resume, relational-vs-interpreter selector cross-check, the
entry() contract, and hostile-input probes.

Usage: python tools/verify_drive.py [sf_dir]   (default sf0.001)
Prints one line per flow; exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf: str = "/root/testdata/sf0.001") -> int:
    import duckdb
    import pyspark.sql.functions as F

    from hickoryspark.spark.session import get_spark

    spark = get_spark(8, app_name="verify-drive", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from hickoryspark.spark.pages import load_pages, DUCKDB_PAGES_CTE

    pages = load_pages(spark, sf)
    sp = {r["url"]: r["html"].decode("utf-8") for r in pages.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    dk = dict(con.execute(
        DUCKDB_PAGES_CTE + "SELECT url, html FROM pages").fetchall())
    assert sp == dk, "pages parity FAILED"
    print(f"1. pages parity ok: {len(sp)}")

    from hickoryspark.spark.extract import extract_pages

    ext = extract_pages(pages).select("url", "main_text")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = docs.select(
        F.concat(F.lit("https://ex.test/"), "source", F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat_ws(" ", "source", "text").alias("want"))
    bad = ext.join(want, "url").where(
        F.col("main_text") != F.col("want")).count()
    n = ext.count()
    assert bad == 0 and n == len(sp), (bad, n)
    print(f"2. extraction byte-identity ok: {n}")

    from hickoryspark.spark.pipeline import run_extract

    out = tempfile.mkdtemp(prefix="vfy_") + "/out"
    r1 = run_extract(spark, pages, out)
    r2 = run_extract(spark, pages, out)
    print(f"3. resume: {r1} -> {r2}")

    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark import selectors_rel as R
    from hickoryspark.html.core import parse, as_hickory
    from hickoryspark import select as S

    nodes = explode_nodes(pages)
    n_rel = nodes.where(R.p_tag("a")).count()
    n_int = sum(
        len(S.select(S.tag("a"), as_hickory(parse(h))))
        for h in sp.values())
    assert n_rel == n_int, (n_rel, n_int)
    print(f"4. selector cross-check ok: {n_rel}")

    import __spark_entry__ as E

    print(f"5. entry rows: {E.entry(spark).count()}")

    hostile = spark.createDataFrame(
        [("h1", b"\xff\xfe garbage \x00\x01"), ("h2", b""),
         ("h3", b"<a><b><i>soup"),
         ("h4", ("<div>" * 5000 + "x").encode()),
         ("h5", ("w " * 100000).encode())],
        "url string, html binary")
    print(f"6. hostile probes ok: {extract_pages(hostile).count()}")
    spark.stop()
    print("VERIFY-DRIVE ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
