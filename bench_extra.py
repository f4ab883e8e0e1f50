"""Optimization-round instrumentation — NOT the frozen bench.

Isolates the phases of each headline query (guide §1.4: noop sink so
the computation, not the sink, is timed) and dumps
``.explain("formatted")`` plans into plans/r06/.  bench.py stays the
frozen driver protocol; numbers from here are cited in
OPTIMIZATION_r06.md only.

Usage:  python bench_extra.py [phase ...]
Phases: sel dedup pages render extract text ann   (default: all)
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

PLANS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


@contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    print(f"{label:44s} {time.perf_counter() - t0:8.3f}s", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    which = set(sys.argv[1:]) or {
        "sel", "dedup", "pages", "render", "extract", "text", "ann"
    }
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from hickoryspark.spark.extract import extract_pages
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_documents, load_pages
    from hickoryspark.spark.pipeline import salt_repartition
    from hickoryspark.spark.session import get_spark
    from hickoryspark.spark import selectors_rel as R

    spark = get_spark(cpus, app_name="hickoryspark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _pages():
        p = sc.defaultParallelism
        return salt_repartition(load_pages(spark, sf_dir).select("url", "html"), p * 2)

    # warm JVM + python workers (mirror bench.py)
    pages = load_pages(spark, sf_dir)
    pages.count()
    extract_pages(pages.select("url", "html").limit(cpus * 32).repartition(cpus)).agg(
        F.count("*")
    ).collect()

    os.makedirs(PLANS, exist_ok=True)

    def dump_plan(name: str, df, suffix: str) -> None:
        with open(os.path.join(PLANS, f"{name}_{suffix}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))

    suffix = os.environ.get("PLAN_SUFFIX", "scratch")

    if "pages" in which:
        sc.setJobDescription("pages: load only")
        with timed("load_pages noop (no salt)"):
            noop(load_pages(spark, sf_dir).select("url", "html"))
        sc.setJobDescription("pages: salt_repartition")
        with timed("salt_repartition noop"):
            noop(_pages())
        dump_plan("pages_salted", _pages(), suffix)

    if "render" in which or "extract" in which:
        import pandas as pd

        def rgen(batches):
            import hashlib

            from hickoryspark import parse, as_hickory, hickory_to_html

            for b in batches:
                if not len(b):
                    continue
                md5s = [
                    hashlib.md5(
                        hickory_to_html(
                            as_hickory(parse(bytes(h).decode("utf-8")))
                        ).encode()
                    ).hexdigest()
                    for h in b["html"]
                ]
                yield pd.DataFrame({"url": b["url"], "html_md5": md5s})

        rdf = _pages().mapInPandas(rgen, "url string, html_md5 string").agg(
            F.count("*"), F.min("html_md5")
        )
        sc.setJobDescription("render_roundtrip")
        with timed("render_roundtrip full"):
            rdf.collect()
        dump_plan("render_roundtrip", rdf, suffix)

    if "extract" in which:
        sc.setJobDescription("extract_main")
        with timed("extract_main full"):
            extract_pages(_pages()).agg(
                F.count("*"), F.sum("main_text_len"), F.sum("n_nodes")
            ).collect()
        dump_plan(
            "extract_main",
            extract_pages(_pages()).agg(
                F.count("*"), F.sum("main_text_len"), F.sum("n_nodes")
            ),
            suffix,
        )
        sc.setJobDescription("parse_node_stats")
        with timed("parse_node_stats full"):
            explode_nodes(_pages()).groupBy("tag").agg(
                F.count("*"), F.avg("depth")
            ).collect()
        dump_plan(
            "parse_node_stats",
            explode_nodes(_pages()).groupBy("tag").agg(F.count("*"), F.avg("depth")),
            suffix,
        )

    if "sel" in which:
        sc.setJobDescription("sel: parse+cache")
        nodes = explode_nodes(_pages()).cache()
        with timed("sel: nodes.count (parse+cache)"):
            nodes.count()
        sel = R.and_rel(
            R.child_rel(R.where(R.p_tag("div")), R.where(R.p_tag("p"))),
            R.where(R.p_nth_child("odd")),
        )
        out = sel(nodes).groupBy("url").count().agg(F.sum("count"))
        sc.setJobDescription("sel: joins")
        with timed("sel: joins+agg (cached nodes)"):
            out.collect()
        with timed("sel: joins+agg again"):
            out.collect()
        dump_plan("sel_relational", out, suffix)
        nodes.unpersist()

    if "dedup" in which:
        from hickoryspark.ops.dedup import lsh_candidate_pairs, minhash_signatures

        docs = load_documents(spark, sf_dir)
        sc.setJobDescription("dedup: minhash signatures only")
        with timed("minhash_signatures noop"):
            noop(minhash_signatures(docs, 8))
        sc.setJobDescription("dedup: full lsh_candidate_pairs")
        with timed("lsh_candidate_pairs count"):
            n = lsh_candidate_pairs(docs, 8, 4, group_cap=None).count()
        print(f"  pairs={n}")
        dump_plan(
            "dedup_minhash_lsh", lsh_candidate_pairs(docs, 8, 4, group_cap=None), suffix
        )
        spark.catalog.clearCache()

    if "text" in which:
        from hickoryspark.ops.textstats import lang_id, quality_score, token_stats

        docs = load_documents(spark, sf_dir)
        sc.setJobDescription("text_stats")
        with timed("token_stats"):
            token_stats(docs).agg(F.sum("n_tokens")).collect()
        with timed("quality_score"):
            quality_score(docs).agg(F.sum("quality_ppm")).collect()
        with timed("lang_id"):
            lang_id(docs).groupBy("lang_pred").count().collect()
        dump_plan("text_stats", token_stats(docs).agg(F.sum("n_tokens")), suffix)

    if "ann" in which:
        from hickoryspark.ops.similarity import brute_topk, lsh_bucket_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        sc.setJobDescription("ann_topk")
        with timed("ann_topk"):
            brute_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")).collect()
        sc.setJobDescription("ann_lsh")
        with timed("ann_lsh"):
            lsh_bucket_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")).collect()
        dump_plan(
            "ann_topk", brute_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")), suffix
        )
        dump_plan(
            "ann_lsh",
            lsh_bucket_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")),
            suffix,
        )

    spark.stop()


if __name__ == "__main__":
    main()
