"""Micro-benchmarks: per-page latency percentiles by page size, and an
Arrow batch-size sweep of the distributed extract path.

Rewrites BENCH/MICRO.md with the freshly measured sections. Pages are synthesized
deterministically (repeatable article-like HTML with paragraphs, links
and boilerplate divs at target byte sizes) — no wall-clock, no RNG.

Usage: python tools/bench_micro.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = ("spark shuffle parquet arrow batch schema join filter window "
         "page crawl extract render select zipper token parse tree node").split()


def make_page(doc_id: int, target_bytes: int) -> str:
    """Deterministic article-like page of ~target_bytes."""
    paras = []
    i = doc_id
    size = 0
    while size < target_bytes - 400:
        words = [WORDS[(i * 7 + k) % len(WORDS)] for k in range(20)]
        if i % 5 == 0:
            words.insert(10, f'<a href="/l/{i}">{WORDS[i % len(WORDS)]}</a>')
        p = "<p>" + " ".join(words) + "</p>"
        paras.append(p)
        size += len(p)
        i += 1
    return (
        f'<!DOCTYPE html><html><head><title>d{doc_id}</title></head><body>'
        f'<nav><a href="/">home</a></nav>'
        f'<div id="main" class="content">{"".join(paras)}</div>'
        f'<div class="footer">© example</div></body></html>'
    )


def micro_latency() -> list[str]:
    from hickoryspark import parse, as_hickory
    from hickoryspark.nodes import flatten
    from hickoryspark.spark.extract import extract_doc

    lines = ["| page size | n | p50 | p95 | p99 | pages/sec/core |",
             "|---|---|---|---|---|---|"]
    for target, n in ((3_000, 400), (30_000, 150), (300_000, 30), (1_000_000, 10)):
        pages = [make_page(i, target) for i in range(n)]
        # warm-up
        for p in pages[:3]:
            extract_doc(flatten(as_hickory(parse(p))))
        lat = []
        for p in pages:
            t0 = time.perf_counter()
            extract_doc(flatten(as_hickory(parse(p))))
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        q = lambda f: lat[min(int(f * len(lat)), len(lat) - 1)]
        rate = 1000.0 / statistics.mean(lat)
        lines.append(
            f"| ~{target//1000} KB | {n} | {q(.5):.2f} ms | {q(.95):.2f} ms "
            f"| {q(.99):.2f} ms | {rate:.0f} |"
        )
    return lines


DATA_DIR = "/tmp/hickoryspark_micro_pages"

STAGE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F, SparkSession
import pandas as pd
from tools.bench_micro import make_page

spark = (SparkSession.builder.master("local[32]")
    .appName("arrow-sweep-stage").config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def gen(batches):
    for b in batches:
        ids = b["id"].tolist()
        yield pd.DataFrame({{
            "url": [f"u{{i}}" for i in ids],
            "html": [make_page(i, 3000).encode() for i in ids],
        }})

(spark.range(40000).repartition(128)
 .mapInPandas(gen, "url string, html binary")
 .write.mode("overwrite").parquet({data!r}))
spark.stop()
print("STAGED")
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F, SparkSession
from hickoryspark.spark.extract import extract_pages

batch = {batch}
spark = (SparkSession.builder.master("local[32]")
    .appName(f"arrow-sweep-{{batch}}")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
    .config("spark.python.worker.reuse", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({data!r})
n = pages.count()
extract_pages(pages.limit(2048).repartition(32)).agg(F.count("*")).collect()
t0 = time.perf_counter()
extract_pages(pages).agg(F.count("*")).collect()
dt = time.perf_counter() - t0
print(json.dumps({{"batch": batch, "sec": round(dt,3), "pages_per_sec": round(n/dt,1)}}))
spark.stop()
"""


def arrow_sweep() -> list[str]:
    import subprocess, json

    def run(code, label):
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise SystemExit(f"{label} failed")
        return out.stdout

    run(STAGE.format(repo=REPO, data=DATA_DIR), "stage")
    lines = ["| maxRecordsPerBatch | wall sec | pages/sec |", "|---|---|---|"]
    for batch in (32, 128, 512, 2048):
        stdout = run(CHILD.format(repo=REPO, batch=batch, data=DATA_DIR),
                     f"sweep batch={batch}")
        r = json.loads([l for l in stdout.splitlines() if l.startswith("{")][-1])
        print(r, flush=True)
        lines.append(f"| {batch} | {r['sec']} | {r['pages_per_sec']} |")
    return lines


def main() -> None:
    stamp = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    body = [f"# BENCH/MICRO.md — per-page latency + Arrow batch sweep",
            f"", f"measured: {stamp}", "",
            "## Single-core parse+extract latency by page size", ""]
    body += micro_latency()
    body += ["", "## Arrow batch-size sweep (40k 3KB pages, local[32])", ""]
    body += arrow_sweep()
    body += ["", "Chosen default: 128 records/batch (session.py) — large "
             "enough to amortize Arrow IPC, small enough that a batch of "
             "1 MB pages stays ~128 MB.", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "MICRO.md"), "w") as f:
        f.write("\n".join(body))
    print("wrote BENCH/MICRO.md")


if __name__ == "__main__":
    main()
