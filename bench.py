"""Bench harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query MEDIAN sec over n_trials...}, "sf": <sf>,
     "pages_per_sec": ..., "n_pages": ..., "trials": [per-trial raw]}

Per-query numbers are the MEDIAN of $SPARK_GRAFT_TRIALS runs
(default 3) of the full headline loop: this host's speed swings 2-5x
for minutes at a time, so a single trial reads as a regression when
nothing changed (round-3 verdict #6). Raw trials ship in the JSON so
the spread stays visible.

Headline set (the queries a user of the engine actually runs hot):
  extract_main      — the north-star job: parse → boilerplate strip →
                      main-content text per page (mapInPandas, Arrow)
  render_roundtrip  — parse → byte-exact hickory render per page
  parse_node_stats  — explode pages into the flat node table + agg
  sel_relational    — a representative selector program evaluated
                      RELATIONALLY on the node table (child + class +
                      nth-child windows), exercising the shuffle path
  dedup_minhash_lsh — MinHash signatures + LSH banding candidate pairs
  ann_topk          — brute-force cosine top-k over embeddings
  ann_lsh           — hyperplane-LSH bucketed top-k (the ANN scale path)
  text_stats        — token counts + quality + language id

Each query is forced with a cheap terminal action (count / write to
noop-ish agg) so the WHOLE plan executes; timings are wall-clock per
query after a warm-up of the Spark session (worker JVM + Python worker
pool startup excluded from per-query numbers, as they would be
amortized on a long-lived cluster).

Scaling evidence (north_rule: >=0.8 efficiency N -> 4N executors):
run `python bench.py --scaling` to execute the extract_main job at
local[8] and local[32] on the same input and report pages/sec at both
plus efficiency; results land in BENCH/BASELINE.md via tools/bench_scaling.py.

PINNED PROTOCOL (round-2 verdict item 9): the 8-query headline list
above and the 4-variant adversarial page corpus (spark/pages.py
template, frozen at its round-2 revision) are FROZEN so BENCH_rN.json
files compare line-for-line across rounds. New operators get parity
coverage in __spark_entry__.queries(), NOT new headline entries; a
corpus/template change requires bumping BENCH_PROTOCOL below and
noting the break in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: bumped only when the headline list or corpus template changes.
#: r05-8q-corpus4v2: round-5 template revision (dot-segment hrefs
#: '/x/../about' + '../m3', variant-3 nested anchor 'l<b>5</b>') —
#: same 8-query headline list; bridge readings on BOTH templates are
#: recorded in BENCH/BASELINE.md so r5 stays comparable to r4.
BENCH_PROTOCOL = "r05-8q-corpus4v2"


def _queries(sf_dir: str):
    from pyspark.sql import functions as F

    from hickoryspark.spark.extract import extract_pages
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_documents, load_pages
    from hickoryspark.spark.pipeline import salt_repartition
    from hickoryspark.spark import selectors_rel as R

    def _pages(spark):
        # the sf parquet is one tiny file = one input split; a real
        # Iceberg table has thousands. Salted repartition stands in for
        # the multi-split scan so the job actually uses every core.
        p = spark.sparkContext.defaultParallelism
        return salt_repartition(
            load_pages(spark, sf_dir).select("url", "html"), p * 2
        )

    def extract_main(spark):
        out = extract_pages(_pages(spark))
        return out.agg(
            F.count("*"), F.sum("main_text_len"), F.sum("n_nodes")
        ).collect()

    def render_roundtrip(spark):
        import pandas as pd

        def gen(batches):
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

        df = _pages(spark).mapInPandas(gen, "url string, html_md5 string")
        return df.agg(F.count("*"), F.min("html_md5")).collect()

    def parse_node_stats(spark):
        nodes = explode_nodes(_pages(spark))
        return nodes.groupBy("tag").agg(
            F.count("*"), F.avg("depth")
        ).collect()

    def sel_relational(spark):
        # composite selectors reference the node table several times;
        # parse once and cache (the materialize_nodes pattern) so each
        # reference reads the cached table instead of re-parsing —
        # timed region includes the parse+cache
        nodes = explode_nodes(_pages(spark)).cache()
        try:
            nodes.count()
            sel = R.and_rel(
                R.child_rel(
                    R.where(R.p_tag("div")), R.where(R.p_tag("p"))
                ),
                R.where(R.p_nth_child("odd")),
            )
            return sel(nodes).groupBy("url").count().agg(F.sum("count")).collect()
        finally:
            nodes.unpersist()

    def dedup_minhash_lsh(spark):
        from hickoryspark.ops.dedup import lsh_candidate_pairs

        docs = load_documents(spark, sf_dir)
        # group_cap=None pins the r02 protocol's exact all-pairs
        # semantics (the library default became a finite cap in r4)
        return lsh_candidate_pairs(docs, 8, 4, group_cap=None).count()

    def ann_topk(spark):
        from hickoryspark.ops.similarity import brute_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return brute_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")).collect()

    def ann_lsh(spark):
        from hickoryspark.ops.similarity import lsh_bucket_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return (
            lsh_bucket_topk(emb, 50, 10).agg(F.count("*"), F.sum("sim")).collect()
        )

    def text_stats(spark):
        from hickoryspark.ops.textstats import lang_id, quality_score, token_stats

        docs = load_documents(spark, sf_dir)
        a = token_stats(docs).agg(F.sum("n_tokens")).collect()
        b = quality_score(docs).agg(F.sum("quality_ppm")).collect()
        c = lang_id(docs).groupBy("lang_pred").count().collect()
        return (a, b, c)

    return {
        "extract_main": extract_main,
        "render_roundtrip": render_roundtrip,
        "parse_node_stats": parse_node_stats,
        "sel_relational": sel_relational,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "ann_topk": ann_topk,
        "ann_lsh": ann_lsh,
        "text_stats": text_stats,
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hickoryspark.spark.pages import load_pages
    from hickoryspark.spark.session import get_spark

    spark = get_spark(cpus, app_name="hickoryspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from hickoryspark.spark.extract import extract_pages
    from pyspark.sql import functions as F

    pages = load_pages(spark, sf_dir)
    n_pages = pages.count()  # warms the JVM
    # warm the full Python worker pool before any timed query
    extract_pages(
        pages.select("url", "html").limit(cpus * 32).repartition(cpus)
    ).agg(F.count("*")).collect()

    # round-3 verdict #6: the host VM's speed swings 2-5x for minutes,
    # so a best-of-1 reading is noise — run the pinned headline N times
    # (default 3) and report the per-query MEDIAN, plus the raw trials
    # so the spread is visible. Protocol tag unchanged: trials, not
    # queries, changed.
    n_trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))
    trials: list[dict[str, float]] = []
    for _ in range(n_trials):
        t: dict[str, float] = {}
        for name, fn in _queries(sf_dir).items():
            t0 = time.perf_counter()
            fn(spark)
            t[name] = round(time.perf_counter() - t0, 4)
        trials.append(t)
        # lsh_candidate_pairs persists its group frame per call; without
        # this, later trials run under accumulating storage pressure
        spark.catalog.clearCache()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    timings = {
        name: round(median([t[name] for t in trials]), 4)
        for name in trials[0]
    }
    t_extract = timings["extract_main"]

    total = round(sum(timings.values()), 4)
    base = os.path.basename(sf_dir.rstrip("/"))
    sf = base[2:] if base.startswith("sf") else base
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_total_sec(extract+render+nodes+select+dedup+ann+text)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_pages": n_pages,
        "pages_per_sec": round(n_pages / t_extract, 2) if t_extract else None,
        "cpus": cpus,
        "protocol": BENCH_PROTOCOL,
        "n_trials": n_trials,
        "trials": trials,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
