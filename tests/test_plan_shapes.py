"""Physical-plan shape guards: the properties that make the operators
viable at 100 TB are asserted on the EXECUTED/optimized plans, so a
regression (lost broadcast, lost column pruning, extra shuffle, a
Python UDF sneaking into a JVM-only path) fails CI instead of
silently costing a cluster.
"""

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

    s = get_spark(4, app_name="hickoryspark-plan-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    # cached DataFrames from other test modules (getOrCreate shares the
    # session) would substitute InMemoryRelations into matching plan
    # fragments and hide the scan shapes these tests assert on
    s.catalog.clearCache()
    yield s


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_relational_joins_broadcast_the_dimension_tables(spark):
    """revenue_by_nation joins lineitem against orders/customer/nation:
    the dim side must be broadcast (no shuffled sort-merge join of the
    fact table against a tiny dimension)."""
    from hickoryspark.ops.relational import revenue_by_nation

    plan = _plan(revenue_by_nation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_textstats_scan_prunes_columns_and_stays_jvm_side(spark):
    """token_stats needs only (doc_id, text): the parquet ReadSchema
    must not include lang/source/n_chars, and no Python evaluation may
    appear — the whole query is JVM expressions."""
    from hickoryspark.ops.textstats import token_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(token_stats(docs))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "lang" not in scan[0] and "source" not in scan[0]
    assert "Python" not in plan  # builtins only; no UDF in the hot path


def test_extract_prunes_unused_page_columns(spark):
    """extract_pages selects only (url, html): column pruning must push
    through the pages-synthesis projection to the documents scan, so
    the column the synthesis does NOT need for those two outputs
    (lang) never leaves parquet."""
    from hickoryspark.spark.extract import extract_pages
    from hickoryspark.spark.pages import load_pages

    plan = _plan(extract_pages(load_pages(spark, SF_DIR)))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "lang" not in scan[0], scan[0]


def test_minhash_signatures_single_shuffle(spark):
    """minhash_signatures = explode + ONE groupBy with k min-aggs: the
    executed plan must contain exactly one shuffle exchange."""
    from hickoryspark.ops.dedup import minhash_signatures
    from hickoryspark.spark.pages import load_documents

    plan = _plan(minhash_signatures(load_documents(spark, SF_DIR), 4))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ann_partial_topk_shuffles_only_partials(spark):
    """brute_topk: the embedding column must NOT cross a shuffle — the
    only exchange is the final per-query merge of (query_id,
    neighbor_id, sim) partials."""
    from hickoryspark.ops.similarity import brute_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(brute_topk(emb, 5, 3))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "embedding" not in exchanges[0]


def test_pages_filter_pushed_to_parquet_scan(spark):
    """A doc_id predicate over the synthesized pages must reach the
    documents parquet scan as a pushed filter (the generation is a pure
    projection, so Catalyst can push through it)."""
    from pyspark.sql import functions as F

    from hickoryspark.spark.pages import load_pages

    df = load_pages(spark, SF_DIR, with_params=True).where(F.col("doc_id") < 10)
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "doc_id" in pushed[0], plan


def test_simhash_pairs_group_joins_broadcast_at_runtime(spark):
    """simhash_pairs_from_sigs: the group signature/member lookups are
    UNHINTED equi-joins (round-3 advice: a forced broadcast of the
    one-row-per-distinct-signature table is a driver OOM at design
    scale) — AQE must still promote them to broadcast at runtime when
    the group table is small, and no BroadcastNestedLoopJoin may
    appear anywhere."""
    from hickoryspark.ops.dedup import simhash_near_pairs
    from hickoryspark.spark.pages import load_documents

    df = simhash_near_pairs(load_documents(spark, SF_DIR), 64, 3)
    df.count()  # materialize so AQE finalizes the adaptive plan
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # static plan must NOT force broadcast; the finalized adaptive plan
    # should have promoted the tiny group lookups at runtime
    assert "isFinalPlan=true" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan  # 2 sig + 2 member
    spark.catalog.clearCache()


def test_pack_sequences_offsets_join_is_broadcast(spark):
    """pack_sequences: the per-slice prefix-offset frame (one row per
    partition-stratum slice) joins back by BROADCAST, and the bulk
    window partitions by (_pid, stratum) — never stratum alone."""
    from hickoryspark.ops.sampling import pack_sequences
    from hickoryspark.spark.pages import load_documents

    plan = _plan(pack_sequences(load_documents(spark, SF_DIR), 512))
    assert "BroadcastHashJoin" in plan, plan
    # bulk-data windows must include the slice id in their keys
    for ln in plan.splitlines():
        if "Window" in ln and "_before_loc" in ln:
            assert "_pid" in ln, ln


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the same key/count join WITHOUT any
    shuffle: the executed plan must contain no Exchange operator on
    either side (the 100 TB co-location contract of spark/bucketing)."""
    from pyspark.sql import functions as F

    from hickoryspark.spark.bucketing import bucketed_join, write_bucketed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # broadcast thresholds off so a lost bucket spec would show up as
    # an Exchange+SortMergeJoin, not get masked by a broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            docs.select("doc_id", "source"), "hs_bkt_a", "doc_id", 8
        )
        write_bucketed(
            docs.select("doc_id", F.length("text").alias("n")),
            "hs_bkt_b", "doc_id", 8,
        )
        joined = bucketed_join(spark, "hs_bkt_a", "hs_bkt_b", "doc_id")
        assert joined.count() == docs.count()
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # bucket-pruned scan: the scan nodes report the bucket spec
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS hs_bkt_a")
        spark.sql("DROP TABLE IF EXISTS hs_bkt_b")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """Runtime skew evidence: a join whose hot key dwarfs the median
    partition must come out of AQE as SortMergeJoin(skew=true) with a
    skewed AQEShuffleRead — the mechanism that protects the url-keyed
    joins from crawl hot-spots at design scale."""
    from pyspark.sql import functions as F

    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        pad = "x" * 200
        fact = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97).alias("k"),
            F.concat(F.lit(pad), F.col("id")).alias("payload"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), F.lit("d").alias("d")
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 300_000
        plan = _plan(j)  # final adaptive plan (post-execution)
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_rejects_mismatched_specs(spark):
    """A bucket-count mismatch must raise, not silently replan the
    full shuffle the module exists to avoid."""
    import pytest as _pytest

    from hickoryspark.spark.bucketing import bucketed_join, write_bucketed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        write_bucketed(docs.select("doc_id"), "hs_bkt_m4", "doc_id", 4)
        write_bucketed(docs.select("doc_id"), "hs_bkt_m8", "doc_id", 8)
        with _pytest.raises(ValueError, match="specs must match"):
            bucketed_join(spark, "hs_bkt_m4", "hs_bkt_m8", "doc_id")
        with _pytest.raises(ValueError, match="specs must match"):
            bucketed_join(spark, "hs_bkt_m4", "hs_bkt_m4", "source")
    finally:
        spark.sql("DROP TABLE IF EXISTS hs_bkt_m4")
        spark.sql("DROP TABLE IF EXISTS hs_bkt_m8")


def test_extract_links_single_url_shuffle(spark):
    """extract_links: the anchor-text join broadcasts/equi-joins (no
    BroadcastNestedLoopJoin), and ONE url exchange serves both the
    per-anchor aggregation and the link_pos window (url-subset
    satisfaction) — at bucketed-by-url scale that one shuffle
    disappears too."""
    from hickoryspark.ops.links import extract_links
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    df = extract_links(explode_nodes(load_pages(spark, SF_DIR)))
    df.count()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    spark.catalog.clearCache()


def test_css_is_fuses_to_one_filter_and_has_equi_joins(spark):
    """css_rel: a compound whose :is branches are all pure-column must
    compile to a SINGLE Filter over the node scan — no join, no
    exchange beyond what the node table itself needs (the fused-OR
    claim in css.py's docstring); :has compounds join but must stay
    equi-joins (never BroadcastNestedLoopJoin)."""
    from hickoryspark.css import css_rel
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    nodes = explode_nodes(load_pages(spark, SF_DIR))
    base_plan = _plan(nodes.where("type = 1"))
    fused = _plan(css_rel("div:is(.content, .footer)[id]")(nodes))
    assert "Join" not in fused, fused
    assert fused.count("Exchange") == base_plan.count("Exchange"), fused
    assert fused.count("Filter") == base_plan.count("Filter"), fused

    for s in ("div:has(> a)", "td:has(+ td)", "p:empty"):
        plan = _plan(css_rel(s)(nodes))
        assert "BroadcastNestedLoopJoin" not in plan, (s, plan)


def test_page_metadata_single_shuffle_and_prefilter(spark):
    """page_metadata: ONE url exchange total (the groupBy), with the
    head-shape Filter applied BEFORE it (partial aggregation over the
    pruned rows, not a shuffle of the whole node table), and no Python
    evaluation — the aggregate is pure JVM expressions."""
    from hickoryspark.ops.metadata import page_metadata
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    df = page_metadata(explode_nodes(load_pages(spark, SF_DIR)))
    df.count()
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the node-table mapInPandas is the only Python in the path
    assert plan.count("PythonMapInArrow") + plan.count("MapInPandas") <= 1, plan
    assert "Filter" in plan, plan
    # the filter must sit below the exchange: everything after the
    # shuffle is aggregate-only (cheap string check on plan order —
    # the first Exchange line appears ABOVE the Filter line in the
    # top-down tree rendering)
    assert plan.index("Exchange hashpartitioning") < plan.index(
        "Filter"
    ), plan
    spark.catalog.clearCache()


def test_jsonld_join_is_equi_and_jvm_side(spark):
    """extract_jsonld: the script↔payload join must be an equi-join
    (never BroadcastNestedLoopJoin), and the only Python in the path
    is the node-table parse — field extraction is JVM get_json_object."""
    from hickoryspark.ops.structured import extract_jsonld
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    df = extract_jsonld(explode_nodes(load_pages(spark, SF_DIR)))
    df.count()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    spark.catalog.clearCache()


def test_robots_sitemaps_single_host_shuffle_jvm_only(spark):
    """robots_sitemaps: explode → filter → window must cost exactly
    one hash exchange (the host window) with zero Python evaluation."""
    from hickoryspark.ops.robots import robots_sitemaps

    robots = spark.createDataFrame(
        [("h.test", "Sitemap: https://h.test/s.xml\nUser-agent: *")],
        "host string, content string",
    )
    df = robots_sitemaps(robots)
    df.count()
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_terms_tf_exchange_reused_single_token_pass(spark):
    """tfidf/surprisal consume the tf relation twice (rows + per-term
    aggregate); the shared child must land as ONE exchange reused by
    both branches — otherwise the token explode runs twice. Guarded on
    the AQE final plan (reuse materializes at stage submission)."""
    from hickoryspark.ops.terms import tfidf_top_terms, unigram_surprisal

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (tfidf_top_terms(docs, 3), unigram_surprisal(docs)):
        df.collect()
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        ).split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in plan
        assert plan.count("ReusedExchange") >= 1, plan
        # exactly 2 source scans: the tf lineage + the cheap
        # one-row corpus/doc-count aggregate
        assert plan.count("FileScan parquet") == 2, plan


def test_aggregate_anchors_linear_preagg_no_codegen_overflow(spark):
    """aggregate_anchors must (a) pre-aggregate to (target, url,
    anchor) grain BEFORE its windows so the sort sees distinct triples
    rather than raw edges, (b) stay a single linear pipeline (no
    second scan of the links lineage), and (c) keep the giant
    resolve_href expression out of any pushed-down filter (the
    isnotnull(CASE ...) form that overflowed 64 KB codegen)."""
    from pyspark.sql import Row

    from hickoryspark.ops.links import aggregate_anchors

    edges = spark.createDataFrame([
        Row(url=f"u{i % 5}", resolved=f"t{i % 3}", anchor_text=f"a{i % 4}")
        for i in range(40)
    ])
    out = aggregate_anchors(edges)
    plan = _plan(out)
    # pre-agg grain: the edge-count partial aggregate (count(1) keyed
    # by target+url+anchor) sits BELOW the windows in the printed tree
    # (string position AFTER them); the distinct-url partial above the
    # windows prints as partial_count(distinct ...), not count(1)
    w = plan.find("Window")
    pre = plan.find("partial_count(1)")
    assert w != -1 and pre > w, plan
    assert "isnotnull(CASE" not in plan
    # counts stay exact: sum of edge multiplicities + distinct urls
    rows = {r["target"]: r for r in out.collect()}
    assert rows["t0"]["n_links"] == 14  # i%3==0 over range(40)
    assert rows["t0"]["n_pages"] == 5


def test_repetition_signals_jvm_only_no_nested_loop(spark):
    """repetition_signals is a pure-JVM two-tree aggregation: no
    Python evaluation anywhere, no nested-loop/cartesian join (the
    doc_id stitches are equi-joins), and the n-gram top pick must ride
    a Window over the aggregated relation — never a self-join of the
    gram counts."""
    from hickoryspark.ops.repetition import repetition_signals

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(repetition_signals(docs))
    assert "Python" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # column pruning: only doc_id + text reach the scan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "lang" not in scan[0] and "source" not in scan[0]


def test_extract_images_equi_joins_and_bounded_exchanges(spark):
    """extract_images: every join is url-equi with interval residuals
    (never BroadcastNestedLoop/cartesian), and after the input
    relations' own url exchanges NOTHING downstream reshuffles — the
    groupBys key on (url, m_id, ...) with url-subset satisfaction and
    the media_pos window rides the same url partitioning, so the
    hash-exchange count stays at the input-side bound (4: media,
    figures, texts, figcaps)."""
    from hickoryspark.ops.media import extract_images
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    df = extract_images(explode_nodes(load_pages(spark, SF_DIR)))
    df.count()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    spark.catalog.clearCache()


def test_boilerplate_exchanges_key_on_digests_not_text(spark):
    """strip_boilerplate's shuffles partition on (host, sig)/(url) —
    never on the text body — and no join degrades to a nested loop."""
    from hickoryspark.ops.boilerplate import strip_boilerplate

    rows = [(f"h/p{i}", "h", j, t if j else "NAV")
            for i in range(6) for j, t in enumerate(["NAV", f"c{i}" * 40])]
    texts = spark.createDataFrame(
        rows, "url string, host string, pre_ord int, text string"
    )
    df = strip_boilerplate(texts, min_pages=3, min_frac=0.5)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "text#" not in head, plan


def test_spans_joins_are_equi_never_nested_loop(spark):
    """duplicated_spans: bucket/diagonal/slice joins are all equi —
    a BNLJ or cartesian over the pair set would be the 100x killer."""
    from hickoryspark.ops.spans import duplicated_spans

    block = "a shared run long enough to anchor and verify fully"
    docs = spark.createDataFrame(
        [(i, f"u{i:03d}" + block + f"v{i:03d}") for i in range(8)],
        "doc_id long, text string",
    )
    df = duplicated_spans(docs, k=10, w=4, min_len=20)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the verifier consumes bounded slices, not document bodies
    assert "sl_a" in plan and "sl_b" in plan


def test_ahash_images_is_shuffle_free(spark):
    from hickoryspark.ops.imagehash import ahash_images
    from hickoryspark.ops.multimodal import encode_ppm
    import numpy as np

    img = encode_ppm(np.full((16, 16, 3), 99, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, img)], "media_id long, payload binary"
    )
    df = ahash_images(media)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_sample_broadcasts_thresholds(spark):
    """the per-stratum threshold frame is tiny: the corpus-side join
    must be a broadcast, and the corpus is touched by one filter pass
    (no SortMergeJoin of the full table)."""
    from hickoryspark.ops.sampling import temperature_sample
    from hickoryspark.spark.pages import load_documents

    df = temperature_sample(load_documents(spark, SF_DIR), 0.5)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_iterations_equi_joins_only(spark):
    """3 power iterations: every join equi (no BNLJ/cartesian) — an
    accidental cross join over the edge table is the 100x killer."""
    from hickoryspark.ops.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20)], "src long, dst long"
    )
    df = pagerank(edges, n_iter=3)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_build_single_shuffle(spark):
    """explode + groupBy(word): exactly one exchange, partial bit_or
    map-side."""
    from hickoryspark.ops.sketch import bloom_build

    keys = spark.createDataFrame([(f"k{i}",) for i in range(64)],
                                 "key string")
    df = bloom_build(keys)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_bit_or" in plan


def test_hll_registers_single_shuffle(spark):
    from hickoryspark.ops.sketch import hll_registers

    keys = spark.createDataFrame([(f"k{i}",) for i in range(64)],
                                 "key string")
    df = hll_registers(keys)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_paragraph_dedup_no_window_no_nested_loop(spark):
    """dedup_paragraphs' first-seen table must come from a partial-
    aggregable min(struct), never a per-key window (a viral paragraph
    would funnel one window partition), and the key join must stay an
    equi-join."""
    from hickoryspark.ops.paragraphs import dedup_paragraphs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(dedup_paragraphs(docs))
    assert "Window" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "partial_min" in plan


def test_forms_interval_joins_are_equi(spark):
    """extract_forms' ownership joins are url-equi with interval
    residuals — a BroadcastNestedLoopJoin here is the O(N*M)
    regression the descendant_rel pattern exists to prevent."""
    from hickoryspark.ops.forms import extract_forms
    from hickoryspark.spark.nodes_table import explode_nodes
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit("<form action='/x'><input name='a'></form>").alias("html"),
    )
    plan = _plan(extract_forms(explode_nodes(pages)))
    assert "BroadcastNestedLoop" not in plan


def test_lm_relations_no_window_single_generate(spark):
    """ngram_counts / continuation_counts: one explode each into a
    map-side-combinable aggregation — no windows, and the aggregate
    must show a partial phase before the exchange."""
    from hickoryspark.ops.lm import continuation_counts, ngram_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (ngram_counts(docs, 3), continuation_counts(docs, 3)):
        plan = _plan(df)
        assert "Window" not in plan
        assert plan.count("Generate") == 1
        assert "partial_count" in plan


def test_cdx_records_shuffle_free(spark):
    """cdx_records is a pure projection over the captures scan."""
    from hickoryspark.ops.cdx import cdx_records
    from pyspark.sql import functions as F

    caps = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("https://c.ex/"), F.col("doc_id")).alias("url"),
        F.expr("TIMESTAMP_NTZ '2026-01-01 00:00:00'").alias("ts"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    plan = _plan(cdx_records(caps))
    assert "Exchange" not in plan


def test_url_and_mojibake_features_shuffle_free(spark):
    """url_features / mojibake_stats are row-local column programs."""
    from hickoryspark.ops.textnorm import mojibake_stats
    from hickoryspark.ops.urls import url_features
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    urls = docs.select(
        F.concat(F.lit("https://u.ex/"), F.col("doc_id")).alias("url"))
    assert "Exchange" not in _plan(url_features(urls))
    assert "Exchange" not in _plan(mojibake_stats(docs))


def test_cms_build_single_shuffle_probe_broadcasts(spark):
    """cms_build: one exchange (partial sums map-side); cms_query: the
    d cell-table joins broadcast — the probes lineage never shuffles."""
    from hickoryspark.ops.sketch import cms_build, cms_query

    keys = spark.createDataFrame([(f"k{i % 9}",) for i in range(64)],
                                 "key string")
    cms = cms_build(keys, w=32, d=3)
    cms.count()
    plan = _plan(cms)
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan

    probes = spark.createDataFrame([(f"k{i}",) for i in range(20)],
                                   "key string")
    out = cms_query(probes, cms, w=32, d=3)
    out.collect()  # collect the SAME df so AQE finalizes this plan
    pplan = _plan(out)
    assert "isFinalPlan=true" in pplan
    assert "BroadcastHashJoin" in pplan
    assert "SortMergeJoin" not in pplan
    # no exchange introduced on the probe lineage itself (the only
    # exchanges are the cms build + broadcast distribution)
    assert "Exchange hashpartitioning(key" not in pplan


def test_url_templates_two_shuffle_jvm_only(spark):
    """signature fold is pure JVM expressions; the rollup is exactly
    TWO hash exchanges — the exact-distinct minimum: partial dedup on
    (host, signature, url), then the (host, signature) rollup. The
    second exchange carries only deduplicated rows (partial_count
    present = map-side combine on both)."""
    from hickoryspark.ops.urltemplates import url_templates

    df = spark.createDataFrame(
        [(f"https://t.ex/cal/2026/{i % 12}",) for i in range(64)],
        "url string")
    out = url_templates(df)
    out.count()
    plan = _plan(out)
    assert plan.count("Exchange") == 2
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "partial_count" in plan


def test_script_profile_shuffle_free_jvm_only(spark):
    from hickoryspark.ops.scripts import script_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = script_profile(docs)
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bm25_prunes_postings_to_query_terms_before_agg(spark):
    """the tf aggregation must sit ABOVE the query-term semi-join
    (broadcast), so only matching occurrences ever shuffle; the query
    relation must broadcast, never sort-merge."""
    from hickoryspark.ops.retrieval import bm25_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    qs = spark.createDataFrame([(0, "hash join"), (1, "spark")],
                               "query_id long, query string")
    out = bm25_scores(docs, qs, top_k=5)
    out.collect()
    plan = _plan(out)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    opt = _optimized(out)
    # the semi-join prune survives optimization: a LeftSemi appears
    # below the tf Aggregate in the optimized plan
    assert "LeftSemi" in opt


def test_decontam_broadcasts_bench_grams(spark):
    """the bench gram relation must broadcast into the corpus gram
    stream — never a sort-merge join on the gram key."""
    from hickoryspark.ops.decontam import decontaminate

    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    bench = spark.createDataFrame(
        [(0, "one two three four five six")],
        "bench_id long, text string")
    out = decontaminate(corpus, bench, n=4)
    out.collect()
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_shard_manifest_single_shuffle_jvm_only(spark):
    from hickoryspark.ops.shards import shard_manifest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    out = shard_manifest(docs, 16)
    out.count()
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_anchor_profile_no_window(spark):
    """top-anchor selection is the min-struct tie rule — aggregation
    only, never a rank window over per-target frames."""
    from hickoryspark.ops.links import anchor_text_profile

    links = spark.createDataFrame(
        [(f"https://s/{i % 5}", i, "h", f"T{i % 3}", "a", False)
         for i in range(30)],
        "url string, link_pos long, href string, resolved string, "
        "anchor_text string, rel_nofollow boolean")
    out = anchor_text_profile(links)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_lm_scoring_broadcasts_scalars_not_model(spark):
    """corpus scalars broadcast (explicit); the vocabulary-sized model
    joins on term as an equi-join — and the whole program stays
    JVM-side."""
    from hickoryspark.ops.lm import unigram_logprob_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    out = unigram_logprob_scores(docs, docs)
    out.count()
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_admission_policy_equi_joins_jvm_only(spark):
    """the three carrier joins are url equi-joins (never
    BroadcastNestedLoop/cartesian) and the merge is pure column
    logic — no Python crossing anywhere."""
    from hickoryspark.ops.admission import admission_policy

    pages = spark.createDataFrame(
        [(f"https://s/{i}",) for i in range(40)], "url string")
    robots = spark.createDataFrame(
        [(f"https://s/{i}", i % 2 == 0) for i in range(0, 40, 3)],
        "url string, allowed boolean")
    http = spark.createDataFrame(
        [(f"https://s/{i}", 200 + i, i % 2 == 0, False)
         for i in range(0, 40, 5)],
        "url string, status int, noindex boolean, nofollow boolean")
    meta = spark.createDataFrame(
        [(f"https://s/{i}", False, i % 2 == 1) for i in range(0, 40, 4)],
        "url string, noindex boolean, nofollow boolean")
    out = admission_policy(pages, robots, http, meta)
    out.count()
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_phrase_match_broadcasts_phrase_terms(spark):
    """the phrase-term table broadcasts into the occurrence join (only
    phrase-term occurrences shuffle), both rollups stay JVM-side, and
    no window appears."""
    from hickoryspark.ops.retrieval import phrase_match

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    phrases = spark.createDataFrame(
        [(0, "a b"), (1, "c")], "phrase_id long, phrase string")
    out = phrase_match(docs, phrases)
    out.count()
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_publish_dates_filters_below_exchange_no_window(spark):
    """carrier candidates are filtered before the url exchange, the
    priority pick is a min-struct aggregation (never a window), and
    the jsonld attach is an equi-join."""
    from hickoryspark.ops.dates import publish_dates
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    nodes = explode_nodes(load_pages(spark, SF_DIR))
    out = publish_dates(nodes)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_host_graph_two_rollups_no_window(spark):
    """host_edges collapses pairs map-side before the shuffle; the
    stats rollup is aggregation-only (top-external is a min-struct,
    never a window); everything JVM-side."""
    from hickoryspark.ops.hostgraph import host_link_stats

    edges = spark.createDataFrame(
        [(f"https://h{i % 7}.ex/p{i}", f"https://h{(i * 3) % 11}.ex/t")
         for i in range(200)],
        "url string, resolved string")
    out = host_link_stats(edges)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # partial aggregation must appear below the exchange (map-side
    # combine of host pairs)
    assert "partial" in plan.lower(), plan


def test_soft404_is_shuffle_free_jvm_only(spark):
    """pure column expressions: no exchange, no Python crossing."""
    from hickoryspark.ops.soft404 import soft404_signals

    df = spark.createDataFrame(
        [(f"u{i}", 200, "t", "x y z") for i in range(10)],
        "url string, status int, title string, text string")
    out = soft404_signals(df)
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_change_stability_single_mapside_rollup(spark):
    """one url groupBy with partial aggregation below the exchange; no
    window, no Python."""
    from hickoryspark.ops.snapshots import change_stability

    obs = spark.createDataFrame(
        [(f"u{i % 9}", i % 3 == 0) for i in range(100)],
        "url string, changed boolean")
    out = change_stability(obs)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") == 1, plan
    assert "partial" in plan.lower(), plan


def test_c4_filter_zero_shuffle_jvm_only(spark):
    """the whole line/page program is per-row higher-order array
    expressions: no exchange, no Python crossing."""
    from hickoryspark.ops.c4filter import c4_line_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    out = c4_line_filter(docs)
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_embstats_prunes_columns_and_rollup_is_jvm(spark):
    """the Arrow pass carries only (vec_id, label, embedding); the
    label rollup is a plain JVM aggregation over the per-vec rows."""
    from hickoryspark.ops.embstats import label_norm_rollup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = label_norm_rollup(emb)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert plan.count("ArrowEval") + plan.count("MapInPandas") >= 1
    # column pruning: the scan's ReadSchema must not exceed the three
    # needed columns
    import re as _re
    m = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(
        c.split(":")[0] for c in m.group(1).split(",") if c
    ) <= {"vec_id", "label", "embedding"}, plan


def test_duplicate_titles_single_rollup(spark):
    """one (host, title) groupBy, threshold at the aggregation — no
    window, no self-join."""
    from hickoryspark.ops.metadata import duplicate_titles

    meta = spark.createDataFrame(
        [(f"https://h{i % 3}.ex/p{i}", f"T{i % 5}") for i in range(40)],
        "url string, title string")
    out = duplicate_titles(meta)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_frontier_priority_joins_and_no_sort(spark):
    """url equi-join for stability, host join for delays (equi, never
    nested-loop), no window, no global sort, no Python."""
    from hickoryspark.ops.frontier import frontier_priority

    pages = spark.createDataFrame(
        [(f"https://h{i % 4}.ex/p{i}",) for i in range(50)],
        "url string")
    stability = spark.createDataFrame(
        [(f"https://h{i % 4}.ex/p{i}", 400 + i) for i in range(0, 50, 3)],
        "url string, stability_milli long")
    delays = spark.createDataFrame(
        [(f"h{k}.ex", 1000 * k) for k in range(4)],
        "host string, delay_ms long")
    out = frontier_priority(pages, stability, delays)
    out.count()
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan and "Sort [priority" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bigram_dice_threshold_at_aggregation_no_window(spark):
    """bigram counts combine map-side, the threshold filters at the
    aggregation (before the unigram joins), joins are equi, no
    window, no Python."""
    from hickoryspark.ops.terms import bigram_dice

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    out = bigram_dice(docs, min_count=2)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "partial" in plan.lower(), plan


def test_prices_shuffle_free_jvm_only(spark):
    """regexp extract + posexplode + column parsing: no exchange, no
    Python crossing."""
    from hickoryspark.ops.prices import extract_prices

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = extract_prices(docs)
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_dom_stats_single_rollup_jvm_only(spark):
    """one url groupBy with partial aggregation below the single
    exchange; everything else is conditional aggregation."""
    from hickoryspark.ops.domstats import dom_stats
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    out = dom_stats(explode_nodes(load_pages(spark, SF_DIR)))
    out.count()
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan  # map-side combine before the shuffle
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_deobfuscated_emails_shuffle_free_jvm_only(spark):
    from hickoryspark.ops.pii import deobfuscated_emails

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = deobfuscated_emails(docs)
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_line_similarity_no_nested_loop_and_no_body_in_shuffle(spark):
    """every join is an equi-join (never BroadcastNestedLoop); the
    exploded line relations shuffle lines, never whole payloads."""
    from hickoryspark.ops.snapshots import delta_line_similarity

    rows = [(f"u{i}", "a\nb\nc") for i in range(10)]
    old = spark.createDataFrame(rows, "url string, text string")
    new = spark.createDataFrame(rows, "url string, text string")
    out = delta_line_similarity(old, new)
    out.count()
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_grouped_percentile_ranks_on_histogram(spark):
    """the window runs over the per-group distinct-score histogram
    (an aggregate sits BELOW the window), never over the raw rows."""
    from hickoryspark.ops.sampling import grouped_percentile_buckets

    df = spark.createDataFrame(
        [("g", i, (i * 7) % 13) for i in range(100)],
        "g string, doc_id long, s long")
    out = grouped_percentile_buckets(df, "s", ["g"], 4)
    out.count()
    opt = _optimized(out)
    w = opt.find("Window")
    assert w != -1, opt
    assert "Aggregate" in opt[w:], opt  # histogram below the window


def test_extract_resources_single_url_shuffle_jvm_only(spark):
    """filter + projection + one url window: exactly one url hash
    exchange (the res_pos window reuses the explicit repartition), no
    joins, no Python crossing (resolve_href runs interpreted but
    JVM-side — CLAUDE.md codegen-limit invariant)."""
    from hickoryspark.ops.resources import extract_resources
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.spark.pages import load_pages

    out = extract_resources(explode_nodes(load_pages(spark, SF_DIR)))
    out.count()
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_image_dims_shuffle_free_jvm_only(spark):
    """fixed-offset header arithmetic: pure projection — no exchange,
    no Python crossing."""
    from hickoryspark.ops.imagemeta import image_dims

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = image_dims(
        docs.selectExpr("doc_id", "CAST(text AS BINARY) AS payload"))
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_doc_keywords_jvm_only_scalars_broadcast(spark):
    """tf/df rollups + one term join + one per-doc window; the 1-row
    scalars relation arrives broadcast (never a CartesianProduct),
    and no Python crosses the path."""
    from hickoryspark.ops.keywords import doc_keywords

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = doc_keywords(docs.select("doc_id", "text"),
                       top_k=4, max_df_milli=800)
    out.collect()  # AQE must finalize for ReusedExchange to appear
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalars side
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # map-side top-k (partial WindowGroupLimit) before the doc shuffle
    assert "WindowGroupLimit" in plan, plan
    # the df branch must REUSE the tf branch's (doc_id, term)
    # exchange — one corpus scan + explode, not two
    assert "ReusedExchange" in plan, plan


def test_asof_join_single_key_shuffle_no_range_join(spark):
    """The union-window formulation: ONE window over the user key,
    never a BroadcastNestedLoop/Cartesian range join, no Python."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.asof import asof_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value"),
        ev.where(F.col("event_type") == "view"),
        keys=("user_id",), payload_cols=("event_id",))
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert plan.count("Window") >= 1
    # no join operator at all — the match rides the union + window
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_interval_join_is_equi_bucket_join_never_nested_loop(spark):
    """The bucketized decomposition must plan as an EQUI join on
    (keys, bucket) with the range predicate as residual — a lost
    bucket column degenerates to BroadcastNestedLoop, the 100-TB
    killer this op exists to avoid."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.intervals import interval_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    points = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("pid"), "ts", "user_id")
    iv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("start_ts"),
        F.expr("ts + INTERVAL 12 HOURS").alias("end_ts"),
        "user_id")
    out = interval_join(points, iv, keys=("user_id",),
                        bucket_seconds=3600)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bitext_pairs_no_cartesian_and_jvm_only(spark):
    """Pair build is a url-equi self-join plus two url equi-joins —
    never a cartesian, no Python in the path."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.bitext import bitext_pairs_from_alts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    alts = docs.select(
        F.concat(F.lit("L"), (F.col("doc_id") % 50).cast("string"))
        .alias("url"),
        (F.col("doc_id") % 7 + 1).alias("alt_pos"),
        F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
        .alias("lang"),
        F.concat(F.lit("P"), F.col("doc_id").cast("string"))
        .alias("target"))
    pages = docs.select(
        F.concat(F.lit("P"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.col("text"))
    out = bitext_pairs_from_alts(alts, pages)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_harvest_urls_prunes_scan_and_stays_jvm(spark):
    """texturls.harvest_urls needs only (doc_id, text): the parquet
    ReadSchema must prune the rest, no Exchange (per-row program),
    no Python."""
    from hickoryspark.ops.texturls import harvest_urls

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(harvest_urls(docs))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "lang" not in scan[0] and "n_chars" not in scan[0]
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_gap_cost_jvm_bounded_exchanges(spark):
    """postings_gap_cost: JVM-only; the distinct + per-term window +
    final agg cost at most three exchanges (a fourth means the window
    re-shuffles something it shouldn't)."""
    from hickoryspark.ops.postings import postings_gap_cost

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(postings_gap_cost(docs))
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_reciprocity_and_related_hosts_equi_joins_only(spark):
    """host_reciprocity and related_hosts must stay equi-join
    programs — a BroadcastNestedLoop/CartesianProduct means the pair
    blocking degenerated."""
    from hickoryspark.ops.hostgraph import (host_edges,
                                            host_reciprocity,
                                            related_hosts)

    links = spark.createDataFrame(
        [("https://a.ex/p", "https://b.ex/x"),
         ("https://b.ex/p", "https://a.ex/x")],
        "url string, resolved string")
    for df in (host_reciprocity(host_edges(links)),
               related_hosts(links, min_shared=1)):
        plan = _plan(df)
        assert "BroadcastNestedLoop" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Python" not in plan


def test_retention_no_windows_no_python(spark):
    """retention_cohorts is pure groupBy/join — a Window in the plan
    means the per-user aggregation regressed to a ranking pass."""
    from hickoryspark.ops.events import retention_cohorts

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _plan(retention_cohorts(ev))
    assert "Window" not in plan, plan
    assert "Python" not in plan


def test_skipgram_pairs_no_nested_loop_join(spark):
    """The pair stage must be TRUE equi-joins on (doc_id, rank+delta):
    a doc-only join with a residual |gap| filter compiles to a join
    whose extra condition fans the per-doc cross product (the
    join_ngrams O(tokens^2) ban). No BroadcastNestedLoopJoin /
    CartesianProduct anywhere; every Python crossing is absent (pure
    JVM)."""
    from hickoryspark.ops.skipgram import skipgram_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    plan = _plan(skipgram_pairs(docs, window=2))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "mapInPandas" not in plan.lower()


def test_layout_zorder_stats_single_aggregation_exchange(spark):
    """zvalue/file_id are shuffle-free column expressions; the stats
    frame costs exactly ONE hash exchange (the groupBy(file_id)) over
    the scan."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.layout import zorder_file_stats, zorder_layout

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_id").cast("long").alias("secs"),
    )
    laid = zorder_layout(ev, "uid", "secs", (0, 1023), (0, 1023), 16)
    plan = _plan(zorder_file_stats(laid, "uid", "secs"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PythonUDF" not in plan


def test_cooccur_single_pair_generation_pass(spark):
    """The pair total comes from doc lengths and the token margins
    from ONE checkpointed aggregation: the executed plan carries
    exactly one Generate (the pair explode) — a second end-to-end
    pair generation or per-margin token explode would show up here."""
    from hickoryspark.ops.cooccur import cooccurrence_pmi

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    plan = _plan(cooccurrence_pmi(docs, window=3, min_count=2))
    assert plan.count("Generate explode") == 1, plan.count("Generate explode")
