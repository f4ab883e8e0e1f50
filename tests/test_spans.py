"""Duplicated-span detection (ops/spans.py): winnowing guarantee,
maximal extension, multiple blocks per pair, position exactness,
bucket caps, and a brute-force python oracle fuzz."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-spans-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rand_text(rng, n):
    return "".join(rng.choice(list("abcdefghij")) for _ in range(n))


def test_winnow_positions_guarantee_and_tie_rule():
    from hickoryspark.ops.spans import winnow_positions

    h = np.array([5, 3, 3, 9, 1, 1, 7], dtype=np.uint64)
    pos = winnow_positions(h, 3)
    # windows: [5,3,3]->rightmost 3 at 2; [3,3,9]->2; [3,9,1]->4;
    # [9,1,1]->5; [1,1,7]->5
    assert pos.tolist() == [2, 4, 5]
    # every w-window contains a selected position
    for i in range(len(h) - 3 + 1):
        assert any(i <= p < i + 3 for p in pos)


def test_single_shared_block_exact_positions(spark):
    from hickoryspark.ops.spans import duplicated_spans

    rng = np.random.RandomState(0)
    block = "THE-SHARED-RUN-" * 4                       # 60 chars
    pre_a, pre_b = _rand_text(rng, 40), _rand_text(rng, 25)
    suf_a, suf_b = _rand_text(rng, 33), _rand_text(rng, 50)
    docs = spark.createDataFrame(
        [(1, pre_a + block + suf_a), (2, pre_b + block + suf_b)],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, k=10, w=4, min_len=20).collect()
    # the block repeats internally ("THE-SHARED-RUN-" x4) so SHIFTED
    # diagonals also carry >= min_len matches; the full-length maximal
    # run on the aligned diagonal must be among them
    spans = {(r["pos_a"], r["pos_b"], r["length"]) for r in rows}
    assert (40, 25, 60) in spans
    # no emitted span exceeds the true shared run
    assert all(r["length"] <= 60 for r in rows)


def test_two_disjoint_blocks_same_pair(spark):
    from hickoryspark.ops.spans import duplicated_spans

    rng = np.random.RandomState(1)
    b1 = "zqxwvzqxwvzqxwvzqxwvzqxwv"          # 25 chars, periodic-free? no: periodic
    b1 = "first shared block with enough chars!"   # 38
    b2 = "second distinct shared payload 123456"   # 38
    # distinct boundary chars so the maximal runs are exactly the
    # planted blocks (a shared filler char at a boundary legitimately
    # extends the run — the engine is right to include it)
    mid_a = "A" + _rand_text(rng, 98) + "A"
    mid_b = "B" + _rand_text(rng, 53) + "B"
    docs = spark.createDataFrame(
        [(1, b1 + mid_a + b2), (2, b1 + mid_b + b2)],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, k=10, w=4, min_len=20).collect()
    spans = {(r["pos_a"], r["pos_b"], r["length"]) for r in rows}
    assert (0, 0, len(b1)) in spans
    assert (len(b1) + 100, len(b1) + 55, len(b2)) in spans


def test_no_false_positives_below_threshold(spark):
    from hickoryspark.ops.spans import duplicated_spans

    rng = np.random.RandomState(2)
    shared = "tiny common bit"                 # 15 < min_len
    docs = spark.createDataFrame(
        [(1, _rand_text(rng, 80) + shared + _rand_text(rng, 80)),
         (2, _rand_text(rng, 60) + shared + _rand_text(rng, 90))],
        "doc_id long, text string",
    )
    assert duplicated_spans(docs, k=10, w=4, min_len=20).count() == 0


def test_min_len_below_guarantee_rejected(spark):
    from hickoryspark.ops.spans import duplicated_spans

    docs = spark.createDataFrame([(1, "x" * 50)], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicated_spans(docs, k=20, w=8, min_len=20)


def test_fuzz_vs_bruteforce_oracle(spark):
    """Planted + random corpus: every maximal shared run >= min_len
    found by brute force must be reported with exact positions."""
    from hickoryspark.ops.spans import duplicated_spans

    rng = np.random.RandomState(3)
    k, w, min_len = 8, 4, 12
    blocks = ["SHARED BLOCK ALPHA 0001", "other shared beta 2222"]
    texts = {}
    for i in range(8):
        t = _rand_text(rng, rng.randint(30, 120))
        if i % 2 == 0:
            p = rng.randint(0, len(t))
            t = t[:p] + blocks[0] + t[p:]
        if i % 3 == 0:
            p = rng.randint(0, len(t))
            t = t[:p] + blocks[1] + t[p:]
        texts[i] = t
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["pos_a"], r["pos_b"], r["length"])
        for r in duplicated_spans(docs, k=k, w=w, min_len=min_len).collect()
    }

    def brute(a, b):
        out = set()
        for diag in range(-len(b) + 1, len(a)):
            i0 = max(0, diag)
            j0 = i0 - diag
            run = 0
            for step in range(min(len(a) - i0, len(b) - j0) + 1):
                i, j = i0 + step, j0 + step
                if step < min(len(a) - i0, len(b) - j0) and a[i] == b[j]:
                    run += 1
                else:
                    if run >= min_len:
                        out.add((i - run, j - run, run))
                    run = 0
        return out

    want = set()
    for a in range(8):
        for b in range(a + 1, 8):
            for pa, pb, ln in brute(texts[a], texts[b]):
                want.add((a, b, pa, pb, ln))
    # completeness holds for runs >= w+k-1; shorter ones may or may
    # not be anchored — check exact equality on the guaranteed set
    # and no-junk on the rest
    want_guaranteed = {t for t in want if t[4] >= w + k - 1}
    assert want_guaranteed <= got
    assert got <= want          # everything reported is a real maximal run


def test_long_run_reported_at_full_length(spark):
    """A multi-thousand-char shared run must come back as ONE span of
    the exact full length (regression: an anchor-list/slice cap once
    truncated long duplicates)."""
    from hickoryspark.ops.spans import duplicated_spans

    rng = np.random.RandomState(9)
    block = _rand_text(rng, 5000)
    docs = spark.createDataFrame(
        [(1, "A" + _rand_text(rng, 37) + "A" + block + "C" + _rand_text(rng, 20)),
         (2, "B" + _rand_text(rng, 11) + "B" + block + "D" + _rand_text(rng, 60))],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, k=10, w=4, min_len=20).collect()
    spans = {(r["pos_a"], r["pos_b"], r["length"]) for r in rows}
    assert (39, 13, 5000) in spans
    assert max(r["length"] for r in rows) == 5000


def test_bucket_cap_deterministic_truncation(spark):
    """A stopword block shared by many docs: capped run still returns
    pairs for the docs inside the cap and never errors. The cap is a
    DETERMINISTIC truncation (documented contract — lowest (doc_id,
    pos) anchors survive), opt-out via bucket_cap=None."""
    from hickoryspark.ops.spans import duplicated_spans

    common = "the same boilerplate sentence appears everywhere here"
    docs = spark.createDataFrame(
        [(i, f"u{i:04d}" + common + f"v{i:04d}") for i in range(30)],
        "doc_id long, text string",
    )
    full = duplicated_spans(docs, k=10, w=4, min_len=20, bucket_cap=None)
    assert full.count() == 30 * 29 // 2
    capped = duplicated_spans(docs, k=10, w=4, min_len=20, bucket_cap=10)
    n = capped.count()
    assert 0 < n < 30 * 29 // 2


def test_remove_spans_cuts_later_doc_keeps_first(spark):
    from hickoryspark.ops.spans import duplicated_spans, remove_duplicate_spans

    rng = np.random.RandomState(11)
    block = "a block destined to be cut from later documents!"
    t1 = "A" + _rand_text(rng, 20) + "A" + block + "C" + _rand_text(rng, 10)
    t2 = "B" + _rand_text(rng, 30) + "B" + block + "D" + _rand_text(rng, 15)
    docs = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    spans = duplicated_spans(docs, k=10, w=4, min_len=20)
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, spans, min_len=20).collect()}
    assert out[1]["text"] == t1 and out[1]["n_cut_spans"] == 0
    assert block not in out[2]["text"]
    assert out[2]["n_cut_spans"] == 1
    assert out[2]["n_cut_chars"] == len(block)
    assert out[2]["text"] == t2.replace(block, "")


def test_remove_spans_merges_overlaps_and_is_idempotent(spark):
    """3 docs share a block: the later two each lose it ONCE (pairs
    against both earlier docs merge to one interval), and re-running
    detection on the cut corpus finds nothing — the ExactSubstr
    contract."""
    from hickoryspark.ops.spans import duplicated_spans, remove_duplicate_spans

    rng = np.random.RandomState(12)
    block = "shared across three documents, long enough to anchor"
    rows = []
    for i in range(3):
        rows.append((i, chr(69 + i) + _rand_text(rng, 20 + 7 * i)
                     + chr(75 + i) + block + chr(80 + i)
                     + _rand_text(rng, 25)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicated_spans(docs, k=10, w=4, min_len=20)
    cut = remove_duplicate_spans(docs, spans, min_len=20)
    got = {r["doc_id"]: r for r in cut.collect()}
    assert got[0]["n_cut_spans"] == 0 and block in got[0]["text"]
    for i in (1, 2):
        assert got[i]["n_cut_spans"] == 1
        assert block not in got[i]["text"]
    again = duplicated_spans(
        cut.select("doc_id", "text"), k=10, w=4, min_len=20
    )
    assert again.count() == 0


def test_remove_spans_end_clamp_and_null_text(spark):
    from hickoryspark.ops.spans import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "0123456789"), (2, None)], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(0, 1, 0, 6, 30)],
        "doc_a long, doc_b long, pos_a long, pos_b long, length long",
    )
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, spans, min_len=20).collect()}
    assert got[1]["text"] == "012345"      # cut clamped at text end
    assert got[1]["n_cut_chars"] == 4
    assert got[2]["text"] is None and got[2]["n_cut_spans"] == 0


def test_remove_spans_collects_merged_intervals_only(spark):
    """One passage duplicated against MANY earlier docs: the doc's
    collect frame holds the merged interval (n_cut_spans == 1), and
    the relational merge handles overlapping AND touching spans."""
    from hickoryspark.ops.spans import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(9, "x" * 100)], "doc_id long, text string"
    )
    # 50 pairs, three overlap shapes: identical, shifted-overlap,
    # touching (s == prev end)
    rows = [(a, 9, 0, 10, 30) for a in range(50)]
    rows += [(1, 9, 0, 25, 30), (2, 9, 0, 55, 30)]
    spans = spark.createDataFrame(
        rows, "doc_a long, doc_b long, pos_a long, pos_b long, length long"
    )
    got = remove_duplicate_spans(docs, spans, min_len=30).collect()[0]
    assert got["n_cut_spans"] == 1          # [10,85) merged
    assert got["n_cut_chars"] == 75
    assert got["text"] == "x" * 25
