"""BPE merge induction (ops/bpe.py): Sennrich worked example, greedy
overlap rule, tie rule, early stop, Python-reference fuzz, mirror."""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bpe-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts, k):
    from hickoryspark.ops.bpe import bpe_merges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return [(r["merge_rank"], r["lsym"], r["rsym"], r["pair_count"])
            for r in bpe_merges(docs, k).orderBy("merge_rank").collect()]


def _reference(texts, k):
    """Independent pure-Python BPE (dict-of-tuples formulation, the
    Sennrich pseudocode — not the string program the op uses)."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if "\x1f" in w:
                continue
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, cnt))
        new = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += freq
        vocab = new
    return merges


def test_sennrich_style_example(spark):
    texts = ["low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest"]
    got = _run(spark, texts, 4)
    assert got == _reference(texts, 4)
    # the classic corpus learns ('e','s') first: 6 newest + 3 widest
    assert (got[0][1], got[0][2], got[0][3]) == ("e", "s", 9)


def test_greedy_overlap_no_remerge_within_round(spark):
    got = _run(spark, ["aaaa aaaa"], 2)
    assert got == _reference(["aaaa aaaa"], 2)
    # round 1: (a,a) count 6 (3 adjacent pairs x 2 words); round 2
    # operates on aa,aa
    assert got[0] == (1, "a", "a", 6)
    assert got[1] == (2, "aa", "aa", 2)


def test_tie_rule_and_early_stop(spark):
    # 'ab' vs 'cd': equal counts, (a,b) wins lexicographically;
    # single-char vocab stops early
    got = _run(spark, ["ab cd ab cd"], 1)
    assert got == [(1, "a", "b", 2)]
    assert _run(spark, ["a b c"], 3) == []


def test_fuzz_against_reference(spark):
    import random

    rng = random.Random(31)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randrange(1, 6)))
            for _ in range(rng.randrange(1, 15)))
        for _ in range(12)
    ]
    assert _run(spark, texts, 6) == _reference(texts, 6)


def test_mirror_agrees(spark):
    import duckdb

    from hickoryspark.ops.bpe import duckdb_bpe_sql

    texts = ["low lower lowest", "newest news new", "wide widest ab"]
    got = _run(spark, texts, 5)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    want = sorted(con.execute(duckdb_bpe_sql("documents", 5)).fetchall())
    assert sorted(got) == [tuple(w) for w in want]


def _encode_reference(texts, k):
    """Apply _reference merges with the same tuple algorithm."""
    merges = _reference(texts, k)
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if "\x1f" not in w:
                vocab[w] += 1
    out = {}
    for w, freq in vocab.items():
        syms = list(w)
        for _, l, r, _ in merges:
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out[w] = (freq, len(syms), " ".join(syms))
    return out


def test_encode_matches_reference(spark):
    from hickoryspark.ops.bpe import bpe_encode, bpe_merges

    texts = ["low low lower lowest", "newest new news", "aaaa abab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_merges(docs, 5)
    got = {r["word"]: (r["freq"], r["n_subwords"], r["subwords"])
           for r in bpe_encode(docs, merges).collect()}
    assert got == _encode_reference(texts, 5)


def test_encode_mirror_agrees(spark):
    import duckdb

    from hickoryspark.ops.bpe import (bpe_encode, bpe_merges,
                                      duckdb_bpe_encode_sql)

    texts = ["wide wider widest", "low slow glow", "a bb ccc"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["word"]: (r["freq"], r["n_subwords"], r["subwords"])
           for r in bpe_encode(docs, bpe_merges(docs, 4)).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    want = {w: (f, n, s) for w, f, n, s in con.execute(
        duckdb_bpe_encode_sql("documents", 4)).fetchall()}
    assert got == want


def test_encode_mirror_survives_merge_exhaustion(spark):
    # review regression: an exhausted vocabulary (fewer merges than
    # n_merges) must yield the partially-encoded table from the
    # mirror, never zero rows
    import duckdb

    from hickoryspark.ops.bpe import (bpe_encode, bpe_merges,
                                      duckdb_bpe_encode_sql)

    texts = ["a bb ccc"]
    docs = spark.createDataFrame(
        [(0, texts[0])], "doc_id long, text string")
    merges = bpe_merges(docs, 4)
    assert merges.count() < 4  # exhaustion engaged
    got = {r["word"]: (r["freq"], r["n_subwords"], r["subwords"])
           for r in bpe_encode(docs, merges).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [texts[0]])
    want = {w: (f, n, s) for w, f, n, s in con.execute(
        duckdb_bpe_encode_sql("documents", 4)).fetchall()}
    assert got == want and len(got) == 3


def test_fertility_vs_mirror_and_hand(spark):
    import duckdb

    from hickoryspark.ops.bpe import (bpe_fertility, bpe_merges,
                                      duckdb_bpe_fertility_sql)

    rows = [(1, "low low lower lowest"), (2, "low newer newer"),
            (3, ""), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs = docs.where(docs.text.isNotNull())
    merges = bpe_merges(docs, n_merges=4)
    got = sorted(tuple(r) for r in
                 bpe_fertility(docs, merges).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)",
                    [r for r in rows if r[1] is not None])
    exp = sorted(tuple(r) for r in con.execute(
        duckdb_bpe_fertility_sql("d", 4)).fetchall())
    con.close()
    assert got == exp
    by = {r[0]: r for r in got}
    assert set(by) == {1, 2}  # empty doc emits nothing
    for d, (_, n_words, n_pieces, fm) in by.items():
        assert fm == 1000 * n_pieces // n_words
        assert n_pieces >= n_words
