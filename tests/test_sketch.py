"""Sketches (ops/sketch.py): Bloom no-false-negatives + deterministic
false positives + mergeability; HLL registers vs a python reference,
mergeability, and estimate sanity."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-sketch-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pos(key: str, salt: str, mod: int) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:12], 16) % mod


def test_bloom_no_false_negatives_and_exact_bitmap(spark):
    from hickoryspark.ops.sketch import bloom_build, bloom_probe

    members = [f"u{i}" for i in range(200)]
    keys = spark.createDataFrame([(m,) for m in members], "key string")
    bloom = bloom_build(keys, m_bits=4096, k=3)
    # bitmap matches the python-computed reference exactly
    want_words = {}
    for m in members:
        for i in range(3):
            pos = _pos(m, f"b{i}", 4096)
            want_words[pos // 32] = want_words.get(pos // 32, 0) | (1 << pos % 32)
    got_words = {r["word"]: r["bits"] for r in bloom.collect()}
    assert got_words == want_words
    probes = spark.createDataFrame(
        [(f"u{i}",) for i in range(400)], "key string"
    )
    got = {r["key"]: r["maybe_present"]
           for r in bloom_probe(probes, bloom, m_bits=4096, k=3).collect()}
    assert all(got[m] == 1 for m in members)            # no false negatives
    negatives = [f"u{i}" for i in range(200, 400)]
    fp = sum(got[x] for x in negatives)
    assert fp < 0.2 * len(negatives)                    # plausible fp rate
    # and the false positives are exactly the hash-determined ones
    for x in negatives:
        expected = all(
            want_words.get(_pos(x, f"b{i}", 4096) // 32, 0)
            >> (_pos(x, f"b{i}", 4096) % 32) & 1
            for i in range(3)
        )
        assert got[x] == int(expected)


def test_bloom_merge_is_bit_or(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.sketch import bloom_build, bloom_probe

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
    merged = (
        bloom_build(a).unionByName(bloom_build(b))
        .groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b))
    assert {(r["word"], r["bits"]) for r in merged.collect()} == \
           {(r["word"], r["bits"]) for r in direct.collect()}
    probes = spark.createDataFrame([("a7",), ("b33",)], "key string")
    got = bloom_probe(probes, merged).collect()
    assert all(r["maybe_present"] == 1 for r in got)


def _py_hll(keys, p):
    m = {}
    rem = 32 - p
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
        b, w = h >> rem, h % (1 << rem)
        rho = rem + 1 if w == 0 else rem - w.bit_length() + 1
        m[b] = max(m.get(b, 0), rho)
    return m


def test_hll_registers_match_python_reference(spark):
    from hickoryspark.ops.sketch import hll_registers

    keys = [f"k{i}" for i in range(1000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["bucket"]: r["register"]
           for r in hll_registers(df, p=6).collect()}
    assert got == _py_hll(keys, 6)
    # merge = max per bucket
    half1 = _py_hll(keys[:500], 6)
    half2 = _py_hll(keys[500:], 6)
    merged = {b: max(half1.get(b, 0), half2.get(b, 0))
              for b in set(half1) | set(half2)}
    assert got == merged


def test_hll_estimate_sanity(spark):
    from hickoryspark.ops.sketch import hll_estimate, hll_registers

    n = 5000
    df = spark.createDataFrame(
        [(f"v{i % n}",) for i in range(2 * n)], "key string"
    )
    regs = [(r["bucket"], r["register"])
            for r in hll_registers(df, p=6).collect()]
    est = hll_estimate(regs, p=6)
    assert 0.6 * n < est < 1.4 * n   # p=6 -> ~13% standard error


def test_hll_p_bounds(spark):
    from hickoryspark.ops.sketch import hll_registers

    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        hll_registers(df, p=0)


def test_bloom_probe_null_key_survives_as_zero(spark):
    """A NULL probe key (failed normalization) must come back with
    maybe_present=0, never vanish (regression: the join-back on the
    key dropped it — the temperature_sample NULL-join bug class)."""
    from hickoryspark.ops.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([("a",), ("b",)], "key string")
    probes = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zzz")], "id long, key string"
    )
    got = {r["id"]: r["maybe_present"]
           for r in bloom_probe(probes, bloom_build(members)).collect()}
    assert len(got) == 3
    assert got[1] == 1 and got[2] == 0


def test_hll_null_keys_dropped_estimate_works(spark):
    from hickoryspark.ops.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("x",), (None,), ("y",)], "key string"
    )
    regs = hll_registers(df, p=6).collect()
    assert all(r["bucket"] is not None and r["register"] is not None
               for r in regs)
    est = hll_estimate([(r["bucket"], r["register"]) for r in regs], p=6)
    assert est > 0


def test_cms_exact_cells_and_never_underestimates(spark):
    from hickoryspark.ops.sketch import cms_build, cms_query

    # 40 keys, key i repeated i+1 times; tiny width forces collisions
    items = spark.createDataFrame(
        [(f"k{i}",) for i in range(40) for _ in range(i + 1)],
        "key string")
    cms = cms_build(items, w=16, d=4)
    # cell table matches the python-computed reference exactly
    want = {}
    for i in range(40):
        for r in range(4):
            c = _pos(f"k{i}", f"c{r}", 16)
            want[(r, c)] = want.get((r, c), 0) + (i + 1)
    got = {(r["row"], r["col"]): r["cnt"] for r in cms.collect()}
    assert got == want
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(60)], "key string")
    est = {r["key"]: r["cms_count"]
           for r in cms_query(probes, cms, w=16, d=4).collect()}
    for i in range(40):                       # never underestimates
        assert est[f"k{i}"] >= i + 1
    # python reference of the min-over-rows estimate, bit-exact
    for i in range(60):
        ref = min(want.get((r, _pos(f"k{i}", f"c{r}", 16)), 0)
                  for r in range(4))
        assert est[f"k{i}"] == ref


def test_cms_merge_is_cell_sum(spark):
    import pyspark.sql.functions as F

    from hickoryspark.ops.sketch import cms_build, cms_query

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "key string")
    b = spark.createDataFrame([("x",), ("z",)], "key string")
    merged = (
        cms_build(a, w=32, d=3).unionByName(cms_build(b, w=32, d=3))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt")))
    whole = cms_build(a.unionByName(b), w=32, d=3)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    probes = spark.createDataFrame([("x",), ("z",), ("q",)], "key string")
    est = {r["key"]: r["cms_count"]
           for r in cms_query(probes, merged, w=32, d=3).collect()}
    assert est["x"] >= 3 and est["z"] >= 1


def test_cms_null_and_weighted(spark):
    import pyspark.sql.functions as F

    from hickoryspark.ops.sketch import cms_build, cms_query

    items = spark.createDataFrame(
        [("x", 5), (None, 99), ("y", 2)], "key string, n int")
    cms = cms_build(items, weight_col="n", w=64, d=4)
    # NULL key contributed no cells
    assert cms.agg(F.sum("cnt")).collect()[0][0] == 7 * 4
    probes = spark.createDataFrame([("x",), (None,)], "key string")
    got = {r["key"]: r["cms_count"]
           for r in cms_query(probes, cms, w=64, d=4).collect()}
    assert got["x"] >= 5
    assert got[None] == 0          # NULL probe survives, counts 0


def test_hll_grouped_matches_global_per_slice_and_merges(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.sketch import (
        hll_estimate, hll_registers, hll_registers_grouped)

    df = spark.createDataFrame(
        [(f"h{i % 3}", f"k{i}") for i in range(300)]
        + [(None, "kx"), ("h0", None)],
        "host string, key string",
    )
    grouped = hll_registers_grouped(df, "host", "key").collect()
    # each group's slice equals the global state over that slice
    for g in ("h0", "h1", "h2"):
        want = sorted(
            (r["bucket"], r["register"])
            for r in hll_registers(
                df.where(F.col("host") == g).select("key")).collect()
        )
        got = sorted((r["bucket"], r["register"])
                     for r in grouped if r["host"] == g)
        assert got == want, g
    # NULL group/key rows contributed nothing
    assert {r["host"] for r in grouped} == {"h0", "h1", "h2"}
    # the estimator lands in the p=6 error band (~13% std error on
    # n=100; the EXACT state equality above is the real contract)
    for g in ("h0", "h1", "h2"):
        est = hll_estimate(
            [(r["bucket"], r["register"]) for r in grouped
             if r["host"] == g])
        assert 55 <= est <= 160
