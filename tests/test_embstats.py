"""Embedding norm statistics (ops/embstats.py): quantization, NULL
vectors, rollup, DuckDB mirror agreement on random float32 data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-embstats-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_quantized_norms_exact(spark):
    from hickoryspark.ops.embstats import vector_norms

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0015], 0),
         (2, [], 1),
         (3, None, 1)],
        "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: (r["n_dims"], r["norm2_micro"])
           for r in vector_norms(emb).collect()}
    # floor(1.0*1000)=1000, floor(-0.5*1000)=-500, floor(.0015f*1000)=1
    assert out[1] == (3, 1000**2 + 500**2 + 1)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_label_rollup(spark):
    from hickoryspark.ops.embstats import label_norm_rollup

    emb = spark.createDataFrame(
        [(1, [1.0], 0), (2, [2.0], 0), (3, [0.5], 1)],
        "vec_id long, embedding array<float>, label int")
    out = {r["label"]: (r["n_vecs"], r["sum_norm2"], r["min_norm2"],
                        r["max_norm2"])
           for r in label_norm_rollup(emb).collect()}
    assert out[0] == (2, 1000**2 + 2000**2, 1000**2, 2000**2)
    assert out[1] == (1, 500**2, 500**2, 500**2)


def test_mirror_agrees_on_random_float32(spark):
    import random
    import struct

    import duckdb

    from hickoryspark.ops.embstats import (duckdb_vector_norms_sql,
                                           vector_norms)

    rng = random.Random(11)

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    rows = [
        (i, [f32(rng.uniform(-2, 2)) for _ in range(rng.randrange(0, 9))],
         i % 3)
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: (r["n_dims"], r["norm2_micro"])
           for r in vector_norms(emb).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    want = {v: (n, s) for v, _, n, s in con.execute(
        duckdb_vector_norms_sql("e")).fetchall()}
    assert got == want


def test_nonfinite_and_huge_components_clamp_identically(spark):
    # review regression: NaN cast to int64 is undefined behavior in
    # NumPy (INT64_MIN) and an error in DuckDB; huge components wrap
    # the int64 square — both must pin to Q_CLAMP on BOTH engines
    import duckdb

    from hickoryspark.ops.embstats import (Q_CLAMP,
                                           duckdb_vector_norms_sql,
                                           vector_norms)

    rows = [
        (1, [float("nan")], 0),
        (2, [float("inf"), float("-inf")], 0),
        (3, [1e13], 0),
        (4, [-1e13, 0.5], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: (r["n_dims"], r["norm2_micro"])
           for r in vector_norms(emb).collect()}
    c2 = Q_CLAMP * Q_CLAMP
    assert got[1] == (1, c2)
    assert got[2] == (2, 2 * c2)
    assert got[3] == (1, c2)
    assert got[4] == (2, c2 + 500 ** 2)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    want = {v: (n, s) for v, _, n, s in con.execute(
        duckdb_vector_norms_sql("e")).fetchall()}
    assert got == want
