"""Random projection (ops/randproj.py): sign determinism, exact
arithmetic vs a hand computation, NULL/empty handling, DuckDB mirror
agreement, and distance-preservation sanity."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.randproj import (  # noqa: E402
    duckdb_randproj_sql, sign_of)


def test_sign_determinism_and_balance():
    assert sign_of(0, 0) in (1, -1)
    assert sign_of(0, 0) == sign_of(0, 0)
    # roughly balanced over a grid (md5 uniformity)
    total = sum(sign_of(j, i) for j in range(8) for i in range(64))
    assert abs(total) < 120


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-randproj-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_exact_values_and_nulls(spark):
    from hickoryspark.ops.randproj import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 2.25], 0),
         (2, None, 0),
         (3, [], 1)],
        "vec_id long, embedding array<float>, label int")
    rows = random_projection(df, k=2).collect()
    assert {r["vec_id"] for r in rows} == {1}
    got = {r["j"]: r["proj"] for r in rows}
    q = [1000, -500, 2250]
    for j in (0, 1):
        want = sum(sign_of(j, i) * q[i] for i in range(3))
        assert got[j] == want


def test_mirror_agreement(spark):
    from hickoryspark.ops.randproj import random_projection

    vecs = [(i, [((i * 7 + d * 3) % 11) - 5.5 for d in range(16)],
             i % 3) for i in range(20)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    got = {(r["vec_id"], r["j"]): (r["label"], r["proj"])
           for r in random_projection(df, k=4).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    con.executemany("INSERT INTO emb VALUES (?, ?, ?)", vecs)
    want = {(v, j): (lab, p) for v, lab, j, p in
            con.execute(duckdb_randproj_sql("emb", k=4)).fetchall()}
    assert got == want


def test_distance_preservation_sanity(spark):
    # identical vectors project identically; a far vector stays far
    from hickoryspark.ops.randproj import random_projection

    base = [float(d % 5) for d in range(32)]
    far = [float(-(d % 7)) for d in range(32)]
    df = spark.createDataFrame(
        [(1, base, 0), (2, list(base), 0), (3, far, 0)],
        "vec_id long, embedding array<float>, label int")
    out = {}
    for r in random_projection(df, k=8).collect():
        out.setdefault(r["vec_id"], {})[r["j"]] = r["proj"]
    assert out[1] == out[2]
    assert out[1] != out[3]
