"""Z-order layout invariants: Morton arithmetic vs an independent
bit-twiddling reference, locality (z-order prunes BOTH dims where a
1-D sort only prunes its leading dim), and clamp behavior."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-layout-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ref_morton(a: int, b: int) -> int:
    # independent per-bit reference (no magic numbers)
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_per_bit_reference(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.layout import morton_interleave

    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (0x1234, 0xABCD),
            (7, 42), (65535, 0)]
    df = spark.createDataFrame(vals, "a long, b long").withColumn(
        "z", morton_interleave(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r["z"] == _ref_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_prunes_both_dimensions(spark):
    # 64x64 grid of points; with 16 files, a narrow range predicate on
    # EITHER dimension must leave most files prunable — a row-major
    # layout only achieves that on its leading dimension
    from hickoryspark.ops.layout import (
        prunable_files, zorder_file_stats, zorder_layout)

    pts = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(pts, "a long, b long")
    laid = zorder_layout(df, "a", "b", (0, 63), (0, 63), 16)
    stats = zorder_file_stats(laid, "a", "b").collect()
    n_files = len(stats)
    assert n_files == 16
    # a quarter-range predicate on each dim keeps at most half the files
    assert len(prunable_files(stats, 0, 15, "a")) <= n_files // 2
    assert len(prunable_files(stats, 0, 15, "b")) <= n_files // 2
    # every row is in exactly one file
    assert sum(r["n_rows"] for r in stats) == len(pts)


def test_zorder_clamps_out_of_bounds(spark):
    from hickoryspark.ops.layout import zorder_layout

    df = spark.createDataFrame(
        [(-5, 0), (0, 0), (1000, 0)], "a long, b long"
    )
    out = zorder_layout(df, "a", "b", (0, 63), (0, 63), 4).collect()
    z = {r["a"]: r["zvalue"] for r in out}
    assert z[-5] == z[0]  # below-range clamps to lo
    assert all(r["file_id"] in range(4) for r in out)


def test_duckdb_mirror_matches_spark(spark):
    import duckdb

    from hickoryspark.ops.layout import (
        duckdb_zorder_sql, zorder_file_stats, zorder_layout)

    rows = [(i * 37 % 101, i * 53 % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    laid = zorder_layout(df, "a", "b", (0, 100), (0, 96), 8)
    got = sorted(
        tuple(r) for r in zorder_file_stats(laid, "a", "b").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            duckdb_zorder_sql("t", "a", "b", (0, 100), (0, 96), 8)
        ).fetchall()
    )
    assert got == want
