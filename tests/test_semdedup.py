"""SemDeDup (ops/semdedup.py): keep-first-by-id pruning inside real
k-means cells, unscoreable and zero-norm handling."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-semdedup-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    from hickoryspark.ops.semdedup import semdedup

    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    out = semdedup(emb, **kw).orderBy("id")
    return {r["id"]: (r["cluster"], r["kept"]) for r in out.collect()}


def test_near_dups_drop_later_ids(spark):
    # two tight bundles far apart; k=2 separates them
    got = _run(spark, [
        (1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0]),
        (4, [0.01, 0.999]), (5, [0.0, 1.01]),
    ], k=2, n_iter=2, threshold=0.99)
    kept = {i: kv[1] for i, kv in got.items()}
    assert kept[1] == 1 and kept[3] == 1        # first of each bundle
    assert kept[2] == 0 and kept[4] == 0 and kept[5] == 0
    # the two bundles landed in different clusters
    assert got[1][0] != got[3][0]


def test_pairwise_not_transitive_rule(spark):
    # a~b and b~c but a!~c (angles 0deg, 8deg, 16deg; thr ~ cos 10deg):
    # b drops (a earlier), c drops too (b earlier, even though b
    # itself dropped) — the pinned EXISTS rule
    import math

    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    got = _run(spark, [(1, v(0)), (2, v(8)), (3, v(16))],
               k=1, n_iter=1, threshold=math.cos(math.radians(10)))
    assert [got[i][1] for i in (1, 2, 3)] == [1, 0, 0]


def test_below_threshold_all_kept(spark):
    got = _run(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
               k=1, n_iter=1, threshold=0.5)
    assert all(kv[1] == 1 for kv in got.values())


def test_unscoreable_and_zero_norm_kept(spark):
    got = _run(spark, [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]),
        (3, None), (4, []),               # unscoreable -> cluster NULL
        (5, [0.0, 0.0]), (6, [0.0, 0.0]),  # zero-norm: never a dup
    ], k=1, n_iter=1, threshold=0.9)
    assert got[1] == (0, 1) and got[2] == (0, 0)
    assert got[3] == (None, 1) and got[4] == (None, 1)
    assert got[5][1] == 1 and got[6][1] == 1
