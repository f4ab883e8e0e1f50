"""Exact-integer Lloyd k-means (ops/kmeans.py): recurrence vs a
python reference, quantization sharing with embstats, tie/NULL/dim
handling, empty-cluster retention, partition invariance."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-kmeans-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _quant(v, clamp=3_000_000):
    import math

    out = []
    for x in v:
        q = math.floor(float(x) * 1000.0)
        if not math.isfinite(q):
            q = clamp
        out.append(max(-clamp, min(clamp, int(q))))
    return out


def _py_kmeans(vecs, k, n_iter):
    """vecs: {id: float list}. Mirrors ops/kmeans.py exactly:
    milli-quantize, seeds = k smallest ids, argmin with lowest-cluster
    tiebreak, truncating-div centroid mean, empty clusters keep their
    centroid, final closing assignment."""
    q = {i: _quant(v) for i, v in vecs.items() if v}
    seeds = sorted(q)[:k]
    cent = [list(q[i]) for i in seeds]
    dim = len(cent[0])

    def trunc_div(a, b):
        # python // floors; both engines truncate toward zero
        r = abs(a) // b
        return r if a >= 0 else -r

    def assign():
        out = {}
        for i, v in q.items():
            if len(v) != dim:
                out[i] = None
                continue
            best, bc = None, None
            for c, cv in enumerate(cent):
                d = sum((a - b) ** 2 for a, b in zip(v, cv))
                if best is None or d < best:
                    best, bc = d, c
            out[i] = bc
        return out

    for _ in range(n_iter):
        a = assign()
        sums = {}
        for i, c in a.items():
            if c is None:
                continue
            s, n = sums.setdefault(c, ([0] * dim, [0]))
            for p, v in enumerate(q[i]):
                s[p] += v
            n[0] += 1
        for c, (s, n) in sums.items():
            cent[c] = [trunc_div(x, n[0]) for x in s]
    return assign()


def test_matches_python_reference(spark):
    from hickoryspark.ops.kmeans import kmeans_assign

    # two obvious blobs + one outlier + a stray dimension + a NULL
    vecs = {
        0: [0.0, 0.0], 1: [0.1, 0.0], 2: [0.0, 0.1],
        3: [5.0, 5.0], 4: [5.1, 5.0], 5: [4.9, 5.1],
        6: [-9.0, 9.0],
    }
    rows = [(i, v) for i, v in vecs.items()]
    rows += [(7, [1.0]), (8, None)]  # dim mismatch, NULL
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["cluster"]
           for r in kmeans_assign(emb, k=3, n_iter=2).collect()}
    want = _py_kmeans(vecs, 3, 2)
    want[7] = None
    want[8] = None
    assert got == want
    # blob membership is sane: 0/1/2 together, 3/4/5 together, apart
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_tie_goes_to_lowest_cluster_and_partition_invariance(spark):
    from hickoryspark.ops.kmeans import kmeans_assign

    # seeds 0 and 1 are equidistant from vec 2 -> cluster 0 by contract
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["cluster"]
           for r in kmeans_assign(emb, k=2, n_iter=1).collect()}
    assert got[2] == 0
    big = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(kmeans_assign(big, k=4, n_iter=2).collect())
    b = sorted(kmeans_assign(big.repartition(7), k=4, n_iter=2).collect())
    assert a == b


def test_empty_cluster_keeps_centroid_and_validation(spark):
    from hickoryspark.ops.kmeans import kmeans_assign

    # k=3 over 2 distinct points: cluster 2 never wins but must not
    # crash the update; everything still assigns deterministically
    rows = [(0, [0.0]), (1, [1.0]), (2, [0.0]), (3, [1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["cluster"]
           for r in kmeans_assign(emb, k=3, n_iter=2).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}
    with pytest.raises(ValueError):
        kmeans_assign(emb, k=0)
    none = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<float>"
    )
    assert [r["cluster"] for r in kmeans_assign(none, k=2).collect()] == [
        None
    ]


def test_outliers_planted(spark):
    from hickoryspark.ops.kmeans import kmeans_outliers

    # two tight clusters around 0.0 and 10.0 plus one far point that
    # still assigns to the 10.0 cluster and must flag as the outlier
    rows = [(0, [0.0]), (1, [0.001]), (2, [0.002]),
            (3, [10.0]), (4, [10.001]), (5, [14.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r for r in kmeans_outliers(
        emb, k=2, n_iter=2, ratio_milli=2000).collect()}
    assert got[5]["is_outlier"] == 1
    assert all(got[i]["is_outlier"] == 0 for i in (0, 1, 2, 3, 4))
    # dist2 is the exact squared quantized distance to the FINAL
    # centroid: cluster 1 centroid = mean(10000, 10001, 14000) div 3
    cent1 = (10000 + 10001 + 14000) // 3
    assert got[5]["dist2"] == (14000 - cent1) ** 2
    assert got[5]["mean_d"] == (
        (10000 - cent1) ** 2 + (10001 - cent1) ** 2
        + (14000 - cent1) ** 2) // 3


def test_outliers_null_vector_and_empty(spark):
    from hickoryspark.ops.kmeans import kmeans_outliers

    emb = spark.createDataFrame(
        [(0, [1.0]), (1, None), (2, [2.0])],
        "vec_id long, embedding array<float>")
    got = {r["id"]: r for r in kmeans_outliers(emb, k=2).collect()}
    assert got[1]["cluster"] is None and got[1]["dist2"] is None \
        and got[1]["is_outlier"] is None
    none = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<float>")
    r = kmeans_outliers(none, k=2).collect()[0]
    assert (r["cluster"], r["dist2"], r["mean_d"], r["is_outlier"]) \
        == (None, None, None, None)


def test_outliers_partition_invariant(spark):
    from hickoryspark.ops.kmeans import kmeans_outliers

    big = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, kmeans_outliers(big, k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_outliers(
        big.repartition(7), k=4, n_iter=2).collect()))
    assert a == b
