"""Mega-bucket control for MinHash-LSH dedup (group_cap).

At 100 TB a duplication-heavy corpus can put 10^7 near-identical docs
into ONE signature group; uncapped expansion emits ~5*10^13 pairs.
group_cap switches such groups to a star from the representative
(linear) while preserving the connected components the downstream
union-find consumes. These tests pin (a) the linear behavior on a
10^4-member group and (b) component-equivalence vs the exact mode.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-dedup-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_group_cap_star_expands_mega_group_linearly(spark):
    # 10^4 docs with IDENTICAL text -> one signature group; uncapped
    # expansion would be ~5*10^7 pairs, capped is exactly m-1
    from hickoryspark.ops.dedup import lsh_candidate_pairs

    n = 10_000
    docs = spark.range(n).selectExpr(
        "id AS doc_id", "'alpha beta gamma delta epsilon' AS text"
    )
    pairs = lsh_candidate_pairs(docs, 8, 4, group_cap=64).collect()
    assert len(pairs) == n - 1
    # star shape: every pair anchored at the representative (min doc_id)
    assert all(r["doc_a"] == 0 for r in pairs)
    assert sorted(r["doc_b"] for r in pairs) == list(range(1, n))
    spark.catalog.clearCache()


def _components(pairs, all_ids):
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return frozenset(
        frozenset(i for i in all_ids if find(i) == r)
        for r in {find(i) for i in all_ids}
    )


def test_group_cap_preserves_connected_components(spark):
    # mixed corpus: two duplicated contents (one above, one below the
    # cap), plus distinct docs — capped and exact modes must yield the
    # SAME connected components even though the pair sets differ
    from pyspark.sql import functions as F

    from hickoryspark.ops.dedup import lsh_candidate_pairs

    rows = []
    for i in range(30):
        rows.append((i, "red orange yellow green blue indigo"))  # giant
    for i in range(30, 36):
        rows.append((i, "one two three four five six"))  # small dup group
    for i in range(36, 48):
        rows.append((i, f"unique{i} tokens all different here {i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = [
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, 8, 4).collect()
    ]
    capped = [
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, 8, 4, group_cap=8).collect()
    ]
    assert len(capped) < len(exact)
    ids = [r[0] for r in rows]
    assert _components(capped, ids) == _components(exact, ids)
    spark.catalog.clearCache()
