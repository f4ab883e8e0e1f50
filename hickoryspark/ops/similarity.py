"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Baseline: brute-force cosine top-k with the query side broadcast —
at scale the candidate scan is embarrassingly parallel and the only
shuffle is the final per-query top-k (a tiny aggregate).
Scale path: blocked / IVF-style search restricted to a partition key
(here ``label`` plays the IVF-cell role), and a random-hyperplane LSH
variant whose hyperplanes are derived deterministically from md5 so
results are reproducible with no RNG state.

Dot products run JVM-side via zip_with/aggregate — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, blocked_by_label: bool = False
) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries.

    Query side is tiny → broadcast; candidates stream through a single
    projection; per-query top-k via window rank (the shuffle carries
    n_queries × |candidates| rows pre-AQE; at real scale replace the
    window with a per-partition partial top-k + final merge, same
    semantics).

    ``blocked_by_label=True`` is the IVF-style variant: candidates are
    restricted to the query's label cell, turning the cross join into
    an equi-join on label.
    """
    from pyspark.sql.window import Window

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _dvec("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _dvec("embedding").alias("cv"),
        F.col("label").alias("c_label"),
    )
    if blocked_by_label:
        joined = F.broadcast(q).join(c, F.col("q_label") == F.col("c_label"))
    else:
        joined = F.broadcast(q).crossJoin(c)
    scored = (
        joined.where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component from md5:
    weight(plane, j) = nibble(md5('p<plane>:<j>')) - 7.5 — fixed,
    reproducible, no RNG state to ship to executors."""
    weights = F.array(
        *[
            (F.conv(F.substring(F.md5(F.lit(f"p{plane}:{j}")), 1, 1), 16, 10)
             .cast("double") - F.lit(7.5))
            for j in range(dim)
        ]
    )
    return (dot(vec, weights) >= 0).cast("int")


def lsh_bucket_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, planes: int = 6, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of `planes`
    hyperplanes; search only within the query's bucket. The scale
    path for ANN — bucket join is an equi-join; recall traded for a
    ~2^planes candidate reduction."""
    from pyspark.sql.window import Window

    v = _dvec("embedding")
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket + F.shiftleft(_hyperplane_sign(v, p, dim), p)
    tagged = emb.select(
        "vec_id", v.alias("v"), bucket.cast("int").alias("bucket")
    )
    q = tagged.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    scored = (
        F.broadcast(q)
        .join(tagged, F.col("qb") == F.col("bucket"))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    IVF-cell analogue): an equi-join on label instead of a full cross
    product — the blocking key is what makes this viable at 10^9+
    vectors."""
    a = emb.select(
        F.col("vec_id").alias("vec_a"), _dvec("embedding").alias("va"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), _dvec("embedding").alias("vb"),
        F.col("label").alias("label_b"),
    )
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
