"""Exact-integer Lloyd k-means over embedding vectors — the
"separate k-means fit job" ops/similarity.py `ivf_topk` defers to for
its coarse quantizer, and the standard corpus-clustering primitive
for topic balancing / dedup blocking in training-data pipelines.

Pinned EXACT-INTEGER dialect (the embstats / pagerank rule — float
k-means is not hash-comparable across engines: summation order flips
argmins at the ulp):

- components MILLI-QUANTIZE exactly like ops/embstats.py
  `vector_norms` (float64 widen, *1000, floor, non-finite -> clamp,
  ±Q_CLAMP) — one shared rule, one shared DuckDB mirror expression;
- distance = Σ (q - c)² as BIGINT (clamped components bound each
  term at 3.6e13, safe past 10^5 dims);
- assignment = argmin distance, ties to the LOWEST cluster id
  (integer distances make ties real; the tiebreak is part of the
  cross-engine contract);
- centroid update = per-position truncating integer mean
  ``sum div count`` — Spark `div` and DuckDB `//` both truncate
  toward zero (verified), so no floor/pmod dance is needed;
- initial centroids = the quantized vectors of the k SMALLEST ids
  (deterministic; cluster c is the rank-c id ascending).

Empty clusters KEEP their previous centroid (documented, mirrored).
Vectors that are NULL / empty / a different length than the
centroids get cluster NULL and never vote in updates.

Scale shape: quantization is one mapInPandas pass; each iteration is
one assignment pass (centroids broadcast as a NumPy int64 matrix,
row-chunked squared-distance — the _seq_dots memory lesson) plus one
relational update (posexplode -> groupBy(cluster, pos) with map-side
partial sums -> k*d tiny rows collected for the next broadcast).
Driver traffic per iteration is exactly the k*d centroid matrix —
the sanctioned bounded-collect class (centroid/query sets).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embstats import Q_CLAMP

__all__ = ["kmeans_assign", "kmeans_outliers", "quantize_vectors",
           "duckdb_quantize_expr"]

#: rows per squared-distance chunk inside the assignment pass — bounds
#: the rows x k x dim float-free intermediate (the _seq_dots lesson)
ROW_CHUNK = 1024


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, q array<bigint>) — the embstats milli-quantization as a
    reusable pass; NULL/empty vectors yield q NULL."""
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            out = []
            for e in b[vec_col]:
                if e is None or not len(e):
                    out.append(None)
                    continue
                x = np.floor(np.asarray(e, dtype=np.float64) * 1000.0)
                x = np.where(np.isfinite(x), x, float(Q_CLAMP))
                out.append(
                    np.clip(x, -Q_CLAMP, Q_CLAMP).astype(np.int64).tolist()
                )
            yield pd.DataFrame({"id": b[id_col], "q": out})

    return emb.select(id_col, vec_col).mapInPandas(
        gen, "id long, q array<long>"
    )


def duckdb_quantize_expr(x: str) -> str:
    """The per-component quantization as a DuckDB scalar expression
    over ``x`` — verbatim the embstats mirror rule."""
    return (
        f"CAST(LEAST(GREATEST(CASE WHEN isfinite(CAST({x} AS DOUBLE))"
        f" THEN FLOOR(CAST({x} AS DOUBLE) * 1000)"
        f" ELSE {float(Q_CLAMP)} END, {-float(Q_CLAMP)}),"
        f" {float(Q_CLAMP)}) AS BIGINT)"
    )


def _assign_df(quant: DataFrame, C, with_dist: bool = False) -> DataFrame:
    """One assignment pass of ``quant`` against centroid matrix ``C``
    (np int64 k×d): (id, cluster[, dist2]) — argmin BIGINT squared
    distance, ties to the lowest cluster id (np.argmin returns the
    FIRST minimum, matching the oracle's ORDER BY dist, cluster).
    Unscoreable vectors (NULL/empty/dim-mismatch) get NULLs."""
    import numpy as np
    import pandas as pd

    dim = C.shape[1]

    def gen(batches):
        for b in batches:
            if not len(b):
                continue
            ids = b["id"].to_numpy()
            qs = list(b["q"])
            ok = np.array(
                [q is not None and len(q) == dim for q in qs], dtype=bool
            )
            cl = np.full(len(qs), -1, dtype=np.int64)
            dist = np.zeros(len(qs), dtype=np.int64)
            idx = np.nonzero(ok)[0]
            for s in range(0, len(idx), ROW_CHUNK):
                sel = idx[s : s + ROW_CHUNK]
                Q = np.array([qs[i] for i in sel], dtype=np.int64)
                d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                cl[sel] = np.argmin(d2, axis=1)
                if with_dist:
                    dist[sel] = d2[np.arange(len(sel)), cl[sel]]
            cols = {
                "id": ids,
                "cluster": [int(c) if c >= 0 else None for c in cl],
            }
            if with_dist:
                cols["dist2"] = [
                    int(dist[i]) if cl[i] >= 0 else None
                    for i in range(len(qs))
                ]
            yield pd.DataFrame(cols)

    schema = "id long, cluster long" + (
        ", dist2 long" if with_dist else ""
    )
    return quant.mapInPandas(gen, schema)


def _lloyd_fit(quant: DataFrame, k: int, n_iter: int):
    """Final centroid matrix (np int64 k×d) after ``n_iter`` Lloyd
    iterations, or None when no vector is scoreable. ``quant`` should
    be persisted by the caller (each iteration re-reads it)."""
    import numpy as np

    seed_rows = (
        quant.where(F.col("q").isNotNull())
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        return None
    cent = np.array([list(r["q"]) for r in seed_rows], dtype=np.int64)
    dim = cent.shape[1]
    for _ in range(n_iter):
        assigned = _assign_df(quant, cent)
        upd_rows = (
            assigned.join(quant, "id")
            .where(F.col("cluster").isNotNull())
            .select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.expr("sum(v) div count(1)").alias("m"))
            .collect()
        )
        nxt = cent.copy()  # empty clusters keep their previous centroid
        for r in upd_rows:
            if r["pos"] < dim:
                nxt[r["cluster"], r["pos"]] = r["m"]
        cent = nxt
    return cent


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) — final assignment after ``n_iter`` full Lloyd
    iterations (assign + centroid update) and one closing assignment
    against the final centroids. cluster is BIGINT, NULL for vectors
    that cannot be scored (NULL/empty/dimension mismatch)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quant = quantize_vectors(emb, id_col, vec_col).persist()
    cent = _lloyd_fit(quant, k, n_iter)
    if cent is None:
        return quant.select(
            F.col("id"), F.lit(None).cast("long").alias("cluster")
        )
    return _assign_df(quant, cent).select(
        F.col("id"), F.col("cluster").cast("long").alias("cluster")
    )


def kmeans_outliers(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    ratio_milli: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid-distance outlier scoring — the embedding-quality
    filter that drops mis-embedded / off-distribution vectors before
    they poison dedup blocking or ANN recall (the SemDeDup paper's
    cluster-distance pruning cousin): ``(id, cluster, dist2, mean_d,
    is_outlier)`` where dist2 is the BIGINT squared quantized
    distance to the vector's FINAL assigned centroid, mean_d the
    per-cluster truncating-div mean of dist2, and is_outlier = 1 iff
    ``dist2 * 1000 > greatest(mean_d, 1) * ratio_milli`` (exact
    integers on both sides; default flags vectors past 2× their
    cluster's mean; the floor of 1 keeps clusters whose truncated
    mean is 0 — vectors that ARE their centroid up to quantization
    dust — from flagging every nonzero speck).
    Unscoreable vectors keep NULL cluster/dist2/is_outlier.

    Overflow bound: dist2 ≤ d·(2·Q_CLAMP)² = d·3.6e13, so the
    comparison stays inside BIGINT for d·max(1000, ratio_milli) <
    2.5e5 — comfortable for any real embedding width at the default
    ratio; raise ratio_milli past ~3900 at d=64 only with narrower
    clamps.

    Scale shape: the Lloyd fit (bounded k·d driver traffic per
    iteration), ONE distance-emitting assignment pass, a k-row
    cluster-mean aggregate joined back unhinted (AQE broadcasts at
    runtime — the r4 convention)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quant = quantize_vectors(emb, id_col, vec_col).persist()
    cent = _lloyd_fit(quant, k, n_iter)
    if cent is None:
        n = F.lit(None)
        return quant.select(
            "id", n.cast("long").alias("cluster"),
            n.cast("long").alias("dist2"),
            n.cast("long").alias("mean_d"),
            n.cast("long").alias("is_outlier"),
        )
    scored = _assign_df(quant, cent, with_dist=True)
    means = scored.where(F.col("cluster").isNotNull()).groupBy(
        "cluster"
    ).agg(F.expr("sum(dist2) div count(1)").alias("mean_d"))
    out = scored.join(means, "cluster", "left")
    flag = F.when(
        F.col("cluster").isNotNull(),
        (F.col("dist2") * 1000
         > F.greatest(F.col("mean_d"), F.lit(1)) * ratio_milli)
        .cast("long"),
    )
    return out.select(
        "id", "cluster", "dist2", "mean_d", flag.alias("is_outlier")
    )
