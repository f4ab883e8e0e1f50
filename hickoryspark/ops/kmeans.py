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

__all__ = ["kmeans_assign", "quantize_vectors", "duckdb_quantize_expr"]

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
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quant = quantize_vectors(emb, id_col, vec_col).persist()

    seed_rows = (
        quant.where(F.col("q").isNotNull())
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        return quant.select(
            F.col("id"), F.lit(None).cast("long").alias("cluster")
        )
    cent = np.array([list(r["q"]) for r in seed_rows], dtype=np.int64)
    dim = cent.shape[1]

    def assign_with(C: "np.ndarray"):
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
                idx = np.nonzero(ok)[0]
                for s in range(0, len(idx), ROW_CHUNK):
                    sel = idx[s : s + ROW_CHUNK]
                    Q = np.array([qs[i] for i in sel], dtype=np.int64)
                    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    # argmin returns the FIRST minimum -> lowest
                    # cluster id tiebreak, matching the oracle's
                    # ORDER BY dist, cluster
                    cl[sel] = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "id": ids,
                        "cluster": [
                            int(c) if c >= 0 else None for c in cl
                        ],
                    }
                )

        return quant.mapInPandas(gen, "id long, cluster long")

    for _ in range(n_iter):
        assigned = assign_with(cent)
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

    return assign_with(cent).select(
        F.col("id"), F.col("cluster").cast("long").alias("cluster")
    )
