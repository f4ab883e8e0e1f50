"""Embedding-corpus statistics — the sanity layer every
embedding-based pipeline stage (ANN, near-dup, IVF training) needs
before trusting its vectors: norm outliers are truncated downloads or
all-zero failures, per-label norm drift reveals mis-scaled encoder
batches.

Pinned EXACT-INTEGER dialect (the readability / pagerank rule —
cross-engine hash gates need order-independent arithmetic, and float
norm sums are neither portable nor order-independent):

- each component is MILLI-QUANTIZED first: ``q = floor(x * 1000)``
  as BIGINT (floor, not round — round-half ties differ between
  engines; the float32 component widens to float64 exactly in both);
- NON-FINITE components (NaN/Inf — truncated downloads, the very
  breakage this op screens for) quantize to the CLAMP BOUND, and
  every q clamps to ±:data:`Q_CLAMP` (3e6 milli = component 3000.0):
  un-clamped, NaN casts to INT64_MIN in NumPy (undefined behavior)
  while DuckDB raises, and a huge component silently wraps the
  int64 square — broken vectors must surface as extreme-but-exact
  norms, identically on both engines;
- ``norm2_micro = Σ q²`` — an exact BIGINT, order-independent
  (clamped: ≤ 9e12 per dim, safe past 10⁵ dims);
- the per-label rollup sums those BIGINTs (mergeable, map-side
  combinable) and carries min/max/count.

Scale shape: the quantized norm is computed in ONE mapInPandas pass
with NumPy (Catalyst higher-order aggregates evaluate interpreted
per element — the ann_topk lesson; vectorized int64 matmul-free
reduceat beats them by orders of magnitude), column-pruned to
(vec_id, label, embedding). The label rollup is a plain JVM groupBy
over the tiny per-vec output.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["vector_norms", "label_norm_rollup", "duckdb_vector_norms_sql",
           "Q_CLAMP"]

#: quantized-component clamp (milli-units): non-finite and huge
#: components pin here instead of wrapping/erroring
Q_CLAMP = 3_000_000


def vector_norms(emb: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding, label) → (vec_id, label, n_dims,
    norm2_micro); NULL embeddings yield n_dims 0 / norm 0."""
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            dims, norms = [], []
            for e in b["embedding"]:
                if e is None or not len(e):
                    dims.append(0)
                    norms.append(0)
                    continue
                x = np.asarray(e, dtype=np.float64) * 1000.0
                qf = np.floor(x)
                # non-finite -> clamp bound BEFORE the int cast (NaN
                # casts to INT64_MIN otherwise); then clamp magnitude
                qf = np.where(np.isfinite(qf), qf, float(Q_CLAMP))
                q = np.clip(qf, -Q_CLAMP, Q_CLAMP).astype(np.int64)
                dims.append(len(q))
                norms.append(int(np.dot(q, q)))
            yield pd.DataFrame({
                "vec_id": b["vec_id"], "label": b["label"],
                "n_dims": dims, "norm2_micro": norms,
            })

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        gen, "vec_id long, label int, n_dims long, norm2_micro long")


def label_norm_rollup(emb: DataFrame) -> DataFrame:
    """Per-label norm statistics: (label, n_vecs, sum_norm2,
    min_norm2, max_norm2) — all exact BIGINTs, mergeable."""
    return vector_norms(emb).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("norm2_micro").cast("long").alias("sum_norm2"),
        F.min("norm2_micro").cast("long").alias("min_norm2"),
        F.max("norm2_micro").cast("long").alias("max_norm2"),
    )


def duckdb_vector_norms_sql(emb_rel: str) -> str:
    """DuckDB mirror of :func:`vector_norms` (same quantization:
    float32 → float64 widening, *1000, floor, non-finite → clamp,
    ±Q_CLAMP clamp, BIGINT square-sum)."""
    q = (f"CAST(LEAST(GREATEST(CASE WHEN isfinite(CAST(u.x AS DOUBLE))"
         f" THEN FLOOR(CAST(u.x AS DOUBLE) * 1000)"
         f" ELSE {float(Q_CLAMP)} END, {-float(Q_CLAMP)}),"
         f" {float(Q_CLAMP)}) AS BIGINT)")
    return f"""
        SELECT vec_id, label,
               CAST(COALESCE(len(embedding), 0) AS BIGINT) AS n_dims,
               CAST(COALESCE((
                 SELECT SUM({q} * {q})
                 FROM unnest(embedding) AS u(x)), 0) AS BIGINT)
                   AS norm2_micro
        FROM {emb_rel}"""
