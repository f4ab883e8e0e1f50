"""Random projection (Johnson–Lindenstrauss) for embedding columns.

Dimensionality reduction ahead of ANN indexing / clustering at
corpus scale: a k-dim signed projection preserves pairwise distances
within (1±ε) (JL lemma; the ±1 "database-friendly" variant is
Achlioptas, JCSS 2003) at a fraction of the storage and distance
cost. Deterministic by construction — the sign matrix derives from
md5, so any executor (and the DuckDB oracle) regenerates the same
projection with no shared state.

Pinned EXACT-INTEGER dialect (the embstats rule — float sums are
neither portable nor order-independent):

- components quantize exactly like ops/embstats.vector_norms
  (float64 widen, ×1000, floor, non-finite → clamp, ±Q_CLAMP);
- sign(j, i) = +1 iff the first hex digit of
  ``md5("<j>,<i>")`` is 0-7, else −1 (j = output dim, i = 0-based
  input dim) — reproducible anywhere md5 exists;
- ``proj_j = Σ_i sign(j,i)·q_i`` — exact BIGINT (bounded by
  d·Q_CLAMP: safe past 10⁶ dims);
- output is LONG format ``(vec_id, label, j, proj)``; NULL/empty
  embeddings contribute no rows.

Scale shape: one shuffle-free mapInPandas pass; the per-batch work
is a single int64 matmul against the (k × d) sign matrix (built once
per task per dimensionality, NumPy — the ann_topk lesson: Catalyst
higher-order aggregates are interpreted per element).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

from hickoryspark.ops.embstats import Q_CLAMP

__all__ = ["random_projection", "sign_of", "duckdb_randproj_sql"]


def sign_of(j: int, i: int) -> int:
    """+1 iff md5("<j>,<i>") starts with hex 0-7."""
    h = hashlib.md5(f"{j},{i}".encode("ascii")).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def _sign_matrix(k: int, d: int):
    import numpy as np

    return np.array(
        [[sign_of(j, i) for i in range(d)] for j in range(k)],
        dtype=np.int64)


def random_projection(emb: DataFrame, k: int = 8) -> DataFrame:
    """embeddings(vec_id, embedding, label) → long-format
    ``(vec_id, label, j, proj)`` — k exact-integer projections."""
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        signs: dict[int, "np.ndarray"] = {}
        for b in batches:
            vec_ids, labels, js, projs = [], [], [], []
            for vid, lab, e in zip(b["vec_id"], b["label"],
                                   b["embedding"]):
                if e is None or not len(e):
                    continue
                x = np.asarray(e, dtype=np.float64) * 1000.0
                qf = np.floor(x)
                qf = np.where(np.isfinite(qf), qf, float(Q_CLAMP))
                q = np.clip(qf, -Q_CLAMP, Q_CLAMP).astype(np.int64)
                d = len(q)
                s = signs.get(d)
                if s is None:
                    s = signs[d] = _sign_matrix(k, d)
                p = s @ q
                vec_ids.extend([vid] * k)
                labels.extend([lab] * k)
                js.extend(range(k))
                projs.extend(int(v) for v in p)
            yield pd.DataFrame({
                "vec_id": pd.array(vec_ids, dtype="int64"),
                "label": pd.array(labels, dtype="int32"),
                "j": pd.array(js, dtype="int32"),
                "proj": pd.array(projs, dtype="int64"),
            })

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        gen, "vec_id long, label int, j int, proj long")


def duckdb_randproj_sql(emb_rel: str, k: int = 8) -> str:
    """DuckDB mirror of :func:`random_projection` (same quantization,
    same md5 sign rule)."""
    q = (f"CAST(LEAST(GREATEST(CASE WHEN isfinite(CAST(x AS DOUBLE))"
         f" THEN FLOOR(CAST(x AS DOUBLE) * 1000)"
         f" ELSE {float(Q_CLAMP)} END, {-float(Q_CLAMP)}),"
         f" {float(Q_CLAMP)}) AS BIGINT)")
    return f"""
        WITH rp_q AS (
          SELECT vec_id, label, i - 1 AS i0, {q} AS qv
          FROM (SELECT vec_id, label, embedding[i] AS x, i
                FROM {emb_rel},
                     unnest(range(1, len(embedding) + 1)) AS r(i)
                WHERE embedding IS NOT NULL AND len(embedding) > 0)
        )
        SELECT vec_id, label, CAST(s.j AS INT) AS j,
               CAST(SUM(CASE WHEN strpos('01234567',
                        substr(md5(CAST(s.j AS VARCHAR) || ',' ||
                               CAST(i0 AS VARCHAR)), 1, 1)) > 0
                        THEN qv ELSE -qv END) AS BIGINT) AS proj
        FROM rp_q, unnest(range(0, {k})) AS s(j)
        GROUP BY vec_id, label, s.j"""
