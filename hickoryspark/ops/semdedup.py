"""SemDeDup — semantic deduplication via k-means cells + intra-cell
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

The LAION/web-text recipe: embed every document, k-means the
embedding space, and inside each cluster drop all but one of any
group of near-identical embeddings — semantic near-dups that lexical
MinHash/SimHash (ops/dedup.py) cannot see. This composes two REAL
operators from this repo: ops/kmeans.kmeans_assign (exact-integer
Lloyd) for the cells and the similarity.py float64 Gram-matrix
convention (round-6 cosine, the embed_neardup contract) for the
intra-cell scoring.

Pinned semantics (so the DuckDB oracle can reproduce them exactly):

- cells are ``kmeans_assign(emb, k, n_iter)`` — the pinned Lloyd
  recurrence (milli-quantization, lowest-cluster tiebreak,
  truncating-div means); vectors it cannot score (NULL/empty/dim
  mismatch) have cluster NULL and are ALWAYS kept;
- pair similarity is ``ROUND(cosine(a, b), 6)`` in float64 — the
  embed_neardup convention (NumPy matmul on one side,
  list_cosine_similarity on the other, hash-stable at round 6);
- a vector is DROPPED iff some cluster-mate with a SMALLER id scores
  ``>= threshold`` against it — keep-first-by-id per PAIR, not per
  transitive-closure component (the earlier mate need not itself
  survive; chains thin accordingly). This is deliberately the
  relationally-mirrorable EXISTS rule — component-wise keep-one is
  ops/components.py composed over the pair set when a caller wants
  it;
- zero-norm vectors never match any pair (cosine undefined -> no
  drop in either direction).

Scale shape: one shuffle on the cluster key into applyInPandas; each
cell is scored by ONE float64 Gram matmul (the ops/similarity.py
pattern). Cost is O(|cell|^2) BY DESIGN (the paper's own cost model)
— size k so cells fit a task; for skewed/giant cells compose
similarity.tile_cells blocking instead of raising k blindly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.kmeans import kmeans_assign

__all__ = ["semdedup"]

_OUT_SCHEMA = "id long, cluster long, kept int"


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, kept) per input row — kept is 1 for survivors,
    0 for semantic near-dups of an earlier (smaller-id) cluster-mate.
    cluster is NULL (and kept 1) for unscoreable vectors."""
    import numpy as np
    import pandas as pd

    clusters = kmeans_assign(emb, k=k, n_iter=n_iter,
                             id_col=id_col, vec_col=vec_col)
    rows = clusters.join(
        emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("emb")
        ),
        "id",
    )

    def prune(b: "pd.DataFrame") -> "pd.DataFrame":
        ids = b["id"].to_numpy()
        cl = b["cluster"]
        if not len(b) or cl.isna().all():
            return pd.DataFrame(
                {"id": ids, "cluster": [None] * len(b),
                 "kept": np.ones(len(b), dtype=np.int32)})
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.array(
            [list(v) for v in b["emb"].iloc[order]], dtype=np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        kept = np.ones(len(ids), dtype=np.int32)
        nz = norms > 0.0  # zero-norm: cosine undefined, never a dup
        if nz.sum() >= 2:
            W = V[nz]
            n = norms[nz]
            sims = np.round((W @ W.T) / (n[:, None] * n[None, :]), 6)
            ai, bi = np.triu_indices(len(n), k=1)
            hit = np.unique(bi[sims[ai, bi] >= threshold])
            kept[np.nonzero(nz)[0][hit]] = 0
        return pd.DataFrame(
            {"id": ids, "cluster": b["cluster"].iloc[order],
             "kept": kept})

    return rows.groupBy("cluster").applyInPandas(prune, _OUT_SCHEMA)
