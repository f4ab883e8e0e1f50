"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Baseline: brute-force cosine top-k with the query side broadcast —
at scale the candidate scan is embarrassingly parallel and the only
shuffle is the final per-query top-k (a tiny aggregate).
Scale path: blocked / IVF-style search restricted to a partition key
(here ``label`` plays the IVF-cell role), and a random-hyperplane LSH
variant whose hyperplanes are derived deterministically from md5 so
results are reproducible with no RNG state.

Hot scoring paths run as float64 NumPy matmuls inside Arrow-batched
mapInPandas/applyInPandas (per-element Catalyst HOF evaluation is
interpreted, ~50x slower); the column-expression dot/cosine helpers
remain for JVM-side composition in small expressions.
"""

from __future__ import annotations

import numpy as np
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

    Scale design: the tiny query matrix is broadcast to executors;
    candidates stream through mapInPandas where one float64 matmul
    scores the whole Arrow batch (vectorized — per-element Catalyst
    HOF evaluation is ~50x slower); each task emits only its PARTIAL
    top-k per query, so the final exact merge (window rank) sees just
    n_queries x n_partitions x k rows regardless of corpus size.

    ``blocked_by_label=True`` is the IVF-style variant: candidates are
    restricted to the query's label cell.

    Ordering contract (mirrors the DuckDB oracle): sims are rounded to
    6 decimals FIRST, then ranked by (sim desc, neighbor_id asc) — the
    in-task partial selection uses the same key, which makes the
    partial/merge decomposition exact.
    """
    q_rows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    qlab = (
        np.array([r["label"] for r in q_rows], dtype=np.int64)
        if blocked_by_label
        else None
    )
    bc = emb.sparkSession.sparkContext.broadcast((qids, Q, qnorm, qlab, k))

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids, Q, qnorm, qlab, k = bc.value
        for b in batches:
            if not len(b) or not len(qids):
                continue
            C = np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])
            nids = b["vec_id"].to_numpy()
            cnorm = np.sqrt((C * C).sum(axis=1))
            sims = np.round((Q @ C.T) / (qnorm[:, None] * cnorm[None, :]), 6)
            sims[qids[:, None] == nids[None, :]] = -np.inf  # exclude self
            if qlab is not None:
                clab = b["label"].to_numpy()
                sims[qlab[:, None] != clab[None, :]] = -np.inf
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                s = sims[qi]
                order = np.lexsort((nids, -s))[: min(k, len(s))]
                order = order[s[order] > -np.inf]
                out_q.extend([qids[qi]] * len(order))
                out_n.extend(nids[order])
                out_s.extend(s[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    partial = _spread(emb.select("vec_id", "embedding", "label")).mapInPandas(
        gen, "query_id long, neighbor_id long, sim double"
    )
    return _merge_topk(partial, k)


def _spread(df: DataFrame) -> DataFrame:
    """Parallelize the candidate scan when the source is a single
    unsplittable file (guide §2.5): the per-task partial top-k / cell
    scoring below is embarrassingly parallel, and the exact merge
    makes the partial decomposition value-neutral at ANY partition
    count. No-op on an already-parallel scan (the 100 TB case)."""
    from hickoryspark.spark.pages import spread_scan

    return spread_scan(df)


def _hyperplane_matrix(planes: int, dim: int):
    """Deterministic pseudo-random hyperplane weights from md5:
    weight(plane, j) = nibble(md5('p<plane>:<j>')) - 7.5 — fixed,
    reproducible, no RNG state to ship to executors. Identical to the
    literal weights the DuckDB oracle bakes into its bucket expression
    (__spark_entry__._plane_dot)."""
    import hashlib

    return np.array(
        [
            [
                float(int(hashlib.md5(f"p{p}:{j}".encode()).hexdigest()[0], 16))
                - 7.5
                for j in range(dim)
            ]
            for p in range(planes)
        ],
        dtype=np.float64,
    )


def _seq_sum(arr):
    """Strict left-to-right float64 row sums: cumsum's recurrence
    out[i] = out[i-1] + x[i] reproduces the left-assoc chain of IEEE
    additions that a SQL `a+b+c...` expression (the oracle) and a
    Catalyst `aggregate` HOF evaluate — np.dot/matmul use pairwise
    summation, which can flip the sign of a near-zero hyperplane dot
    and land a vector in a different bucket than the oracle."""
    return np.cumsum(arr, axis=-1)[..., -1]


def _seq_dots(E, M, row_chunk: int = 256):
    """All-pairs sequential-sum dot products dots[i, j] =
    seq_sum(E[i] * M[j]), computed in row chunks of E so the
    (rows x len(M) x dim) broadcast intermediate never materializes
    whole (round-3 verdict #7: at production batch x cells sizes the
    one-shot product is a per-task memory cliff). Chunking over rows
    is bit-identical — each row's left-to-right addition chain is
    untouched — so the oracle contract survives unchanged."""
    E = np.asarray(E, dtype=np.float64)
    out = np.empty((len(E), len(M)), dtype=np.float64)
    for s in range(0, len(E), row_chunk):
        e = E[s : s + row_chunk]
        out[s : s + row_chunk] = _seq_sum(e[:, None, :] * M[None, :, :])
    return out


def _merge_topk(partial: DataFrame, k: int) -> DataFrame:
    """Exact merge of per-task partial top-k rows: the one shared
    shuffle of every ANN variant (n_queries × n_partitions × k rows,
    never the embeddings)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _lsh_buckets(E, W):
    """Bucket ids for embedding rows E (n×dim) under hyperplanes W."""
    b = np.zeros(len(E), dtype=np.int64)
    for p in range(len(W)):
        b |= (_seq_sum(E * W[p]) >= 0).astype(np.int64) << p
    return b


def lsh_bucket_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, planes: int = 6, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of `planes`
    hyperplanes; search only within the query's bucket. The scale
    path for ANN — recall traded for a ~2^planes candidate reduction.

    Bucketing + scoring run as vectorized NumPy inside mapInPandas
    (per-element Catalyst HOF evaluation of the same expressions is
    interpreted, ~50x slower — module docstring). Mirrors brute_topk's
    shape: broadcast query matrix, per-task PARTIAL top-k, tiny final
    merge. Bit-identity contract with the oracle: hyperplane dots and
    the cosine dot/norms use strict left-to-right float64 summation
    (_seq_sum), the same op order as the previous column-expression
    implementation and the oracle's literal `v[1]*w1+v[2]*w2+...`.
    """
    W = _hyperplane_matrix(planes, dim)
    q_rows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    if len(Q):
        qnorm = np.sqrt(_seq_sum(Q * Q))
        qbuck = _lsh_buckets(Q, W)
    else:
        qnorm = np.zeros(0)
        qbuck = np.zeros(0, dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((qids, Q, qnorm, qbuck, W, k))

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids, Q, qnorm, qbuck, W, k = bc.value
        for b in batches:
            if not len(b) or not len(qids):
                continue
            C = np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])
            nids = b["vec_id"].to_numpy()
            cbuck = _lsh_buckets(C, W)
            cnorm = np.sqrt(_seq_sum(C * C))
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                m = (cbuck == qbuck[qi]) & (nids != qids[qi])
                if not m.any():
                    continue
                dots = _seq_sum(C[m] * Q[qi])
                sims = np.round(dots / (qnorm[qi] * cnorm[m]), 6)
                cand = nids[m]
                order = np.lexsort((cand, -sims))[: min(k, len(sims))]
                out_q.extend([qids[qi]] * len(order))
                out_n.extend(cand[order])
                out_s.extend(sims[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    partial = _spread(emb.select("vec_id", "embedding")).mapInPandas(
        gen, "query_id long, neighbor_id long, sim double"
    )
    return _merge_topk(partial, k)


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """True IVF ANN: a coarse quantizer (centroids) partitions the
    corpus into inverted cells; each query probes only its ``nprobe``
    nearest cells. Centroids here are the embeddings of
    ``vec_id < n_cells`` — deterministic seeds, so the DuckDB oracle
    can recompute the identical assignment; at design scale they come
    from a separate k-means fit job and the pattern is unchanged.

    Scale shape (mirrors brute_topk / lsh_bucket_topk): the tiny
    centroid + query matrices broadcast; candidates stream through ONE
    mapInPandas pass that assigns each row's cell and scores it against
    the queries probing that cell (vectorized float64 NumPy); each task
    emits only its partial top-k, so the exact merge sees
    n_queries x n_partitions x k rows regardless of corpus size — no
    shuffle of the embedding column at all.

    Determinism contract with the oracle: cell assignment is argmax of
    the 6-decimal-ROUNDED cosine with ties broken by smallest centroid
    id (rounding makes ties likely, so the tiebreak is part of the
    contract on both sides); every dot and norm uses strict
    left-to-right float64 summation (_seq_sum) so the pre-rounding
    value reproduces a sequential-loop oracle — matmul's pairwise
    summation could differ in the last ulp and flip an argmax at a
    6th-decimal boundary.
    """
    cent_rows = (
        emb.where(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    # centroid columns sorted by ascending cid: argmax returns the
    # FIRST max index, which then IS the smallest-cid tiebreak — fully
    # vectorized, no per-row lexsort in the hot path
    cent_rows.sort(key=lambda r: r["vec_id"])
    cids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    Cm = np.array([list(r["embedding"]) for r in cent_rows], dtype=np.float64)
    cm_norm = np.sqrt(_seq_sum(Cm * Cm))

    def assign(E):
        """Cell id per row of E: nearest centroid by rounded cosine,
        ties to the smallest centroid id. Row-chunked (_seq_dots) so
        the rows x cells x dim intermediate stays bounded."""
        en = np.sqrt(_seq_sum(E * E))
        dots = _seq_dots(E, Cm)
        sims = np.round(dots / (en[:, None] * cm_norm[None, :]), 6)
        return cids[np.argmax(sims, axis=1)], sims

    q_rows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r["embedding"]) for r in q_rows], dtype=np.float64)
    if len(Q):
        qnorm = np.sqrt(_seq_sum(Q * Q))
        _, qsims = assign(Q)
        # np.argsort(kind="stable") on -sims: equal sims keep ascending
        # cid column order — same smallest-cid-first tiebreak
        probes = cids[
            np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]
        ]
    else:
        qnorm = np.zeros(0)
        probes = np.zeros((0, nprobe), dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast(
        (qids, Q, qnorm, probes, cids, Cm, cm_norm, k)
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids, Q, qnorm, probes, cids, Cm, cm_norm, k = bc.value
        for b in batches:
            if not len(b) or not len(qids):
                continue
            C = np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])
            nids = b["vec_id"].to_numpy()
            cn = np.sqrt(_seq_sum(C * C))
            cdots = _seq_dots(C, Cm)  # row-chunked: bounded memory
            csims = np.round(cdots / (cn[:, None] * cm_norm[None, :]), 6)
            cells = cids[np.argmax(csims, axis=1)]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                m = np.isin(cells, probes[qi]) & (nids != qids[qi])
                if not m.any():
                    continue
                sims = np.round(
                    _seq_sum(C[m] * Q[qi]) / (qnorm[qi] * cn[m]), 6
                )
                cand = nids[m]
                order = np.lexsort((cand, -sims))[: min(k, len(sims))]
                out_q.extend([qids[qi]] * len(order))
                out_n.extend(cand[order])
                out_s.extend(sims[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    partial = _spread(emb.select("vec_id", "embedding")).mapInPandas(
        gen, "query_id long, neighbor_id long, sim double"
    )
    return _merge_topk(partial, k)


_PAIR_SCHEMA = "vec_a long, vec_b long, sim double"


def _empty_pairs():
    import pandas as pd

    return pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []}).astype(
        {"vec_a": "int64", "vec_b": "int64", "sim": "float64"}
    )


def _load_sorted(b):
    import numpy as np

    order = np.argsort(b["vec_id"].to_numpy())
    ids = b["vec_id"].to_numpy()[order]
    V = np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])[order]
    return ids, V, np.sqrt((V * V).sum(axis=1))


def tile_cells(cols: DataFrame, cell_cap: int) -> DataFrame:
    """Triangle tiling of label cells: sub-split each cell into
    nblk = ceil(n/cap) salt blocks on xxhash64(vec_id) and replicate
    every row to its nblk (bi <= bj) tiles, so each unordered block
    pair is one bounded task and every within-cell vector pair lands
    in exactly one tile."""
    counts = cols.groupBy("label").agg(F.count("*").alias("n_in_cell"))
    tagged = (
        cols.join(F.broadcast(counts), "label")
        .withColumn(
            "nblk",
            F.ceil(F.col("n_in_cell") / F.lit(cell_cap)).cast("int"),
        )
        .withColumn(
            "blk", F.pmod(F.xxhash64("vec_id"), F.col("nblk")).cast("int")
        )
    )
    return tagged.select(
        "label", "vec_id", "embedding", "blk",
        F.explode(F.sequence(F.lit(0), F.col("nblk") - 1)).alias("t"),
    ).select(
        "label", "vec_id", "embedding", "blk",
        F.least("blk", "t").alias("bi"),
        F.greatest("blk", "t").alias("bj"),
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, cell_cap: int | None = None
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    IVF-cell analogue): all-pairs scoring happens only WITHIN a block
    — the blocking key is what makes this viable at 10^9+ vectors.

    Each block is scored by one float64 Gram-matrix matmul inside
    applyInPandas (one shuffle on the block key).

    ``cell_cap`` is the skew control: a label cell holding more than
    cap vectors is sub-split into ceil(n/cap) salt blocks on
    xxhash64(vec_id), and the cell's pair set is covered by TRIANGLE
    TILING — one task per unordered block pair (i <= j), each row
    replicated to its nblk tiles. The output pair set is IDENTICAL to
    the unsplit mode (every within-cell pair lands in exactly one
    tile); what changes is task granularity: a cell holding 80% of the
    corpus becomes ~nblk^2/2 bounded tasks instead of one straggler.
    """

    def score_block(b):
        import numpy as np

        if len(b) < 2:
            return _empty_pairs()
        ids, V, norms = _load_sorted(b)
        sims = np.round((V @ V.T) / (norms[:, None] * norms[None, :]), 6)
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        import pandas as pd

        return pd.DataFrame(
            {"vec_a": ids[ai[keep]], "vec_b": ids[bi[keep]],
             "sim": sims[ai[keep], bi[keep]]}
        )

    cols = emb.select("vec_id", "embedding", "label")
    if cell_cap is None:
        return cols.groupBy("label").applyInPandas(score_block, _PAIR_SCHEMA)

    tiles = tile_cells(cols, cell_cap)

    def score_tile(b):
        import numpy as np
        import pandas as pd

        if len(b) < 2:
            return _empty_pairs()
        bi, bj = int(b["bi"].iloc[0]), int(b["bj"].iloc[0])
        if bi == bj:
            return score_block(b)
        a_side = b[b["blk"] == bi]
        b_side = b[b["blk"] == bj]
        if not len(a_side) or not len(b_side):
            return _empty_pairs()
        ids_a, A, na = _load_sorted(a_side)
        ids_b, B, nb = _load_sorted(b_side)
        sims = np.round((A @ B.T) / (na[:, None] * nb[None, :]), 6)
        ai, bj_idx = np.nonzero(sims >= threshold)
        xa, xb = ids_a[ai], ids_b[bj_idx]
        return pd.DataFrame(
            {"vec_a": np.minimum(xa, xb), "vec_b": np.maximum(xa, xb),
             "sim": sims[ai, bj_idx]}
        )

    return tiles.groupBy("label", "bi", "bj").applyInPandas(
        score_tile, _PAIR_SCHEMA
    )
