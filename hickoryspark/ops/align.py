"""Length-based bitext sentence alignment — Gale & Church (ACL 1991,
Computational Linguistics 1993), "A Program for Aligning Sentences in
Bilingual Corpora". Completes the bitext mining pipeline: hreflang
page pairs (ops/bitext.py) -> per-pair sentence beads ready for
translation-model training.

Pinned exact-integer dialect (the readability/pagerank rule — float
Gaussians are neither portable nor hash-stable):

- beads and their priors are the paper's: 1-1 (0.89), 1-0/0-1
  (0.0099), 2-1/1-2 (0.089), 2-2 (0.011); the bead PENALTY is the
  centi-integer ``round(-100 * log10(prior / 0.89))`` computed once
  by hand: 1-1 -> 0, 1-0/0-1 -> 195, 2-1/1-2 -> 100, 2-2 -> 191;
- the per-bead MATCH cost replaces the paper's Gaussian delta with
  the centi relative length difference
  ``(|s - t| * 100) div (s + t + 1)`` over the summed char lengths
  (monotone in the same signal; bounded 0..100 so it composes with
  the penalties on one integer scale);
- bead cost = match cost + penalty; the DP minimizes the total.
  Pinned tie rule (what strict ``<`` + forward row-major iteration
  actually yields, empirically verified): an equal-cost state keeps
  its FIRST writer, which is the predecessor earliest in row-major
  (i, j) order — i.e. the LARGEST src-consuming bead wins a tie
  (a 2-2 bead beats two 1-1 beads of the same total cost), and among
  beads from the SAME predecessor the earliest-listed of
  :data:`BEADS` (1-1, 1-0, 0-1, 2-1, 1-2, 2-2) wins.

The DP is O(n*m) per pair with a 6-way transition — per-document
Python over Arrow batches (mapInPandas); the op is shuffle-free.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["align_lengths", "align_sentence_pairs", "BEADS"]

#: (src_n, tgt_n, penalty_centi) in tie-break order
BEADS = [
    (1, 1, 0),
    (1, 0, 195),
    (0, 1, 195),
    (2, 1, 100),
    (1, 2, 100),
    (2, 2, 191),
]


def _match_cost(s: int, t: int) -> int:
    d = s - t if s >= t else t - s
    return (d * 100) // (s + t + 1)


def align_lengths(src: list[int],
                  tgt: list[int]) -> list[tuple[int, int, int, int, int]]:
    """DP alignment of two sentence-length sequences; returns beads
    ``(src_lo, src_n, tgt_lo, tgt_n, cost_centi)`` in document
    order, covering every sentence exactly once."""
    n, m = len(src), len(tgt)
    INF = float("inf")
    # cost[i][j] = best cost aligning src[:i] with tgt[:j]
    cost = [[INF] * (m + 1) for _ in range(n + 1)]
    back: list[list[tuple[int, int, int] | None]] = [
        [None] * (m + 1) for _ in range(n + 1)]
    cost[0][0] = 0
    for i in range(n + 1):
        for j in range(m + 1):
            c0 = cost[i][j]
            if c0 is INF:
                continue
            for si, ti, pen in BEADS:
                ni, nj = i + si, j + ti
                if ni > n or nj > m:
                    continue
                c = c0 + pen + _match_cost(
                    sum(src[i:ni]), sum(tgt[j:nj]))
                if c < cost[ni][nj]:
                    cost[ni][nj] = c
                    back[ni][nj] = (si, ti, pen)
    out: list[tuple[int, int, int, int, int]] = []
    i, j = n, m
    while i > 0 or j > 0:
        si, ti, pen = back[i][j]  # type: ignore[misc]
        i -= si
        j -= ti
        out.append((i, si, j, ti,
                    pen + _match_cost(sum(src[i:i + si]),
                                      sum(tgt[j:j + ti]))))
    out.reverse()
    return out


_SCHEMA = T.StructType([
    T.StructField("pair_id", T.LongType()),
    T.StructField("bead", T.LongType()),
    T.StructField("src_lo", T.LongType()),
    T.StructField("src_n", T.LongType()),
    T.StructField("tgt_lo", T.LongType()),
    T.StructField("tgt_n", T.LongType()),
    T.StructField("cost_centi", T.LongType()),
])


def align_sentence_pairs(pairs: DataFrame,
                         src_col: str = "src",
                         tgt_col: str = "tgt") -> DataFrame:
    """Align each row's ``src``/``tgt`` sentence arrays
    (array<string>; char lengths drive the DP): one row per bead,
    ``(pair_id, bead, src_lo, src_n, tgt_lo, tgt_n, cost_centi)``,
    ``bead`` 0-based in document order. NULL arrays are treated as
    empty; an empty-vs-empty pair emits no rows."""
    srcd = pairs.select(
        F.col("pair_id").cast("long").alias("pair_id"),
        F.col(src_col).alias("_s"), F.col(tgt_col).alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, s, t in zip(pdf["pair_id"].tolist(),
                                 pdf["_s"].tolist(),
                                 pdf["_t"].tolist()):
                # NULL array -> empty; NULL ELEMENT -> length-0
                # sentence (kept: cardinality must cover every slot)
                sl = ([0 if x is None else len(x) for x in s]
                      if s is not None else [])
                tl = ([0 if x is None else len(x) for x in t]
                      if t is not None else [])
                for k, (a, sn, b, tn, c) in enumerate(
                        align_lengths(sl, tl)):
                    rows.append((pid, k, a, sn, b, tn, c))
            yield pd.DataFrame(
                rows, columns=["pair_id", "bead", "src_lo", "src_n",
                               "tgt_lo", "tgt_n", "cost_centi"])

    return srcd.mapInPandas(run, _SCHEMA)
