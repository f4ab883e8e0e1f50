"""TextTiling topic segmentation — Hearst (Computational Linguistics
1997), "TextTiling: Segmenting Text into Multi-paragraph Subtopic
Passages". Splits long documents at vocabulary-shift points: the
standard pre-chunking pass for RAG corpora and training-window
packing (cut at topic boundaries, not mid-topic).

Pinned exact-integer dialect (cross-engine hash gates need
order-independent integer arithmetic):

- tokens = ASCII-whitespace split, no case folding;
- pseudo-sentences = consecutive runs of ``w`` tokens, the final
  partial run KEPT;
- gap ``i`` (1-based, between pseudo-sentences i-1 and i) scores the
  cosine-squared of the two adjacent ``k``-pseudo-sentence blocks in
  milli: ``score = (1000 * dot * dot) div (na2 * nb2)`` over token
  count vectors (0 when dot is 0) — cosine² is monotone in cosine
  for non-negative counts, and needs no square root;
- depth score (Hearst §4.1): climb left and right from the gap while
  the next score is >= the climb height (plateaus continue the
  climb); ``depth = (hl - score) + (hr - score)``;
- boundary rule: Hearst cuts at depth >= mean - sd/2; the pinned rule
  drops the sd term (sqrt-free): ``is_boundary = depth > 0 AND
  depth * n_gaps > sum_depths`` (strict cross-multiplied mean
  comparison — no division rounding on either engine).

Per-document Python over Arrow batches (mapInPandas, shuffle-free);
the per-gap block vectors are bounded by ``2 * w * k`` tokens so a
document of any length streams in O(len) with bounded state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["tile_scores", "text_tiles", "DEFAULT_W", "DEFAULT_K"]

DEFAULT_W = 20
DEFAULT_K = 10

_ASCII_WS = " \t\n\x0b\f\r"


def _counts(toks: list[str]) -> dict[str, int]:
    d: dict[str, int] = {}
    for t in toks:
        d[t] = d.get(t, 0) + 1
    return d


def tile_scores(tokens: list[str], w: int = DEFAULT_W,
                k: int = DEFAULT_K) -> list[tuple[int, int, int, int]]:
    """(gap, score_milli, depth_milli, is_boundary) rows for every
    gap between pseudo-sentences of ``tokens``."""
    ps = [tokens[i:i + w] for i in range(0, len(tokens), w)]
    n = len(ps)
    if n < 2:
        return []
    scores: list[int] = []
    for i in range(1, n):
        left = _counts([t for p in ps[max(0, i - k):i] for t in p])
        right = _counts([t for p in ps[i:i + k] for t in p])
        dot = sum(c * right[t] for t, c in left.items() if t in right)
        if dot == 0:
            scores.append(0)
            continue
        na2 = sum(c * c for c in left.values())
        nb2 = sum(c * c for c in right.values())
        scores.append((1000 * dot * dot) // (na2 * nb2))
    depths: list[int] = []
    m = len(scores)
    for i in range(m):
        hl = scores[i]
        j = i - 1
        while j >= 0 and scores[j] >= hl:
            hl = scores[j]
            j -= 1
        hr = scores[i]
        j = i + 1
        while j < m and scores[j] >= hr:
            hr = scores[j]
            j += 1
        depths.append((hl - scores[i]) + (hr - scores[i]))
    total = sum(depths)
    return [
        (i + 1, scores[i], depths[i],
         1 if depths[i] > 0 and depths[i] * m > total else 0)
        for i in range(m)
    ]


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("gap", T.LongType()),
    T.StructField("score_milli", T.LongType()),
    T.StructField("depth_milli", T.LongType()),
    T.StructField("is_boundary", T.LongType()),
])


def text_tiles(docs: DataFrame, text_col: str = "text",
               w: int = DEFAULT_W, k: int = DEFAULT_K) -> DataFrame:
    """(doc_id, gap, score_milli, depth_milli, is_boundary) per
    pseudo-sentence gap; NULL text and sub-2-pseudo-sentence docs
    emit no rows. Shuffle-free: one mapInPandas scan."""
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(text_col).alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf["doc_id"].tolist(),
                                pdf["_t"].tolist()):
                if not isinstance(txt, str):
                    continue
                # Python str.split() splits on Unicode ws; pin ASCII:
                toks = []
                word = []
                for c in txt:
                    if c in _ASCII_WS:
                        if word:
                            toks.append("".join(word))
                            word = []
                    else:
                        word.append(c)
                if word:
                    toks.append("".join(word))
                for g, s, d, b in tile_scores(toks, w, k):
                    rows.append((did, g, s, d, b))
            yield pd.DataFrame(
                rows, columns=["doc_id", "gap", "score_milli",
                               "depth_milli", "is_boundary"])

    return src.mapInPandas(run, _SCHEMA)
