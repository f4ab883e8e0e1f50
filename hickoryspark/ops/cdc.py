"""Content-defined chunking (gear-hash CDC).

Web archives and training-data stores dedup at the CHUNK level:
content-defined boundaries (rsync/LBFS/FastCDC lineage) survive
insertions — editing one paragraph changes O(1) chunk digests, where
fixed-size blocking re-digests the whole tail. Chunk digests feed
storage dedup, delta sync, and near-identical-page detection.

Pinned semantics (deterministic — the gate oracle re-derives them
with an independent per-byte reference implementation):

- The stream is the UTF-8 encoding of the text column; NULL text rows
  are skipped, empty text yields no rows.
- Gear table: ``GEAR[b]`` = first 8 bytes (big-endian) of
  ``md5(bytes([b]))`` — deterministic, no RNG.
- Rolling hash over the WHOLE document, never reset at cuts (gear
  self-flushes after 64 bytes, so boundaries are content-local and
  shift-resistant): ``h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64)``.
- Position ``i`` ends a chunk when ``h_i & mask == 0`` (mask =
  ``2^mask_bits - 1``) AND the chunk would be >= ``min_size`` bytes;
  a cut is FORCED when the chunk reaches ``max_size``; the remainder
  is the final chunk (may be shorter than min_size).
- Output: ``(doc_id, chunk_idx, offset, length, digest)`` with
  0-based ``chunk_idx``, byte ``offset``/``length``, md5 hex digest
  of the chunk bytes.

Scale shape: one mapInPandas pass, shuffle-free. The hash is
vectorized: ``h_i = sum_{j=0..63} GEAR[b_{i-j}] << j`` equals the
recurrence exactly (bits shift out past 64), so NumPy computes all
positions in 64 vector ops; only the sparse candidate list is walked
in Python. Callers repartition first when the input is one file =
one partition.
"""

from __future__ import annotations

import hashlib
from bisect import bisect_left
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame

__all__ = ["content_chunks", "chunk_boundaries_ref", "GEAR"]

GEAR = tuple(
    int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
    for b in range(256)
)

_SCHEMA = ("doc_id long, chunk_idx long, offset long, length long, "
           "digest string")


def _cut_positions(data: bytes, min_size: int, mask: int,
                   max_size: int) -> List[int]:
    """End positions (inclusive) of every chunk except the last."""
    import numpy as np

    n = len(data)
    g = np.asarray(GEAR, dtype=np.uint64)[
        np.frombuffer(data, dtype=np.uint8)]
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, n)):
            if j:
                h[j:] += g[:-j] << np.uint64(j)
            else:
                h += g
    cand = np.nonzero((h & np.uint64(mask)) == 0)[0].tolist()

    cuts: List[int] = []
    start = 0
    while start < n:
        lo = start + min_size - 1   # earliest allowed cut
        hi = start + max_size - 1   # forced cut position
        k = bisect_left(cand, lo)
        if k < len(cand) and cand[k] <= min(hi, n - 1):
            cut = cand[k]
        elif hi < n - 1:
            cut = hi  # no candidate in window: force at max_size
        else:
            break     # remainder fits in max_size: final chunk
        cuts.append(cut)
        start = cut + 1
    return cuts


def chunk_boundaries_ref(data: bytes, min_size: int = 64,
                         mask_bits: int = 13,
                         max_size: int = 65536
                         ) -> List[Tuple[int, int]]:
    """(offset, length) per chunk — the vectorized path, exposed for
    tests and composition."""
    if not data:
        return []
    mask = (1 << mask_bits) - 1
    cuts = _cut_positions(data, min_size, mask, max_size)
    out, start = [], 0
    for c in cuts:
        out.append((start, c - start + 1))
        start = c + 1
    if start < len(data):
        out.append((start, len(data) - start))
    return out


def content_chunks(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_size: int = 64,
                   mask_bits: int = 13,
                   max_size: int = 65536) -> DataFrame:
    """``(doc_id, chunk_idx, offset, length, digest)`` per chunk."""
    if min_size < 64:
        raise ValueError("min_size must be >= 64 (gear window)")
    if max_size < min_size:
        raise ValueError("max_size must be >= min_size")
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, offs, lens, digs = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                data = text.encode("utf-8")
                for ci, (off, ln) in enumerate(chunk_boundaries_ref(
                        data, min_size, mask_bits, max_size)):
                    ids.append(doc_id)
                    idxs.append(ci)
                    offs.append(off)
                    lens.append(ln)
                    digs.append(
                        hashlib.md5(data[off:off + ln]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "offset": pd.Series(offs, dtype="int64"),
                "length": pd.Series(lens, dtype="int64"),
                "digest": pd.Series(digs, dtype="object"),
            })

    return docs.select(id_col, text_col).mapInPandas(gen, _SCHEMA)
