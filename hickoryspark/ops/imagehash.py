"""Perceptual image hashing + near-duplicate pairs — the multimodal
arm of the dedup family.

LAION/DataComp-style corpora dedup images by a perceptual hash (aHash
/ dHash / pHash family): near-identical images (re-encodes, small
crops, brightness shifts) collapse to signatures within a small
Hamming distance. This module implements

- ``ahash_images``: the average hash ("aHash") — decode, grayscale,
  block-mean downsample to ``hash_size²`` cells, threshold each cell
  against the global cell mean. Brightness- and contrast-shift
  invariant by construction (an affine shift moves every cell AND the
  mean together). Decoding uses the repo's real PPM codec
  (ops/multimodal.py), NumPy-vectorized inside mapInPandas — undecodable
  payloads yield NULL rather than killing the task.
- ``ahash_near_pairs``: complete near-pair set at Hamming distance
  <= max_hamming, via the SAME pigeonhole-banded join the text side
  uses (ops/dedup.py simhash_pairs_from_sigs — Manku et al. WWW'07):
  guaranteed recall, mega-group star capping, no quadratic self-join.

Scale (100 TB): hashing is one shuffle-free mapInPandas pass (Arrow
batches, one O(h·w) NumPy reduction per image); the pair join
inherits the text-side skew controls (identical-signature quotient
groups, group_cap star expansion, AQE-broadcast group lookups).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.dedup import DEFAULT_GROUP_CAP, simhash_pairs_from_sigs
from hickoryspark.ops.multimodal import decode_image


def ahash_bits(arr: np.ndarray, hash_size: int = 8) -> int | None:
    """aHash of an (h, w, 3) uint8 array as a Python int in
    [0, 2**hash_size**2). Bit i (LSB-first) is cell i in row-major
    cell order. None when the image is smaller than the cell grid
    (no meaningful downsample exists).

    Cells are EXACT block means over an integer grid (cell r spans
    rows [r*h//n, (r+1)*h//n) — the same index arithmetic as
    multimodal.resize_images), and the threshold is STRICT
    (cell > mean), so a constant image hashes to 0.
    """
    h, w = arr.shape[:2]
    n = hash_size
    if h < n or w < n:
        return None
    gray = arr.astype(np.float64).mean(axis=2)
    # exact block means via 2-level add.reduceat on the integer grid
    rb = (np.arange(n) * h) // n
    cb = (np.arange(n) * w) // n
    rows = np.add.reduceat(gray, rb, axis=0)
    cells = np.add.reduceat(rows, cb, axis=1)
    rcnt = np.diff(np.append(rb, h)).astype(np.float64)
    ccnt = np.diff(np.append(cb, w)).astype(np.float64)
    cells = cells / rcnt[:, None] / ccnt[None, :]
    bits = (cells > cells.mean()).ravel()
    packed = np.packbits(bits.astype(np.uint8), bitorder="little")
    return int.from_bytes(packed.tobytes(), "little")


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash_images(
    media: DataFrame,
    hash_size: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, ahash BIGINT) for a binary image column. hash_size=8 gives
    the standard 64-bit signature (bit 63 in two's complement, like
    ops.dedup.simhash, so bit_count(a XOR b) Hamming stays exact).
    NULL ahash for undecodable / too-small payloads."""
    if not 1 <= hash_size <= 8:
        raise ValueError(f"hash_size must be 1..8, got {hash_size}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            out = []
            for payload in b[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                try:
                    bits = ahash_bits(decode_image(payload), hash_size)
                except ValueError:
                    out.append(None)
                    continue
                out.append(None if bits is None else _to_signed64(bits))
            yield pd.DataFrame(
                {id_col: b[id_col], "ahash": pd.array(out, dtype="Int64")}
            )

    return media.mapInPandas(gen, f"{id_col} long, ahash long")


def ahash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    hash_size: int = 8,
    group_cap: int | None = DEFAULT_GROUP_CAP,
    id_col: str = "media_id",
) -> DataFrame:
    """Complete (id_a, id_b, hamming) pair set at Hamming distance
    <= max_hamming between aHash signatures — delegates to the
    pigeonhole-banded joiner shared with the text SimHash path (same
    recall guarantee, same skew caps). NULL hashes are dropped (an
    undecodable image matches nothing).

    ``hash_size`` must match the ``ahash_images`` call that produced
    the signatures: the band count derives from the true signature
    width hash_size², and banding a narrow signature as if it were
    64-bit would make the high bands all-zero — every image colliding
    in those bands, a quadratic candidate blowup."""
    sigs = hashes.where(F.col("ahash").isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col("ahash").alias("simhash")
    )
    out = simhash_pairs_from_sigs(
        sigs, hash_size * hash_size, max_hamming, group_cap
    )
    return out.select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "hamming",
    )


def dhash_bits(arr: np.ndarray, hash_size: int = 8) -> int | None:
    """Difference hash ("dHash") of an (h, w, 3) uint8 array: block
    means over an n x (n+1) cell grid, bit (r, c) = STRICT
    ``cell[r, c+1] > cell[r, c]`` (the horizontal gradient), LSB-first
    row-major — n*n bits total. None when the image is smaller than
    the cell grid.

    Gradient comparisons make dHash invariant to any GLOBAL brightness
    offset by construction (both operands shift together), catching
    re-encodes that move levels uniformly; it reacts to different
    structure than aHash (which thresholds against the global mean),
    so the two hashes are complementary dedup signals.
    """
    h, w = arr.shape[:2]
    n = hash_size
    if h < n or w < n + 1:
        return None
    gray = arr.astype(np.float64).mean(axis=2)
    rb = (np.arange(n) * h) // n
    cb = (np.arange(n + 1) * w) // (n + 1)
    rows = np.add.reduceat(gray, rb, axis=0)
    cells = np.add.reduceat(rows, cb, axis=1)
    rcnt = np.diff(np.append(rb, h)).astype(np.float64)
    ccnt = np.diff(np.append(cb, w)).astype(np.float64)
    cells = cells / rcnt[:, None] / ccnt[None, :]
    bits = (cells[:, 1:] > cells[:, :-1]).ravel()
    packed = np.packbits(bits.astype(np.uint8), bitorder="little")
    return int.from_bytes(packed.tobytes(), "little")


def dhash_images(
    media: DataFrame,
    hash_size: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash BIGINT) for a binary image column — the dHash twin
    of :func:`ahash_images` (same codec, same NULL contract)."""
    if not 1 <= hash_size <= 8:
        raise ValueError(f"hash_size must be 1..8, got {hash_size}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            out = []
            for payload in b[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                try:
                    bits = dhash_bits(decode_image(payload), hash_size)
                except ValueError:
                    out.append(None)
                    continue
                out.append(None if bits is None else _to_signed64(bits))
            yield pd.DataFrame(
                {id_col: b[id_col], "dhash": pd.array(out, dtype="Int64")}
            )

    return media.mapInPandas(gen, f"{id_col} long, dhash long")


def dhash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    hash_size: int = 8,
    group_cap: int | None = DEFAULT_GROUP_CAP,
    id_col: str = "media_id",
) -> DataFrame:
    """Complete (id_a, id_b, hamming) near-pair set over dHash
    signatures — the same pigeonhole-banded joiner (and the same
    hash_size/band-width rule) as :func:`ahash_near_pairs`."""
    sigs = hashes.where(F.col("dhash").isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col("dhash").alias("simhash")
    )
    out = simhash_pairs_from_sigs(
        sigs, hash_size * hash_size, max_hamming, group_cap
    )
    return out.select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "hamming",
    )
