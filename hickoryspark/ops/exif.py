"""EXIF/TIFF metadata extraction from JPEG payloads.

Multimodal corpora filter and audit images on EXIF long before any
pixel decode: orientation decides whether width/height swap, capture
DateTime feeds freshness/dedup keys, Make/Model power device-skew
audits, and the Exif sub-IFD's PixelX/YDimension is the declared
decode size (LAION-style pipelines drop mis-declared images on it).
``ops/imagemeta.py`` deliberately stops at fixed-offset PNG/GIF/BMP
headers; EXIF lives behind a JPEG segment walk plus a TIFF IFD walk
with a byte-order switch — per-row imperative parsing, so this is a
mapInPandas op (the sanctioned Python crossing, like ops/pdf.py /
ops/wat.py), not a column program. The reference engine has no
equivalent; net-new surface like ops/warc.py.

Pinned semantics (so the closed-form gate oracle can reproduce them):

- input is a JPEG (``FF D8`` SOI, then a segment walk: each marker is
  ``FF xx``; TEM/RSTn (``01``/``D0-D7``) are standalone; the walk
  stops at SOS/EOI; every other segment carries a big-endian u16
  length covering itself) or a bare TIFF (``II 2A 00`` / ``MM 00
  2A``). The FIRST APP1 segment whose payload starts ``Exif\\0\\0``
  is the EXIF block; later APP1s are ignored.
- TIFF: byte order ``II`` (little) or ``MM`` (big), magic 42, then
  the IFD0 offset. IFD entries are 12 bytes (tag u16, type u16,
  count u32, value-or-offset u32); a value whose encoded size is
  <= 4 bytes is INLINE in the value field (in the TIFF byte order),
  else the field is an offset from the TIFF start.
- extracted tags — IFD0: Make 0x010F (ASCII), Model 0x0110 (ASCII),
  Orientation 0x0112 (SHORT), DateTime 0x0132 (ASCII), plus the Exif
  sub-IFD pointer 0x8769; sub-IFD: ISOSpeedRatings 0x8827 (SHORT),
  PixelXDimension 0xA002, PixelYDimension 0xA003 (SHORT or LONG).
  ``n_ifd`` is IFD0's entry count. Unknown tags are skipped.
- ASCII values: ALL trailing NULs stripped, then latin-1 decoded
  (lossless byte->char; EXIF "ASCII" is routinely mojibake on the
  real web and must not raise). SHORT reads the FIRST value.
- any structural violation (bad magic, truncated segment, IFD or
  value read out of bounds, odd marker stream) yields an all-NULL
  row — never an exception, never a partial guess past the break.
  A payload with a valid TIFF but none of the pinned tags yields
  non-NULL ``n_ifd`` and NULL fields.

Scale shape: one mapInPandas pass, shuffle-free; only ``payload`` +
id cross the Arrow boundary. Per the repo lesson, rows are pulled to
Python lists before the loop (scalar NumPy indexing is ~10x slower).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["exif_fields", "exif_tags", "EXIF_SCHEMA"]

EXIF_SCHEMA = ("make string, model string, orientation long, "
               "datetime string, iso long, pixel_x long, "
               "pixel_y long, n_ifd long")

_FIELDS = ("make", "model", "orientation", "datetime", "iso",
           "pixel_x", "pixel_y", "n_ifd")

# TIFF value-type encoded widths (bytes per count unit) for the types
# this op reads; anything else is skipped tag-by-tag.
_TYPE_WIDTH = {1: 1, 2: 1, 3: 2, 4: 4, 7: 1}

_IFD0_TAGS = {0x010F: "make", 0x0110: "model",
              0x0112: "orientation", 0x0132: "datetime"}
_EXIF_TAGS = {0x8827: "iso", 0xA002: "pixel_x", 0xA003: "pixel_y"}
_EXIF_POINTER = 0x8769


def _find_tiff(buf: bytes) -> Optional[bytes]:
    """The TIFF block: the payload itself, or the first APP1 Exif
    segment of a JPEG segment walk. None on structural violation."""
    if len(buf) >= 4 and buf[:2] in (b"II", b"MM"):
        return buf
    if len(buf) < 2 or buf[:2] != b"\xff\xd8":
        return None
    pos = 2
    while True:
        if pos + 2 > len(buf):
            return None
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no Exif
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(buf):
            return None
        (seg_len,) = struct.unpack(">H", buf[pos:pos + 2])
        if seg_len < 2 or pos + seg_len > len(buf):
            return None
        if marker == 0xE1 and buf[pos + 2:pos + 8] == b"Exif\x00\x00":
            return buf[pos + 8:pos + seg_len]
        pos += seg_len


def _read_ifd(tiff: bytes, off: int, fmt: str, want, out) -> Optional[int]:
    """Walk one IFD at ``off``; fill ``out`` for tags in ``want``.
    Returns the entry count, or None on a bounds violation. Also
    stashes the Exif sub-IFD pointer under key 0 when present."""
    if off + 2 > len(tiff):
        return None
    (count,) = struct.unpack(fmt + "H", tiff[off:off + 2])
    if off + 2 + 12 * count > len(tiff):
        return None
    for i in range(count):
        ent = off + 2 + 12 * i
        tag, typ, n = struct.unpack(fmt + "HHI", tiff[ent:ent + 8])
        if tag == _EXIF_POINTER and typ == 4:
            (ptr,) = struct.unpack(fmt + "I", tiff[ent + 8:ent + 12])
            out[0] = ptr
            continue
        name = want.get(tag)
        if name is None or typ not in _TYPE_WIDTH:
            continue
        size = _TYPE_WIDTH[typ] * n
        if size <= 4:
            data = tiff[ent + 8:ent + 8 + size]
        else:
            (voff,) = struct.unpack(fmt + "I", tiff[ent + 8:ent + 12])
            if voff + size > len(tiff):
                return None
            data = tiff[voff:voff + size]
        if typ == 2:  # ASCII
            out[name] = data.rstrip(b"\x00").decode("latin-1")
        elif typ == 3 and n >= 1:  # SHORT: first value
            out[name] = struct.unpack(fmt + "H", data[:2])[0]
        elif typ == 4 and n >= 1:  # LONG: first value
            out[name] = struct.unpack(fmt + "I", data[:4])[0]
    return count


def exif_fields(payload: Optional[bytes]) -> Optional[dict]:
    """Parse one payload; dict over ``_FIELDS`` (missing tags absent)
    or None when the payload is NULL or structurally invalid."""
    if payload is None:
        return None
    tiff = _find_tiff(bytes(payload))
    if tiff is None or len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        return None
    magic, ifd0 = struct.unpack(fmt + "HI", tiff[2:8])
    if magic != 42:
        return None
    out: dict = {}
    n = _read_ifd(tiff, ifd0, fmt, _IFD0_TAGS, out)
    if n is None:
        return None
    sub = out.pop(0, None)
    if sub is not None:
        if _read_ifd(tiff, sub, fmt, _EXIF_TAGS, out) is None:
            return None
    out["n_ifd"] = n
    return out


def exif_tags(
    df: DataFrame,
    payload_col: str = "payload",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """``id_cols + (make, model, orientation, datetime, iso, pixel_x,
    pixel_y, n_ifd)`` per input row; all fields NULL on malformed or
    NULL payloads (``n_ifd`` NULL is the validity flag)."""
    ids = list(id_cols)
    id_schema = ", ".join(f"{c} long" for c in ids)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            cols: dict = {c: b[c] for c in ids}
            parsed = [exif_fields(p) for p in list(b[payload_col])]
            for name in _FIELDS:
                vals = [None if d is None else d.get(name)
                        for d in parsed]
                if name in ("make", "model", "datetime"):
                    cols[name] = pd.array(vals, dtype="string")
                else:
                    cols[name] = pd.array(vals, dtype="Int64")
            yield pd.DataFrame(cols)

    return df.select(*ids, payload_col).mapInPandas(
        gen, f"{id_schema}, {EXIF_SCHEMA}")
