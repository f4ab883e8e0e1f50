"""EXIF/TIFF metadata extraction (ops/exif.py)."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.exif import exif_fields, exif_tags  # noqa: E402


def _entry(fmt, tag, typ, count, value_bytes):
    """One 12-byte IFD entry; value_bytes padded/inline or an offset
    already packed by the caller."""
    assert len(value_bytes) <= 4
    return (struct.pack(fmt + "HHI", tag, typ, count)
            + value_bytes.ljust(4, b"\x00"))


def _tiff(fmt, entries, tail=b"", ifd0_off=8, next_off=0):
    order = b"II" if fmt == "<" else b"MM"
    head = order + struct.pack(fmt + "HI", 42, ifd0_off)
    ifd = struct.pack(fmt + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(fmt + "I", next_off)
    return head + ifd + tail


def _jpeg(app1_tiff, pre_segments=b""):
    app1 = b"Exif\x00\x00" + app1_tiff
    return (b"\xff\xd8" + pre_segments
            + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1)


def _le_make_orient_dt(make=b"CamA\x00\x00", orient=6,
                       dt=b"2023:05:17 10:11:12\x00"):
    """Little-endian TIFF: Make (ASCII, at offset), Orientation
    (SHORT, inline), DateTime (ASCII, at offset)."""
    fmt = "<"
    # IFD0 at 8: 2 + 3*12 + 4 = 42 bytes -> data area at 50
    data_off = 8 + 2 + 3 * 12 + 4
    entries = [
        _entry(fmt, 0x010F, 2, len(make),
               struct.pack(fmt + "I", data_off)),
        _entry(fmt, 0x0112, 3, 1, struct.pack(fmt + "H", orient)),
        _entry(fmt, 0x0132, 2, len(dt),
               struct.pack(fmt + "I", data_off + len(make))),
    ]
    return _tiff(fmt, entries, tail=make + dt)


def test_jpeg_le_full():
    out = exif_fields(_jpeg(_le_make_orient_dt()))
    assert out == {"make": "CamA", "orientation": 6,
                   "datetime": "2023:05:17 10:11:12", "n_ifd": 3}


def test_bare_tiff_accepted():
    out = exif_fields(_le_make_orient_dt())
    assert out["make"] == "CamA" and out["n_ifd"] == 3


def test_big_endian_inline_short():
    fmt = ">"
    entries = [_entry(fmt, 0x0110, 2, 4, b"Mod\x00"),
               _entry(fmt, 0x0112, 3, 1, struct.pack(fmt + "H", 3))]
    out = exif_fields(_jpeg(_tiff(fmt, entries)))
    assert out == {"model": "Mod", "orientation": 3, "n_ifd": 2}


def test_exif_sub_ifd_iso_and_pixels():
    fmt = "<"
    # IFD0: 1 entry (pointer) -> ends at 8 + 2 + 12 + 4 = 26
    sub_off = 26
    ifd0 = [_entry(fmt, 0x8769, 4, 1, struct.pack(fmt + "I", sub_off))]
    sub = (struct.pack(fmt + "H", 3)
           + _entry(fmt, 0x8827, 3, 1, struct.pack(fmt + "H", 200))
           + _entry(fmt, 0xA002, 4, 1, struct.pack(fmt + "I", 640))
           + _entry(fmt, 0xA003, 3, 1, struct.pack(fmt + "H", 480))
           + struct.pack(fmt + "I", 0))
    out = exif_fields(_jpeg(_tiff(fmt, ifd0, tail=sub)))
    assert out == {"iso": 200, "pixel_x": 640, "pixel_y": 480,
                   "n_ifd": 1}


def test_segment_walk_skips_other_segments():
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    out = exif_fields(_jpeg(_le_make_orient_dt(), pre_segments=app0))
    assert out["make"] == "CamA"


def test_standalone_markers_skipped():
    out = exif_fields(_jpeg(_le_make_orient_dt(),
                            pre_segments=b"\xff\x01\xff\xd0"))
    assert out["orientation"] == 6


def test_first_app1_wins_and_non_exif_app1_skipped():
    other = _le_make_orient_dt(make=b"Late\x00\x00")
    xmp = b"\xff\xe1" + struct.pack(">H", 8) + b"http:\x00"
    first = _jpeg(_le_make_orient_dt(), pre_segments=xmp)
    second = (b"\xff\xe1" + struct.pack(">H", len(other) + 8)
              + b"Exif\x00\x00" + other)
    assert exif_fields(first + second)["make"] == "CamA"


@pytest.mark.parametrize("bad", [
    None,
    b"",
    b"\xff\xd8",                                   # SOI only
    b"\xff\xd8\xff\xd9",                           # EOI before APP1
    b"\xff\xd8\xff\xda\x00\x04\x00\x00",           # SOS stops walk
    b"\xff\xd8\x00\xe1\x00\x04",                   # no FF prefix
    b"\xff\xd8\xff\xe1\x00\x01",                   # segment len < 2
    b"\xff\xd8\xff\xe1\xff\xff" + b"Exif\x00\x00", # len > buffer
    b"II\x2b\x00\x08\x00\x00\x00",                 # wrong magic
    b"MM\x00\x2a\x00\x00\xff\xff",                 # IFD0 out of bounds
])
def test_malformed_yields_none(bad):
    assert exif_fields(bad) is None


def test_value_offset_out_of_bounds_is_malformed():
    fmt = "<"
    entries = [_entry(fmt, 0x010F, 2, 64,
                      struct.pack(fmt + "I", 10_000))]
    assert exif_fields(_tiff(fmt, entries)) is None


def test_truncated_ifd_is_malformed():
    fmt = "<"
    good = _le_make_orient_dt()
    assert exif_fields(good[:12]) is None


def test_no_pinned_tags_keeps_n_ifd():
    fmt = "<"
    entries = [_entry(fmt, 0x9999, 3, 1, struct.pack(fmt + "H", 7))]
    assert exif_fields(_tiff(fmt, entries)) == {"n_ifd": 1}


def test_ascii_trailing_nuls_and_latin1():
    fmt = "<"
    make = b"Caf\xe9\x00\x00"
    data_off = 8 + 2 + 12 + 4
    entries = [_entry(fmt, 0x010F, 2, len(make),
                      struct.pack(fmt + "I", data_off))]
    out = exif_fields(_tiff(fmt, entries, tail=make))
    assert out["make"] == "Caf\xe9"


def test_unknown_value_type_skipped():
    fmt = "<"
    # RATIONAL (5) Orientation is nonsense; must be skipped, not read
    entries = [_entry(fmt, 0x0112, 5, 1, b"\x00\x00\x00\x00"),
               _entry(fmt, 0x0110, 2, 3, b"ab\x00\x00")]
    out = exif_fields(_tiff(fmt, entries))
    assert out == {"model": "ab", "n_ifd": 2}


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark
    return get_spark()


def test_exif_tags_spark(spark):
    rows = [
        (1, bytearray(_jpeg(_le_make_orient_dt()))),
        (2, bytearray(b"\xff\xd8\xff\xd9")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in exif_tags(df).collect()}
    assert got[1]["make"] == "CamA"
    assert got[1]["orientation"] == 6
    assert got[1]["n_ifd"] == 3
    assert got[2]["n_ifd"] is None and got[2]["make"] is None
    assert got[3]["n_ifd"] is None
