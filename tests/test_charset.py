"""Charset sniffing at the bytes->str parse boundary (html/charset.py):
BOM precedence, WHATWG meta prescan, label mapping, UTF-8-strict ->
cp1252 fallback — what the reference inherits from Jsoup
(core.clj:150-154) and real Common Crawl needs constantly."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.html.charset import decode_html, sniff_charset

PAGE = "<html><head>{meta}</head><body><p>café ñ€ö —</p></body></html>"


def test_bom_utf8():
    raw = b"\xef\xbb\xbf" + PAGE.format(meta="").encode("utf-8")
    assert sniff_charset(raw) == ("utf-8", 3)
    assert decode_html(raw) == PAGE.format(meta="")  # BOM stripped


def test_bom_utf16():
    for codec, bom in (("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")):
        raw = bom + PAGE.format(meta="").encode(codec)
        assert decode_html(raw) == PAGE.format(meta="")


def test_bom_beats_meta():
    # WHATWG: a BOM overrides any declared charset
    raw = b"\xef\xbb\xbf" + PAGE.format(
        meta='<meta charset="shift_jis">').encode("utf-8")
    assert sniff_charset(raw)[0] == "utf-8"


def test_meta_charset_cp1252():
    raw = PAGE.format(meta='<meta charset="windows-1252">').encode("cp1252")
    assert decode_html(raw) == PAGE.format(meta='<meta charset="windows-1252">')


def test_meta_http_equiv_and_latin1_label_maps_to_cp1252():
    # the € (0x80) only survives if iso-8859-1 maps to windows-1252
    # per the WHATWG label table
    meta = ('<meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1">')
    raw = PAGE.format(meta=meta).encode("cp1252")
    assert "€" in decode_html(raw)


def test_meta_inside_comment_ignored():
    raw = PAGE.format(
        meta='<!-- <meta charset="utf-16"> --><meta charset="utf-8">'
    ).encode("utf-8")
    assert sniff_charset(raw)[0] == "utf-8"


def test_meta_utf16_label_read_as_utf8():
    # spec: a prescan-found UTF-16 label means the doc is NOT UTF-16
    raw = PAGE.format(meta='<meta charset="utf-16">').encode("utf-8")
    assert sniff_charset(raw)[0] == "utf-8"


def test_fallback_utf8_then_cp1252():
    assert sniff_charset(PAGE.format(meta="").encode("utf-8"))[0] == "utf-8"
    raw = PAGE.format(meta="").encode("cp1252")  # é = 0xe9: invalid UTF-8
    assert sniff_charset(raw)[0] == "windows-1252"
    assert decode_html(raw) == PAGE.format(meta="")


def test_unknown_label_falls_through():
    raw = PAGE.format(meta='<meta charset="klingon-9">').encode("cp1252")
    assert sniff_charset(raw)[0] == "windows-1252"  # via fallback sniff


def test_lying_meta_never_raises():
    # meta says utf-8 but bytes are cp1252: decode must not raise
    raw = PAGE.format(meta='<meta charset="utf-8">').encode("cp1252")
    out = decode_html(raw)
    assert "�" in out  # replacement, not an exception


def test_meta_beyond_1024_bytes_ignored():
    pad = "<!-- " + "x" * 1100 + " -->"
    raw = (pad + PAGE.format(meta='<meta charset="utf-16">')).encode("utf-8")
    assert sniff_charset(raw)[0] == "utf-8"


def test_meta_inside_unterminated_comment_ignored():
    # review regression: an open <!-- swallows the rest of the prescan
    # window, so a charset mentioned inside it must not win
    raw = b'<!-- example: <meta charset="shift_jis"> and more ' + b"a" * 2000
    assert sniff_charset(raw)[0] == "utf-8"


def test_cp1252_undefined_bytes_map_to_c1_controls():
    # WHATWG windows-1252 index: the 5 bytes Python's cp1252 leaves
    # undefined decode to the same-valued C1 controls, not U+FFFD
    raw = b"<p>a\x81b\x8dc\x8fd\x90e\x9df\x93g</p>\xff"
    out = decode_html(raw)  # invalid UTF-8 -> windows-1252 fallback
    assert "a\x81b\x8dc\x8fd\x90e\x9df" in out
    assert "“g" in out  # 0x93 still maps via cp1252 proper
    assert "�" not in out  # 0xff is defined in cp1252 (U+00FF)


def test_cp1252_undefined_bytes_via_declared_meta():
    raw = b'<meta charset="iso-8859-1"><p>x\x90y</p>'
    assert decode_html(raw) == '<meta charset="iso-8859-1"><p>x\x90y</p>'
