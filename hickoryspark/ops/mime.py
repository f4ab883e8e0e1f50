"""MIME type sniffing of payload bytes — the WHATWG MIME Sniffing
Standard's "identifying a resource with an unknown MIME type"
algorithm (https://mimesniff.spec.whatwg.org/ §7, public spec), the
step a crawler runs on every fetched body before routing it to the
HTML / image / media / archive pipelines.

Implemented subset (documented deltas from the full spec):

- §7.1 scriptable: the 17 case-insensitive, whitespace-skipped,
  tag-terminated HTML patterns, ``<?xml`` and ``%PDF-`` / §7.2
  ``%!PS-Adobe-`` and the three BOMs.
- §6.1 images: ICO/CUR, BMP, GIF87a/89a, WEBP, PNG, JPEG.
- §6.2 audio/video: ``.snd``, AIFF, ID3→audio/mpeg, OggS, MThd, AVI,
  WAVE; MP4 via the major-brand bytes only (the full §6.2.1 algorithm
  also scans compatible brands in the remainder of the ftyp box — a
  payload whose FIRST brand is not ``mp4``-prefixed sniffs as
  octet-stream here).
- §7.1 archives: gzip, zip, rar.
- Fallback: header free of binary data bytes (0x00-0x08, 0x0B,
  0x0E-0x1A, 0x1C-0x1F — the spec's table) → text/plain, else
  application/octet-stream.

Not implemented (needs the HTTP layer, out of scope for a column
operator): supplied-type checks, apache-bug flag, feed sniffing (§7.3
operates on resources ALREADY typed text/html).

Engineered for scale: the whole classifier is ONE chain of Catalyst
``rlike``/``startswith`` predicates over the hex dump of the first
``header_bytes`` bytes — pure JVM whole-stage-codegen expressions, no
Python crossing, no shuffle (plan-guarded in tests/test_mime.py).
Patterns stay in the Java-regex ∩ RE2 subset (no ``$``, no ``.``)
per the repo's cross-engine regex rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: spec §7.1: bytes that may be skipped before a tag pattern
_WS = "(?:09|0A|0C|0D|20)*"
#: spec: tag-terminating byte — 0x20 (space) or 0x3E ('>')
_TT = "(?:20|3E)"
#: binary data bytes (spec §3 table) as hex-pair alternatives
_BINARY_PAIR = "(?:0[0-8]|0B|0[EF]|1[0-9A]|1[C-F])"


def _hx(data: bytes, ci: bool = False) -> str:
    """Hex-pair regex for a byte string; ``ci`` makes ASCII letters
    match either case (the spec's 0xDF mask)."""
    out = []
    for b in data:
        if ci and (0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A):
            up, lo = b & ~0x20, b | 0x20
            out.append(f"(?:{up:02X}|{lo:02X})")
        else:
            out.append(f"{b:02X}")
    return "".join(out)


def _tag(name: str) -> str:
    """Whitespace-skipped, case-insensitive, tag-terminated pattern."""
    return _WS + _hx(name.encode(), ci=True) + _TT


#: (anchored hex-regex, mime) in spec evaluation order — first match
#: wins. All patterns are implicitly anchored at position 0 (evaluated
#: with a leading '^').
_HTML_TAGS = [
    "<!DOCTYPE HTML", "<HTML", "<HEAD", "<SCRIPT", "<IFRAME", "<H1",
    "<DIV", "<FONT", "<TABLE", "<A", "<STYLE", "<TITLE", "<B",
    "<BODY", "<BR", "<P", "<!--",
]
_PATTERNS: list[tuple[str, str]] = (
    [(_tag(t), "text/html") for t in _HTML_TAGS]
    + [
        (_WS + _hx(b"<?xml"), "text/xml"),
        (_hx(b"%PDF-"), "application/pdf"),
        (_hx(b"%!PS-Adobe-"), "application/postscript"),
        ("FEFF", "text/plain"),            # UTF-16BE BOM
        ("FFFE", "text/plain"),            # UTF-16LE BOM
        ("EFBBBF", "text/plain"),          # UTF-8 BOM
        ("00000100", "image/x-icon"),      # ICO
        ("00000200", "image/x-icon"),      # CUR
        (_hx(b"BM"), "image/bmp"),
        (_hx(b"GIF87a"), "image/gif"),
        (_hx(b"GIF89a"), "image/gif"),
        # RIFF????WEBP then "VP" (the 4 size bytes are wildcards)
        (_hx(b"RIFF") + "(?:[0-9A-F]{2}){4}" + _hx(b"WEBPVP"),
         "image/webp"),
        ("89504E470D0A1A0A", "image/png"),
        ("FFD8FF", "image/jpeg"),
        (_hx(b".snd"), "audio/basic"),
        (_hx(b"FORM") + "(?:[0-9A-F]{2}){4}" + _hx(b"AIFF"),
         "audio/aiff"),
        (_hx(b"ID3"), "audio/mpeg"),
        (_hx(b"OggS") + "00", "application/ogg"),
        (_hx(b"MThd") + "00000006", "audio/midi"),
        (_hx(b"RIFF") + "(?:[0-9A-F]{2}){4}" + _hx(b"AVI "),
         "video/avi"),
        (_hx(b"RIFF") + "(?:[0-9A-F]{2}){4}" + _hx(b"WAVE"),
         "audio/wave"),
        # MP4: 4 size bytes, "ftyp", major brand starting "mp4"
        # (simplified §6.2.1 — see module docstring)
        ("(?:[0-9A-F]{2}){4}" + _hx(b"ftypmp4"), "video/mp4"),
        ("1F8B08", "application/x-gzip"),
        (_hx(b"PK") + "0304", "application/zip"),
        # the WHATWG table says "Rar " (0x20) — a documented spec typo
        # (whatwg/mimesniff#63); real archives start "Rar!" (0x21), so
        # match both or the row is dead against actual web content
        (_hx(b"Rar") + "(?:20|21)" + "1A0700",
         "application/x-rar-compressed"),
    ]
)


def sniff_mime(payload: Column, header_bytes: int = 512) -> Column:
    """MIME type of a binary payload column (see module docstring).

    Matching runs over the UPPERCASE hex dump of the resource header
    (first ``header_bytes`` bytes — the spec reads at most 1445; 512
    covers every magic number and any plausible pre-tag whitespace
    run). One ``when`` chain in spec order; ties impossible (first
    match wins, as the spec's row order dictates).
    """
    hx = F.upper(F.hex(F.substring(payload, 1, header_bytes)))
    expr = None
    for pat, mime in _PATTERNS:
        cond = hx.rlike("^" + pat)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    has_binary = hx.rlike("^(?:[0-9A-F]{2})*?" + _BINARY_PAIR)
    sniffed = expr.otherwise(
        F.when(has_binary, "application/octet-stream").otherwise("text/plain")
    )
    # a NULL payload (failed fetch) is unknown, not text/plain — every
    # rlike above is NULL and would fall through to the otherwise
    return F.when(payload.isNotNull(), sniffed)


def sniff_df(
    df: DataFrame, payload_col: str = "payload", out_col: str = "mime"
) -> DataFrame:
    """Attach a sniffed ``mime`` column — shuffle-free map."""
    return df.withColumn(out_col, sniff_mime(F.col(payload_col)))
