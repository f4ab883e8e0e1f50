"""Charset detection for the bytes -> str boundary of the parse path.

The reference inherits Jsoup's charset machinery when parsing streams
(/root/reference/src/clj/hickory/core.clj:150-154 delegates to Jsoup,
which sniffs BOM and meta-declared charsets); our engine owns the
boundary because BASELINE.json mandates ``html BINARY`` input, and a
real Common-Crawl slice is 5-10% legacy-encoded. Detection order
follows the WHATWG Encoding sniff (encoding spec "determine the
encoding", html spec "prescan a byte stream"):

1. BOM: UTF-8 / UTF-16LE / UTF-16BE — authoritative, overrides meta.
2. ``<meta charset>`` / ``<meta http-equiv=content-type>`` prescan
   over the first 1024 bytes (attribute-parsed, comment-aware).
   A meta-declared UTF-16 is read as UTF-8 per spec (the prescan
   having worked proves the document is ASCII-superset), and
   latin-1/ascii labels map to windows-1252 per the WHATWG label
   table (they are the same bytes on the web).
3. Fallback: strict UTF-8 attempt, else windows-1252 (the spec's
   default for the en/"unknown" locale group — every byte sequence
   decodes, so legacy mojibake stays readable instead of U+FFFD).
"""

from __future__ import annotations

import codecs
import re

#: Python's cp1252 codec leaves 5 bytes undefined (0x81 0x8D 0x8F
#: 0x90 0x9D) and errors='replace' would turn them into U+FFFD; the
#: WHATWG windows-1252 single-byte index maps each to the C1 control
#: of the same value, which is what browsers (and Jsoup) produce.
_CP1252_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _whatwg_cp1252_errors(exc: UnicodeError) -> tuple[str, int]:
    if isinstance(exc, UnicodeDecodeError):
        b = exc.object[exc.start]
        ch = chr(b) if b in _CP1252_UNDEFINED else "�"
        return ch, exc.start + 1
    raise exc


codecs.register_error("whatwg-cp1252", _whatwg_cp1252_errors)


def _errors_for(codec: str) -> str:
    return "whatwg-cp1252" if codec == "windows-1252" else "replace"

#: WHATWG encoding label -> Python codec, for the labels that matter
#: on the web (encoding.spec.whatwg.org "names and labels" table;
#: latin-1 family deliberately maps to windows-1252 per that table).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15",
    "windows-1250": "windows-1250", "windows-1251": "windows-1251",
    "cp1251": "windows-1251", "windows-1253": "windows-1253",
    "windows-1254": "windows-1254", "windows-1255": "windows-1255",
    "windows-1256": "windows-1256", "windows-1257": "windows-1257",
    "windows-1258": "windows-1258",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc-jp", "iso-2022-jp": "iso2022_jp",
    "gb2312": "gb18030", "gbk": "gb18030", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "tis-620": "cp874", "windows-874": "cp874",
    # meta-declared UTF-16 is read as UTF-8 per the spec (§prescan):
    # the ASCII-superset prescan finding the label proves the bytes
    # are not actually UTF-16
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

_META_RE = re.compile(rb"<meta[\s/]", re.IGNORECASE)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z][a-zA-Z0-9-]*)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)"""
)
_CONTENT_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([^"'\s;]+)""", re.IGNORECASE
)


def _norm_label(label: bytes) -> str | None:
    return _LABELS.get(label.strip().strip(b"\"'").lower().decode("ascii", "replace"))


def _prescan_meta(head: bytes) -> str | None:
    """WHATWG-style prescan of the first bytes for a meta-declared
    charset: comments stripped, attributes parsed, ``charset`` attr
    preferred, ``http-equiv=content-type``'s content= parsed too."""
    head = _COMMENT_RE.sub(b"", head)
    # an UNTERMINATED comment swallows the rest of the prescan window
    # (the WHATWG prescan skips from <!-- to the next --> and aborts at
    # EOF): a meta mentioned inside an open comment must not win
    cut = head.find(b"<!--")
    if cut != -1:
        head = head[:cut]
    for m in _META_RE.finditer(head):
        end = head.find(b">", m.end())
        tag = head[m.end() - 1 : end if end != -1 else len(head)]
        attrs = {}
        for am in _ATTR_RE.finditer(tag):
            name = am.group(1).lower()
            if name not in attrs:  # first occurrence wins, per spec
                attrs[name] = am.group(2)
        if b"charset" in attrs:
            codec = _norm_label(attrs[b"charset"])
            if codec:
                return codec
        elif (
            attrs.get(b"http-equiv", b"").strip(b"\"'").lower()
            == b"content-type"
            and b"content" in attrs
        ):
            cm = _CONTENT_CHARSET_RE.search(attrs[b"content"])
            if cm:
                codec = _norm_label(cm.group(1))
                if codec:
                    return codec
    return None


def sniff_charset(raw: bytes) -> tuple[str, int]:
    """(python codec, BOM byte count) for an HTML byte payload."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    codec = _prescan_meta(raw[:1024])
    if codec:
        return codec, 0
    try:
        raw.decode("utf-8")
        return "utf-8", 0
    except UnicodeDecodeError:
        return "windows-1252", 0


def decode_html(raw: bytes | bytearray | memoryview) -> str:
    """Decode HTML bytes with charset sniffing (BOM > meta prescan >
    UTF-8 attempt > windows-1252). Never raises: residual errors (a
    lying meta, say) replace to U+FFFD.

    Inlined rather than sniff+decode so the dominant path (no BOM, no
    meta, valid UTF-8 — the vast majority of a modern crawl) decodes
    exactly ONCE; this runs per page in the parse hot loop."""
    raw = bytes(raw)
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace")
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", "replace")
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    codec = _prescan_meta(raw[:1024])
    if codec:
        return raw.decode(codec, _errors_for(codec))
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("windows-1252", "whatwg-cp1252")
