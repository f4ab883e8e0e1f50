"""HTML5 character-reference decoding.

Implements the WHATWG "character reference state" rules from scratch
(tokenizer 13.2.5.72-80), using only the stdlib named-entity table
(``html.entities.html5``) as data. The reference engine gets this
behavior from its HTML5 parser (jsoup); tests pinning it:
/root/reference/test/cljc/hickory/test/core.cljc:109-127 (text decode),
/root/reference/test/cljc/hickory/test/convert.cljc:13 (attr decode).
"""

from __future__ import annotations

from html.entities import html5 as _HTML5_ENTITIES

# Longest-first candidate lengths for named references (name incl. ';').
_MAX_NAME_LEN = max(len(k) for k in _HTML5_ENTITIES)

# WHATWG numeric-reference replacement table (13.2.5.80).
_NUMERIC_REPLACEMENTS = {
    0x00: 0xFFFD, 0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030,
    0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018,
    0x92: 0x2019, 0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013,
    0x97: 0x2014, 0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}

_HEX_DIGITS = set("0123456789abcdefABCDEF")
_DEC_DIGITS = set("0123456789")
_ALNUM = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")


def _decode_numeric(s: str, i: int) -> tuple[str, int] | None:
    """Decode a numeric reference starting at ``s[i]`` == '#'.

    Returns (replacement, index-after) or None if not a valid start.
    """
    j = i + 1
    n = len(s)
    if j < n and s[j] in ("x", "X"):
        j += 1
        start = j
        while j < n and s[j] in _HEX_DIGITS:
            j += 1
        if j == start:
            return None
        code = int(s[start:j], 16)
    else:
        start = j
        while j < n and s[j] in _DEC_DIGITS:
            j += 1
        if j == start:
            return None
        code = int(s[start:j])
    if j < n and s[j] == ";":
        j += 1
    code = _NUMERIC_REPLACEMENTS.get(code, code)
    if code > 0x10FFFF or 0xD800 <= code <= 0xDFFF:
        code = 0xFFFD
    return chr(code), j


def _decode_named(s: str, i: int, in_attribute: bool) -> tuple[str, int] | None:
    """Decode a named reference starting just after '&' at ``s[i]``.

    Longest-match against the HTML5 entity table. For historical
    entities without a trailing ';', the match is suppressed inside
    attribute values when followed by '=' or an alphanumeric
    (WHATWG 13.2.5.73)."""
    n = len(s)
    limit = min(n, i + _MAX_NAME_LEN)
    # Gather the maximal run of candidate characters (alnum then maybe ';').
    j = i
    while j < limit and s[j] in _ALNUM:
        j += 1
    has_semi = j < n and s[j] == ";"
    if has_semi:
        candidate_end = j + 1
    else:
        candidate_end = j
    # Try longest-first. Semicolon form is preferred.
    for end in range(candidate_end, i, -1):
        name = s[i:end]
        if name in _HTML5_ENTITIES:
            if not name.endswith(";"):
                if in_attribute and end < n and (s[end] == "=" or s[end] in _ALNUM):
                    continue
            return _HTML5_ENTITIES[name], end
    return None


def decode_entities(s: str, in_attribute: bool = False) -> str:
    """Decode all character references in ``s`` (HTML5 semantics)."""
    amp = s.find("&")
    if amp == -1:
        return s
    out: list[str] = []
    pos = 0
    n = len(s)
    while amp != -1:
        out.append(s[pos:amp])
        i = amp + 1
        if i < n and s[i] == "#":
            decoded = _decode_numeric(s, i)
        elif i < n:
            decoded = _decode_named(s, i, in_attribute)
        else:
            decoded = None
        if decoded is None:
            out.append("&")
            pos = amp + 1
        else:
            out.append(decoded[0])
            pos = decoded[1]
        amp = s.find("&", pos)
    out.append(s[pos:])
    return "".join(out)
