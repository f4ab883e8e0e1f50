"""IDN host audit — punycode (RFC 3492) decoding + homograph signal.

Internationalized domain names travel in DNS as ASCII ``xn--`` labels
(IDNA, RFC 5890); crawlers and URL-frontier dedup need the Unicode
form, and security/quality filters need the classic homograph signal:
a decoded host mixing Latin with confusable non-Latin letters
(``pаypal.com`` with a Cyrillic а) is a phishing-shaped outlier worth
flagging before it enters a training corpus.

The punycode decoder is implemented from scratch per RFC 3492 §6.2
(base 36, bias adaptation, generalized variable-length integers) and
is hypothesis-fuzzed against CPython's ``punycode`` codec — an
INDEPENDENT oracle (tests/test_idn.py): every round-trip
``codec-encode → this-decode`` must reproduce the input, and on raw
ASCII inputs accept/reject must agree with the codec EXCEPT for the
one pinned divergence: inputs the codec decodes to lone surrogates
are REJECTED here (Arrow cannot serialize them — the sitemaps
lesson; the fuzz pins this branch explicitly).

Pinned semantics:

- a label is an IDN label iff it starts with ``xn--`` (case folded by
  the caller — compose with ops.hosts.url_host, which lowercases);
- ``host_unicode``: every IDN label replaced by its decoding; if ANY
  label fails to decode (bad digit, truncated last group, codepoint
  out of range / surrogate, non-ASCII input), ``decode_ok`` is false
  and ``host_unicode`` is the ASCII host unchanged;
- ``latin_letters`` counts alphabetic chars in the Latin blocks
  (ASCII letters, Latin-1 supplement letters, Latin Extended-A/B:
  U+0041-U+024F range, alphabetic only); ``other_letters`` counts all
  other alphabetic chars; ``mixed_script`` = both are > 0 — the
  homograph flag (a pure-Cyrillic host is NOT mixed; ``münchen`` is
  pure Latin);
- counts run over the DECODED host (the ASCII fallback when decoding
  failed, so mixed_script is then always false).

Scale shape: one shuffle-free mapInPandas pass (pure per-row string
work, the sanctioned Python-in-Arrow cost class — there is no JVM
punycode primitive); schema appended, input columns pass through.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["punycode_decode", "decode_idn_host", "idn_hosts"]

_BASE = 36
_TMIN, _TMAX = 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS = 72
_INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit(ch: str) -> int:
    o = ord(ch)
    if 0x61 <= o <= 0x7A:  # a-z
        return o - 0x61
    if 0x41 <= o <= 0x5A:  # A-Z
        return o - 0x41
    if 0x30 <= o <= 0x39:  # 0-9
        return o - 0x30 + 26
    raise ValueError(f"invalid punycode digit {ch!r}")


def punycode_decode(s: str) -> str:
    """RFC 3492 §6.2 — decode the part AFTER the ``xn--`` prefix.
    Raises ValueError on any malformed input (bad digit, truncated
    group, non-basic char in the literal portion, codepoint out of
    range or in the surrogate block)."""
    if not s.isascii():
        raise ValueError("punycode input must be ASCII")
    if len(s) > 256:
        # hostnames cap at 253 bytes; the bound also keeps the
        # variable-length-integer weights small on hostile input
        raise ValueError("punycode label too long")
    delim = s.rfind("-")
    if delim >= 0:
        literal, ext = s[:delim], s[delim + 1:]
    else:
        literal, ext = "", s
    output = list(literal)
    i, n, bias = 0, _INITIAL_N, _INITIAL_BIAS
    pos = 0
    while pos < len(ext):
        oldi, w, k = i, 1, _BASE
        while True:
            if pos >= len(ext):
                raise ValueError("truncated punycode group")
            digit = _digit(ext[pos])
            pos += 1
            i += digit * w
            # i // (len+1) becomes the codepoint increment, so once i
            # exceeds (maxcp+1)*(len+1) no valid decode can follow
            if i > 0x110000 * (len(output) + 1):
                raise ValueError("punycode overflow")
            t = max(_TMIN, min(k - bias, _TMAX))
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        i %= len(output) + 1
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            raise ValueError("punycode codepoint out of range")
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def decode_idn_host(host: str) -> tuple[str, int, bool]:
    """``host`` -> ``(unicode_host, n_idn_labels, decode_ok)``."""
    labels = host.split(".")
    n_idn, ok = 0, True
    out = []
    for lab in labels:
        if lab.startswith("xn--"):
            n_idn += 1
            try:
                out.append(punycode_decode(lab[4:]))
            except ValueError:
                ok = False
                out.append(lab)
        else:
            out.append(lab)
    if not ok:
        return host, n_idn, False
    return ".".join(out), n_idn, True


def _letter_counts(s: str) -> tuple[int, int]:
    latin = other = 0
    for ch in s:
        if ch.isalpha():
            if 0x41 <= ord(ch) <= 0x24F:
                latin += 1
            else:
                other += 1
    return latin, other


IDN_SCHEMA_SUFFIX = (
    "host_unicode string, n_idn_labels long, decode_ok boolean, "
    "latin_letters long, other_letters long, mixed_script boolean"
)


def idn_hosts(df: DataFrame, host_col: str = "host") -> DataFrame:
    """Append IDN-audit columns to ``df`` (shuffle-free mapInPandas)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + IDN_SCHEMA_SUFFIX

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            uni, nlab, ok, lat, oth, mix = [], [], [], [], [], []
            for h in b[host_col]:
                if h is None:
                    uni.append(None); nlab.append(0); ok.append(False)
                    lat.append(0); oth.append(0); mix.append(False)
                    continue
                u, n, good = decode_idn_host(h)
                la, ot = _letter_counts(u)
                uni.append(u); nlab.append(n); ok.append(good)
                lat.append(la); oth.append(ot)
                mix.append(la > 0 and ot > 0)
            b = b.copy()
            b["host_unicode"] = uni
            b["n_idn_labels"] = pd.array(nlab, dtype="int64")
            b["decode_ok"] = ok
            b["latin_letters"] = pd.array(lat, dtype="int64")
            b["other_letters"] = pd.array(oth, dtype="int64")
            b["mixed_script"] = mix
            yield b

    return df.mapInPandas(gen, schema)
