"""PDF text extraction — the north rule's "PDF/layout parse" leg.

From-scratch minimal PDF reader (no external libraries): object-scan
based (tolerant of broken/absent xref tables, which real crawled PDFs
frequently have), FlateDecode via zlib, and a content-stream text
interpreter covering the operators that carry text:

- ``BT``/``ET`` text blocks
- ``Tj`` (show string), ``TJ`` (show array with kerning numbers),
  ``'`` and ``"`` (next-line show)
- ``Td``/``TD``/``T*`` treated as line breaks between shows
- literal strings ``(...)`` with the full escape table (\\n \\r \\t
  \\b \\f \\( \\) \\\\ and octal \\ddd, plus line-continuation) and
  hex strings ``<...>``

String bytes decode as latin-1 — correct for the Standard/WinAnsi
simple fonts that dominate text PDFs. Composite fonts (CID/CMap,
ToUnicode) are out of scope and degrade to mojibake rather than
failure; at pipeline level a bad PDF yields an error row, never a
dead task (same policy as the HTML extract path).

The writer half (``pdf_bytes``) emits small valid PDFs (catalog /
page tree / Helvetica / per-page content streams, optionally
FlateDecoded, with a correct xref) for fixtures and oracles.

Spark surface: ``extract_pdf_text_df`` maps (doc_id, payload) batches
through the extractor inside ``mapInPandas`` — same Arrow-batched,
column-pruned shape as the HTML extract stage.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

# -- writer -------------------------------------------------------------------


def _esc(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_bytes(pages: list[str], compress: bool = False) -> bytes:
    """Serialize one text line per page into a minimal valid PDF."""
    objs: list[bytes] = []  # 1-indexed object bodies (without n 0 obj wrapper)
    n_pages = len(pages)
    # obj 1: catalog, obj 2: page tree, obj 3: font,
    # objs 4..3+n: pages, objs 4+n..3+2n: content streams
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n_pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + n_pages + i} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/MediaBox [0 0 612 792] >>".encode()
        )
    for text in pages:
        content = f"BT /F1 12 Tf 72 720 Td ({_esc(text)}) Tj ET".encode(
            "latin-1"
        )
        if compress:
            data = zlib.compress(content)
            objs.append(
                f"<< /Length {len(data)} /Filter /FlateDecode >>\n"
                f"stream\n".encode() + data + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


# -- reader -------------------------------------------------------------------

_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")
_OCTAL = frozenset(b"01234567")


def _read_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string at ``i``; returns (text,
    index-after). Handles nesting, the escape table, and octal."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in _OCTAL:
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and data[i] in _OCTAL:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # \( \) \\ and unknown escapes: literal char
                out.append(e)
                i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
        out.append(c)
        i += 1
    return out.decode("latin-1"), i  # unterminated: best effort


def _read_hex_string(data: bytes, i: int) -> tuple[str, int]:
    assert data[i : i + 1] == b"<"
    j = data.find(b">", i + 1)
    if j == -1:
        j = len(data)
    hx = bytes(
        ch for ch in data[i + 1 : j] if ch not in b" \t\r\n\f\0"
    ).decode("ascii", "replace")
    if len(hx) % 2:
        hx += "0"  # spec: odd final digit implies trailing 0
    try:
        raw = bytes.fromhex(hx)
    except ValueError:
        raw = b""
    return raw.decode("latin-1"), j + 1


def _content_text(data: bytes) -> str:
    """Run the text operators of one content stream; returns the shown
    text with line structure from Td/TD/T*/'/" breaks."""
    lines: list[str] = []
    cur: list[str] = []
    pend: list[str] = []
    i, n = 0, len(data)

    def break_line() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _read_literal_string(data, i)
            pend.append(s)
        elif c == 0x3C and data[i + 1 : i + 2] != b"<":  # < but not <<
            s, i = _read_hex_string(data, i)
            pend.append(s)
        elif c == 0x27:  # ' operator: next line + show
            break_line()
            cur.extend(pend)
            pend.clear()
            i += 1
        elif c == 0x22:  # " operator: aw ac string "
            break_line()
            cur.extend(pend)
            pend.clear()
            i += 1
        elif 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c == 0x2A:  # A-Za-z *
            j = i
            while j < n and (
                0x41 <= data[j] <= 0x5A
                or 0x61 <= data[j] <= 0x7A
                or data[j] == 0x2A
            ):
                j += 1
            op = data[i:j]
            if op == b"Tj":
                cur.extend(pend)
                pend.clear()
            elif op == b"TJ":
                cur.extend(pend)
                pend.clear()
            elif op in (b"Td", b"TD", b"T*"):
                break_line()
                pend.clear()
            elif op in (b"BT", b"ET"):
                pend.clear()
            i = j
        else:
            i += 1
    break_line()
    return "\n".join(lines)


def extract_pdf_text(payload: bytes) -> str:
    """All text shown by the document's content streams, in file
    order, pages/blocks separated by newlines. Raises ValueError on
    payloads that are not PDF."""
    payload = bytes(payload)
    if not payload.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    parts: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end == -1:
            end = len(payload)
        raw = payload[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
        # the owning dict sits between the previous 'obj' and 'stream'
        dict_start = payload.rfind(b"obj", 0, m.start())
        head = payload[dict_start : m.start()]
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue  # corrupt stream: skip, keep the rest
        if b"BT" not in raw:
            continue  # no text block (image/xobject/font stream)
        text = _content_text(raw)
        if text:
            parts.append(text)
    return "\n".join(parts)


PDF_TEXT_SCHEMA = "doc_id long, text string, error string"


def extract_pdf_text_df(media: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, text, error): Arrow-batched
    distributed PDF text extraction; a bad payload yields an error row
    (job survives dirty archives, same policy as the HTML path)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            ids, texts, errs = [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                ids.append(did)
                try:
                    texts.append(extract_pdf_text(bytes(p)))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — error-row policy
                    texts.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"doc_id": ids, "text": texts, "error": errs})

    return media.select("doc_id", "payload").mapInPandas(gen, PDF_TEXT_SCHEMA)
