"""PDF text extraction (ops/pdf.py): writer/reader roundtrip, string
escapes, FlateDecode, dirty-payload tolerance, distributed op."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.pdf import extract_pdf_text, pdf_bytes


def test_roundtrip_multipage_plain_and_compressed():
    pages = ["Doc 7 from web", "Page 2 #7", "third page"]
    assert extract_pdf_text(pdf_bytes(pages)) == "\n".join(pages)
    assert extract_pdf_text(pdf_bytes(pages, compress=True)) == "\n".join(pages)


def test_escapes_parens_backslashes_survive():
    pages = ["parens (nested (deep)) and \\ backslash", "tab\there"]
    assert extract_pdf_text(pdf_bytes(pages)) == "\n".join(pages)


def test_literal_string_escape_table_and_hex():
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n"
        b"BT (a\\nb\\164c\\\\d\\(e\\)) Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text(raw) == "a\nbtc\\d(e)"
    raw2 = b"%PDF-1.4\n1 0 obj\n<< >>\nstream\nBT <48 65 6C6C 6F> Tj ET\nendstream\n"
    assert extract_pdf_text(raw2) == "Hello"


def test_tj_array_with_kerning_numbers():
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n"
        b"BT [(ke)-120(rn)8(ed)] TJ ET\nendstream\n"
    )
    assert extract_pdf_text(raw) == "kerned"


def test_quote_operators_break_lines():
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n"
        b"BT (one) Tj (two) ' ET\nendstream\n"
    )
    assert extract_pdf_text(raw) == "one\ntwo"


def test_corrupt_flate_stream_skipped_not_fatal():
    good = pdf_bytes(["survivor"])
    bad = (
        b"%PDF-1.4\n9 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
        b"\x00notzlib\x00BT\nendstream\nendobj\n"
    )
    assert extract_pdf_text(bad + good) == "survivor"


def test_non_pdf_raises_value_error():
    with pytest.raises(ValueError):
        extract_pdf_text(b"<html>not pdf</html>")


def test_endstream_word_not_matched_as_stream_start():
    # 'endstream\n' must not open a phantom stream that swallows the
    # next object (regression for the (?<!end) lookbehind)
    pages = ["first", "second"]
    assert extract_pdf_text(pdf_bytes(pages)) == "first\nsecond"


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="driver testdata not present"
)
def test_extract_pdf_text_df_distributed_with_error_rows():
    from hickoryspark.spark.session import get_spark
    from hickoryspark.ops.pdf import extract_pdf_text_df

    spark = get_spark(4, app_name="hickoryspark-pdf-tests", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [(i, pdf_bytes([f"p{i}"], compress=bool(i % 2))) for i in range(20)]
    rows.append((99, b"not a pdf at all"))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_pdf_text_df(media).collect()}
    for i in range(20):
        assert got[i]["text"] == f"p{i}" and got[i]["error"] is None
    assert got[99]["text"] is None and "ValueError" in got[99]["error"]
