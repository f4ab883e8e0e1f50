"""IDN punycode audit (ops/idn.py): RFC 3492 vectors, round-trip and
accept/reject fuzz vs CPython's punycode codec (the INDEPENDENT
oracle), surrogate rejection, host splitting, letter-script counts,
and the Spark mapInPandas path."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.idn import (  # noqa: E402
    punycode_decode, decode_idn_host, _letter_counts)


def test_rfc3492_sample_vectors():
    assert punycode_decode("egbpdaj6bu4bxfgehfvwxn") == "ليهمابتكلموشعربي؟"
    assert punycode_decode("ihqwcrb4cv8a8dqg056pqjye") == "他们为什么不说中文"
    assert punycode_decode("de-jg4avhby1noc0d") == "パフィーdeルンバ"
    assert punycode_decode("mnchen-3ya") == "münchen"
    assert punycode_decode("80ak6aa92e") == "аррӏе"
    # extended digits are case-insensitive, but basic (literal) code
    # points keep their case (RFC 3492 §6.2; matches CPython's codec)
    assert punycode_decode("MNCHEN-3YA") == "MüNCHEN"


def test_malformed_labels_raise():
    for bad in ["999999999", "zzzzzzzzzzzz", "a b", "é", "x" * 300,
                "99999999999999999999"]:
        with pytest.raises(ValueError):
            punycode_decode(bad)


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs",),
        max_codepoint=0x10FFFF),
    min_size=1, max_size=40))
def test_roundtrip_fuzz_vs_codec(s):
    enc = s.encode("punycode").decode("ascii")
    assert punycode_decode(enc) == s


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-",
               max_size=24))
def test_ascii_accept_reject_fuzz_vs_codec(raw):
    try:
        want = raw.encode("ascii").decode("punycode")
        codec_ok = True
    except Exception:
        codec_ok = False
    try:
        got = punycode_decode(raw)
        mine_ok = True
    except ValueError:
        mine_ok = False
    if codec_ok and any(0xD800 <= ord(c) <= 0xDFFF for c in want):
        # pinned divergence: the codec emits lone surrogates, we
        # reject them (Arrow cannot serialize them — sitemaps lesson)
        assert not mine_ok
    else:
        assert codec_ok == mine_ok
        if codec_ok:
            assert got == want


def test_decode_idn_host():
    assert decode_idn_host("xn--mnchen-3ya.example") == (
        "münchen.example", 1, True)
    assert decode_idn_host("xn--mnchen-3ya.xn--bcher-kva.example") == (
        "münchen.bücher.example", 2, True)
    # any failed label -> ASCII host unchanged, ok=False
    assert decode_idn_host("xn--zzzzzzzzzzzz.example") == (
        "xn--zzzzzzzzzzzz.example", 1, False)
    assert decode_idn_host("plain.example") == ("plain.example", 0, True)


def test_letter_counts():
    assert _letter_counts("münchen") == (7, 0)      # ü is Latin
    assert _letter_counts("аррӏе") == (0, 5)        # pure Cyrillic
    assert _letter_counts("pаypal") == (5, 1)       # homograph mix
    assert _letter_counts("x1-2.y") == (2, 0)       # digits don't count


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-idn-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_idn_hosts_df(spark):
    from hickoryspark.ops.idn import idn_hosts

    df = spark.createDataFrame(
        [("a", "xn--pypal-4ve.example"),
         ("b", "plain.example"),
         ("c", "xn--99999999.example"),
         ("d", None)],
        "k string, host string")
    rows = {r["k"]: r for r in idn_hosts(df).collect()}
    assert rows["a"]["host_unicode"] == "pаypal.example"
    assert rows["a"]["mixed_script"] is True
    assert rows["a"]["decode_ok"] is True and rows["a"]["n_idn_labels"] == 1
    assert rows["b"]["host_unicode"] == "plain.example"
    assert rows["b"]["mixed_script"] is False
    assert rows["c"]["decode_ok"] is False
    assert rows["c"]["host_unicode"] == "xn--99999999.example"
    assert rows["d"]["host_unicode"] is None and rows["d"]["decode_ok"] is False
