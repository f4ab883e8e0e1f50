"""NFKC compatibility audit (ops/textnorm.nfkc_stats)."""

from __future__ import annotations

import os
import sys
import unicodedata

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FW = "ｆｏｏ"   # fullwidth 'foo'
LIG = "ﬁ"              # fi ligature
SUP = "²"              # superscript two (NFKC -> '2')


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-nfkc-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows):
    from hickoryspark.ops.textnorm import nfkc_stats

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in nfkc_stats(df).collect())


def test_counts_against_unicodedata(spark):
    texts = {
        1: "plain ascii",
        2: f"x {FW} y",
        3: f"the {LIG}ne print",
        4: f"area{SUP}",
        5: "",
    }
    rows = list(texts.items()) + [(6, None)]
    got = _run(spark, rows)
    exp = []
    for d, t in sorted(texts.items()):
        norm = unicodedata.normalize("NFKC", t)
        nf = sum(1 for c in t
                 if "！" <= c <= "｠" or "￠" <= c <= "￦")
        ng = sum(1 for c in t if "ﬀ" <= c <= "ﬆ")
        exp.append((d, len(t), len(norm),
                    1 if norm != t else 0, nf, ng))
    assert got == exp
    # the ligature expands: nfkc_len > n_chars for doc 3
    by = {r[0]: r for r in got}
    assert by[3][2] == by[3][1] + 1 and by[3][3] == 1
    assert by[2][4] == 3 and by[2][3] == 1
    assert by[4][3] == 1 and by[4][2] == by[4][1]
    assert by[1][3] == 0
