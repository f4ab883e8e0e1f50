"""Emoji audit (ops/emoji.py): class membership, ZWJ join-edge
counting on chains, astral code-point lengths, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.emoji import duckdb_emoji_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-emoji-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


TEXTS = [
    "plain prose, no symbols",
    "party \U0001F389 and grin \U0001F600!",               # 2 emoji
    "flag \U0001F1EF\U0001F1F5 pair",                      # 2 flag points
    # family ZWJ chain: 4 emoji, 3 join edges
    "fam \U0001F468‍\U0001F469‍\U0001F467‍\U0001F466",
    "sun ☀ and snowman ☃ bmp blocks",            # BMP emoji
    "lone zwj a‍b joins nothing",                     # 0 joins
    "",                                                     # NULL ppm
    None,                                                   # dropped
]


def _spark_rows(spark, texts):
    from hickoryspark.ops.emoji import emoji_audit

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(tuple(r) for r in emoji_audit(df).collect())


def _duck_rows(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)",
                    list(enumerate(texts)))
    return sorted(tuple(r) for r in
                  con.execute(duckdb_emoji_sql("src")).fetchall())


def test_counts(spark):
    rows = {r[0]: r for r in _spark_rows(spark, TEXTS)}
    assert rows[0][2:] == (0, 0, 0, 0, 0)
    assert rows[1][2] == 2 and rows[1][6] == 1
    assert rows[2][2:5] == (0, 2, 0) and rows[2][6] == 1
    # chain: 4 emoji people, 3 ZWJ join edges
    assert rows[3][2] == 4 and rows[3][4] == 3
    assert rows[4][2] == 2            # BMP misc-symbols block
    assert rows[5][2:5] == (0, 0, 0)  # ZWJ not followed by emoji
    assert rows[6][1] == 0 and rows[6][5] is None
    assert 7 not in rows              # NULL text dropped


def test_astral_char_length(spark):
    # n_chars must be code points, not UTF-16 units: one astral emoji
    # in a 5-char string
    rows = _spark_rows(spark, ["abcd\U0001F600"])
    assert rows[0][1] == 5
    assert rows[0][5] == 1000000 * 1 // 5


def test_mirror_agreement(spark):
    assert _spark_rows(spark, TEXTS) == _duck_rows(TEXTS)


def test_plan_shuffle_free(spark):
    from hickoryspark.ops.emoji import emoji_audit

    df = spark.createDataFrame(
        [(0, "x \U0001F600")], "doc_id long, text string")
    plan = emoji_audit(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
