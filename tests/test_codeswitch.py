"""Paragraph-level language segmentation (ops/codeswitch.py)."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EN, DE, FR, UNK = "the and ing", "der ein und", "les des que", "zz qq"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-codeswitch-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _stats(spark, rows):
    from hickoryspark.ops.codeswitch import codeswitch_stats

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in codeswitch_stats(df).collect())


def _mirror(rows):
    from hickoryspark.ops.codeswitch import duckdb_codeswitch_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", rows)
    got = con.execute(duckdb_codeswitch_sql("docs")).fetchall()
    con.close()
    return sorted(tuple(r) for r in got)


def test_paragraph_langs(spark):
    from hickoryspark.ops.codeswitch import paragraph_langs

    df = spark.createDataFrame(
        [(1, f"{EN}\n\n\n{DE}\n\n  \n\n{FR}")],
        "doc_id long, text string")
    got = sorted(tuple(r) for r in paragraph_langs(df).collect())
    # pos 2 is the whitespace-only paragraph (dropped, gap kept)
    assert got == [(1, 0, "en", len(EN)), (1, 1, "de", len(DE)),
                   (1, 3, "fr", len(FR))]


def test_stats_switches_and_primary(spark):
    rows = [
        (1, f"{EN}\n\n{DE}\n\n{EN}"),        # en,de,en: 2 switches
        (2, f"{EN}\n\n{EN}\n\n{EN}"),        # no switches
        (3, f"{UNK}\n\n{FR}"),               # unk transparent
        (4, f"{DE}\n\n{UNK}\n\n{DE}\n\n{FR}"),  # unk between de,de
        (5, f"{EN}\n\n{DE}"),                # tie count -> min lang
        (6, "\n\n \n\n"),                    # all empty: no row
        (7, UNK),                            # all unk: NULL primary
    ]
    got = _stats(spark, rows)
    exp = [
        (1, 3, 3, "en", 2, 1),
        (2, 3, 3, "en", 0, 0),
        (3, 2, 1, "fr", 0, 0),
        (4, 4, 3, "de", 1, 1),
        (5, 2, 2, "de", 1, 1),
        (7, 1, 0, None, 0, 0),
    ]
    assert got == exp
    assert got == _mirror(rows)


def test_fuzz_vs_mirror(spark):
    rng = random.Random(11)
    blocks = [EN, DE, FR, UNK, "", " ", "the und que",
              "der the", "ing sch oir"]
    rows = []
    for i in range(40):
        n = rng.randint(0, 6)
        rows.append((i, "\n\n".join(rng.choice(blocks)
                                    for _ in range(n))))
    assert _stats(spark, rows) == _mirror(rows)
