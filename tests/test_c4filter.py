"""C4 line/page filter (ops/c4filter.py): line rules, page reasons,
priority, NULL text, mirror agreement."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-c4-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


GOOD = "one two three four five six."
ROWS = [
    (0, f"{GOOD}\n{GOOD}\n{GOOD}"),                    # kept, 3 sentences
    (1, f"{GOOD}\nshort line.\n{GOOD}\n{GOOD}"),       # <5 words line drops
    (2, f"{GOOD}\nno terminal punct here at all\n{GOOD}\n{GOOD}"),
    (3, f"{GOOD}\nthis uses JavaScript a lot today.\n{GOOD}\n{GOOD}"),
    (4, f"{GOOD} trailing ws line.   \n{GOOD}\n{GOOD}"),  # rstrip then punct
    (5, f"{GOOD}\n{GOOD}"),                            # 2 sentences: drop doc
    (6, f"Lorem Ipsum dolor sit amet.\n{GOOD}\n{GOOD}\n{GOOD}"),
    (7, f"{GOOD} {{x}}\n{GOOD}\n{GOOD}"),              # brace page
    (8, None),                                         # NULL text
    (9, f'he said "five words right here!"\n{GOOD}\n{GOOD}'),  # quote end
]


def _run(spark):
    from hickoryspark.ops.c4filter import c4_line_filter

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}


def test_line_rules(spark):
    out = _run(spark)
    assert out[0]["n_lines_kept"] == 3 and out[0]["keep_doc"]
    assert out[1]["n_lines_kept"] == 3 and out[1]["n_lines_removed"] == 1
    assert out[2]["n_lines_kept"] == 3
    assert out[3]["n_lines_kept"] == 3  # javascript line dropped
    assert out[4]["n_lines_kept"] == 3  # trailing ws rstripped
    assert out[9]["n_lines_kept"] == 3  # quote is terminal


def test_page_reasons_and_priority(spark):
    out = _run(spark)
    assert out[5]["drop_reason"] == "few_sentences"
    assert out[6]["drop_reason"] == "lorem_ipsum"
    assert out[7]["drop_reason"] == "brace"
    assert out[8] == {
        "doc_id": 8, "text": "", "n_lines_kept": 0,
        "n_lines_removed": 1, "n_sentences": 0, "keep_doc": False,
        "drop_reason": "few_sentences"}
    kept = {d for d, r in out.items() if r["keep_doc"]}
    assert kept == {0, 1, 2, 3, 4, 9}


def test_kept_text_joins_in_order(spark):
    out = _run(spark)
    assert out[1]["text"] == f"{GOOD}\n{GOOD}\n{GOOD}"


def test_mirror_agrees(spark):
    import duckdb

    from hickoryspark.ops.c4filter import duckdb_c4_sql

    got = _run(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", ROWS)
    cols = ("doc_id", "text", "n_lines_kept", "n_lines_removed",
            "n_sentences", "keep_doc", "drop_reason")
    for row in con.execute(duckdb_c4_sql("d")).fetchall():
        want = dict(zip(cols, row))
        assert got[want["doc_id"]] == want, want["doc_id"]
