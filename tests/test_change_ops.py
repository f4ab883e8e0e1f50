"""Dehyphenation (textnorm), snapshot line similarity (snapshots),
code clone groups (codeblocks) — incl. DuckDB-mirror cross-checks."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-changeops-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ------------------------------------------------------------ dehyphenate

DEHYPH_CASES = [
    ("exam-\nple", "example"),           # basic join
    ("exam-\r\nple", "example"),         # CRLF
    ("well-\nKnown", "well-\nKnown"),    # uppercase after break: keep
    ("5-\nyear", "5-\nyear"),            # digit before hyphen: keep
    ("so­ft", "soft"),              # soft hyphen removed
    ("a-\nb-\nc", "ab-\nc"),             # single pass by design
    ("no break", "no break"),
    ("", ""),
]


def test_dehyphenate_cases(spark):
    from hickoryspark.ops.textnorm import dehyphenate

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(DEHYPH_CASES)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["fixed"], r["changed"])
           for r in dehyphenate(df).collect()}
    for i, (t, want) in enumerate(DEHYPH_CASES):
        assert got[i][0] == want, (t, got[i][0], want)
        assert got[i][1] == (1 if want != t else 0)


def test_dehyphenate_mirror(spark):
    from hickoryspark.ops.textnorm import dehyphenate, duckdb_dehyphenate_sql

    con = duckdb.connect()
    for t, want in DEHYPH_CASES:
        (mir,) = con.execute(
            "SELECT " + duckdb_dehyphenate_sql("?"), [t]).fetchone()
        assert mir == want, (t, mir, want)


# ----------------------------------------------------- delta line similarity

def _sim(spark, old_rows, new_rows):
    from hickoryspark.ops.snapshots import delta_line_similarity

    o = spark.createDataFrame(old_rows, "url string, text string")
    n = spark.createDataFrame(new_rows, "url string, text string")
    return {r["url"]: tuple(r)[1:] for r in
            delta_line_similarity(o, n).collect()}


def test_line_similarity_basics(spark):
    got = _sim(
        spark,
        [("same", "a\nb"), ("disjoint", "a\nb"), ("part", "a\nb\nc"),
         ("empty", ""), ("only_old", "x")],
        [("same", "b\na"), ("disjoint", "c\nd"), ("part", "b\nc\nd"),
         ("empty", None), ("only_new", "y")],
    )
    assert got == {
        "same": (2, 2, 2, 1000),
        "disjoint": (2, 2, 0, 0),
        "part": (3, 3, 2, 500),
        "empty": (0, 0, 0, 1000),
    }


def test_line_similarity_trim_and_distinct(spark):
    # trimmed duplicates collapse; blank lines don't count
    got = _sim(spark, [("u", " a \na\n\n\t\nb")], [("u", "a\r\nc")])
    assert got == {"u": (2, 2, 1, 333)}


def test_line_similarity_mirror(spark):
    import random

    from hickoryspark.ops.snapshots import duckdb_line_similarity_sql

    rng = random.Random(7)
    vocab = ["alpha", "beta ", " gamma", "d\te", ""]
    olds, news = [], []
    for i in range(40):
        mk = lambda: "\n".join(rng.choice(vocab)
                               for _ in range(rng.randrange(0, 6)))
        if rng.random() < 0.8:
            olds.append((f"u{i}", mk() if rng.random() < 0.9 else None))
        if rng.random() < 0.8:
            news.append((f"u{i}", mk() if rng.random() < 0.9 else None))
    got = _sim(spark, olds, news)
    con = duckdb.connect()
    con.execute("CREATE TABLE o(url VARCHAR, text VARCHAR)")
    con.execute("CREATE TABLE n(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO o VALUES (?, ?)", olds)
    con.executemany("INSERT INTO n VALUES (?, ?)", news)
    mir = {r[0]: tuple(r)[1:] for r in con.execute(
        duckdb_line_similarity_sql("o", "n")).fetchall()}
    assert got == mir


# ------------------------------------------------------------- code clones

def test_code_clone_groups(spark):
    from hickoryspark.ops.codeblocks import code_clone_groups

    rows = [
        ("p1", "pip install x"),
        ("p2", "pip install x  \n"),   # normalizes to the same key
        ("p2", "pip install x"),       # second block, same page
        ("p3", "unique snippet"),
        ("p4", "solo"), ("p4", "solo"),  # same page twice: n_pages=1
    ]
    df = spark.createDataFrame(rows, "url string, code string")
    got = {r["code_md5"]: (r["n_blocks"], r["n_pages"], r["first_url"],
                           r["n_chars"])
           for r in code_clone_groups(df).collect()}
    import hashlib
    key = hashlib.md5(b"pip install x").hexdigest()
    assert got == {key: (3, 2, "p1", 13)}


def test_code_clone_norm_mirror(spark):
    from hickoryspark.ops.codeblocks import duckdb_clone_norm_sql

    con = duckdb.connect()
    for raw, want in [
        ("  a  \nb\t\n\n", "a\nb"),
        ("\n\nx\n", "x"),
        ("plain", "plain"),
    ]:
        (mir,) = con.execute(
            "SELECT " + duckdb_clone_norm_sql("?"), [raw]).fetchone()
        assert mir == want, (raw, mir, want)
