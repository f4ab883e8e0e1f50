"""Public-suffix registered-domain extraction (ops/psl.py): PSL rule
semantics (exact/wildcard/exception/implicit-*), the expression vs
joined execution paths, and the DuckDB mirror."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-psl-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# (host, public_suffix, registered_domain) under DEFAULT_RULES
CASES = [
    ("example.com", "com", "example.com"),
    ("a.b.example.com", "com", "example.com"),
    ("com", "com", None),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),
    ("uk", "uk", None),
    ("proj.github.io", "github.io", "proj.github.io"),
    ("deep.proj.github.io", "github.io", "proj.github.io"),
    ("github.io", "github.io", None),
    # wildcard *.ck: any single label under ck is a public suffix
    ("b.ck", "b.ck", None),
    ("x.b.ck", "b.ck", "x.b.ck"),
    ("deep.x.b.ck", "b.ck", "x.b.ck"),
    ("ck", "ck", None),
    # exception !www.ck: registrable despite the wildcard
    ("www.ck", "ck", "www.ck"),
    ("a.www.ck", "ck", "www.ck"),
    # unlisted TLD -> implicit '*'
    ("example.zz", "zz", "example.zz"),
    ("a.example.zz", "zz", "example.zz"),
    ("zz", "zz", None),
    ("localhost", "localhost", None),
    # IP literals: no registered domain
    ("192.168.0.1", None, None),
    ("[2001:db8::1]", None, None),
    ("", None, None),
    (None, None, None),
]


def _run_expr(spark, hosts):
    from hickoryspark.ops.psl import registered_domains

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = registered_domains(df).collect()
    return {r["host"]: (r["public_suffix"], r["registered_domain"])
            for r in rows}


def test_expression_path_cases(spark):
    got = _run_expr(spark, [c[0] for c in CASES])
    for host, ps, rd in CASES:
        assert got[host] == (ps, rd), host


def test_joined_path_matches_expression(spark):
    from hickoryspark.ops.psl import (registered_domains,
                                      registered_domains_joined)

    hosts = [c[0] for c in CASES if c[0]] + [
        "x.y.z.w.example.org", "sub.blogspot.com", "blogspot.com",
        "a.herokuapp.com", "www.gov.uk", "service.gov.uk",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    a = {r["host"]: (r["public_suffix"], r["registered_domain"])
         for r in registered_domains(df).collect()}
    b = {r["host"]: (r["public_suffix"], r["registered_domain"])
         for r in registered_domains_joined(df).collect()}
    assert a == b


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.psl import (duckdb_public_suffix_sql,
                                      duckdb_registered_sql)

    hosts = [c[0] for c in CASES if c[0] is not None]
    got = _run_expr(spark, hosts)
    con = duckdb.connect()
    con.execute("CREATE TABLE h(host VARCHAR)")
    con.executemany("INSERT INTO h VALUES (?)", [(h,) for h in hosts])
    sql = (f"SELECT host, {duckdb_public_suffix_sql('host')} AS ps, "
           f"{duckdb_registered_sql('host')} AS rd FROM h")
    for host, ps, rd in con.execute(sql).fetchall():
        assert got[host] == (ps, rd), host


def test_custom_rules_and_parse_errors(spark):
    from hickoryspark.ops.psl import parse_rules, registered_domains

    df = spark.createDataFrame([("a.b.custom",), ("b.custom",)],
                               "host string")
    rows = {r["host"]: r["registered_domain"]
            for r in registered_domains(
                df, rules=["custom", "b.custom"]).collect()}
    assert rows == {"a.b.custom": "a.b.custom", "b.custom": None}
    assert parse_rules(["// comment", "", "com"]) == [("exact", "com", 1)]
    with pytest.raises(ValueError):
        parse_rules([".bad"])


def test_no_shuffle_in_expression_path(spark):
    from hickoryspark.ops.psl import registered_domains

    df = spark.createDataFrame([("a.example.com",)], "host string")
    plan = registered_domains(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
