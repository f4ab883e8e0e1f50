"""HTTP response-head parsing (ops/http.py): status line forms,
header field validity, duplicate preservation, obs-fold drop,
Content-Type / charset extraction, and the shuffle-free plan."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-http-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _parse(spark, raw):
    from hickoryspark.ops.http import parse_headers_df

    df = spark.createDataFrame([("u", raw)], "url string, raw string")
    return [
        (r["status"], r["field_pos"], r["name"], r["value"])
        for r in parse_headers_df(df).orderBy("field_pos").collect()
    ]


def test_basic_head_and_ows_trim(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "Content-Type:  text/html; charset=UTF-8 \r\n"
           "SERVER:\tnginx\t\r\n"
           "\r\n"
           "Body: not-a-header\r\nIgnored: yes")
    assert _parse(spark, raw) == [
        (200, 0, "content-type", "text/html; charset=UTF-8"),
        (200, 1, "server", "nginx"),
    ]


def test_duplicates_kept_in_order_and_bare_lf(spark):
    raw = ("HTTP/1.0 301 Moved Permanently\n"
           "Set-Cookie: a=1\n"
           "Location: /x\n"
           "Set-Cookie: b=2\n\n")
    assert _parse(spark, raw) == [
        (301, 0, "set-cookie", "a=1"),
        (301, 1, "location", "/x"),
        (301, 2, "set-cookie", "b=2"),
    ]


def test_invalid_lines_dropped_status_forms(spark):
    raw = ("HTTP/2 204\r\n"
           "X-Ok: fine\r\n"
           "Bad Line No Colon\r\n"
           "Spaced Name : nope\r\n"
           " folded-continuation\r\n"
           "empty-value:\r\n"
           "\r\n")
    assert _parse(spark, raw) == [
        (204, 0, "x-ok", "fine"),
        (204, 1, "empty-value", ""),
    ]


def test_headerless_valid_response_keeps_status(spark):
    """'HTTP/1.1 304 Not Modified' with no fields must emit one row
    (NULL field columns), not vanish (regression: posexplode dropped
    empty-array heads)."""
    assert _parse(spark, "HTTP/1.1 304 Not Modified\r\n\r\n") == [
        (304, None, None, None)
    ]


def test_invalid_status_line_yields_nothing(spark):
    from hickoryspark.ops.http import http_status
    from pyspark.sql import functions as F

    assert _parse(spark, "ICY 200 OK\r\nA: b\r\n\r\n") == []
    df = spark.createDataFrame(
        [("HTTP/1.1 20 OK\r\n\r\n",), ("",), ("HTTP/1.1 500\r\n\r\n",)],
        "raw string",
    )
    got = [r["s"] for r in
           df.select(http_status(F.col("raw")).alias("s")).collect()]
    assert got == [None, None, 500]


def test_content_type_and_charset(spark):
    from pyspark.sql import functions as F

    from hickoryspark.ops.http import charset_param, content_type

    cases = [
        ("HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=UTF-8\r\n\r\n",
         "text/html", "utf-8"),
        ("HTTP/1.1 200 OK\r\ncontent-type: text/plain;charset=\"ISO-8859-1\"\r\n\r\n",
         "text/plain", "iso-8859-1"),
        ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n",
         "application/json", None),
        # first Content-Type wins; charset from the SAME (first) header
        ("HTTP/1.1 200 OK\r\nContent-Type: a/b\r\nContent-Type: c/d; charset=x\r\n\r\n",
         "a/b", None),
        ("HTTP/1.1 200 OK\r\nServer: x\r\n\r\n", None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    got = df.select(
        content_type(F.col("raw")).alias("ct"),
        charset_param(F.col("raw")).alias("cs"),
    ).collect()
    for (_, ct, cs), r in zip(cases, got):
        assert r["ct"] == ct and r["cs"] == cs


def test_plan_is_narrow_map(spark):
    from hickoryspark.ops.http import parse_headers_df

    df = parse_headers_df(spark.createDataFrame(
        [("u", "HTTP/1.1 200 OK\r\nA: b\r\n\r\n")], "url string, raw string"
    ))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_x_robots_flags_unscoped_and_none(spark):
    from hickoryspark.ops.http import x_robots_flags

    df = spark.createDataFrame(
        [("u1", "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex, nofollow\r\n\r\n"),
         ("u2", "HTTP/1.1 200 OK\r\nX-Robots-Tag: noarchive\r\n"
                "X-Robots-Tag:  NONE \r\n\r\n"),
         ("u3", "HTTP/1.1 200 OK\r\nServer: x\r\n\r\n"),
         ("u4", "HTTP/1.1 204\r\n\r\n")],
        "url string, raw string")
    got = {r["url"]: (r["noindex"], r["nofollow"], r["status"])
           for r in x_robots_flags(df).collect()}
    assert got == {"u1": (True, True, 200), "u2": (True, True, 200),
                   "u3": (False, False, 200), "u4": (False, False, 204)}


def test_x_robots_flags_agent_scoping(spark):
    from hickoryspark.ops.http import x_robots_flags

    df = spark.createDataFrame(
        [("u1", "HTTP/1.1 200 OK\r\nX-Robots-Tag: googlebot: noindex\r\n\r\n"),
         ("u2", "HTTP/1.1 200 OK\r\nX-Robots-Tag: TestBot: nofollow\r\n\r\n"),
         # unavailable_after's colon is a directive, never an agent —
         # the trailing noindex must survive
         ("u3", "HTTP/1.1 200 OK\r\nX-Robots-Tag: "
                "unavailable_after: 2026-06-25, noindex\r\n\r\n")],
        "url string, raw string")
    got = {r["url"]: (r["noindex"], r["nofollow"])
           for r in x_robots_flags(df, agent="testbot").collect()}
    assert got == {"u1": (False, False), "u2": (False, True),
                   "u3": (True, False)}
    # agent=None: scoped rules never apply
    got_none = {r["url"]: (r["noindex"], r["nofollow"])
                for r in x_robots_flags(df).collect()}
    assert got_none["u2"] == (False, False)
    assert got_none["u3"] == (True, False)


def test_x_robots_colon_after_comma_never_scopes(spark):
    # 'noindex, unavailable_after: <date>' — the colon belongs to the
    # second directive's argument; treating the whole value as
    # agent-scoped would silently ship an opted-out page
    from hickoryspark.ops.http import x_robots_flags

    df = spark.createDataFrame(
        [("u1", "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex, "
                "unavailable_after: 25 Jun 2026 15:00:00 PST\r\n\r\n")],
        "url string, raw string")
    got = x_robots_flags(df).collect()[0]
    assert (got["noindex"], got["nofollow"]) == (True, False)


def _cookies(spark, raw):
    from hickoryspark.ops.http import parse_headers_df, set_cookies

    df = spark.createDataFrame([("u", raw)], "url string, raw string")
    return set_cookies(parse_headers_df(df)).orderBy("field_pos").collect()


def test_set_cookie_full_attributes(spark):
    rows = _cookies(
        spark,
        "HTTP/1.1 200 OK\r\nSet-Cookie: id=abc; Path=/; Secure; "
        "HttpOnly; SameSite=Lax; Max-Age=3600\r\n\r\n")
    assert len(rows) == 1
    r = rows[0]
    assert (r["cookie_name"], r["cookie_value"]) == ("id", "abc")
    assert (r["secure"], r["httponly"], r["samesite"]) == (1, 1, "lax")
    assert (r["max_age"], r["persistent"], r["samesite_insecure"]) == (
        3600, 1, 0)
    assert r["path"] == "/" and r["domain"] is None


def test_set_cookie_domain_fold_and_samesite_none(spark):
    r = _cookies(
        spark,
        "HTTP/1.1 200 OK\r\nSet-Cookie: s=x; Domain=.Example.COM; "
        "SameSite=None\r\n\r\n")[0]
    assert r["domain"] == "example.com"
    assert r["samesite"] == "none" and r["samesite_insecure"] == 1
    # only ONE leading dot is stripped (RFC 6265 5.2.3)
    r2 = _cookies(
        spark,
        "HTTP/1.1 200 OK\r\nSet-Cookie: s=x; Domain=..a.com\r\n\r\n")[0]
    assert r2["domain"] == ".a.com"


def test_set_cookie_invalid_forms(spark):
    # no '=' → dropped; empty name → dropped; last Path wins;
    # non-/ path → NULL; invalid Max-Age → NULL but Expires presence
    # still makes the cookie persistent
    rows = _cookies(
        spark,
        "HTTP/1.1 200 OK\r\n"
        "Set-Cookie: noequals\r\n"
        "Set-Cookie: =v; Secure\r\n"
        "Set-Cookie: b=2; Path=/a; Path=/b\r\n"
        "Set-Cookie: a=1; Path=rel; Max-Age=12x; "
        "Expires=Wed, 21 Oct 2015 07:28:00 GMT\r\n\r\n")
    assert [(r["cookie_name"], r["path"], r["max_age"], r["persistent"])
            for r in rows] == [("b", "/b", None, 0), ("a", None, None, 1)]
    # negative Max-Age is VALID per 5.2.2 (first char may be '-')
    r = _cookies(spark,
                 "HTTP/1.1 200 OK\r\nSet-Cookie: m=1; Max-Age=-5\r\n\r\n")[0]
    assert r["max_age"] == -5 and r["persistent"] == 1


def test_set_cookie_plan_is_narrow_map(spark):
    from hickoryspark.ops.http import parse_headers_df, set_cookies

    df = set_cookies(parse_headers_df(spark.createDataFrame(
        [("u", "HTTP/1.1 200 OK\r\nSet-Cookie: a=1\r\n\r\n")],
        "url string, raw string")))
    df.collect()
    assert "Exchange" not in \
        df._jdf.queryExecution().executedPlan().toString()


def _policy(spark, raw):
    from hickoryspark.ops.http import cache_policy, parse_headers_df

    df = spark.createDataFrame([("u", raw)], "url string, raw string")
    r = cache_policy(parse_headers_df(df)).collect()[0]
    return (r["ttl_s"], r["source"], r["revalidable"])


def test_cache_policy_directive_precedence(spark):
    h = "HTTP/1.1 200 OK\r\n"
    assert _policy(spark, h + "Cache-Control: max-age=500\r\n\r\n") == (
        500, "max-age", 0)
    assert _policy(
        spark, h + "Cache-Control: no-store, max-age=500\r\n\r\n"
    ) == (0, "no-store", 0)
    assert _policy(
        spark, h + "Cache-Control: private, no-cache\r\n\r\n"
    ) == (0, "no-cache", 0)
    assert _policy(
        spark, h + "Cache-Control: s-maxage=600, max-age=60\r\n\r\n"
    ) == (600, "s-maxage", 0)
    # repeated directive across headers: MAX wins (order-independent)
    assert _policy(
        spark, h + "Cache-Control: max-age=5\r\nCache-Control: "
        "max-age=900\r\n\r\n") == (900, "max-age", 0)
    # invalid numeric form (quoted / non-digit) is ignored
    assert _policy(
        spark, h + 'Cache-Control: max-age="60"\r\n\r\n') == (
        None, "none", 0)


def test_cache_policy_dates(spark):
    h = "HTTP/1.1 200 OK\r\n"
    assert _policy(
        spark, h + "Expires: Wed, 21 Oct 2015 08:28:00 GMT\r\n"
        "Date: Wed, 21 Oct 2015 07:28:00 GMT\r\n\r\n") == (
        3600, "expires", 0)
    # Expires before Date clamps to 0; bogus Expires = already past
    assert _policy(
        spark, h + "Expires: Wed, 21 Oct 2015 06:28:00 GMT\r\n"
        "Date: Wed, 21 Oct 2015 07:28:00 GMT\r\n\r\n") == (
        0, "expires", 0)
    assert _policy(
        spark, h + "Expires: -1\r\n"
        "Date: Wed, 21 Oct 2015 07:28:00 GMT\r\n\r\n") == (
        0, "expires", 0)
    # heuristic: (date - last_modified) / 10, floor; ETag → revalidable
    assert _policy(
        spark, h + "Date: Wed, 21 Oct 2015 07:28:00 GMT\r\n"
        "Last-Modified: Wed, 21 Oct 2015 06:28:01 GMT\r\n"
        "ETag: \"x\"\r\n\r\n") == (359, "heuristic", 1)
    # Date missing → no expires/heuristic path
    assert _policy(
        spark, h + "Expires: Wed, 21 Oct 2015 08:28:00 GMT\r\n\r\n"
    ) == (None, "none", 0)
    assert _policy(spark, h + "ETag: W/\"y\"\r\n\r\n") == (None, "none", 1)


def test_cache_policy_single_exchange(spark):
    from hickoryspark.ops.http import cache_policy, parse_headers_df

    df = cache_policy(parse_headers_df(spark.createDataFrame(
        [("u", "HTTP/1.1 200 OK\r\nCache-Control: max-age=1\r\n\r\n")],
        "url string, raw string")))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE toString repeats the plan under "== Initial Plan ==" — count
    # the final section only: exactly the one groupBy shuffle
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- #
# security_headers                                                  #
# ---------------------------------------------------------------- #

def _sec(spark, raw):
    from hickoryspark.ops.http import parse_headers_df, security_headers

    df = spark.createDataFrame([("u", raw)], "url string, raw string")
    r = security_headers(parse_headers_df(df)).collect()[0]
    return (r["hsts_max_age"], r["hsts_subdomains"], r["hsts_preload"],
            r["xfo"], r["nosniff"], r["referrer_policy"],
            r["n_protections"])


def test_security_headers_full_set(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "Strict-Transport-Security: max-age=31536000; "
           "includeSubDomains; preload\r\n"
           "X-Frame-Options: DENY\r\n"
           "X-Content-Type-Options: nosniff\r\n"
           "Referrer-Policy: no-referrer\r\n\r\n")
    assert _sec(spark, raw) == (
        31536000, 1, 1, "deny", 1, "no-referrer", 4)


def test_security_headers_absent(spark):
    raw = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    assert _sec(spark, raw) == (None, None, None, None, 0, None, 0)


def test_hsts_quoted_and_case(spark):
    # quoted max-age value is valid (RFC 6797 directive grammar);
    # names case-insensitive; unknown directives ignored
    raw = ('HTTP/1.1 200 OK\r\n'
           'Strict-Transport-Security: Max-Age="600"; PRELOAD; x=y\r\n'
           '\r\n')
    assert _sec(spark, raw)[:3] == (600, 0, 1)


def test_hsts_repeated_known_directive_invalid(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "Strict-Transport-Security: max-age=600; "
           "includeSubDomains; includeSubDomains\r\n\r\n")
    assert _sec(spark, raw)[:3] == (None, None, None)


def test_hsts_missing_or_bad_max_age_invalid(spark):
    for sts in ("includeSubDomains",
                "max-age=1x",
                "max-age=600; max-age=700",
                'max-age="12'):
        raw = f"HTTP/1.1 200 OK\r\nStrict-Transport-Security: {sts}\r\n\r\n"
        assert _sec(spark, raw)[:3] == (None, None, None), sts


def test_hsts_first_field_only(spark):
    # RFC 6797 §8.1: only the first STS field is noted — a later
    # valid field cannot rescue an invalid first one
    raw = ("HTTP/1.1 200 OK\r\n"
           "Strict-Transport-Security: includeSubDomains\r\n"
           "Strict-Transport-Security: max-age=600\r\n\r\n")
    assert _sec(spark, raw)[:3] == (None, None, None)


def test_hsts_max_age_zero_not_a_protection(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "Strict-Transport-Security: max-age=0\r\n\r\n")
    got = _sec(spark, raw)
    assert got[:3] == (0, 0, 0) and got[6] == 0


def test_xfo_forms(spark):
    base = "HTTP/1.1 200 OK\r\nX-Frame-Options: %s\r\n\r\n"
    assert _sec(spark, base % " SAMEORIGIN ")[3] == "sameorigin"
    assert _sec(spark, base % "ALLOW-FROM https://x")[3] == "invalid"
    assert _sec(spark, base % "deny;")[3] == "invalid"


def test_nosniff_with_parameters(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "X-Content-Type-Options: NoSniff; charset=utf-8\r\n\r\n")
    assert _sec(spark, raw)[4] == 1


def test_referrer_policy_last_recognized_across_fields(spark):
    raw = ("HTTP/1.1 200 OK\r\n"
           "Referrer-Policy: origin\r\n"
           "Referrer-Policy: bogus, unsafe-url,\r\n\r\n")
    assert _sec(spark, raw)[5] == "unsafe-url"


def test_referrer_policy_none_recognized(spark):
    raw = "HTTP/1.1 200 OK\r\nReferrer-Policy: bogus\r\n\r\n"
    assert _sec(spark, raw)[5] is None


def test_security_headers_single_exchange(spark):
    from hickoryspark.ops.http import parse_headers_df, security_headers

    df = security_headers(parse_headers_df(spark.createDataFrame(
        [("u", "HTTP/1.1 200 OK\r\nX-Frame-Options: DENY\r\n\r\n")],
        "url string, raw string")))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one hash agg pair, AQE-coalesced
