"""URL canonicalization — the web-pipeline dedup key.

Crawls see the same page under many url spellings (case-varying
scheme/host, explicit default ports, tracking parameters, fragments,
trailing slashes). ``normalize_url`` folds those to one canonical
form with pure column expressions (whole-stage codegen, zero Python).
The regex pipeline uses only constructs shared by Spark (Java regex)
and DuckDB (RE2) — no lookaround, numbered groups only — so the
DuckDB oracle (``DUCKDB_NORMALIZE_SQL``) runs the identical program;
the two templates differ solely in backreference spelling ($1 vs \\1).

Normalization steps, in order:
0. remove ASCII tab/newline/CR anywhere in the url (WHATWG URL
   preprocessing; CPython's urlsplit/urljoin do the same)
1. lowercase the scheme://host prefix (path/query case is preserved)
2. fold RFC 3986 §5.2.4 dot-segments out of the path
   (``remove_dot_segments`` below — query/fragment untouched)
3. drop an explicit default port (:443 on https, :80 on http)
4. drop the fragment (#...)
5. drop tracking query params (utm_*, fbclid, gclid), tidying the
   separators they leave behind; a now-empty '?' is dropped
6. drop one trailing slash (including the bare host-root slash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

#: WHATWG URL / CPython urllib (bpo-43882): ASCII tab and newlines are
#: removed from a URL before any parsing. urljoin — the fuzz oracle —
#: strips them, and stripping up front also keeps every later pattern
#: on the single-line inputs where Java regex ('$' matches before a
#: final '\n') and RE2 ('$' is end-of-text) agree.
_UNSAFE_RE = r"[\t\n\r]"

# ---------------------------------------------------------------------------
def let_(value: Column, body) -> Column:
    """Column-level let binding: ``transform(array(value), body)[0]``.

    Evaluates ``value`` ONCE per row and hands it to ``body`` as a
    lambda variable — a LEAF in ``body``'s expression tree. Composing
    Column builders by splicing (``normalize_url(resolve_href(...))``)
    copies the argument's whole tree into EVERY reference the outer
    builder makes: measured on the real normalize∘resolve composition,
    the optimized plan grew to 2.58 MB with 49,895 regexp_replace
    nodes (56x the let-bound 845) and evaluated the resolve subtree
    several times per row — 4.5s vs 0.7s for 60k rows. The binding
    also removes the 64 KB whole-stage-codegen cliff for heavy regex
    programs: higher-order functions are CodegenFallback, so the body
    is evaluated by the (lazy — CaseWhen branches short-circuit)
    interpreted evaluator instead of being emitted into one giant
    janino method. The array is length-1, so the documented
    per-element HOF interpretation cost is once per row."""
    return F.transform(F.array(value), body)[0]


# RFC 3986 §5.2.4 remove_dot_segments, as a bounded regexp-pass program
# shared verbatim (same patterns, same pass count) with the DuckDB
# mirror — constructs restricted to the Java-regex/RE2 intersection
# (no lookaround, literal replacements only).
# ---------------------------------------------------------------------------

#: folding bound: each pass removes one '/../' nesting level per chain,
#: so chains up to FOLD_PASSES deep fold completely. Real-world URLs
#: stay far below this; a hostile deeper chain is left PARTIALLY folded
#: — non-canonical but never a wrong authority or a crossed query.
FOLD_PASSES = 16

#: a path segment that is NOT '..' (and, after the '.'-removal passes,
#: not '.'): starts with a non-dot, or '.x...', or '..x...', or empty
_NOT_DOTDOT = r"([^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+|)"

#: the ordered (pattern, replacement) program. Trailing '/..' and '/.'
#: first (RFC: they leave a trailing slash), then '/./' runs, then
#: FOLD_PASSES x (fold one '/seg/../' per chain; DELETE root-excess
#: leading '../' — CPython's stack pops the root empty segment, so
#: '/..//X' is '/X', which the trailing slash re-add restores; the
#: urljoin fuzz pins this against the stdlib implementation).
_FOLD_STEPS: list[tuple[str, str]] = (
    [
        # \z (end-of-TEXT in both Java regex and RE2), never $: on a
        # path with an embedded newline, Java's $ also matches before
        # a final '\n' while RE2's does not — the engines must agree
        # byte-for-byte even on hostile raw input.
        (r"/\.\.\z", "/../"),
        (r"/\.\z", "/"),
        (r"(/\.)+/", "/"),
    ]
    + [
        step
        for _ in range(FOLD_PASSES)
        for step in (
            ("/" + _NOT_DOTDOT + r"/\.\./", "/"),
            (r"^/\.\./", ""),
            (r"^\.\./", ""),
        )
    ]
)


def _fold_path(p: Column) -> Column:
    orig = p
    for pat, rep in _FOLD_STEPS:
        p = F.regexp_replace(p, pat, rep)
    # root-excess deletions can strip the leading '/' (or everything):
    # re-add it for originally-rooted paths. Prepend + collapse one
    # leading '//' is an identity when the fold kept the slash.
    return F.when(
        orig.startswith("/"),
        F.regexp_replace(F.concat(F.lit("/"), p), "^//", "/"),
    ).otherwise(p)


def remove_dot_segments(u: str | Column) -> Column:
    """Fold '.' / '..' segments out of the PATH of a full url string.

    The scheme://authority prefix is protected (a pattern must never
    eat the '//h/../' of an authority) and the query/fragment tail is
    split off untouched (a '/../' inside '?k=a/../b' is data, not a
    path segment). Clean paths (no '/.') skip the whole program —
    the fold is let-bound and LAZY, so clean rows never execute it.
    """
    u = F.col(u) if isinstance(u, str) else u
    return let_(u, _rds_body)


def _rds_body(u: Column) -> Column:
    pre = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.substring(u, F.length(pre) + 1, F.length(u))
    # [\s\S] tails, not '.*$': '.' stops at '\n' in both dialects and
    # '$' disagrees across them, so a query with an embedded newline
    # would split differently per engine (review repro)
    tail = F.regexp_extract(rest, r"([?#][\s\S]*)", 1)
    path = F.regexp_replace(rest, r"[?#][\s\S]*", "")
    folded = let_(
        path, lambda p: F.when(p.contains("/."), _fold_path(p)).otherwise(p)
    )
    return F.concat(pre, folded, tail)


def _duckdb_fold_path(p: str) -> str:
    orig = p
    for pat, rep in _FOLD_STEPS:
        p = f"regexp_replace({p}, '{pat}', '{rep}', 'g')"
    return (
        f"CASE WHEN left({orig}, 1) = '/'"
        f" THEN regexp_replace('/' || {p}, '^//', '/')"
        f" ELSE {p} END"
    )


def duckdb_remove_dot_segments_sql(u: str) -> str:
    """DuckDB expression mirroring ``remove_dot_segments`` exactly
    (same split, same pattern program, same clean-path skip)."""
    pre = f"regexp_extract({u}, '{_PREFIX_RE}', 1)"
    rest = f"({u})[length({pre}) + 1:]"
    tail = f"regexp_extract({rest}, '([?#][\\s\\S]*)', 1)"
    path = f"regexp_replace({rest}, '[?#][\\s\\S]*', '', 'g')"
    return (
        f"({pre} || CASE WHEN strpos({path}, '/.') > 0"
        f" THEN {_duckdb_fold_path(path)} ELSE {path} END || {tail})"
    )

#: ordered (pattern, spark_replacement) steps 2-5; DuckDB mirrors with
#: \N backrefs
_STEPS: list[tuple[str, str]] = [
    # end anchors are \z and tails [\s\S] throughout (see _FOLD_STEPS
    # note): normalize_url strips [\t\n\r] first so these only matter
    # for direct remove_dot_segments callers, but the two dialects
    # must agree on ANY input.
    (r"^(https://[^/?#:]*):443(\z|[/?#][\s\S]*)", "$1$2"),
    (r"^(http://[^/?#:]*):80(\z|[/?#][\s\S]*)", "$1$2"),
    (r"#[\s\S]*", ""),
    # anchored at a real separator — an unanchored pattern would strip
    # lookalike substrings out of legitimate params ('msgclid=5') and
    # even path segments ('/utm_source=x/'), merging distinct pages
    # into one dedup key. The ()+ repetition eats CONSECUTIVE tracking
    # params in one match (scanning resumes after the replacement, so
    # back-to-back params would otherwise leave every second one).
    (r"([?&])((utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&?)+", "$1"),
    (r"[?&]\z", ""),
    (r"\?&", "?"),
    (r"^([^?#]*[^/?#])/(\?[^#]*)?\z", "$1$2"),
]


def normalize_url(col: str | Column) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    # let-bound: callers compose normalize_url over heavy expressions
    # (resolve_href chains) — the binding embeds the argument tree
    # ONCE instead of once per internal reference (see let_)
    return let_(u, _normalize_body)


def _normalize_body(u: Column) -> Column:
    u = F.regexp_replace(u, _UNSAFE_RE, "")
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.length(u)))
    u = remove_dot_segments(u)
    for pat, rep in _STEPS:
        u = F.regexp_replace(u, pat, rep)
    return u


def _duckdb_steps(expr: str) -> str:
    for pat, rep in _STEPS:
        # standard SQL single-quoted strings pass backslashes through
        # verbatim, so the Python pattern embeds as-is (no '' needed:
        # the patterns contain no quotes)
        rep_sql = rep.replace("$1", "\\1").replace("$2", "\\2")
        expr = f"regexp_replace({expr}, '{pat}', '{rep_sql}', 'g')"
    return expr


def duckdb_normalize_sql(u: str) -> str:
    """DuckDB expression computing the identical normalization of the
    url expression ``u`` (same steps, same patterns)."""
    u = f"regexp_replace({u}, '{_UNSAFE_RE}', '', 'g')"
    prefix = f"regexp_extract({u}, '{_PREFIX_RE}', 1)"
    base = f"(lower({prefix}) || {u}[length({prefix}) + 1:])"
    return _duckdb_steps(duckdb_remove_dot_segments_sql(base))


def url_dedup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group rows by canonical url: (url_norm, n_variants, first_url)
    — the canonicalization-dedup pass of a crawl pipeline. One
    hash-groupBy; map-side partial agg."""
    return (
        df.select(
            normalize_url(url_col).alias("url_norm"),
            F.col(url_col).alias("u"),
        )
        .groupBy("url_norm")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("u").alias("first_url"),
        )
    )


# ---------------------------------------------------------------------------
# SURT — Sort-friendly URI Reordering Transform (the Heritrix /
# web-archive convention; Common Crawl index keys are SURT-ordered):
# host labels reversed and comma-joined so one registrable domain's
# pages sort contiguously ("org,example,www)/path"). Pure column
# expressions; patterns in the Java-regex ∩ RE2 subset.
# ---------------------------------------------------------------------------

#: port capture after an authority (userinfo skipped, bracketed IPv6
#: honored) — group 1 is the digits. The digits must be followed by
#: end-of-text or a path/query/fragment start: without that anchor the
#: optional userinfo group backtracks on port-less URLs and the
#: PASSWORD digits of 'http://u:123@h/' leak out as a port.
_PORT_RE = (
    r"(?i)^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?"
    r"(?:\[[^/?#\]]*\]|[^/?#:@]*):([0-9]+)(?:\z|[/?#])"
)
#: path+query after the authority, fragment excluded — group 1
_REST_RE = r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)"
#: hosts that must NOT be label-reversed: IPv4 dotted quads and
#: bracketed IPv6 literals
_IP_HOST_RE = r"^([0-9]+(\.[0-9]+){3}|\[[\s\S]*)\z"


def surt(col: str | Column) -> Column:
    """SURT form of a url column: ``rev-host[:port])/path?query`` —
    host lowercased with labels reversed (IP literals kept verbatim),
    userinfo and fragment dropped, scheme dropped, empty path → '/'.
    NULL when the url has no scheme://authority. Compose AFTER
    ``normalize_url`` when default-port/dot-segment folding should
    land in the key (this function reorders, it does not normalize —
    except the WHATWG tab/newline strip every URL entry point
    applies)."""
    from hickoryspark.ops.hosts import url_host

    u = F.regexp_replace(
        F.col(col) if isinstance(col, str) else col, _UNSAFE_RE, ""
    )
    host = url_host(u)
    port = F.regexp_extract(u, _PORT_RE, 1)
    rest = F.regexp_extract(u, _REST_RE, 1)
    rhost = F.when(host.rlike(_IP_HOST_RE), host).otherwise(
        F.array_join(F.reverse(F.split(host, r"\.")), ",")
    )
    return F.when(
        host.isNotNull(),
        F.concat(
            rhost,
            F.when(port != "", F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            F.lit(")"),
            F.when(rest == "", F.lit("/")).otherwise(rest),
        ),
    )


def duckdb_surt_sql(u: str) -> str:
    """DuckDB expression computing the identical SURT of url
    expression ``u`` (same regexes, same steps)."""
    u = f"regexp_replace({u}, '{_UNSAFE_RE}', '', 'g')"
    from hickoryspark.ops.hosts import _HOST_RE

    # trailing-dot strip uses \z, never $ (the repo's cross-dialect
    # regex rule); the host pattern is IMPORTED from hosts.py (single
    # source — no lockstep copy to desynchronize), so the mirror is
    # equal to hosts.url_host by construction
    hraw = (
        f"regexp_replace(lower(regexp_extract({u}, "
        f"'{_HOST_RE}', 1)), '\\.\\z', '')"
    )
    host = f"(CASE WHEN {hraw} != '' THEN {hraw} END)"
    port = f"regexp_extract({u}, '{_PORT_RE}', 1)"
    rest = f"regexp_extract({u}, '{_REST_RE}', 1)"
    rhost = (
        f"(CASE WHEN regexp_matches({host}, '{_IP_HOST_RE}') THEN {host} "
        f"ELSE array_to_string(list_reverse(string_split({host}, '.')), ',')"
        f" END)"
    )
    return (
        f"(CASE WHEN {host} IS NOT NULL THEN {rhost} || "
        f"(CASE WHEN {port} != '' THEN ':' || {port} ELSE '' END) || ')' "
        f"|| (CASE WHEN {rest} = '' THEN '/' ELSE {rest} END) END)"
    )



# ---- URL features (crawl prioritization signals) ------------------------

#: path of an absolute url: group 1 after scheme://authority, before
#: ?/# (shared verbatim with the mirror; find-semantics, anchored)
_PATH_RE = r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
#: query (sans '?') up to the fragment
_QUERY_RE = r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)"
#: trailing extension of the LAST path segment: a dot then 1-8
#: alphanumerics at end-of-path (no further dot/slash)
_EXT_RE = r"\.([A-Za-z0-9]{1,8})\z"

_URL_FEATURES = ["host", "path", "path_depth", "ext", "n_params",
                 "is_root", "url_len"]


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """``df`` plus crawl-prioritization URL signals: ``host`` (the
    ops/hosts fold), ``path`` (absolute urls only — no authority →
    NULL host, '' path), ``path_depth`` (non-empty ``/`` segments),
    ``ext`` (lowercased 1-8-alphanumeric trailing extension of the
    last segment, NULL when none), ``n_params`` (non-empty
    ``&``-separated query params), ``is_root`` (path '' or '/'),
    ``url_len`` (characters).

    Frontier schedulers rank on exactly these: deep paths and long
    query strings crawl last, extension filters drop binary assets,
    roots crawl first. Pure column expressions (shuffle-free);
    patterns live in the Java-regex ∩ RE2 subset and are shared with
    :func:`duckdb_url_features_sql`. Feature columns REPLACE any
    same-named input column (a frontier frame that already carries a
    ``host`` from ops/hosts must not end up with two).
    """
    from hickoryspark.ops.hosts import url_host

    u = F.regexp_replace(F.col(url_col), _UNSAFE_RE, "")
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    params = F.filter(F.split(query, "&"), lambda s: s != "")
    ext = F.lower(F.regexp_extract(path, _EXT_RE, 1))
    return df.withColumns({
        "host": url_host(u),
        "path": path,
        "path_depth": F.size(segs).cast("long"),
        "ext": F.when(ext != "", ext),
        "n_params": F.size(params).cast("long"),
        "is_root": path.isin("", "/"),
        "url_len": F.length(u).cast("long"),
    })


def duckdb_url_features_sql(u: str) -> str:
    """DuckDB SELECT-list fragment mirroring :func:`url_features`
    (same patterns; list_filter counting)."""
    from hickoryspark.ops.hosts import _HOST_RE

    u = f"regexp_replace({u}, '{_UNSAFE_RE}', '', 'g')"
    hraw = (
        f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', 1)), "
        f"'\\.\\z', '')"
    )
    path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    query = f"regexp_extract({u}, '{_QUERY_RE}', 1)"
    ext = f"lower(regexp_extract({path}, '{_EXT_RE}', 1))"
    return ", ".join([
        f"(CASE WHEN {hraw} != '' THEN {hraw} END) AS host",
        f"{path} AS path",
        f"CAST(len(list_filter(string_split({path}, '/'), s -> s != ''))"
        f" AS BIGINT) AS path_depth",
        f"NULLIF({ext}, '') AS ext",
        f"CAST(len(list_filter(string_split({query}, '&'), s -> s != ''))"
        f" AS BIGINT) AS n_params",
        f"({path} IN ('', '/')) AS is_root",
        f"CAST(length({u}) AS BIGINT) AS url_len",
    ])


# ---------------------------------------------------------------------------
# Session-identifier stripping — the crawler-side canonicalization
# step beyond normalize_url's tracking params: servlet ;jsessionid=
# path segments and the classic session query params (PHPSESSID,
# ASPSESSIONIDxxxx, sessionid, sid) explode one page into thousands
# of frontier keys. Kept SEPARATE from normalize_url (whose fold is
# pinned by many oracles); compose as
# strip_session_params(normalize_url(u)) or either alone.
# ---------------------------------------------------------------------------

#: session parameter names, matched case-insensitively via GENERATED
#: explicit case classes (never (?i) — the Java/RE2 fold divergence);
#: longest-first so 'sid' cannot pre-empt 'sessionid'
SESSION_PARAM_NAMES = ["aspsessionid", "phpsessid", "jsessionid",
                       "sessionid", "sid"]


def _ci_pat(name: str) -> str:
    return "".join(f"[{c.upper()}{c.lower()}]" if c.isalpha() else c
                   for c in name)


_SESS_ALT = "|".join(
    _ci_pat(n) + ("[A-Za-z]*" if n == "aspsessionid" else "")
    for n in SESSION_PARAM_NAMES)

#: applied in order; the ()+ repetition eats consecutive session
#: params in one match (the normalize_url tracking-strip rule), the
#: two tail passes clean dangling separators. All patterns in the
#: Java ∩ RE2 subset (\z tails, explicit classes).
_SESS_STEPS = [
    (rf";{_ci_pat('jsessionid')}=[^/?#]*", ""),
    (rf"([?&])((?:{_SESS_ALT})=[^&#]*&?)+", "$1"),
    (r"[?&]\z", ""),
    (r"\?&", "?"),
]


def strip_session_params(col: str | Column) -> Column:
    """Remove session identifiers from a url column: the servlet
    ``;jsessionid=...`` path suffix (up to the next ``/``, ``?`` or
    ``#``) and the session query params in
    :data:`SESSION_PARAM_NAMES` (name anchored at ``?``/``&`` — a
    ``userid=`` never matches ``sid``). Pure column expressions,
    shuffle-free."""
    u = F.col(col) if isinstance(col, str) else col
    for pat, rep in _SESS_STEPS:
        u = F.regexp_replace(u, pat, rep)
    return u


def duckdb_strip_session_sql(u: str) -> str:
    """DuckDB expression mirroring :func:`strip_session_params` on
    url expression ``u`` (same generated patterns, same order)."""
    for pat, rep in _SESS_STEPS:
        rep_sql = rep.replace("$1", "\\1")
        u = f"regexp_replace({u}, '{pat}', '{rep_sql}', 'g')"
    return u


def query_param_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Corpus-wide query-parameter statistics — the profiling step
    that FEEDS session-id strip lists and crawler-trap rules (you
    find 'jsessionid' by seeing a key with one value per URL):
    ``(param, n_occurrences, n_distinct_values, n_flags)``.

    Pinned parse (raw, no percent-decoding — decoding belongs to the
    normalizer): the query is everything between the first ``?`` and
    the fragment; pairs split on ``&``, empty pairs drop; the key is
    the text before the first ``=``; a pair WITHOUT ``=`` is a flag
    (NULL value — counted in ``n_flags``, excluded from the distinct
    values); repeated keys count once per occurrence.

    Scale shape: one regexp + split + explode (shuffle-free), then a
    single groupBy(param) carrying both counts (count_distinct is
    the only expansion; map-side partial aggregation applies).
    """
    # the query lives in the PRE-fragment prefix: a '?' inside the
    # fragment ('#/route?tab=1' SPA urls) is fragment content, not a
    # query (RFC 3986) — extract the prefix first so it cannot match
    prefrag = F.regexp_extract(F.col(url_col), r"^[^#]*", 0)
    q = F.regexp_extract(prefrag, r"\?([\s\S]*)", 1)
    pair = F.explode(
        F.filter(F.split(q, "&"), lambda p: p != "")
    ).alias("pair")
    rows = urls.select(pair)
    eq = F.locate("=", F.col("pair"))
    key = F.when(eq > 0, F.substring(F.col("pair"), 1, eq - 1)).otherwise(
        F.col("pair")
    )
    val = F.when(
        eq > 0, F.expr("substring(pair, locate('=', pair) + 1)")
    )
    return (
        rows.select(key.alias("param"), val.alias("_v"))
        .groupBy("param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("_v").cast("long").alias("n_distinct_values"),
            F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
            .cast("long").alias("n_flags"),
        )
    )
