"""HTTP response-head parsing — the layer between a crawler's raw
fetch (WARC response records store the full HTTP message) and every
downstream decision: status handling, Content-Type routing (into
ops/mime.py's sniffer when absent/ambiguous), charset override,
redirect chasing, cache policy.

RFC 9112 (HTTP/1.1 message syntax) subset:

- status line ``HTTP-version SP status-code SP [reason]``; a head
  whose first line does not match yields NULL status (and no header
  rows) rather than garbage.
- header fields ``name ":" OWS value OWS``; names case-insensitive
  (lowercased here), values OWS-trimmed. RFC 9112 §5.2 obs-fold
  (continuation lines) is deprecated and treated as invalid — such
  lines are dropped, as are lines without a colon or with whitespace
  before the colon (§5.1: reject or consume-and-ignore; we ignore).
- duplicate field names are emitted as SEPARATE rows in document
  order (``field_pos``) — RFC 9110 §5.3's comma-combination rule is a
  consumer decision (Set-Cookie famously must NOT be combined), so
  the relational form keeps every occurrence.

Everything is pure JVM Catalyst (split / regexp / transform /
posexplode) — no Python in the path, one narrow map per op
(plan-guarded in tests/test_http.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: status line: HTTP-name "/" DIGIT "." DIGIT SP 3DIGIT [SP reason]
#: (also accepts HTTP/2-style single-digit versions)
_STATUS_RE = r"\AHTTP/[0-9](?:\.[0-9])? ([0-9]{3})(?: [\s\S]*)?\z"
#: field-line: token ":" OWS value — token per RFC 9110 §5.6.2
_FIELD_RE = r"\A([!#$%&'*+.^_`|~0-9A-Za-z-]+):[ \t]*([\s\S]*?)[ \t]*\z"


def _head(raw: Column) -> Column:
    """Everything before the first blank line (the message head);
    tolerates bare-LF line endings (RFC 9112 §2.2 MAY recognize)."""
    return F.substring_index(
        F.regexp_replace(raw, "\r\n", "\n"), "\n\n", 1
    )


def http_status(raw: Column) -> Column:
    """Status code (int) from a raw response head, NULL if the first
    line is not a valid status line."""
    first = F.substring_index(_head(raw), "\n", 1)
    code = F.regexp_extract(first, _STATUS_RE, 1)
    return F.when(code != "", code.cast("int"))


def parse_headers_df(
    df: DataFrame, raw_col: str = "raw", id_cols: tuple = ("url",)
) -> DataFrame:
    """One row per valid header field: (*id_cols, status, field_pos,
    name, value) — name lowercased, value OWS-trimmed, duplicates
    preserved in order. Invalid field lines are dropped (module
    docstring); a head with an invalid status line contributes no
    rows; a VALID head with zero (valid) fields still contributes one
    row with NULL field_pos/name/value, so header-less 204/304
    responses keep their status in the table."""
    raw = F.col(raw_col)
    lines = F.split(_head(raw), "\n")
    fields = F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))
    parsed = F.filter(
        F.transform(
            fields,
            lambda l: F.struct(
                F.lower(F.regexp_extract(l, _FIELD_RE, 1)).alias("name"),
                F.regexp_extract(l, _FIELD_RE, 2).alias("value"),
            ),
        ),
        lambda s: s["name"] != "",
    )
    base = df.select(
        *id_cols,
        http_status(raw).alias("status"),
        parsed.alias("_fields"),
    ).where(F.col("status").isNotNull())
    return base.select(
        *id_cols,
        "status",
        F.posexplode_outer("_fields").alias("field_pos", "_f"),
    ).select(
        *id_cols, "status", "field_pos",
        F.col("_f.name").alias("name"), F.col("_f.value").alias("value"),
    )


def content_type(raw: Column) -> Column:
    """Lowercased media type (no parameters) of the FIRST
    Content-Type header, NULL when absent/invalid."""
    head = _head(raw)
    # first matching field line anywhere after the status line
    line = F.regexp_extract(
        head, r"(?i)\n(content-type):[ \t]*([^\n]*)", 2
    )
    mt = F.lower(F.trim(F.substring_index(line, ";", 1)))
    return F.when(mt != "", mt)


def charset_param(raw: Column) -> Column:
    """charset parameter of the first Content-Type header, lowercased,
    quotes stripped; NULL when absent."""
    head = _head(raw)
    line = F.regexp_extract(
        head, r"(?i)\n(content-type):[ \t]*([^\n]*)", 2
    )
    cs = F.regexp_extract(
        line, r'(?i)(?:\A|;)[ \t]*charset[ \t]*=[ \t]*"?([^";\n]*)', 1
    )
    cs = F.lower(F.trim(cs))
    return F.when(cs != "", cs)


def set_cookies(
    headers: DataFrame, id_cols: tuple = ("url",)
) -> DataFrame:
    """RFC 6265 Set-Cookie parsing + security audit over the output of
    :func:`parse_headers_df` — one row per VALID cookie:

    ``(*id_cols, status, field_pos, cookie_name, cookie_value, domain,
    path, secure, httponly, samesite, max_age, persistent,
    samesite_insecure)``

    Pinned semantics (RFC 6265 §5.2/§5.3 user-agent subset):

    - the value splits on ``;``; segment 1 is the name-value pair,
      the rest are attributes. A pair with no ``=`` or an empty
      (post-trim) name is INVALID — the whole header is ignored
      (§5.2 steps 1-4). Value kept verbatim after OWS trim (quotes
      NOT stripped — browsers keep them).
    - attribute names are case-insensitive; when an attribute repeats
      the LAST occurrence wins (§5.3 "the last attribute in the
      cookie-attribute-list").
    - ``Domain``: lowercased, ONE leading ``.`` stripped (§5.2.3);
      empty → NULL. ``Path``: kept only when it starts with ``/``
      (§5.2.4 default-path rule → NULL here). ``SameSite``: lowercased,
      one of strict/lax/none, else NULL.
    - ``Max-Age``: valid iff ``-?[0-9]{1,18}`` (§5.2.2 first char
      DIGIT or '-'; 18-digit bound keeps the BIGINT cast exact);
      invalid → NULL.
    - ``persistent`` = 1 iff a valid Max-Age OR any Expires attribute
      is present (§5.3 steps 2-3; Expires VALUE is not date-validated
      here — presence is what makes a UA attempt persistence).
    - ``samesite_insecure`` = 1 iff SameSite=None without Secure (the
      combination modern browsers reject).

    Scale shape: narrow per-row column program on the header table —
    no shuffle, no Python."""
    is_sc = F.col("name") == "set-cookie"
    segs = F.split(F.col("value"), ";")
    nv = F.trim(segs[0])
    eq = F.instr(nv, "=")
    cname = F.trim(F.substring(nv, F.lit(1), eq - 1))
    cval = F.trim(F.substring(nv, eq + 1, F.length(nv)))
    attrs = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))

    def last_val(attr_name: str) -> Column:
        """Trimmed text after '=' of the LAST 'name=...' attribute
        (case-insensitive name match); NULL when absent."""
        hits = F.filter(
            attrs,
            lambda a: F.lower(F.trim(F.substring_index(a, "=", 1)))
            == attr_name,
        )
        last = F.try_element_at(hits, F.lit(-1))
        return F.when(
            last.isNotNull() & (F.instr(last, "=") > 0),
            F.trim(
                F.substring(last, F.instr(last, "=") + 1, F.length(last))
            ),
        )

    def flag(attr_name: str) -> Column:
        return F.exists(
            attrs, lambda a: F.lower(F.trim(a)) == attr_name
        ).cast("int")

    domain_raw = F.lower(last_val("domain"))
    domain = F.when(
        domain_raw.isNotNull() & (domain_raw != ""),
        F.regexp_replace(domain_raw, r"\A\.", ""),
    )
    path_raw = last_val("path")
    path = F.when(path_raw.startswith("/"), path_raw)
    ss_raw = F.lower(last_val("samesite"))
    samesite = F.when(ss_raw.isin("strict", "lax", "none"), ss_raw)
    ma_raw = last_val("max-age")
    max_age = F.when(
        ma_raw.rlike(r"\A-?[0-9]{1,18}\z"), ma_raw.cast("long")
    )
    has_expires = F.exists(
        attrs,
        lambda a: F.lower(F.trim(F.substring_index(a, "=", 1)))
        == "expires",
    )
    secure = flag("secure")
    persistent = (max_age.isNotNull() | has_expires).cast("int")
    ss_insecure = ((samesite == F.lit("none")) & (secure == 0))
    out = headers.where(
        is_sc & (eq > 0) & (cname != "")
    ).select(
        *id_cols, "status", "field_pos",
        cname.alias("cookie_name"), cval.alias("cookie_value"),
        domain.alias("domain"), path.alias("path"),
        secure.alias("secure"), flag("httponly").alias("httponly"),
        samesite.alias("samesite"), max_age.alias("max_age"),
        persistent.alias("persistent"),
        F.coalesce(ss_insecure, F.lit(False)).cast("int").alias(
            "samesite_insecure"),
    )
    return out


#: IMF-fixdate (RFC 9110 §5.6.7 preferred form) — day-name validated
#: by shape only (3 alpha + ", "), zone must be literal GMT
_IMF_CORE_RE = (
    r"\A[A-Za-z]{3}, ([0-9]{2} [A-Za-z]{3} [0-9]{4} "
    r"[0-9]{2}:[0-9]{2}:[0-9]{2}) GMT\z"
)


def http_date_epoch(c: Column) -> Column:
    """Epoch seconds of an IMF-fixdate header value, NULL when the
    value is not the preferred RFC 9110 form or the date is invalid
    (obsolete RFC 850 / asctime forms are deliberately not parsed —
    RFC 9110 §5.6.7 only REQUIRES accepting them on receipt of
    messages, and a recrawl planner treating them as absent just
    falls through to the heuristic)."""
    core = F.regexp_extract(c, _IMF_CORE_RE, 1)
    return F.try_to_timestamp(
        F.when(core != "", core), F.lit("dd MMM yyyy HH:mm:ss")
    ).cast("long")


def cache_policy(
    headers: DataFrame, id_cols: tuple = ("url",),
    heuristic_frac: int = 10,
) -> DataFrame:
    """Per-response freshness lifetime for a recrawl scheduler — one
    row per response: ``(*id_cols, status, ttl_s, source,
    revalidable)``.

    Pinned RFC 9111 precedence (§4.2.1 + §4.2.2 heuristic):

    1. ``no-store`` directive → ttl 0, source ``no-store``
    2. ``no-cache`` → 0, ``no-cache``
    3. valid ``s-maxage=N`` → N, ``s-maxage`` (shared-cache view)
    4. valid ``max-age=N`` → N, ``max-age``
    5. Expires present AND Date valid IMF-fixdate → max(0, expires −
       date), ``expires``; an unparseable Expires counts as already
       past (RFC 9111 §5.3 "treat invalid dates as expired") → 0
    6. Last-Modified AND Date parseable with date ≥ last-modified →
       (date − last-modified) / heuristic_frac (floor), ``heuristic``
       (the §4.2.2 10% convention)
    7. else ttl NULL, ``none``

    Directive scan: ALL Cache-Control headers of the response
    contribute (RFC 9110 §5.3 list field); each value comma-splits,
    ASCII-trims, lowercases. A directive value is valid iff unquoted
    ``[0-9]{1,18}`` (quoted forms are rare-to-nonexistent on the wire
    and left invalid on purpose); when a directive repeats the MAX
    wins — order-independent, so the aggregation below never depends
    on header order. Date/Expires/Last-Modified: FIRST occurrence by
    field_pos (min-struct). ``revalidable`` = 1 iff an ETag or
    Last-Modified is present.

    Scale shape: ONE groupBy from header grain back to response grain
    (conditional aggregates); everything else is a narrow column
    program."""
    name, value = F.col("name"), F.col("value")

    def first_of(header: str) -> Column:
        s = F.when(
            name == header,
            F.struct(F.col("field_pos").alias("p"), value.alias("v")),
        )
        return F.min(s)["v"]

    cc = F.concat_ws(
        ",", F.collect_list(F.when(name == "cache-control", value))
    )
    agg = headers.groupBy(*id_cols, "status").agg(
        cc.alias("_cc"),
        first_of("expires").alias("_expires"),
        first_of("date").alias("_date"),
        first_of("last-modified").alias("_lm"),
        F.max((name == "etag").cast("int")).alias("_etag"),
    )
    dirs = F.transform(
        F.split(F.col("_cc"), ","), lambda d: F.lower(F.trim(d))
    )
    has = lambda d: F.exists(dirs, lambda x: x == d)

    def max_directive(prefix: str) -> Column:
        vals = F.filter(
            F.transform(
                dirs,
                lambda d: F.regexp_extract(
                    d, r"\A" + prefix + r"=([0-9]{1,18})\z", 1
                ),
            ),
            lambda v: v != "",
        )
        return F.array_max(vals.cast("array<long>"))

    s_maxage = max_directive("s-maxage")
    max_age = max_directive("max-age")
    exp_e = http_date_epoch(F.col("_expires"))
    date_e = http_date_epoch(F.col("_date"))
    lm_e = http_date_epoch(F.col("_lm"))
    # RFC 9111 §5.3: an unparseable Expires value means "already
    # expired" — coalesce to epoch 0 so any valid Date clamps to 0.
    # Both branches need a valid Date (no current-time notion here).
    exp_ttl = F.when(
        F.col("_expires").isNotNull() & date_e.isNotNull(),
        F.greatest(
            F.coalesce(exp_e, F.lit(0).cast("long")) - date_e,
            F.lit(0).cast("long"),
        ),
    )
    heur = F.when(
        date_e >= lm_e,
        ((date_e - lm_e) / F.lit(heuristic_frac)).cast("long"),
    )
    ttl = (
        F.when(has("no-store"), F.lit(0).cast("long"))
        .when(has("no-cache"), F.lit(0).cast("long"))
        .when(s_maxage.isNotNull(), s_maxage)
        .when(max_age.isNotNull(), max_age)
        .when(exp_ttl.isNotNull(), exp_ttl)
        .when(heur.isNotNull(), heur)
    )
    source = (
        F.when(has("no-store"), F.lit("no-store"))
        .when(has("no-cache"), F.lit("no-cache"))
        .when(s_maxage.isNotNull(), F.lit("s-maxage"))
        .when(max_age.isNotNull(), F.lit("max-age"))
        .when(exp_ttl.isNotNull(), F.lit("expires"))
        .when(heur.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("none"))
    )
    revalidable = (
        (F.col("_etag") == 1) | F.col("_lm").isNotNull()
    ).cast("int")
    return agg.select(
        *id_cols, "status", ttl.alias("ttl_s"), source.alias("source"),
        F.coalesce(revalidable, F.lit(0)).alias("revalidable"),
    )


#: directive names that may legitimately contain a ':' in their value
#: (or start a value) — a prefix matching one of these is NEVER an
#: agent scope (the unavailable_after case)
X_ROBOTS_DIRECTIVES = (
    "all", "noindex", "nofollow", "none", "noarchive", "nosnippet",
    "notranslate", "noimageindex", "indexifembedded",
    "unavailable_after", "max-snippet", "max-image-preview",
    "max-video-preview",
)


def x_robots_flags(df: DataFrame, raw_col: str = "raw",
                   agent: str | None = None,
                   id_cols: tuple = ("url",)) -> DataFrame:
    """One row per valid response: (*id_cols, status, noindex,
    nofollow) from its ``X-Robots-Tag`` headers — the HTTP-layer
    complement of ops/metadata.meta_robots_flags (the robots meta
    rules apply to both carriers; an index pipeline must honor the
    header or it ships opted-out pages the HTML never sees, e.g.
    PDFs).

    Pinned semantics: every X-Robots-Tag header of the response
    contributes; a value whose prefix before the first ``:`` is not a
    known directive name is agent-scoped (Google's optional
    ``<user-agent>:`` form) and applies only when it equals ``agent``
    case-insensitively (``agent=None`` ⇒ scoped rules never apply);
    ``unavailable_after: <date>`` is a directive, never an agent.
    The directive list then follows the meta rule verbatim
    (comma-split, ASCII-trim, case-insensitive, ``none`` ⇒ both,
    absent ⇒ indexable).

    Scale shape: parse_headers_df's scan + ONE groupBy back to
    response grain (the collect_list holds at most the response's own
    X-Robots-Tag values — head-bounded, not corpus-bounded)."""
    from hickoryspark.ops.metadata import meta_robots_flags

    agg = x_robots_values(df, raw_col=raw_col, agent=agent,
                          id_cols=id_cols).withColumnRenamed(
                              "xr", "_xr")
    return meta_robots_flags(agg, col="_xr").drop("_xr")


def x_robots_values(df: DataFrame, raw_col: str = "raw",
                    agent: str | None = None,
                    id_cols: tuple = ("url",)) -> DataFrame:
    """``(*id_cols, status, xr)`` — the response's APPLICABLE
    X-Robots-Tag directive lists, comma-joined (the scope rule of
    :func:`x_robots_flags`, factored out so other directive consumers
    — e.g. ops/optout.py — share one parse)."""
    headers = parse_headers_df(df, raw_col=raw_col, id_cols=id_cols)
    value = F.col("value")
    pre = F.lower(F.trim(F.substring_index(value, ":", 1)))
    colon_pos = F.instr(value, ":")
    comma_pos = F.instr(value, ",")
    # an agent scope prefixes the WHOLE value — a ',' before the first
    # ':' means the colon belongs to a later directive's argument
    # ('noindex, unavailable_after: <date>'), never a scope
    scoped = (
        (colon_pos > 0)
        & ((comma_pos == 0) | (colon_pos < comma_pos))
        & ~pre.isin(*X_ROBOTS_DIRECTIVES)
    )
    applies = ~scoped if agent is None else (
        ~scoped | (pre == agent.lower())
    )
    directives = F.when(
        scoped,
        F.expr(f"substring({'value'}, instr(value, ':') + 1)"),
    ).otherwise(value)
    contrib = F.when(
        (F.col("name") == "x-robots-tag") & applies, directives
    )
    return headers.groupBy(*id_cols, "status").agg(
        F.concat_ws(",", F.collect_list(contrib)).alias("xr")
    )


#: Referrer-Policy tokens the W3C referrer-policy spec §4.1 defines;
#: anything else in the list is skipped (the spec's "unknown policy
#: values are ignored" parse rule).
REFERRER_POLICIES = (
    "no-referrer", "no-referrer-when-downgrade", "origin",
    "origin-when-cross-origin", "same-origin", "strict-origin",
    "strict-origin-when-cross-origin", "unsafe-url",
)

#: the STS directive names RFC 6797 §6.1 defines (+ the de-facto
#: ``preload`` submission token); the repeat rule below applies to
#: these — unknown directives are ignored entirely (§6.1 p4).
_STS_KNOWN = ("max-age", "includesubdomains", "preload")


def security_headers(
    headers: DataFrame, id_cols: tuple = ("url",)
) -> DataFrame:
    """Response-security-header audit — one row per response:
    ``(*id_cols, status, hsts_max_age, hsts_subdomains, hsts_preload,
    xfo, nosniff, referrer_policy, n_protections)``.

    A crawler uses these for recrawl scheme pinning (a valid HSTS
    host never needs the http:// variant refetched), frame-embedding
    policy in archival replay, and as host-quality signals next to
    ops/csp.py / the cookie audit / ops/amp.py's mixed-content check
    (CSP itself stays in ops/csp.py).

    Pinned semantics:

    - HSTS (RFC 6797): only the FIRST Strict-Transport-Security field
      is processed (§8.1 "only the first... is noted"). Directives
      split on ``;``, OWS-trimmed; names case-insensitive; values may
      be quoted (one surrounding quote pair stripped). The field is
      VALID iff ``max-age`` appears exactly once with a value matching
      ``[0-9]{1,18}`` after quote-strip, and no other KNOWN directive
      (includeSubDomains, preload) repeats (§6.1's once-only rule;
      unknown directives are ignored). Invalid ⇒ the three hsts_*
      columns are NULL; valid ⇒ max-age seconds + 0/1 flags.
    - X-Frame-Options (RFC 7034): FIRST field, trimmed + lowercased;
      ``deny``/``sameorigin`` kept verbatim, anything else (including
      the obsolete ALLOW-FROM form) ⇒ ``invalid``; NULL when absent.
    - X-Content-Type-Options (fetch spec): ``nosniff`` = 1 iff the
      FIRST field's value, token before the first ``;``, trims+lowers
      to ``nosniff``; else 0 (0 when absent — flag semantics).
    - Referrer-Policy (w3c referrer-policy §8.1): ALL fields join as
      one comma-list; the LAST recognized token wins; NULL when no
      token is recognized.
    - ``n_protections`` = (hsts valid AND max-age > 0) + nosniff +
      (xfo is deny/sameorigin) + (referrer_policy non-NULL).

    Scale shape: ONE groupBy from header grain to response grain
    (first-occurrence min-structs + one bounded collect_list), then a
    narrow JVM column program — no Python, no second shuffle
    (plan-guarded in tests/test_http.py)."""
    name, value = F.col("name"), F.col("value")

    def first_of(header: str) -> Column:
        s = F.when(
            name == header,
            F.struct(F.col("field_pos").alias("p"), value.alias("v")),
        )
        return F.min(s)["v"]

    # collect_list gives NO order guarantee after the shuffle, and
    # "last recognized token wins" is order-sensitive — collect
    # (field_pos, value) structs and sort_array before joining
    rp = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list(F.when(
                name == "referrer-policy",
                F.struct(F.col("field_pos").alias("p"),
                         value.alias("v")),
            ))),
            lambda s: s["v"],
        ),
    )
    agg = headers.groupBy(*id_cols, "status").agg(
        first_of("strict-transport-security").alias("_sts"),
        first_of("x-frame-options").alias("_xfo"),
        first_of("x-content-type-options").alias("_xcto"),
        rp.alias("_rp"),
    )

    # --- HSTS --- (value extraction after the FIRST '=', one
    # surrounding quote pair stripped)
    dirs = F.transform(
        F.split(F.col("_sts"), ";"),
        lambda d: F.struct(
            F.lower(F.trim(F.substring_index(d, "=", 1))).alias("n"),
            F.regexp_replace(
                F.trim(
                    F.when(
                        F.instr(d, "=") > 0,
                        F.substring(
                            d, F.instr(d, "=") + 1, F.length(d)
                        ),
                    ).otherwise(F.lit(""))
                ),
                r'\A"([\s\S]*)"\z', "$1",
            ).alias("v"),
        ),
    )

    def n_dir(dname: str) -> Column:
        return F.size(F.filter(dirs, lambda s: s["n"] == dname))

    # try_element_at: ANSI mode makes element_at throw on an empty
    # array (no max-age directive / no recognized policy token)
    max_age_v = F.try_element_at(
        F.filter(dirs, lambda s: s["n"] == "max-age"), F.lit(1)
    )["v"]
    hsts_valid = (
        F.col("_sts").isNotNull()
        & (n_dir("max-age") == 1)
        & max_age_v.rlike(r"\A[0-9]{1,18}\z")
        & (n_dir("includesubdomains") <= 1)
        & (n_dir("preload") <= 1)
    )
    hsts_max_age = F.when(hsts_valid, max_age_v.cast("long"))
    hsts_sub = F.when(
        hsts_valid, (n_dir("includesubdomains") == 1).cast("long")
    )
    hsts_pre = F.when(hsts_valid, (n_dir("preload") == 1).cast("long"))

    # --- XFO ---
    xfo_tok = F.lower(F.trim(F.col("_xfo")))
    xfo = F.when(
        F.col("_xfo").isNotNull(),
        F.when(xfo_tok.isin("deny", "sameorigin"), xfo_tok).otherwise(
            F.lit("invalid")
        ),
    )

    # --- nosniff ---
    nosniff = (
        F.lower(F.trim(F.substring_index(F.col("_xcto"), ";", 1)))
        == "nosniff"
    ).cast("long")
    nosniff = F.coalesce(nosniff, F.lit(0))

    # --- Referrer-Policy: last recognized token ---
    rp_toks = F.filter(
        F.transform(
            F.split(F.col("_rp"), ","), lambda t: F.lower(F.trim(t))
        ),
        lambda t: t.isin(*REFERRER_POLICIES),
    )
    referrer_policy = F.try_element_at(rp_toks, F.lit(-1))

    out = agg.select(
        *id_cols,
        "status",
        hsts_max_age.alias("hsts_max_age"),
        hsts_sub.alias("hsts_subdomains"),
        hsts_pre.alias("hsts_preload"),
        xfo.alias("xfo"),
        nosniff.alias("nosniff"),
        referrer_policy.alias("referrer_policy"),
    )
    n_prot = (
        F.coalesce((F.col("hsts_max_age") > 0).cast("long"), F.lit(0))
        + F.col("nosniff")
        + F.coalesce(
            F.col("xfo").isin("deny", "sameorigin").cast("long"),
            F.lit(0),
        )
        + F.col("referrer_policy").isNotNull().cast("long")
    )
    return out.withColumn("n_protections", n_prot)
