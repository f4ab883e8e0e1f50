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
    agg = headers.groupBy(*id_cols, "status").agg(
        F.concat_ws(",", F.collect_list(contrib)).alias("_xr")
    )
    return meta_robots_flags(agg, col="_xr").drop("_xr")
