"""Public-suffix registered-domain extraction (the PSL algorithm).

Host-level rollups (ops/hosts.py ``host_stats``), politeness, and
blocklist curation all want the REGISTRABLE domain (``a.b.example.
co.uk`` → ``example.co.uk``), not the raw host. The grouping rule is
the Public Suffix List algorithm (publicsuffix.org/list/ — the same
rule set Mozilla/Chromium/libpsl implement):

- a RULE is a label suffix; ``*.ck`` wildcards exactly one extra
  label; ``!www.ck`` is an exception (``www.ck`` is registrable even
  though ``*.ck`` would make it a public suffix);
- the prevailing rule for a host is the matching EXCEPTION rule if
  any, else the matching rule with the MOST labels, else the implicit
  ``*`` (the bare TLD is the public suffix);
- public suffix = the matched labels (exception: the rule minus its
  leftmost label); registered domain = public suffix plus ONE more
  label — NULL when the host IS a public suffix.

The reference engine has no equivalent; this extends the §2 surface
the same way ops/hosts.py does.

Two execution shapes, cross-validated in tests:

- ``registered_domain_col`` / ``public_suffix_col``: the rule set is
  known at plan time, so the whole decision compiles to ONE when-chain
  of ``ends_with`` probes + a ``regexp_extract`` of the last ``ps+1``
  labels — pure JVM column expressions, whole-stage codegen, zero
  shuffle, zero Python. Right for curated rule sets (up to a few
  hundred rules). ``duckdb_registered_sql`` emits the IDENTICAL chain
  as DuckDB SQL from the same parsed rules — single source, the
  ops/urls.py ``_FOLD_STEPS`` pattern.
- ``registered_domains_joined``: the full ~10k-rule PSL would blow the
  64 KB codegen limit as a when-chain (the resolve_href lesson,
  CLAUDE.md), so the scale path explodes each DISTINCT host into its
  dot-suffix chain (ops/hosts.py ``host_suffixes`` bound), broadcast-
  joins the parsed rule table, takes the prevailing rule with ONE
  max-of-struct aggregation, and joins the verdict back on host.
  Distinct hosts are millions when pages are billions — the wide rows
  never carry the explode.

Pinned semantics (so the oracle can reproduce them exactly):

- hosts are matched AS GIVEN (caller lowercases/strips via
  ops/hosts.py ``url_host``); labels are split on ``.``;
- IPv4 literals (four all-digit labels) and bracketed IPv6 literals
  have NO registered domain (PSL applies to DNS names only) — both
  outputs NULL;
- NULL / empty hosts → NULL;
- rule precedence at EQUAL label count (exact ``x.a.b`` vs wildcard
  ``*.a.b`` both matching) is exact-first — the public suffix is the
  same either way, so the choice never changes the output;
- hosts with EMPTY labels (``a..ck``, leading dots) are outside the
  contract: such names are invalid DNS and the two execution paths may
  disagree on them (the expression path's last-k-labels regex rejects
  empty labels; the joined path's split/slice keeps them) — fold or
  drop them upstream;
- regex dialect: patterns live in the Java-regex ∩ RE2 subset
  (``[^.]`` classes, ``\\z`` anchor — never ``$``; CLAUDE.md).

Cites: reference has no URL/host ops — net-new surface, same category
as ops/urls.py (VERDICT r4 item 2's follow-on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_RULES", "parse_rules", "public_suffix_col",
    "registered_domain_col", "registered_domains",
    "registered_domains_joined", "duckdb_registered_sql",
    "duckdb_public_suffix_sql",
]

#: a deliberately small curated rule set exercising every rule KIND
#: (exact single/multi-label, wildcard, exception) — real deployments
#: pass the full PSL via ``rules=``. Entries use PSL syntax verbatim.
DEFAULT_RULES = [
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "dev", "app", "info", "biz",
    "jp", "fr", "de", "nl", "br", "com.br", "net.br",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "org.au", "net.au",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "ck", "*.ck", "!www.ck",
]

#: IPv4 literal — exactly four all-digit labels (the PSL/WHATWG check
#: is stricter about octet range, but any 4x-digit host is not a DNS
#: name either way, and this form is shared verbatim with the mirror)
_IPV4_RE = r"\A[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+\z"


def parse_rules(rules):
    """``[(kind, base, k)]`` — kind in ``exact|wildcard|exception``,
    ``base`` the rule's labels WITHOUT any ``*.``/``!`` marker, ``k``
    the label count of ``base``. Blank / comment lines are dropped
    (PSL files carry ``//`` comments)."""
    out = []
    for raw in rules:
        r = raw.strip()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            kind, base = "exception", r[1:]
        elif r.startswith("*."):
            kind, base = "wildcard", r[2:]
        else:
            kind, base = "exact", r
        if not base or base.startswith(".") or base.endswith("."):
            raise ValueError(f"malformed PSL rule: {raw!r}")
        out.append((kind, base, base.count(".") + 1))
    return out


def _ordered(parsed):
    """Rules in prevailing-first order: exceptions first (longest
    first), then by MATCH label count desc (wildcard counts its ``*``),
    exact before wildcard at ties. Returns ``[(kind, base, k, ps)]``
    where ``ps`` is the public-suffix label count when the rule
    prevails."""
    def sort_key(t):
        kind, _, k = t
        match_len = k + 1 if kind == "wildcard" else k
        return (kind != "exception", -match_len, kind == "wildcard")

    out = []
    for kind, base, k in sorted(parsed, key=sort_key):
        ps = {"exception": k - 1, "exact": k, "wildcard": k + 1}[kind]
        out.append((kind, base, k, ps))
    return out


def _last_labels_re(n: int) -> str:
    """Regex capturing the last ``n`` labels of a host (group 1);
    fails (empty extract) when the host has fewer than ``n`` labels."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return r"([^.]+(?:\.[^.]+){%d})\z" % (n - 1)


# ---------------------------------------------------------------- Spark

def _spark_cond(host: Column, kind: str, base: str) -> Column:
    eq = host == base
    suff = host.endswith("." + base)
    if kind == "wildcard":
        # one extra label required; host == base falls through to the
        # rule's exact sibling or the implicit '*'
        return suff
    return eq | suff


def _spark_chain(host: Column, rules, want: str) -> Column:
    """The compiled when-chain; ``want`` is ``'rd'`` (registered
    domain, ps+1 labels) or ``'ps'`` (public suffix, ps labels)."""
    def emit(ps: int) -> Column:
        n = ps + 1 if want == "rd" else ps
        got = F.regexp_extract(host, _last_labels_re(n), 1)
        return F.when(got != "", got)

    expr = emit(1)  # implicit '*' default rule
    for kind, base, _k, ps in reversed(_ordered(parse_rules(rules))):
        if ps == 0:
            # exception to a single-label rule: public suffix is empty
            # — the whole host is registrable only if it IS the base
            cond_expr = F.when(
                _spark_cond(host, kind, base),
                F.lit(base) if want == "rd" else F.lit(None).cast("string"),
            )
        else:
            cond_expr = F.when(_spark_cond(host, kind, base), emit(ps))
        expr = cond_expr.otherwise(expr)
    bad = (
        host.isNull() | (host == "") | host.startswith("[")
        | host.rlike(_IPV4_RE)
    )
    return F.when(~bad, expr)


def public_suffix_col(host, rules=None) -> Column:
    """Public suffix of a host column under ``rules`` (PSL syntax;
    default :data:`DEFAULT_RULES`). NULL for NULL/empty/IP hosts."""
    host = F.col(host) if isinstance(host, str) else host
    return _spark_chain(host, rules or DEFAULT_RULES, "ps")


def registered_domain_col(host, rules=None) -> Column:
    """Registered (registrable) domain of a host column; NULL when the
    host is itself a public suffix, or NULL/empty/IP."""
    host = F.col(host) if isinstance(host, str) else host
    return _spark_chain(host, rules or DEFAULT_RULES, "rd")


def registered_domains(df: DataFrame, host_col: str = "host",
                       rules=None) -> DataFrame:
    """``df`` plus ``public_suffix`` and ``registered_domain`` columns
    — the plan-time-rules path (pure column exprs, shuffle-free)."""
    return df.withColumn(
        "public_suffix", public_suffix_col(host_col, rules)
    ).withColumn(
        "registered_domain", registered_domain_col(host_col, rules)
    )


def registered_domains_joined(df: DataFrame, host_col: str = "host",
                              rules=None,
                              spark=None) -> DataFrame:
    """The large-rule-set path: suffix-chain explode over DISTINCT
    hosts + broadcast rule join + one max-of-struct prevailing-rule
    aggregation, joined back on host. Output schema matches
    :func:`registered_domains` (cross-validated in tests).

    ``rules`` may be a list (PSL syntax) or a DataFrame with a
    ``rule`` string column."""
    from hickoryspark.ops.hosts import host_suffixes

    spark = spark or df.sparkSession
    if isinstance(rules, DataFrame):
        rule_list = [r["rule"] for r in rules.select("rule").collect()]
    else:
        rule_list = list(rules or DEFAULT_RULES)
    parsed = spark.createDataFrame(
        [(kind, base, k) for kind, base, k in parse_rules(rule_list)],
        "kind string, base string, k int",
    )

    hosts = df.select(F.col(host_col).alias("_h")).where(
        F.col("_h").isNotNull() & (F.col("_h") != "")
        & ~F.col("_h").startswith("[") & ~F.col("_h").rlike(_IPV4_RE)
    ).distinct()
    n_labels = F.size(F.split(F.col("_h"), r"\."))
    chains = hosts.select(
        "_h", n_labels.alias("_n"),
        F.explode(host_suffixes(F.col("_h"))).alias("_suffix"),
    )
    hit = chains.join(
        F.broadcast(parsed), chains["_suffix"] == parsed["base"], "inner"
    ).where(
        # wildcard needs one more label than its base actually present
        (F.col("kind") != "wildcard") | (F.col("_n") > F.col("k"))
    )
    prevailing = hit.groupBy("_h", "_n").agg(
        F.max(
            F.struct(
                (F.col("kind") == "exception").cast("int").alias("is_exc"),
                F.when(F.col("kind") == "wildcard", F.col("k") + 1)
                .otherwise(F.col("k")).alias("match_len"),
                # exact outranks wildcard at equal match_len (same ps)
                (F.col("kind") == "exact").cast("int").alias("is_exact"),
                F.when(F.col("kind") == "exception", F.col("k") - 1)
                .when(F.col("kind") == "wildcard", F.col("k") + 1)
                .otherwise(F.col("k")).alias("ps"),
            )
        ).alias("_best"),
    ).select("_h", "_n", F.col("_best.ps").alias("_ps"))

    verdicts = hosts.join(prevailing, ["_h"], "left").select(
        "_h",
        F.coalesce(F.col("_ps"), F.lit(1)).alias("_ps"),
    )
    labels = F.split(F.col("_h"), r"\.")
    n = F.size(labels)
    ps_str = F.when(
        F.col("_ps") > 0,
        F.array_join(F.slice(labels, n - F.col("_ps") + 1,
                             F.col("_ps")), "."),
    )
    rd_str = F.when(
        n >= F.col("_ps") + 1,
        F.array_join(F.slice(labels, n - F.col("_ps"),
                             F.col("_ps") + 1), "."),
    )
    verdicts = verdicts.select(
        "_h",
        F.when(n >= F.col("_ps"), ps_str).alias("public_suffix"),
        rd_str.alias("registered_domain"),
    )
    return df.join(
        verdicts, df[host_col] == verdicts["_h"], "left"
    ).drop("_h")


# --------------------------------------------------------------- DuckDB

def _sql_q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _duckdb_chain(host_expr: str, rules, want: str) -> str:
    """The identical when-chain as DuckDB SQL (RE2 regexes, same
    patterns/anchors — shared-source with the Spark compiler)."""
    def emit(ps: int) -> str:
        n = ps + 1 if want == "rd" else ps
        pat = _last_labels_re(n)
        return (f"NULLIF(regexp_extract({host_expr}, "
                f"{_sql_q(pat)}, 1), '')")

    branches = []
    for kind, base, _k, ps in _ordered(parse_rules(rules)):
        eq = f"{host_expr} = {_sql_q(base)}"
        suff = f"ends_with({host_expr}, {_sql_q('.' + base)})"
        cond = suff if kind == "wildcard" else f"({eq} OR {suff})"
        if ps == 0:
            val = _sql_q(base) if want == "rd" else "NULL"
        else:
            val = emit(ps)
        branches.append(f"WHEN {cond} THEN {val}")
    chain = "CASE " + " ".join(branches) + f" ELSE {emit(1)} END"
    bad = (f"({host_expr} IS NULL OR {host_expr} = '' OR "
           f"starts_with({host_expr}, '[') OR "
           f"regexp_matches({host_expr}, {_sql_q(_IPV4_RE)}))")
    return f"(CASE WHEN NOT {bad} THEN {chain} END)"


def duckdb_public_suffix_sql(host_expr: str, rules=None) -> str:
    """DuckDB SQL expression mirroring :func:`public_suffix_col`."""
    return _duckdb_chain(host_expr, rules or DEFAULT_RULES, "ps")


def duckdb_registered_sql(host_expr: str, rules=None) -> str:
    """DuckDB SQL expression mirroring :func:`registered_domain_col`."""
    return _duckdb_chain(host_expr, rules or DEFAULT_RULES, "rd")
