"""robots.txt (Robots Exclusion Protocol, RFC 9309 subset) parsing and
URL filtering — the crawl-side admission control a web-scale extraction
pipeline runs before anything else touches a page.

Parser semantics (RFC 9309):
- groups: one or more ``User-agent:`` lines followed by rules; rules
  before any user-agent line are ignored; comments (#) stripped.
- group selection: the crawler uses the group(s) whose product token
  equals its own (case-insensitive); if none match, the ``*`` group;
  if neither exists, everything is allowed. Multiple groups for the
  same agent merge.
- rule matching: ``Allow``/``Disallow`` values are path prefixes with
  ``*`` (any chars) and ``$`` (end anchor) wildcards; the rule with
  the LONGEST value octet-length that matches the path wins; on a
  tie, ``Allow`` wins. An empty ``Disallow:`` matches nothing. No
  matching rule means allowed.

Spark surface: ``robots_filter`` joins pages against a per-host robots
relation and evaluates admission in one ``mapInPandas`` pass with a
per-task parse cache (a host's rules parse once per task, not once per
row). The join is an unhinted equi-join on host — AQE broadcasts the
robots side when it is small; at design scale (millions of hosts) it
shuffles both sides on the host key, which is exactly the partitioning
a crawl frontier already has.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _group_lines(content: str):
    """The ONE group-attribution state machine every robots.txt
    consumer in this module shares (parse_robots, parse_crawl_delays
    — their pinned 'same agent-run rule' equivalence is structural,
    not two hand-synced loops): yields ``(key, value, current)``
    for each non-empty line, where ``key`` is lowercased, ``value``
    comment-stripped and trimmed, and ``current`` is the agent list
    of the group in effect (empty before any User-agent line). A
    contiguous User-agent run accumulates agents; any other line
    ends the run but not the group."""
    current: list[str] = []
    last_was_agent = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            agent = value.lower()
            if last_was_agent:
                current.append(agent)
            else:
                current = [agent]
            last_was_agent = True
        else:
            last_was_agent = False
        yield key, value, current


def parse_robots(content: str) -> dict[str, list[tuple[bool, str]]]:
    """robots.txt text -> {agent(lower): [(is_allow, value), ...]}.
    Groups for the same agent merge; rules preceding any User-agent
    line are dropped (RFC 9309 §2.2.1)."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    for key, value, current in _group_lines(content):
        if key == "user-agent":
            for a in current:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            if not current:
                continue  # rule before any user-agent line
            if key == "disallow" and value == "":
                continue  # empty Disallow matches nothing
            for a in current:
                groups.setdefault(a, []).append((key == "allow", value))
        # sitemap / crawl-delay / unknown lines carry no rules here
    return groups


def rules_for_agent(
    groups: dict[str, list[tuple[bool, str]]], agent: str
) -> list[tuple[bool, str]]:
    """The rule list the given crawler obeys: its own group if present,
    else the ``*`` group, else no rules (allow everything)."""
    return groups.get(agent.lower(), groups.get("*", []))


def _compile_value(value: str) -> tuple[list[str], bool]:
    """Rule value -> ('*'-split literal chunks, end-anchored?). A FINAL
    '$' anchors the end ('$' anywhere else is a literal)."""
    body, anchored = (
        (value[:-1], True) if value.endswith("$") else (value, False)
    )
    return body.split("*"), anchored


def _match(parts: list[str], anchored: bool, path: str) -> bool:
    """Linear greedy wildcard-prefix match (the standard glob chunk
    algorithm): first chunk must be a path prefix, middle chunks are
    found greedily left-to-right, and with a '$' anchor the last chunk
    must additionally end the path. No regex backtracking — robots.txt
    is untrusted web content, and a hostile many-'*' rule sent Python
    re into >30s exponential backtracking per page row."""
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    if len(parts) == 1:
        return path == parts[0] if anchored else True
    for part in parts[1:-1]:
        i = path.find(part, pos)
        if i < 0:
            return False
        pos = i + len(part)
    last = parts[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    i = path.find(last, pos)
    return i >= 0


def compile_rules(
    rules: list[tuple[bool, str]]
) -> list[tuple[bool, str, int, tuple[list[str], bool]]]:
    """Precompile a rule list for the hot loop: (is_allow, value,
    octet_length, ('*'-chunks, anchored)) per rule."""
    return [
        (is_allow, value, len(value.encode()), _compile_value(value))
        for is_allow, value in rules
    ]


def evaluate(rules: list[tuple[bool, str]], path: str) -> tuple[bool, str]:
    """(allowed, winning_rule_value) for a path; ('', allowed) when no
    rule matches. Longest-octet-length match wins; Allow wins ties."""
    return evaluate_compiled(compile_rules(rules), path)


def evaluate_compiled(
    compiled: list[tuple[bool, str, int, tuple[list[str], bool]]],
    path: str,
) -> tuple[bool, str]:
    best: tuple[int, bool, str] | None = None
    for is_allow, value, octets, (parts, anchored) in compiled:
        if _match(parts, anchored, path):
            if best is None or (octets, is_allow) > (best[0], best[1]):
                best = (octets, is_allow, value)
    if best is None:
        return True, ""
    return best[1], best[2]


def robots_filter(
    pages: DataFrame, robots: DataFrame, agent: str = "*"
) -> DataFrame:
    """pages(url, ...) x robots(host, content) -> (url, allowed,
    matched_rule).

    One row per page; ``allowed`` is the REP verdict for ``agent``,
    ``matched_rule`` the winning rule value ('' when none / no robots
    for the host — both allowed). The host join is case-insensitive
    with default http(s) ports stripped on both sides (hostnames are
    case-insensitive; 'EX.TEST:443' must hit the 'ex.test' row)."""
    import pandas as pd

    def norm_host(c):
        return F.lower(F.regexp_replace(c, r":(80|443)$", ""))

    host = norm_host(F.regexp_extract("url", _HOST_RE, 1)).alias("host")
    # RFC 9309 matches against path + query, and an empty path
    # evaluates as '/': a path-less url with a query ('https://h?p=2')
    # strips to '?p=2', which must become '/?p=2' or no '/'-prefixed
    # rule (including 'Disallow: /') could ever match it
    raw_path = F.regexp_replace("url", _HOST_RE, "")
    path = F.when(
        raw_path.startswith("/"), raw_path
    ).otherwise(F.concat(F.lit("/"), raw_path)).alias("path")
    joined = (
        pages.select("url", host, path)
        .join(
            robots.select(
                norm_host(F.col("host")).alias("r_host"), "content"
            ),
            F.col("host") == F.col("r_host"),
            "left",
        )
        .select("url", "host", "path", "content")
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # per-task cache keyed by HOST (cheap hash), storing COMPILED
        # rules — one parse + regex-compile per host per task, not a
        # content-length hash and regex rebuild per row per rule
        cache: dict[str, list] = {}
        for b in batches:
            if not len(b):
                continue
            allowed, matched = [], []
            for h, p, content in zip(b["host"], b["path"], b["content"]):
                if content is None:
                    allowed.append(True)
                    matched.append("")
                    continue
                compiled = cache.get(h)
                if compiled is None:
                    compiled = compile_rules(
                        rules_for_agent(parse_robots(content), agent)
                    )
                    cache[h] = compiled
                ok, rule = evaluate_compiled(compiled, p or "/")
                allowed.append(ok)
                matched.append(rule)
            yield pd.DataFrame(
                {"url": b["url"], "allowed": allowed, "matched_rule": matched}
            )

    return joined.mapInPandas(gen, "url string, allowed boolean, matched_rule string")


def robots_sitemaps(robots: DataFrame) -> DataFrame:
    """robots(host, content) -> (host, sitemap_pos, sitemap_url):
    the ``Sitemap:`` directive values in file order.

    RFC 9309 §2.2.4 carries these as "other records" valid anywhere in
    the file, and sitemaps.org defines them host-wide — independent of
    any user-agent group, which is why ``parse_robots`` ignores them
    (they end an agent-line run but never scope to it). Comments strip
    from the first ``#``; key matching is case-insensitive with
    optional whitespace around the colon; empty values drop.

    Pure JVM column program (explode → filter → window): one host
    shuffle for the position numbering, feeding parse_sitemaps_df
    (ops/sitemaps.py) once the caller fetches the payloads.
    """
    ws = F.lit(" \t\r")
    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col("content"), "\n")).alias(
            "line_no", "line"
        ),
    )
    clean = F.btrim(F.regexp_replace("line", r"#[\s\S]*", ""), ws)
    vals = (
        lines.select("host", "line_no", clean.alias("clean"))
        .where(F.lower(F.col("clean")).rlike(r"^sitemap[ \t]*:"))
        .select(
            "host",
            "line_no",
            F.btrim(
                F.expr("substring(clean, instr(clean, ':') + 1)"), ws
            ).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    return vals.select(
        "host",
        F.row_number().over(w).cast("long").alias("sitemap_pos"),
        "sitemap_url",
    )


def parse_crawl_delays(content: str) -> dict[str, int]:
    """robots.txt text -> {agent(lower): delay_ms}. ``Crawl-delay`` is
    not in RFC 9309 but is honored by most major crawlers; pinned
    semantics: the value is decimal seconds (integer or fraction),
    converted to whole milliseconds (truncated); values that do not
    parse, are negative, or exceed 86400s are ignored; when an
    agent's merged groups carry several delays, the LARGEST wins
    (most polite). Group attribution follows parse_robots exactly
    (same agent-run rule; a delay before any User-agent line is
    dropped)."""
    delays: dict[str, int] = {}
    for key, value, current in _group_lines(content):
        if key != "crawl-delay" or not current:
            continue
        # plain decimal only (no sign, exponent, underscores, inf);
        # exact ms via integer arithmetic — float()*1000 truncates
        # '1.005' to 1004
        m = re.fullmatch(r"([0-9]+)(?:\.([0-9]+))?", value)
        if m is None:
            continue
        whole, frac = int(m.group(1)), (m.group(2) or "")
        if whole > 86400 or (whole == 86400 and frac.strip("0")):
            continue
        ms = whole * 1000 + int((frac + "000")[:3])
        for a in current:
            if ms > delays.get(a, -1):
                delays[a] = ms
    return delays


def host_crawl_delays(robots: DataFrame, agent: str = "*",
                      default_ms: int = 0) -> DataFrame:
    """robots(host, content) -> (host, delay_ms): the politeness
    interval ``agent`` must keep per host — its own group's delay if
    any, else the ``*`` group's, else ``default_ms``. Feed straight
    into ops/hosts.frontier_batches-style per-host pacing.

    Scale shape: one mapInPandas pass over the robots relation (one
    row per host — the same sanctioned cost class as robots_filter's
    parse side; no join, no shuffle)."""
    import pandas as pd

    a = agent.lower()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            out = []
            for content in b["content"]:
                if content is None:
                    out.append(default_ms)
                    continue
                d = parse_crawl_delays(content)
                ms = d.get(a, d.get("*", default_ms))
                out.append(ms)
            yield pd.DataFrame({"host": b["host"], "delay_ms": out})

    return robots.select("host", "content").mapInPandas(
        gen, "host string, delay_ms long")


def robots_rules_df(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """(host, content) -> DISTINCT effective rule rows
    ``(host, is_allow, value)`` for ``agent`` — the same
    parse_robots/rules_for_agent pair the evaluator uses, exposed
    relationally so rule SETS can be joined/diffed."""
    import pandas as pd

    def gen(batches):
        for b in batches:
            if not len(b):
                continue
            hosts, allows, values = [], [], []
            for host, content in zip(b[host_col], b[content_col]):
                if content is None:
                    continue
                for is_allow, value in rules_for_agent(
                    parse_robots(str(content)), agent
                ):
                    hosts.append(host)
                    allows.append(bool(is_allow))
                    values.append(value)
            yield pd.DataFrame(
                {"host": hosts, "is_allow": allows, "value": values}
            )

    return robots.mapInPandas(
        gen, "host string, is_allow boolean, value string"
    ).distinct()


def robots_drift(
    old: DataFrame,
    new: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """Rule-level robots.txt drift between two snapshots — the
    monitoring signal a recrawl scheduler watches (a host that
    TIGHTENS its policy invalidates cached admission verdicts):
    ``(host, n_added, n_removed, n_unchanged, tightened, status)``.

    Pinned semantics: the diff is over the DISTINCT effective rule
    set for ``agent`` (presence, not multiplicity); ``tightened`` iff
    any DISALLOW rule was added or any ALLOW rule removed; ``status``
    is ``added_host`` / ``removed_host`` (host present in one
    snapshot only — tracked via presence columns off the INPUT host
    sets, the crawl_delta lesson: a host whose robots parses to zero
    rules is still present) / ``changed`` / ``unchanged``.

    Scale shape: two shuffle-free parse passes, one (host, is_allow,
    value) full-outer equi-join + one host-grain rollup, one host
    presence full-outer join.
    """
    o = robots_rules_df(old, agent, host_col, content_col).select(
        "host", "is_allow", "value", F.lit(1).alias("_in_old")
    )
    n = robots_rules_df(new, agent, host_col, content_col).select(
        F.col("host").alias("_nh"),
        F.col("is_allow").alias("_na"),
        F.col("value").alias("_nv"),
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(
        n,
        (F.col("host") == F.col("_nh"))
        & (F.col("is_allow") == F.col("_na"))
        & (F.col("value") == F.col("_nv")),
        "full_outer",
    ).select(
        F.coalesce("host", "_nh").alias("host"),
        F.coalesce("is_allow", "_na").alias("is_allow"),
        F.col("_in_old"),
        F.col("_in_new"),
    )
    per_host = joined.groupBy("host").agg(
        F.sum(F.when(F.col("_in_old").isNull(), 1).otherwise(0))
        .cast("long").alias("n_added"),
        F.sum(F.when(F.col("_in_new").isNull(), 1).otherwise(0))
        .cast("long").alias("n_removed"),
        F.sum(F.when(F.col("_in_old").isNotNull()
                     & F.col("_in_new").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_unchanged"),
        F.max(
            F.when(
                (F.col("_in_old").isNull() & ~F.col("is_allow"))
                | (F.col("_in_new").isNull() & F.col("is_allow")),
                1,
            ).otherwise(0)
        ).cast("long").alias("_tight"),
    )
    oh = old.select(F.col(host_col).alias("host")).distinct().withColumn(
        "_h_old", F.lit(1))
    nh = new.select(F.col(host_col).alias("_nhh")).distinct().withColumn(
        "_h_new", F.lit(1))
    hosts = oh.join(
        nh, F.col("host") == F.col("_nhh"), "full_outer"
    ).select(
        F.coalesce("host", "_nhh").alias("host"), "_h_old", "_h_new"
    )
    out = hosts.join(per_host, "host", "left")
    n_added = F.coalesce("n_added", F.lit(0))
    n_removed = F.coalesce("n_removed", F.lit(0))
    status = (
        F.when(F.col("_h_old").isNull(), "added_host")
        .when(F.col("_h_new").isNull(), "removed_host")
        .when((n_added + n_removed) > 0, "changed")
        .otherwise("unchanged")
    )
    return out.select(
        "host",
        n_added.cast("long").alias("n_added"),
        n_removed.cast("long").alias("n_removed"),
        F.coalesce("n_unchanged", F.lit(0)).cast("long")
        .alias("n_unchanged"),
        (F.coalesce("_tight", F.lit(0)) == 1).alias("tightened"),
        status.alias("status"),
    )
