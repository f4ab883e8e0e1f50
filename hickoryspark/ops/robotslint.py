"""robots.txt linting — fleet-wide syntax health audit.

Crawl operators audit the robots.txt fleet before trusting it:
orphan rules (before any User-agent line) are silently dropped by
RFC 9309 parsers, unknown directives betray hand-edited files whose
intent the crawler ignores, and a missing ``*`` group means default-
allow for every unnamed agent. This op rolls those signals up per
host, built on the SAME :func:`hickoryspark.ops.robots._group_lines`
state machine the real REP evaluator uses — the lint counts and the
enforcement semantics cannot drift apart.

Per host: ``(host, n_lines, n_groups, n_rules, n_orphan_rules,
n_unknown, n_sitemaps, has_catchall)``.

- ``n_lines``: non-empty lines after comment stripping;
- ``n_groups``: agent-run starts (a contiguous User-agent run is one
  group);
- ``n_rules``: Allow/Disallow lines attributed to a group;
  ``n_orphan_rules``: Allow/Disallow lines before any User-agent;
- ``n_unknown``: lines whose key is none of user-agent / allow /
  disallow / sitemap / crawl-delay / host;
- ``has_catchall``: 1 iff some group names agent ``*``.

Python-in-Arrow-batches (mapInPandas) like the other robots
consumers — robots files are tiny and per-host; the cost class is
sanctioned.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from hickoryspark.ops.robots import _group_lines

__all__ = ["lint_robots", "lint_robots_df", "KNOWN_DIRECTIVES"]

KNOWN_DIRECTIVES = frozenset(
    {"user-agent", "allow", "disallow", "sitemap", "crawl-delay",
     "host"})

_SCHEMA = ("host string, n_lines long, n_groups long, n_rules long, "
           "n_orphan_rules long, n_unknown long, n_sitemaps long, "
           "has_catchall long")


def lint_robots(content: str) -> tuple[int, int, int, int, int, int, int]:
    """One file → the seven lint counters (see module docstring)."""
    n_lines = n_groups = n_rules = n_orphan = n_unknown = n_maps = 0
    catchall = 0
    prev_run: list[str] | None = None
    for key, _value, current in _group_lines(content):
        n_lines += 1
        if key == "user-agent":
            if current is not prev_run:
                n_groups += 1
                prev_run = current
            if "*" in current:
                catchall = 1
        elif key in ("allow", "disallow"):
            if current:
                n_rules += 1
            else:
                n_orphan += 1
        elif key == "sitemap":
            n_maps += 1
        elif key not in KNOWN_DIRECTIVES:
            n_unknown += 1
    return (n_lines, n_groups, n_rules, n_orphan, n_unknown, n_maps,
            catchall)


def lint_robots_df(robots: DataFrame, host_col: str = "host",
                   content_col: str = "content") -> DataFrame:
    """(host, content) rows → one lint row per host."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                if content is None:
                    continue
                rows.append((host,) + lint_robots(content))
            yield pd.DataFrame(
                rows, columns=["host", "n_lines", "n_groups",
                               "n_rules", "n_orphan_rules",
                               "n_unknown", "n_sitemaps",
                               "has_catchall"])

    return robots.select(host_col, content_col).mapInPandas(
        run, _SCHEMA)
