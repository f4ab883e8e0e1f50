"""AI-training / TDM opt-out audit.

Corpus governance for LLM pipelines: publishers signal machine-use
restrictions through three carriers — robots-meta directives
(``noai`` / ``noimageai``, the DeviantArt/Raptive convention, plus
Google's ``noarchive`` / ``nosnippet`` / ``max-snippet:N``), the
same directives in ``X-Robots-Tag`` response headers, and the W3C
TDM Reservation Protocol (TDMRep: ``tdm-reservation`` meta/header
``1`` with an optional ``tdm-policy`` URL). A compliant training
pipeline joins this audit and drops (or licenses) opted-out pages.

Pinned semantics:

- Directive tokenization follows ops/metadata.meta_robots_flags
  verbatim: comma-split, ASCII-ws-trim, case-insensitive; UNLIKE
  page_metadata's first-robots-meta pick, ALL robots metas of a page
  contribute (most-restrictive-wins is the published rule).
- ``max_snippet``: minimum N over ``max-snippet:N`` directives with
  N >= 0 (``-1`` means unlimited and is ignored); optional ASCII ws
  after the colon; NULL when no carrier sets one.
- TDMRep: reserved iff a ``tdm-reservation`` meta content / header
  value trims to exactly ``1``; ``tdm_policy`` = first (document
  order / first header) policy URL as written.
- Header side reuses ops/http.x_robots_values — the agent-scope rule
  of x_robots_flags applies to the X-Robots-Tag directives.
- Output: one row per url present in EITHER carrier (full outer),
  flags as BIGINT 0/1 (NULL-safe zeros), ``ai_optout`` =
  noai | noimageai | tdm_reserved.

Scale shape: the meta side is one filter + ONE url groupBy over the
node table; the header side runs parse_headers_df twice (once inside
x_robots_values, once for the TDM headers — both head-bounded string
scans) with a url groupBy each; one full-outer url equi-join marries
the carriers. Pure JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.metadata import _DIRECTIVE_TRIM

__all__ = ["meta_ai_optout", "http_ai_optout", "ai_optout"]

_MAX_SNIPPET_RE = "^max-snippet:[ \\t\\n\\x0B\\f\\r]*(-?[0-9]+)$"

_FLAGS = ("noai", "noimageai", "nosnippet", "noarchive")


def _directive_cols(tokens: Column) -> list:
    """BIGINT flag + max_snippet columns from a token array."""
    cols = [
        F.array_contains(tokens, d).cast("long").alias(d)
        for d in _FLAGS
    ]
    ms = F.filter(
        F.transform(
            tokens,
            lambda t: F.regexp_extract(t, _MAX_SNIPPET_RE, 1)
            .try_cast("long"),
        ),
        lambda v: v >= 0,
    )
    cols.append(F.array_min(ms).alias("max_snippet"))
    return cols


def _tok(content: Column) -> Column:
    from hickoryspark.ops.metadata import robots_directive_tokens

    return robots_directive_tokens(content)


def meta_ai_optout(nodes: DataFrame) -> DataFrame:
    """``(url, noai, noimageai, nosnippet, noarchive, max_snippet,
    tdm_reserved, tdm_policy)`` from the meta carriers — one url
    groupBy."""
    a = F.col("attrs")
    name = F.lower(a["name"])
    is_meta = (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "meta")
    carriers = nodes.where(
        is_meta & name.isin("robots", "tdm-reservation", "tdm-policy")
    ).select(
        "url",
        F.col("pre_ord").alias("_ord"),
        name.alias("_name"),
        a["content"].alias("_content"),
    )
    robots = F.when(F.col("_name") == "robots", F.col("_content"))
    tdm_r = ((F.col("_name") == "tdm-reservation")
             & (F.btrim(F.coalesce(F.col("_content"), F.lit("")),
                        F.lit(_DIRECTIVE_TRIM)) == "1"))
    # empty policy values are no policy (matches the header side —
    # an empty meta must not shadow a real header URL in the merge)
    policy = F.when(
        (F.col("_name") == "tdm-policy")
        & F.col("_content").isNotNull() & (F.col("_content") != ""),
        F.struct("_ord", F.col("_content").alias("v")),
    )
    agg = carriers.groupBy("url").agg(
        _tok(F.concat_ws(",", F.collect_list(robots))).alias("_toks"),
        F.max(tdm_r).alias("_tdm"),
        F.min(policy).alias("_pol"),
    )
    return agg.select(
        "url",
        *_directive_cols(F.col("_toks")),
        F.coalesce(F.col("_tdm").cast("long"), F.lit(0))
        .alias("tdm_reserved"),
        F.col("_pol.v").alias("tdm_policy"),
    )


def http_ai_optout(responses: DataFrame, raw_col: str = "raw",
                   agent: str | None = None) -> DataFrame:
    """Header-side twin over raw response heads (url, raw)."""
    from hickoryspark.ops.http import parse_headers_df, x_robots_values

    xr = x_robots_values(responses, raw_col=raw_col, agent=agent)
    headers = parse_headers_df(responses, raw_col=raw_col)
    tdm_r = ((F.col("name") == "tdm-reservation")
             & (F.btrim(F.coalesce(F.col("value"), F.lit("")),
                        F.lit(_DIRECTIVE_TRIM)) == "1"))
    policy = F.when(
        (F.col("name") == "tdm-policy") & (F.col("value") != ""),
        F.struct("field_pos", F.col("value").alias("v")),
    )
    tdm = headers.groupBy("url").agg(
        F.max(tdm_r).alias("_tdm"),
        F.min(policy).alias("_pol"),
    )
    return xr.join(tdm, "url", "left").select(
        "url",
        *_directive_cols(_tok(F.col("xr"))),
        F.coalesce(F.col("_tdm").cast("long"), F.lit(0))
        .alias("tdm_reserved"),
        F.col("_pol.v").alias("tdm_policy"),
    )


def ai_optout(nodes: DataFrame, responses: DataFrame,
              agent: str | None = None) -> DataFrame:
    """Combined audit: most-restrictive merge of the meta and header
    carriers; ``ai_optout`` = noai | noimageai | tdm_reserved."""
    m = meta_ai_optout(nodes)
    h = http_ai_optout(responses, agent=agent)
    mm = m.select("url", *[F.col(c).alias(f"m_{c}")
                           for c in m.columns if c != "url"])
    hh = h.select("url", *[F.col(c).alias(f"h_{c}")
                           for c in h.columns if c != "url"])
    j = mm.join(hh, "url", "full_outer")

    def flag(c: str) -> Column:
        return F.greatest(
            F.coalesce(F.col(f"m_{c}"), F.lit(0)),
            F.coalesce(F.col(f"h_{c}"), F.lit(0)),
        ).alias(c)

    out = j.select(
        "url",
        *[flag(c) for c in _FLAGS],
        F.least(F.col("m_max_snippet"), F.col("h_max_snippet"))
        .alias("max_snippet"),
        flag("tdm_reserved"),
        F.coalesce(F.col("m_tdm_policy"), F.col("h_tdm_policy"))
        .alias("tdm_policy"),
    )
    return out.withColumn(
        "ai_optout",
        F.greatest("noai", "noimageai", "tdm_reserved"),
    )
