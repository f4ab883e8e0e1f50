"""Geotag extraction — page coordinates from meta carriers.

Local-search corpora, POI mining and regional corpus balancing need
per-page coordinates; the web carries them in three meta-tag
conventions, extracted here with the publish_dates carrier-priority
discipline (validity filtered BEFORE the priority pick, so broken
carriers fall through):

1. ``<meta name="geo.position" content="lat;lon">`` (semicolon —
   the geo-tagging convention, with ``geo.region``/``geo.placename``
   as companion strings);
2. ``<meta name="ICBM" content="lat, lon">`` (comma);
3. ``<meta property="place:location:latitude">`` +
   ``…:longitude`` (OpenGraph place — two separate tags, both
   required).

Pinned semantics:

- numbers are ``[+-]?1-3 digits`` with ≤6 fraction digits (the cap
  makes ×10⁶ EXACT — ``lat_micro``/``lon_micro`` are BIGINT
  micro-degrees, no floor ambiguity); |lat| ≤ 90, |lon| ≤ 180 or the
  carrier is invalid;
- attribute names/properties match ASCII-lowercased; content
  verbatim; first valid carrier IN DOCUMENT ORDER wins per kind
  (min-struct, the page_metadata rule); ``src`` records which kind
  won overall under the priority position > icbm > og;
- ``region``/``placename``: first ``geo.region``/``geo.placename``
  content in document order, NULL-safe.

Scale shape: ONE url groupBy over the meta rows — every pick is a
min-struct aggregate on the same shuffle; no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT

__all__ = ["extract_geo", "duckdb_geo_sql"]

_NUM = r"[+-]?[0-9]{1,3}(?:[.][0-9]{1,6})?"
PAIR_SEMI_RE = rf"\A *({_NUM}) *; *({_NUM}) *\z"
PAIR_COMMA_RE = rf"\A *({_NUM}) *, *({_NUM}) *\z"
NUM_ONLY_RE = rf"\A *({_NUM}) *\z"


def _micro(dec_str):
    # exact: ≤6 fraction digits by construction, so ×1e6 is integral
    return (F.col(dec_str).cast("decimal(10,6)")
            * F.lit(1_000_000)).cast("long")


def extract_geo(nodes: DataFrame) -> DataFrame:
    """node table → ``(url, lat_micro, lon_micro, src, region,
    placename)`` — one row per page that carries any geo meta."""
    a = F.col("attrs")
    metas = nodes.where(
        (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "meta")
        & a["content"].isNotNull()
    ).select(
        "url", "pre_ord",
        F.lower(a["name"]).alias("name"),
        F.lower(a["property"]).alias("prop"),
        a["content"].alias("content"),
    )

    def pair(rx):
        la = F.regexp_extract("content", rx, 1)
        lo = F.regexp_extract("content", rx, 2)
        ok = (
            (la != "")
            & (F.abs(la.try_cast("decimal(10,6)")) <= 90)
            & (F.abs(lo.try_cast("decimal(10,6)")) <= 180)
        )
        return la, lo, ok

    p_la, p_lo, p_ok = pair(PAIR_SEMI_RE)
    i_la, i_lo, i_ok = pair(PAIR_COMMA_RE)
    og_v = F.regexp_extract("content", NUM_ONLY_RE, 1)

    rows = metas.select(
        "url", "pre_ord", "name", "prop", "content",
        p_la.alias("p_la"), p_lo.alias("p_lo"), p_ok.alias("p_ok"),
        i_la.alias("i_la"), i_lo.alias("i_lo"), i_ok.alias("i_ok"),
        og_v.alias("og_v"),
    )

    def pick(cond, *vals):
        return F.min(F.when(cond, F.struct(
            F.col("pre_ord").alias("o"),
            *[F.col(v).alias(v) for v in vals])))

    og_lat_ok = (
        (F.col("prop") == "place:location:latitude")
        & (F.col("og_v") != "")
        & (F.abs(F.col("og_v").try_cast("decimal(10,6)")) <= 90))
    og_lon_ok = (
        (F.col("prop") == "place:location:longitude")
        & (F.col("og_v") != "")
        & (F.abs(F.col("og_v").try_cast("decimal(10,6)")) <= 180))

    agg = rows.groupBy("url").agg(
        pick((F.col("name") == "geo.position") & F.col("p_ok"),
             "p_la", "p_lo").alias("pos"),
        pick((F.col("name") == "icbm") & F.col("i_ok"),
             "i_la", "i_lo").alias("icbm"),
        pick(og_lat_ok, "og_v").alias("og_la"),
        pick(og_lon_ok, "og_v").alias("og_lo"),
        pick(F.col("name") == "geo.region", "content").alias("region"),
        pick(F.col("name") == "geo.placename", "content")
        .alias("placename"),
    )

    has_og = (F.col("og_la").isNotNull() & F.col("og_lo").isNotNull())
    src = (
        F.when(F.col("pos").isNotNull(), F.lit("position"))
        .when(F.col("icbm").isNotNull(), F.lit("icbm"))
        .when(has_og, F.lit("og"))
    )
    la = (
        F.when(F.col("pos").isNotNull(), F.col("pos")["p_la"])
        .when(F.col("icbm").isNotNull(), F.col("icbm")["i_la"])
        .when(has_og, F.col("og_la")["og_v"])
    )
    lo = (
        F.when(F.col("pos").isNotNull(), F.col("pos")["p_lo"])
        .when(F.col("icbm").isNotNull(), F.col("icbm")["i_lo"])
        .when(has_og, F.col("og_lo")["og_v"])
    )
    out = agg.select(
        "url",
        la.alias("_la"), lo.alias("_lo"), src.alias("src"),
        F.col("region")["content"].alias("region"),
        F.col("placename")["content"].alias("placename"),
    ).where(
        F.col("src").isNotNull() | F.col("region").isNotNull()
        | F.col("placename").isNotNull()
    )
    return out.select(
        "url", _micro("_la").alias("lat_micro"),
        _micro("_lo").alias("lon_micro"),
        "src", "region", "placename",
    )


def duckdb_geo_sql(nodes_cte: str) -> str:
    """DuckDB mirror over a relation exposing one row per meta tag:
    ``(url, pre_ord, name, prop, content)`` (names/props already
    lowercased). Same regexes, picks, priority."""
    num = _NUM.replace("'", "''")
    semi = rf"\A *({num}) *; *({num}) *\z"
    comma = rf"\A *({num}) *, *({num}) *\z"
    only = rf"\A *({num}) *\z"
    return f"""
        WITH geo_r AS (
          SELECT url, pre_ord, name, prop, content,
                 regexp_extract(content, '{semi}', 1) AS p_la,
                 regexp_extract(content, '{semi}', 2) AS p_lo,
                 regexp_extract(content, '{comma}', 1) AS i_la,
                 regexp_extract(content, '{comma}', 2) AS i_lo,
                 regexp_extract(content, '{only}', 1) AS og_v
          FROM {nodes_cte}
        ), geo_a AS (
          SELECT url,
            min(struct_pack(o := pre_ord, la := p_la, lo := p_lo))
              FILTER (WHERE name = 'geo.position' AND p_la <> ''
                      AND abs(TRY_CAST(p_la AS DECIMAL(10,6))) <= 90
                      AND abs(TRY_CAST(p_lo AS DECIMAL(10,6))) <= 180)
              AS pos,
            min(struct_pack(o := pre_ord, la := i_la, lo := i_lo))
              FILTER (WHERE name = 'icbm' AND i_la <> ''
                      AND abs(TRY_CAST(i_la AS DECIMAL(10,6))) <= 90
                      AND abs(TRY_CAST(i_lo AS DECIMAL(10,6))) <= 180)
              AS icbm,
            min(struct_pack(o := pre_ord, v := og_v))
              FILTER (WHERE prop = 'place:location:latitude'
                      AND og_v <> ''
                      AND abs(TRY_CAST(og_v AS DECIMAL(10,6))) <= 90)
              AS og_la,
            min(struct_pack(o := pre_ord, v := og_v))
              FILTER (WHERE prop = 'place:location:longitude'
                      AND og_v <> ''
                      AND abs(TRY_CAST(og_v AS DECIMAL(10,6))) <= 180)
              AS og_lo,
            min(struct_pack(o := pre_ord, v := content))
              FILTER (WHERE name = 'geo.region') AS region,
            min(struct_pack(o := pre_ord, v := content))
              FILTER (WHERE name = 'geo.placename') AS placename
          FROM geo_r GROUP BY url
        )
        SELECT url,
               CAST(CAST(CASE WHEN pos IS NOT NULL THEN pos.la
                         WHEN icbm IS NOT NULL THEN icbm.la
                         WHEN og_la IS NOT NULL AND og_lo IS NOT NULL
                         THEN og_la.v END AS DECIMAL(10,6)) * 1000000
                    AS BIGINT) AS lat_micro,
               CAST(CAST(CASE WHEN pos IS NOT NULL THEN pos.lo
                         WHEN icbm IS NOT NULL THEN icbm.lo
                         WHEN og_la IS NOT NULL AND og_lo IS NOT NULL
                         THEN og_lo.v END AS DECIMAL(10,6)) * 1000000
                    AS BIGINT) AS lon_micro,
               CASE WHEN pos IS NOT NULL THEN 'position'
                    WHEN icbm IS NOT NULL THEN 'icbm'
                    WHEN og_la IS NOT NULL AND og_lo IS NOT NULL
                    THEN 'og' END AS src,
               region.v AS region, placename.v AS placename
        FROM geo_a
        WHERE pos IS NOT NULL OR icbm IS NOT NULL
           OR (og_la IS NOT NULL AND og_lo IS NOT NULL)
           OR region IS NOT NULL OR placename IS NOT NULL"""
