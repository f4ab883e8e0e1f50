"""WAT metadata records — the Common Crawl metadata derivative.

Every WARC archive ships a WAT sidecar: one ``metadata`` record per
HTML capture holding a JSON envelope of the capture's structural
metadata (page title, out-links with anchor text). Link-graph and
anchor-corpus pipelines consume WAT, not WARC — this op composes the
repo's metadata rollup (``ops.metadata.page_metadata``) and link
extraction (``ops.links.extract_links``, subtree anchor text) with
deterministic JSON + record formatting, completing the capture-
artifact family: ops/warc.py (source), ops/wet.py (text), ops/cdx.py
(index), this module (metadata). The reference engine has no
equivalent; net-new surface.

Pinned dialect (oracle-reproducible, a documented SUBSET of the real
WAT envelope — the real format carries dozens of header echoes):

- payload = ``{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":
  <url>,"WARC-Date":<date>},"Payload-Metadata":{"HTML-Metadata":
  {"Head":{"Title":<title>},"Links":[{"url":<resolved>,"text":
  <anchor>},...]}}}}`` — keys in exactly that order, no whitespace.
  A missing OR empty title serializes as ``"Head":{}`` (the two
  collapse — page_metadata pins '' for title-less pages; documented
  lossy fold); a page with no out-links as ``"Links":[]`` (never
  omitted).
- JSON string escaping is the RFC 8259 minimum: ``\\`` and ``"``
  escaped, C0 controls as ``\\b \\f \\n \\r \\t`` or ``\\u00XX`` —
  applied by a SHARED escape-pair program (``JSON_ESC_PAIRS``) so the
  DuckDB mirror is generated from the same table. Nothing else is
  escaped (no non-ASCII ``\\u`` folding: payloads stay UTF-8).
- ``record_id`` = ``urn:md5:`` + md5 of ``'wat:' + url + '\\n' +
  date`` (deterministic — the wet_records deviation, salted so a WAT
  and WET record for the same capture never collide).
- ``content_length`` counts payload OCTETS (UTF-8 bytes).
- record headers: ``WARC-Type: metadata``, ``Content-Type:
  application/json``, CRLF line ends, blank line, payload, CRLF CRLF.
- NULL capture date propagates to NULL record_id/record (the WARC
  reader emits NaT on malformed archives); the row survives.

Scale shape: one url-shuffle for the links aggregation + the one
page_metadata shuffle + an equi-join of the two per-url relations
(both already partitioned by url, AQE-planned) — no Python beyond the
node table that feeds both inputs; writers concatenate ``record`` per
partition (one WAT file per task, the ops/warc.py layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["wat_records", "json_escape", "JSON_ESC_PAIRS",
           "duckdb_json_escape_sql"]

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

#: (raw, escaped) applied IN ORDER — backslash first (later steps
#: introduce backslashes that must not be re-escaped), then the quote,
#: then every C0 control (short forms where RFC 8259 names one).
JSON_ESC_PAIRS: list[tuple[str, str]] = (
    [("\\", "\\\\"), ('"', '\\"'),
     ("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
     ("\r", "\\r"), ("\t", "\\t")]
    + [(chr(c), "\\u%04x" % c)
       for c in range(0x20) if chr(c) not in "\b\f\n\r\t"]
)


def json_escape(col: Column) -> Column:
    """RFC 8259 minimal string escape as a replace chain (JVM-side)."""
    for raw, esc in JSON_ESC_PAIRS:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def duckdb_json_escape_sql(expr: str) -> str:
    """The identical escape chain over a DuckDB expression string."""
    for raw, esc in JSON_ESC_PAIRS:
        raw_sql = ("chr(%d)" % ord(raw) if ord(raw) < 0x20
                   else "'" + raw.replace("'", "''") + "'")
        esc_sql = "'" + esc.replace("'", "''") + "'"
        expr = f"replace({expr}, {raw_sql}, {esc_sql})"
    return expr


def _q(col: Column) -> Column:
    """Escaped column wrapped in JSON double quotes."""
    return F.concat(F.lit('"'), json_escape(col), F.lit('"'))


def wat_records(nodes: DataFrame, captures: DataFrame,
                url_col: str = "url", ts_col: str = "ts") -> DataFrame:
    """Node table + (url, ts) captures -> WAT rows ``(url, wat_date,
    record_id, content_length, record)``.

    ``nodes`` is explode_nodes output (or materialize_nodes — both
    link and metadata aggregations group by url, so a bucketed input
    keeps the whole op shuffle-free up to the final equi-joins);
    ``captures`` supplies the WARC-Date timestamp per url (NTZ —
    tz-independent formatting, the events_windowed lesson).
    """
    from hickoryspark.ops.links import extract_links
    from hickoryspark.ops.metadata import page_metadata

    meta = page_metadata(nodes).select("url", "title")

    links = extract_links(nodes, subtree_text=True)
    item = F.concat(
        F.lit('{"url":'), _q(F.coalesce(F.col("resolved"), F.col("href"))),
        F.lit(',"text":'), _q(F.col("anchor_text")), F.lit("}"))
    link_lists = (
        links.select("url", F.struct(F.col("link_pos").alias("p"),
                                     item.alias("s")).alias("it"))
        .groupBy("url")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list("it")),
                        lambda x: x["s"]),
            ",").alias("links_json"))
    )

    cap = captures.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), _DATE_FMT).alias("wat_date"))

    joined = (meta
              .join(link_lists, "url", "left")
              .join(cap, "url", "left"))

    head = F.when(
        F.col("title").isNotNull() & (F.col("title") != ""),
        F.concat(F.lit('{"Title":'), _q(F.col("title")), F.lit("}")),
    ).otherwise(F.lit("{}"))
    payload = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":'),
        _q(F.col("url")),
        F.lit(',"WARC-Date":'), _q(F.col("wat_date")),
        F.lit('},"Payload-Metadata":{"HTML-Metadata":{"Head":'), head,
        F.lit(',"Links":['),
        F.coalesce(F.col("links_json"), F.lit("")),
        F.lit("]}}}}"))
    record_id = F.concat(
        F.lit("urn:md5:"),
        F.md5(F.concat(F.lit("wat:"), F.col("url"), F.lit("\n"),
                       F.col("wat_date"))))
    n_bytes = F.octet_length(payload).cast("long")
    record = F.concat(
        F.lit("WARC/1.0\r\n"
              "WARC-Type: metadata\r\n"
              "WARC-Target-URI: "), F.col("url"),
        F.lit("\r\nWARC-Date: "), F.col("wat_date"),
        F.lit("\r\nWARC-Record-ID: <"), record_id,
        F.lit(">\r\nContent-Type: application/json\r\n"
              "Content-Length: "), n_bytes.cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"))
    # a NULL wat_date NULLs the payload (it is concatenated in), so
    # record_id/content_length/record all ride to NULL together — the
    # pinned WET behavior for malformed capture dates; the row stays.
    return joined.select(
        "url", "wat_date", record_id.alias("record_id"),
        n_bytes.alias("content_length"),
        record.alias("record"))
