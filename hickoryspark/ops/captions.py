"""Timed-text extraction — ``<track>`` elements and WebVTT cue
parsing (the caption/subtitle side of a multimodal corpus: video-text
pairs are mined from exactly these relations, the way ops/media.py
mines image-text pairs).

The reference engine has no equivalent; this extends the §2 surface
the same way ops/links.py does for anchors.

``extract_tracks`` pinned semantics (closed-form gate oracle):

- a track row is an element with tag ``track`` carrying a ``src``
  attribute (srcless tracks are dropped — nothing to fetch);
- ``track_pos``: 1-based document-order position among the page's
  track rows;
- ``kind``: the WHATWG enumerated attribute — ASCII-lowercased value
  when in {subtitles, captions, descriptions, chapters, metadata};
  MISSING value default is ``subtitles``, INVALID value default is
  ``metadata`` (html.spec.whatwg.org 4.8.11, the two defaults
  differ by design);
- ``srclang`` / ``label`` as written (NULL when absent);
- ``is_default``: the boolean ``default`` attribute is present;
- ``resolved`` = ops/links.resolve_href(url, src);
- owner = the NEAREST enclosing ``video``/``audio`` element
  (pre_ord/subtree_end interval, the figure-ownership rule in
  ops/media.py); ``owner_tag``/``owner_src``/``owner_poster`` are
  NULL for orphan tracks. ``owner_poster`` surfaces the video poster
  frame WITHOUT widening extract_images' pinned output.

``parse_webvtt_df`` pinned grammar (a documented simplification of
the WHATWG WebVTT file parser; one Python pass per payload inside
mapInPandas — the format is stateful line-structured text, not a
relational shape):

- payload is UTF-8 (errors -> U+FFFD), one leading BOM stripped,
  CRLF/CR normalized to LF; a BLANK line is an EMPTY line;
- the first line must be exactly ``WEBVTT`` or ``WEBVTT`` followed
  by space/tab (else: zero cues for the file);
- blocks are split on blank-line runs; the header block is dropped;
  blocks whose first line starts with NOTE/STYLE/REGION are skipped;
- a cue block is [id line (no ``-->``)] + timing line + payload
  lines; the timing line matches ``(hh+:)?mm:ss.ttt --> (hh+:)?
  mm:ss.ttt [settings]`` with ASCII space/tab padding, minutes and
  seconds must be < 60; anything else skips the block;
- ``start_ms``/``end_ms`` are exact integer milliseconds; cues are
  emitted as parsed (no reordering/overlap validation);
- ``text`` = payload lines joined with LF (may be empty);
- ``plain`` = text with every ``<...>`` tag run removed, then the
  six WebVTT named references decoded (&lt; &gt; &nbsp; &lrm; &rlm;
  and &amp; LAST, so ``&amp;lt;`` yields the literal ``&lt;``).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.links import resolve_href

__all__ = ["extract_tracks", "parse_webvtt", "parse_webvtt_df",
           "TRACK_KINDS", "VTT_SCHEMA"]

TRACK_KINDS = frozenset(
    {"subtitles", "captions", "descriptions", "chapters", "metadata"})

VTT_SCHEMA = (
    "url string, cue_pos long, cue_id string, start_ms long, "
    "end_ms long, settings string, text string, plain string"
)

_TIMING_RE = re.compile(
    r"^[ \t]*(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})"
    r"[ \t]*-->[ \t]*"
    r"(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})"
    r"(?:[ \t]+(.*))?$"
)
_TAG_RE = re.compile(r"<[^>]*>")
# &amp; decodes LAST: the pairs are applied in this order
_VTT_REFS = [("&lt;", "<"), ("&gt;", ">"), ("&nbsp;", "\u00a0"),
             ("&lrm;", "\u200e"), ("&rlm;", "\u200f"), ("&amp;", "&")]


def extract_tracks(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per ``<track src=...>``: ``(url,
    track_pos, kind, srclang, label, is_default, src, resolved,
    owner_tag, owner_src, owner_poster)``."""
    a = F.col("attrs")
    is_elem = F.col("type") == TYPE_ELEMENT
    tracks = nodes.where(
        is_elem & (F.col("tag") == "track") & a["src"].isNotNull()
    ).select(
        "url",
        F.col("pre_ord").alias("t_ord"),
        a["src"].alias("src"),
        F.lower(a["kind"]).alias("_kind_raw"),
        a["kind"].isNotNull().alias("_kind_present"),
        a["srclang"].alias("srclang"),
        a["label"].alias("label"),
        a.getItem("default").isNotNull().alias("is_default"),
    )
    owners = nodes.where(is_elem & F.col("tag").isin("video", "audio")).select(
        F.col("url").alias("o_url"),
        F.col("pre_ord").alias("o_ord"),
        F.col("subtree_end").alias("o_end"),
        F.col("tag").alias("o_tag"),
        F.col("attrs")["src"].alias("o_src"),
        F.col("attrs")["poster"].alias("o_poster"),
    )
    # nearest enclosing owner: max (o_ord, ...) struct over enclosers
    owned = tracks.join(
        owners,
        (tracks["url"] == owners["o_url"])
        & (owners["o_ord"] < tracks["t_ord"])
        & (tracks["t_ord"] <= owners["o_end"]),
        "left",
    ).groupBy(
        "url", "t_ord", "src", "_kind_raw", "_kind_present",
        "srclang", "label", "is_default",
    ).agg(
        F.max(F.struct("o_ord", "o_tag", "o_src", "o_poster")).alias("_o"),
    )
    kind = (
        F.when(~F.col("_kind_present"), F.lit("subtitles"))
        .when(F.col("_kind_raw").isin(*TRACK_KINDS), F.col("_kind_raw"))
        .otherwise(F.lit("metadata"))
    )
    w = Window.partitionBy("url").orderBy("t_ord")
    return owned.select(
        "url",
        F.row_number().over(w).cast("long").alias("track_pos"),
        kind.alias("kind"),
        "srclang",
        "label",
        "is_default",
        "src",
        resolve_href(F.col("url"), F.col("src")).alias("resolved"),
        F.col("_o")["o_tag"].alias("owner_tag"),
        F.col("_o")["o_src"].alias("owner_src"),
        F.col("_o")["o_poster"].alias("owner_poster"),
    )


def _decode_refs(s: str) -> str:
    for pat, rep in _VTT_REFS:
        s = s.replace(pat, rep)
    return s


def _ts_ms(h: str | None, m: str, s: str, ms: str) -> int:
    return (int(h or 0) * 3600000 + int(m) * 60000 + int(s) * 1000
            + int(ms))


def parse_webvtt(payload: bytes) -> list[dict]:
    """One WebVTT payload -> cue dicts (the pinned grammar above)."""
    text = payload.decode("utf-8", errors="replace")
    if text.startswith("\ufeff"):
        text = text[1:]
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    lines = text.split("\n")
    first = lines[0] if lines else ""
    if not (first == "WEBVTT" or first.startswith(("WEBVTT ", "WEBVTT\t"))):
        return []
    # blocks = runs of non-blank lines; the first (header) is dropped
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        blocks.append(cur)
    out: list[dict] = []
    for blk in blocks[1:]:
        if blk[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        cue_id = None
        ti = 0
        if "-->" not in blk[0]:
            if len(blk) < 2 or "-->" not in blk[1]:
                continue
            cue_id, ti = blk[0], 1
        m = _TIMING_RE.match(blk[ti])
        if m is None:
            continue
        settings = m.group(9)
        body = "\n".join(blk[ti + 1:])
        out.append({
            "cue_id": cue_id,
            "start_ms": _ts_ms(m.group(1), m.group(2), m.group(3),
                               m.group(4)),
            "end_ms": _ts_ms(m.group(5), m.group(6), m.group(7),
                             m.group(8)),
            "settings": settings if settings else None,
            "text": body,
            "plain": _decode_refs(_TAG_RE.sub("", body)),
        })
    return out


def parse_webvtt_df(vtt: DataFrame) -> DataFrame:
    """vtt(url, payload binary) -> exploded cue rows (VTT_SCHEMA);
    row-local, no shuffle. NULL payloads degrade to 0 rows (the
    feeds/sitemaps fetch-failure convention)."""
    import pandas as pd

    cols = ["cue_id", "start_ms", "end_ms", "settings", "text", "plain"]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ["url", "cue_pos", *cols]}
            for url, payload in zip(b["url"], b["payload"]):
                if payload is None:
                    continue
                for i, cue in enumerate(parse_webvtt(bytes(payload)), 1):
                    rows["url"].append(url)
                    rows["cue_pos"].append(i)
                    for k in cols:
                        rows[k].append(cue[k])
            yield pd.DataFrame(rows)

    return vtt.select("url", "payload").mapInPandas(gen, VTT_SCHEMA)
