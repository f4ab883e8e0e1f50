"""Line-level corpus deduplication (CCNet-style boilerplate strip).

The corpus-hygiene step between extraction and document-level dedup:
lines that recur across many documents (cookie banners, "subscribe"
prompts, copyright footers) are boilerplate the extractor let through,
and the standard recipe — CCNet / RefinedWeb / Dolma all ship a
variant — drops every line whose (trimmed) form appears in at least
``min_docs`` distinct documents, then stitches the survivors back
together in original order. The reference engine has no equivalent;
this extends the §2 surface the same way ops/dedup.py does.

Pinned semantics (so the DuckDB oracle can reproduce them exactly):

- a "line" is a ``\\n``-split segment of ``text`` (no ``\\r`` handling
  here — CRLF inputs go through ops.textnorm first);
- the MATCH KEY is the line with ASCII space/tab stripped from both
  ends; the emitted text keeps the line AS WRITTEN;
- lines whose key is empty are never counted and always kept;
- a line is dropped when its key appears in >= ``min_docs`` DISTINCT
  documents (document frequency, not occurrence count);
- output ``text`` joins the kept lines with ``\\n`` in original order
  (a fully-boilerplate doc yields ``''``, never a missing row);
- ``n_lines_kept`` / ``n_lines_removed`` partition ALL input lines
  (empty-key lines count as kept).

Scale shape: two shuffles total — the document-frequency aggregation
(map-side partial on the line key; the key set is a small fraction of
corpus bytes because only repeated lines survive the threshold join)
and the per-doc reassembly groupBy. The frequency join is a plain
equi-join on the key (big-to-big, AQE handles skew on mega-lines like
''-adjacent banners); the reassembly ``collect_list`` is bounded by a
single document's own line count — the same row already held the full
text. No Python anywhere in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_lines", "line_doc_frequencies", "dedup_lines"]

#: ASCII space + tab — the key trim set (NOT Unicode strip)
_KEY_TRIM = " \t"


def split_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, line, key)`` — one row per newline-split segment,
    0-based position, with the trimmed match key."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    ).withColumn("key", F.btrim(F.col("line"), F.lit(_KEY_TRIM)))


def line_doc_frequencies(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Document frequency per non-empty line key: ``(key, n_docs)``.

    ``n_docs`` counts DISTINCT documents containing the key (a doc
    repeating its own banner 50 times contributes 1).
    """
    return (
        split_lines(docs, text_col)
        .where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    )


def dedup_lines(docs: DataFrame, min_docs: int = 2,
                text_col: str = "text") -> DataFrame:
    """Strip corpus-frequent lines from every document.

    Returns ``(doc_id, text, n_lines_kept, n_lines_removed)`` for EVERY
    input document — ``text`` is the kept lines rejoined with ``\\n``
    in original order ('' when everything was boilerplate).
    """
    lines = split_lines(docs, text_col)
    frequent = (
        line_doc_frequencies(docs, text_col)
        .where(F.col("n_docs") >= min_docs)
        .select("key", F.lit(True).alias("drop"))
    )
    flagged = (
        lines.join(frequent, "key", "left")
        .select(
            "doc_id", "pos", "line",
            F.coalesce(F.col("drop"), F.lit(False)).alias("drop"),
        )
    )
    rebuilt = flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                # struct sort orders by the first field: original order
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "drop", "line"))),
                    lambda s: ~s["drop"],
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.sum((~F.col("drop")).cast("long")).alias("n_lines_kept"),
        F.sum(F.col("drop").cast("long")).alias("n_lines_removed"),
    )
    # posexplode never drops a doc (split always yields >= 1 segment),
    # but keep the contract explicit against future text_col rewrites
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias(
            "n_lines_kept"),
        F.coalesce(F.col("n_lines_removed"), F.lit(0)).cast("long").alias(
            "n_lines_removed"),
    )
