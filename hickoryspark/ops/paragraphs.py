"""Paragraph-level exact deduplication (Dolma-style keep-first).

The complement to ops/lines.py (which drops lines FREQUENT across
documents): here every exact-duplicate PARAGRAPH occurrence after the
corpus-global first one is removed — the Dolma / RefinedWeb "paragraph
dedup" pass that strips syndicated blocks, quoted boilerplate, and
copy-pasted sections while keeping one canonical copy. The reference
engine has no equivalent; this extends the §2 surface the same way
ops/dedup.py does.

Pinned semantics (so the DuckDB oracle can reproduce them exactly):

- a PARAGRAPH is a segment of ``text`` split on the regex ``\\n\\n+``
  (two-or-more newlines collapse into one separator; single ``\\n``
  stays inside its paragraph);
- the MATCH KEY is the paragraph with ASCII space/tab stripped from
  both ends; the emitted text keeps the paragraph AS WRITTEN;
- empty-key paragraphs are never counted and always kept;
- the kept occurrence of a key is the one with the corpus-global
  minimum ``(doc_id, pos)`` — deterministic under any partitioning;
  every other occurrence (including repeats INSIDE the first doc) is
  dropped;
- output ``text`` rejoins kept paragraphs with exactly ``\\n\\n`` in
  original order (the split is lossy about separator runs BY DESIGN —
  documented, like ops/markdown.py's pinned dialect); a fully-duplicate
  doc yields ``''``, never a missing row;
- ``n_paras_kept`` / ``n_paras_removed`` partition ALL paragraphs
  (empty-key ones count as kept).

Scale shape: the first-seen table is ONE map-side-combinable
``min(struct(doc_id, pos))`` aggregation per key — never a window over
the key (a 10M-copy viral paragraph would funnel one window partition;
the min-struct partial-aggregates inside each task instead). Then one
equi-join back on the key (big-to-big, AQE skew-safe) and the per-doc
reassembly groupBy whose ``collect_list`` frame is bounded by a single
document's own paragraph count. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_paragraphs", "paragraph_first_seen",
           "dedup_paragraphs"]

#: ASCII space + tab — the key trim set (NOT Unicode strip)
_KEY_TRIM = " \t"

#: shared verbatim with the DuckDB oracle (Java regex ∩ RE2)
PARA_SPLIT_RE = "\n\n+"


def split_paragraphs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, para, key)`` — one row per paragraph, 0-based
    position, with the trimmed match key."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.col(text_col), PARA_SPLIT_RE, -1)
        ).alias("pos", "para"),
    ).withColumn("key", F.btrim(F.col("para"), F.lit(_KEY_TRIM)))


def paragraph_first_seen(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Corpus-global first occurrence per non-empty paragraph key:
    ``(key, first_doc, first_pos)``."""
    return (
        split_paragraphs(docs, text_col)
        .where(F.col("key") != "")
        .groupBy("key")
        .agg(F.min(F.struct("doc_id", "pos")).alias("_first"))
        .select(
            "key",
            F.col("_first.doc_id").alias("first_doc"),
            F.col("_first.pos").alias("first_pos"),
        )
    )


def dedup_paragraphs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Remove every duplicate-paragraph occurrence after the corpus-
    global first. Returns ``(doc_id, text, n_paras_kept,
    n_paras_removed)`` for EVERY input document."""
    paras = split_paragraphs(docs, text_col)
    first = paragraph_first_seen(docs, text_col)
    flagged = paras.join(first, "key", "left").select(
        "doc_id", "pos", "para",
        (
            F.col("first_doc").isNotNull()
            & ~((F.col("doc_id") == F.col("first_doc"))
                & (F.col("pos") == F.col("first_pos")))
        ).alias("drop"),
    )
    rebuilt = flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "drop", "para"))),
                    lambda s: ~s["drop"],
                ),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("text"),
        F.sum((~F.col("drop")).cast("long")).alias("n_paras_kept"),
        F.sum(F.col("drop").cast("long")).alias("n_paras_removed"),
    )
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("n_paras_kept"), F.lit(0)).cast("long").alias(
            "n_paras_kept"),
        F.coalesce(F.col("n_paras_removed"), F.lit(0)).cast("long").alias(
            "n_paras_removed"),
    )
