"""Paragraph-level language segmentation (code-switching detection).

Multilingual corpus builders route DOCUMENTS by language, but real
pages mix languages (boilerplate in one, content in another; quoted
passages; forum threads). Paragraph-granular language ID finds the
mixing: a doc whose paragraphs alternate languages needs splitting
or routing to a multilingual bucket, not a single-language one
(the CCNet/CommonCrawl "language segmentation" step).

Composes two pinned primitives: ops/paragraphs.split_paragraphs
(``\\n\\n+`` split, ASCII-trim keys, empty paragraphs dropped) and
ops/textstats.lang_scores/lang_best (trigram profiles, profile-order
ties, all-zero → ``unk``).

Pinned semantics (full mirror in DuckDB):

- ``paragraph_langs``: one row per NON-EMPTY paragraph —
  ``(doc_id, pos, lang_pred, n_chars)`` (pos keeps the original
  split position, so gaps mark dropped empties).
- ``codeswitch_stats``: one row per doc that has >= 1 non-empty
  paragraph — ``(doc_id, n_paras, n_lang_paras, primary_lang,
  n_switches, mixed)`` where ``n_lang_paras`` counts paragraphs
  predicted non-``unk``, ``primary_lang`` is the most frequent
  non-``unk`` language (ties → lexicographically smallest; NULL when
  every paragraph is ``unk``), ``n_switches`` counts positions whose
  non-``unk`` prediction differs from the PREVIOUS non-``unk``
  prediction (``unk`` paragraphs are transparent — they neither
  switch nor reset), and ``mixed`` = 1 iff >= 2 distinct non-``unk``
  languages appear.

Scale shape: explode + pure JVM scoring; the doc rollup is one
window pass (last-ignore-nulls previous language) + two groupBys,
all keyed by doc_id — one shuffle family, no Python, no unbounded
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.paragraphs import split_paragraphs
from hickoryspark.ops.textstats import (LANG_TRIGRAMS, lang_best,
                                        lang_scores)

__all__ = ["paragraph_langs", "codeswitch_stats",
           "duckdb_codeswitch_sql"]


def paragraph_langs(docs: DataFrame,
                    text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, lang_pred, n_chars)`` per non-empty
    paragraph."""
    paras = split_paragraphs(docs, text_col).where(F.col("key") != "")
    return paras.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        lang_best(lang_scores(F.col("para"))).alias("lang_pred"),
        F.length("para").cast("long").alias("n_chars"),
    )


def codeswitch_stats(docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Doc-level mixing rollup — see module docstring."""
    pl = paragraph_langs(docs, text_col)
    known = F.when(F.col("lang_pred") != "unk", F.col("lang_pred"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    seq = pl.select(
        "doc_id", "pos", "lang_pred",
        known.alias("_known"),
        F.last(known, ignorenulls=True).over(w).alias("_prev"),
    )
    base = seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.count("_known").cast("long").alias("n_lang_paras"),
        F.sum(
            (F.col("_known").isNotNull() & F.col("_prev").isNotNull()
             & (F.col("_known") != F.col("_prev"))).cast("long")
        ).cast("long").alias("n_switches"),
        (F.count_distinct("_known") >= 2).cast("long").alias("mixed"),
    )
    prim = (
        seq.where(F.col("_known").isNotNull())
        .groupBy("doc_id", "_known")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("_cnt")).alias("_neg"),
                            F.col("_known").alias("_lang")))
             .alias("_top"))
        .select("doc_id", F.col("_top._lang").alias("primary_lang"))
    )
    return base.join(prim, "doc_id", "left").select(
        "doc_id", "n_paras", "n_lang_paras", "primary_lang",
        "n_switches", "mixed",
    )


def duckdb_codeswitch_sql(docs_rel: str, text_col: str = "text") -> str:
    """Full DuckDB mirror of :func:`codeswitch_stats`; ``docs_rel``
    must expose (doc_id, text)."""
    score = {
        lang: " + ".join(
            f"(length(para) - length(replace(para, '{t}', ''))) // 3"
            for t in tris)
        for lang, tris in LANG_TRIGRAMS.items()
    }
    return f"""
        WITH split AS (
          SELECT doc_id,
                 regexp_split_to_array({text_col},
                     chr(10) || chr(10) || '+') AS lst
          FROM {docs_rel}),
        paras AS (
          SELECT doc_id, i - 1 AS pos, lst[i] AS para
          FROM split, unnest(range(1, len(lst) + 1)) AS u(i)
          WHERE trim(lst[i], ' ' || chr(9)) <> ''),
        scored AS (
          SELECT doc_id, pos,
                 CASE WHEN ({score['fr']})
                        > greatest(({score['en']}), ({score['de']}))
                      THEN 'fr'
                      WHEN ({score['de']}) > ({score['en']}) THEN 'de'
                      WHEN ({score['en']}) > 0 THEN 'en'
                      ELSE 'unk' END AS lang_pred
          FROM paras),
        seq AS (
          SELECT doc_id, pos,
                 CASE WHEN lang_pred <> 'unk' THEN lang_pred END
                   AS known,
                 last_value(CASE WHEN lang_pred <> 'unk'
                                 THEN lang_pred END IGNORE NULLS)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev
          FROM scored),
        base AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_paras,
                 CAST(COUNT(known) AS BIGINT) AS n_lang_paras,
                 CAST(COALESCE(SUM(CASE WHEN known IS NOT NULL
                       AND prev IS NOT NULL AND known <> prev
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_switches,
                 CAST(CASE WHEN COUNT(DISTINCT known) >= 2
                      THEN 1 ELSE 0 END AS BIGINT) AS mixed
          FROM seq GROUP BY doc_id),
        prim AS (
          SELECT doc_id, known AS primary_lang
          FROM (SELECT doc_id, known, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY COUNT(*) DESC, known) AS rn
                FROM seq WHERE known IS NOT NULL
                GROUP BY doc_id, known)
          WHERE rn = 1)
        SELECT b.doc_id, b.n_paras, b.n_lang_paras, p.primary_lang,
               b.n_switches, b.mixed
        FROM base b LEFT JOIN prim p ON b.doc_id = p.doc_id"""
