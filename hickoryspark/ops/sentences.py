"""Sentence segmentation — sentence-level corpus preprocessing.

Sentence-level dedup (the WMT/ParaCrawl recipe), per-sentence quality
scoring, and sentence-pack training formats all start from this
relation. The reference engine has no equivalent; this extends the §2
surface the same way ops/chunking.py does for token windows.

Pinned semantics (exact, so the DuckDB oracle reproduces them):

- a sentence boundary is a maximal ``[.!?]+`` run followed by one or
  more ASCII whitespace chars; the punctuation stays with the LEFT
  sentence, the whitespace is consumed;
- implemented WITHOUT lookbehind (RE2 has none): the boundary pattern
  ``([.!?]+)[ws]+`` is rewritten to ``$1<US>`` (U+001F unit
  separator) and the text is split on ``<US>`` — the separator char
  is stripped from the input first, so hostile text cannot inject
  boundaries (ops/textnorm strips all C0 controls anyway);
- each sentence is then ASCII-ws-trimmed; empty results are dropped;
  a text with no boundary yields one sentence (its trimmed self,
  unless empty);
- ``sent_pos`` is 1-based over the KEPT sentences; ``n_tokens`` is
  the ASCII-ws token count of the trimmed sentence.

Scale shape: pure map-side generator explode — zero shuffles, whole
pipeline in one project (plan-guarded in tests). The regex pair is
shared verbatim with the DuckDB mirror (Java ``$1`` vs RE2 ``\\1``
backref spelling only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["split_sentences", "SENT_BOUNDARY_RE", "SENT_SEP"]

#: the boundary pattern (group 1 = terminal punctuation run); the
#: trailing class is the repo-wide ASCII whitespace class
SENT_BOUNDARY_RE = "([.!?]+)" + ASCII_WS_SPLIT_RE

#: U+001F unit separator — injected as the split marker after the
#: input is scrubbed of it
SENT_SEP = "\x1f"

_TRIM = " \t\n\x0b\f\r"


def split_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, sent_pos, sentence, n_tokens)`` — one row per
    non-empty trimmed sentence, document order."""
    scrubbed = F.regexp_replace(F.col(text_col), SENT_SEP, "")
    marked = F.regexp_replace(scrubbed, SENT_BOUNDARY_RE,
                              "$1" + SENT_SEP)
    sents = F.filter(
        F.transform(
            F.split(marked, SENT_SEP, -1),
            lambda s: F.btrim(s, F.lit(_TRIM)),
        ),
        lambda s: s != "",
    )
    return docs.select(
        "doc_id", F.posexplode(sents).alias("_p", "sentence")
    ).select(
        "doc_id",
        (F.col("_p") + 1).cast("long").alias("sent_pos"),
        "sentence",
        F.size(
            F.filter(F.split(F.col("sentence"), ASCII_WS_SPLIT_RE),
                     lambda t: t != "")
        ).cast("long").alias("n_tokens"),
    )


#: exact SQL mirror — format with ``src`` (relation: doc_id, text).
#: CTE list + final SELECT, no leading WITH (compose like
#: DUCKDB_REPETITION_SQL). \\x1F spelled via chr(31).
DUCKDB_SENTENCES_SQL = """
_ss AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(text, chr(31), '', 'g'),
           '([.!?]+)[ \t\n\x0B\f\r]+', '\\1' || chr(31), 'g') AS m
  FROM {src}
), _sx AS (
  SELECT doc_id, i AS rawpos,
         trim(lst[i], ' ' || chr(9) || chr(10) || chr(11) || chr(12)
              || chr(13)) AS sentence
  FROM (SELECT doc_id, string_split(m, chr(31)) AS lst FROM _ss),
       unnest(range(1, len(lst) + 1)) AS u(i)
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rawpos)
            AS BIGINT) AS sent_pos,
       sentence,
       CAST(len(list_filter(string_split_regex(sentence,
            '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens
FROM _sx WHERE sentence <> ''
"""


def remove_frequent_sentences(
    docs: DataFrame, min_count: int = 3, text_col: str = "text"
) -> DataFrame:
    """C4-style corpus-frequency sentence removal (Raffel et al.
    2020 dropped any three-sentence span occurring 3+ times; the
    sentence-grain variant here is the Dolma/ParaCrawl boilerplate
    rule): drop every sentence whose EXACT trimmed form occurs
    ``min_count``+ times across the corpus (occurrences, not
    documents — a doc repeating its own slogan counts each time),
    then reassemble each doc from its surviving sentences in document
    order (single-space join).

    Output ``(doc_id, n_kept, n_dropped, text)`` — every input doc
    keeps its row (a fully-boilerplate doc shows n_kept 0 and empty
    text; the filter downstream must SEE it).

    Scale shape: the sentence relation is the shuffle-free
    split_sentences explode; frequency is ONE groupBy(sentence)
    aggregation (map-side combined — never a per-sentence window);
    survivors come from a left_anti equi-join against the frequent
    set; reassembly is a doc-bounded sorted collect joined back LEFT
    onto the input so empty docs survive.
    """
    sents = split_sentences(docs, text_col)
    frequent = (
        sents.groupBy("sentence")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("sentence")
    )
    kept = sents.join(frequent, "sentence", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sent_pos", "sentence"))
                ),
                lambda s: s["sentence"],
            ),
            " ",
        ).alias("_text"),
    )
    totals = sents.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_total")
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("_n_total", F.lit(0))
             - F.coalesce("n_kept", F.lit(0))).cast("long")
            .alias("n_dropped"),
            F.coalesce("_text", F.lit("")).alias("text"),
        )
    )


#: mirror: compose with DUCKDB_SENTENCES_SQL's CTE list over ``{src}``
def duckdb_remove_frequent_sql(src: str, min_count: int = 3) -> str:
    return (
        "WITH " + DUCKDB_SENTENCES_SQL.replace("{src}", src)
        .replace(
            "SELECT doc_id,\n       CAST(ROW_NUMBER()",
            ", _sents AS (\nSELECT doc_id,\n       CAST(ROW_NUMBER()",
        )
        + f"""
        ), freq AS (
          SELECT sentence FROM _sents GROUP BY sentence
          HAVING COUNT(*) >= {min_count}
        ), kept AS (
          SELECT s.* FROM _sents s
          WHERE NOT EXISTS (SELECT 1 FROM freq f
                            WHERE f.sentence = s.sentence)
        ), rebuilt AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 string_agg(sentence, ' ' ORDER BY sent_pos) AS t
          FROM kept GROUP BY doc_id
        ), totals AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
          FROM _sents GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(t.n_total, 0) - COALESCE(r.n_kept, 0)
                    AS BIGINT) AS n_dropped,
               COALESCE(r.t, '') AS text
        FROM {src} d
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)"""
    )
