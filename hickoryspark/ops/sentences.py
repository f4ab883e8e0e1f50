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
