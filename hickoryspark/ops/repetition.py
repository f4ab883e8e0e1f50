"""Gopher-style repetition signals (Rae et al. 2021, appendix A1.1).

The repetition family every modern corpus pipeline filters on (Gopher,
Dolma, FineWeb): machine-generated and boilerplate-heavy pages repeat
themselves — the same line, the same n-gram — far more than human
prose, and documents above the published thresholds get dropped. The
reference engine has no equivalent; this extends the §2 surface the
same way ops/textstats.py does. ops/lines.py removes CROSS-document
repeated lines; this scores WITHIN-document repetition.

Pinned semantics (exact, so the DuckDB oracle reproduces them):

- a "line" is a ``\\n``-split segment; its key is the line with ASCII
  space/tab stripped from both ends (the ops/lines.py key rule);
  empty-key lines are excluded from every line signal;
- ``dup_line_ppm``       = (line occurrences beyond the first of each
  key) / (all line occurrences), in parts-per-million;
- ``dup_line_char_ppm``  = (key chars on occurrences whose key appears
  >1 times — ALL such occurrences, as Gopher counts) / (key chars on
  all occurrences);
- tokens are the repo-wide ASCII-whitespace split with empties
  removed (ops/chunking.py ``ASCII_WS_SPLIT_RE``); an n-gram is n
  consecutive tokens joined with one space;
- ``top_gram``           = the most frequent n-gram, ties broken by
  lexicographically smallest; ``top_gram_ppm`` = its occurrence count
  x its char length / total n-gram occurrence chars (the Gopher
  "fraction of characters contained in the most frequent n-gram",
  with the denominator pinned to summed per-occurrence gram length);
- ``dup_gram_ppm``       = chars on occurrences of n-grams appearing
  >1 times / total n-gram occurrence chars;
- every ratio is integer arithmetic ``(num * 1000000) div den`` —
  bit-identical across engines, 0 when the denominator is 0 (the
  quality_score / readability house rule); every docs row emits an
  output row (no-line no-gram docs carry zeros and a NULL top_gram).

Scale shape: two aggregation trees (lines, n-grams), each a
``groupBy(doc_id, key)`` with map-side partial aggregation followed by
a ``doc_id``-level pass; the n-gram top pick rides the same
``doc_id`` exchange as its aggregation (window then agg — no self
join), and the final stitches are doc_id-partitioned joins Catalyst
plans without extra exchanges. Group frames are bounded by one
document's own line/token count. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["repetition_signals", "PPM", "DUCKDB_REPETITION_SQL"]

#: parts-per-million scale shared by every ratio column
PPM = 1_000_000

_KEY_TRIM = " \t"


def _line_stats(docs: DataFrame, text_col: str) -> DataFrame:
    lines = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), "\n", -1)).alias("line"),
        )
        .select(
            "doc_id", F.btrim(F.col("line"), F.lit(_KEY_TRIM)).alias("key")
        )
        .where(F.col("key") != "")
    )
    per_key = lines.groupBy("doc_id", "key").agg(F.count("*").alias("cnt"))
    occ_chars = (F.col("cnt") * F.length("key")).cast("long")
    return per_key.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.count("*").cast("long").alias("n_line_keys"),
        F.sum(F.when(F.col("cnt") > 1, occ_chars).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_line_chars"),
        F.sum(occ_chars).cast("long").alias("tot_line_chars"),
    )


def _gram_stats(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    from hickoryspark.ops.dedup import join_ngrams

    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != ""
    )
    # linear n-gram build — the transform(sequence, slice) form is
    # O(tokens^2), see join_ngrams. Materialize toks as a column first
    # so the shifted slices read an attribute, not a re-split.
    per_gram = (
        docs.select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.explode(join_ngrams(F.col("_toks"), n)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    occ_chars = (F.col("cnt") * F.length("gram")).cast("long")
    return (
        per_gram.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.max(F.when(F.col("rn") == 1, F.col("gram"))).alias("top_gram"),
            F.max(F.when(F.col("rn") == 1, occ_chars).otherwise(F.lit(0)))
            .cast("long")
            .alias("top_gram_chars"),
            F.sum(F.when(F.col("cnt") > 1, occ_chars).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_gram_chars"),
            F.sum(occ_chars).cast("long").alias("tot_gram_chars"),
        )
    )


def repetition_signals(docs: DataFrame, ngram_n: int = 2,
                       text_col: str = "text") -> DataFrame:
    """``(doc_id, n_lines, dup_line_ppm, dup_line_char_ppm, n_grams,
    top_gram, top_gram_ppm, dup_gram_ppm)`` — one row per input doc,
    every ratio an exact integer ppm (see module pin)."""
    if ngram_n < 1:
        raise ValueError("ngram_n must be >= 1")

    def ppm(num: str, den: str):
        return F.when(
            F.col(den) > 0, F.expr(f"({PPM} * {num}) div {den}")
        ).otherwise(F.lit(0)).cast("long")

    out = (
        docs.select("doc_id")
        .join(_line_stats(docs, text_col), "doc_id", "left")
        .join(_gram_stats(docs, text_col, ngram_n), "doc_id", "left")
    )
    zero = F.lit(0).cast("long")
    out = out.select(
        "doc_id",
        F.coalesce("n_lines", zero).alias("n_lines"),
        F.coalesce("n_line_keys", zero).alias("n_line_keys"),
        F.coalesce("dup_line_chars", zero).alias("dup_line_chars"),
        F.coalesce("tot_line_chars", zero).alias("tot_line_chars"),
        F.coalesce("n_grams", zero).alias("n_grams"),
        "top_gram",
        F.coalesce("top_gram_chars", zero).alias("top_gram_chars"),
        F.coalesce("dup_gram_chars", zero).alias("dup_gram_chars"),
        F.coalesce("tot_gram_chars", zero).alias("tot_gram_chars"),
    )
    return out.select(
        "doc_id",
        "n_lines",
        F.when(
            F.col("n_lines") > 0,
            F.expr(f"({PPM} * (n_lines - n_line_keys)) div n_lines"),
        ).otherwise(zero).cast("long").alias("dup_line_ppm"),
        ppm("dup_line_chars", "tot_line_chars").alias("dup_line_char_ppm"),
        "n_grams",
        "top_gram",
        ppm("top_gram_chars", "tot_gram_chars").alias("top_gram_ppm"),
        ppm("dup_gram_chars", "tot_gram_chars").alias("dup_gram_ppm"),
    )


#: exact SQL mirror of ``repetition_signals`` for the DuckDB oracle —
#: a CTE list + final SELECT with NO leading WITH, so callers compose
#: it after their own input CTE (``"WITH dirty AS (...), " + sql``) or
#: standalone (``"WITH " + sql``). Format with ``src`` (input
#: relation: doc_id, text) and ``n`` (the n-gram size). Shares every
#: pin above; final CASTs keep the output BIGINT (DuckDB SUM would
#: otherwise emit HUGEINT, which the gate lint rejects).
DUCKDB_REPETITION_SQL = """
_rl AS (
  SELECT doc_id, trim(l, ' ' || chr(9)) AS key
  FROM {src}, unnest(string_split(text, chr(10))) AS t(l)
  WHERE trim(l, ' ' || chr(9)) <> ''
), _rlc AS (
  SELECT doc_id, key, COUNT(*) AS cnt, length(key) AS klen
  FROM _rl GROUP BY doc_id, key
), _rls AS (
  SELECT doc_id,
         SUM(cnt) AS n_lines,
         COUNT(*) AS n_keys,
         SUM(CASE WHEN cnt > 1 THEN cnt * klen ELSE 0 END) AS dup_chars,
         SUM(cnt * klen) AS tot_chars
  FROM _rlc GROUP BY doc_id
), _rt AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS toks
  FROM {src}
), _rg AS (
  SELECT doc_id, array_to_string(toks[i:i+{n}-1], ' ') AS gram
  FROM _rt,
       unnest(range(1, greatest(len(toks) - {n} + 1, 0) + 1)) AS u(i)
), _rgc AS (
  SELECT doc_id, gram, COUNT(*) AS cnt, length(gram) AS glen,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY COUNT(*) DESC, gram ASC) AS rn
  FROM _rg GROUP BY doc_id, gram
), _rgs AS (
  SELECT doc_id,
         SUM(cnt) AS n_grams,
         MAX(CASE WHEN rn = 1 THEN gram END) AS top_gram,
         MAX(CASE WHEN rn = 1 THEN cnt * glen ELSE 0 END) AS top_chars,
         SUM(CASE WHEN cnt > 1 THEN cnt * glen ELSE 0 END) AS dup_chars,
         SUM(cnt * glen) AS tot_chars
  FROM _rgc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(CASE WHEN COALESCE(l.n_lines, 0) > 0
            THEN (1000000 * (l.n_lines - l.n_keys)) // l.n_lines
            ELSE 0 END AS BIGINT) AS dup_line_ppm,
       CAST(CASE WHEN COALESCE(l.tot_chars, 0) > 0
            THEN (1000000 * l.dup_chars) // l.tot_chars
            ELSE 0 END AS BIGINT) AS dup_line_char_ppm,
       CAST(COALESCE(g.n_grams, 0) AS BIGINT) AS n_grams,
       g.top_gram,
       CAST(CASE WHEN COALESCE(g.tot_chars, 0) > 0
            THEN (1000000 * g.top_chars) // g.tot_chars
            ELSE 0 END AS BIGINT) AS top_gram_ppm,
       CAST(CASE WHEN COALESCE(g.tot_chars, 0) > 0
            THEN (1000000 * g.dup_chars) // g.tot_chars
            ELSE 0 END AS BIGINT) AS dup_gram_ppm
FROM {src} d
LEFT JOIN _rls l ON d.doc_id = l.doc_id
LEFT JOIN _rgs g ON d.doc_id = g.doc_id
"""
