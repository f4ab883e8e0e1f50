"""BPE merge induction (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — learn the byte-pair
merge table from a corpus, the vocabulary step of every modern
tokenizer pipeline.

Pinned semantics (oracle-reproducible):

- words are the shared ASCII-whitespace tokens; words containing the
  U+001F separator are dropped (they cannot be represented — pinned,
  never silent corruption);
- the initial symbol sequence is the word's characters;
- each round counts adjacent symbol pairs weighted by word frequency,
  picks the winner by ``(count DESC, left ASC, right ASC)``, and
  applies the merge GREEDY LEFT-TO-RIGHT, all non-overlapping
  occurrences at once ('aaaa' + (a,a) → 'aa','aa', no re-merge within
  the round — the reference BPE behavior);
- fewer than ``n_merges`` rows come back iff the vocabulary runs out
  of adjacent pairs.

The merge application is a SHARED STRING PROGRAM: every symbol is
wrapped in its OWN ``\\x1f`` pair (``\\x1f a \\x1f \\x1f b \\x1f``
…), and a merge is one literal ``replace(w, SEP+l+SEP + SEP+r+SEP,
SEP+lr+SEP)``. The per-symbol wrapping matters: with single shared
separators, back-to-back occurrences share a boundary character, the
first replacement consumes it, and the scan then pairs the WRONG
symbols in odd runs ('aaaa' came out aa,a,a — caught by the
greedy-overlap test). With wrapped symbols no two occurrences share
characters, so Java's and DuckDB's left-to-right non-overlapping
``replace`` is exactly the greedy BPE rule (property-tested against
an independent tuple-based Python reference); the DuckDB oracle
unrolls the same program one CTE per round (the pagerank-oracle
pattern).

Scale shape: the corpus is touched ONCE (the word-frequency groupBy);
every iteration runs on the DISTINCT-WORD table — bounded by
vocabulary size, not corpus size — as pure JVM expressions, with a
single-row collect per round for the winning pair (the pagerank-style
driver loop; localCheckpoint every 8 rounds truncates lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["bpe_merges", "bpe_encode", "duckdb_bpe_sql",
           "duckdb_bpe_encode_sql", "SEP",
           "bpe_fertility", "duckdb_bpe_fertility_sql"]

#: symbol separator inside the packed word string
SEP = "\x1f"


def bpe_merges(docs: DataFrame, n_merges: int = 8,
               text_col: str = "text") -> DataFrame:
    """docs(text) → merge table ``(merge_rank, lsym, rsym,
    pair_count)``, ``merge_rank`` 1-based in learn order."""
    spark = docs.sparkSession
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
        lambda t: (t != "") & ~F.contains(t, F.lit(SEP)),
    )
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    # each symbol individually wrapped: SEP s SEP SEP s SEP ...
    cur = words.select(
        F.concat(F.lit(SEP),
                 F.array_join(chars, SEP + SEP),
                 F.lit(SEP)).alias("w"),
        "freq",
    ).persist()
    cur.count()

    merges = []
    for rank in range(1, n_merges + 1):
        # symbols are the non-empty split segments (the wrapping
        # yields '' fillers; symbols themselves are never empty)
        inner = F.filter(F.split("w", SEP), lambda s: s != "")
        n = F.size(inner)
        pairs = cur.select(
            F.explode(
                F.zip_with(
                    F.slice(inner, 1, n - 1),
                    F.slice(F.when(n >= 2, inner), 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"),
                          F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(),
                     F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((rank, l, r, int(cnt)))
        nxt = cur.select(
            F.replace(
                F.col("w"),
                F.lit(SEP + l + SEP + SEP + r + SEP),
                F.lit(SEP + l + r + SEP),
            ).alias("w"),
            "freq",
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
        # truncate lineage periodically, but never on the final round
        # (pure overhead), and unpersist the pre-checkpoint frame —
        # rebinding before unpersist would leak its cache entry for
        # the session (the pagerank guard pattern, graph.py)
        if rank % 8 == 0 and rank < n_merges:
            ckpt = cur.localCheckpoint()
            cur.unpersist()
            cur = ckpt
    cur.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank long, lsym string, rsym string, "
                "pair_count long")


def _bpe_cte_chain(docs_rel: str, n_merges: int,
                   carry_word: bool,
                   words_rel: str | None = None) -> str:
    """The ONE generator of the unrolled merge-program CTE chain —
    both mirrors (duckdb_bpe_sql, duckdb_bpe_encode_sql) derive from
    it so the separator scheme, tie rule, and token filter cannot
    diverge. ``carry_word`` threads the original word column through
    every w{i} (the encode mirror needs it). The merge step is a
    LEFT JOIN on the (at most one-row) top table with COALESCE, so an
    exhausted vocabulary passes w{i-1} through unchanged instead of
    annihilating the relation — matching the ops' documented
    early-stop behavior."""
    sep = "chr(31)"
    word_col = "word, " if carry_word else ""
    pack = (f"{sep} || array_to_string(list_filter("
            f"string_split(word, ''), c -> c != ''), "
            f"{sep} || {sep}) || {sep}")
    if words_rel is not None:
        # (word, freq) already tokenized by the caller — one corpus
        # pass shared with the caller's own CTEs (fertility mirror)
        ctes = [f"""
        w0 AS (
          SELECT {word_col}{pack} AS w,
                 CAST(freq AS BIGINT) AS freq
          FROM {words_rel})"""]
    else:
        ctes = [f"""
        w0 AS (
          SELECT {word_col}{pack} AS w,
                 CAST(COUNT(*) AS BIGINT) AS freq
          FROM (
            SELECT t.word
            FROM {docs_rel},
                 unnest(list_filter(regexp_split_to_array(
                   text, '{ASCII_WS_SPLIT_RE}'),
                   s -> s != '' AND NOT contains(s, {sep})))
                 AS t(word))
          GROUP BY 1{', 2' if carry_word else ''})"""]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""
        p{i} AS (
          SELECT lst[j] AS l, lst[j + 1] AS r,
                 CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (SELECT list_filter(string_split(w, {sep}),
                                   s -> s != '') AS lst, freq
                FROM {prev}),
               unnest(range(1, len(lst))) AS u(j)
          GROUP BY 1, 2),
        t{i} AS (
          SELECT l, r, cnt FROM p{i}
          ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        w{i} AS (
          SELECT {word_col}COALESCE(
                   replace(w, {sep} || t.l || {sep} || {sep} || t.r
                              || {sep},
                           {sep} || t.l || t.r || {sep}),
                   w) AS w, freq
          FROM {prev} LEFT JOIN t{i} t ON TRUE)""")
    return ",".join(ctes)


def duckdb_bpe_sql(docs_rel: str, n_merges: int = 8) -> str:
    """DuckDB mirror: the identical program unrolled one CTE pair per
    round (words_i / top_i)."""
    union = "\n        UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS lsym, r AS rsym, "
        f"cnt AS pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    return ("WITH " + _bpe_cte_chain(docs_rel, n_merges, False)
            + "\n        " + union)


def bpe_encode(docs: DataFrame, merges: DataFrame,
               text_col: str = "text") -> DataFrame:
    """Apply a learned merge table: docs x merges(merge_rank, lsym,
    rsym) → ``(word, freq, n_subwords, subwords)`` over the corpus's
    DISTINCT words (subwords space-joined — words are
    whitespace-free by construction, so the join is unambiguous).

    The merge list is collected driver-side (it is the learned
    artifact — k rows) and applied as k chained literal replaces in
    merge order over the wrapped-symbol packing, exactly the training
    loop's step. Expression depth grows with k, so this JVM path is
    for MODEST merge tables (the corpus-analysis use: auditing what a
    vocab of size k captures); a production 30k-merge tokenizer
    applies merges per word in a trained-tokenizer UDF instead —
    documented bound, not a silent cliff.

    Scale shape: one corpus pass for word frequencies, then pure
    column expressions over the distinct-word table; no shuffle after
    the frequency groupBy."""
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
        lambda t: (t != "") & ~F.contains(t, F.lit(SEP)),
    )
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return _encode_words(words, merges)


def _encode_words(words: DataFrame, merges: DataFrame) -> DataFrame:
    """The encode core over a (word, freq) table — shared by
    bpe_encode and bpe_fertility so the corpus is tokenized once."""
    rows = sorted(
        ((r["merge_rank"], r["lsym"], r["rsym"])
         for r in merges.select("merge_rank", "lsym", "rsym").collect()),
    )  # bounded: the learned merge table
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    w = F.concat(F.lit(SEP), F.array_join(chars, SEP + SEP),
                 F.lit(SEP))
    for _, l, r in rows:
        w = F.replace(w, F.lit(SEP + l + SEP + SEP + r + SEP),
                      F.lit(SEP + l + r + SEP))
    subs = F.filter(F.split(w, SEP), lambda s: s != "")
    return words.select(
        "word", "freq",
        F.size(subs).cast("long").alias("n_subwords"),
        F.array_join(subs, " ").alias("subwords"),
    )


def duckdb_bpe_encode_sql(docs_rel: str, n_merges: int = 8) -> str:
    """DuckDB mirror of learn-then-encode: the SHARED CTE chain
    (_bpe_cte_chain, word carried through), final select = the
    encoded distinct-word table. The chain's LEFT JOIN merge step
    means an exhausted vocabulary yields the partially-encoded table
    (matching bpe_encode), never zero rows."""
    sep = "chr(31)"
    return ("WITH " + _bpe_cte_chain(docs_rel, n_merges, True) + f"""
        SELECT word, freq,
               CAST(len(list_filter(string_split(w, {sep}),
                                    s -> s != '')) AS BIGINT)
                   AS n_subwords,
               array_to_string(list_filter(string_split(w, {sep}),
                                           s -> s != ''), ' ')
                   AS subwords
        FROM w{n_merges}""")


def bpe_fertility(docs: DataFrame, merges: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Tokenizer fertility per document — pieces-per-word under a
    learned merge table, THE signal for vocabulary-fit audits (high
    fertility = the vocab fragments this document's language/domain;
    CCNet-style corpora track it per language).

    ``(doc_id, n_words, n_pieces, fertility_milli)`` where words
    follow the bpe token rule (ASCII-ws split, ''/separator-bearing
    tokens skipped), ``n_pieces`` sums each word's subword count
    under ``merges``, and ``fertility_milli`` = 1000 * n_pieces div
    n_words. Documents with zero tokens emit nothing.

    Scale shape: ONE corpus tokenization pass — the per-(doc, word)
    counts feed both the distinct-word table (a second small rollup,
    not a second scan) and the join back; the encode's chained
    replaces run over the distinct words only; one doc groupBy."""
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
        lambda t: (t != "") & ~F.contains(t, F.lit(SEP)),
    )
    per = (
        docs.select(id_col, F.explode(toks).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    words = per.groupBy("word").agg(
        F.sum("_cnt").cast("long").alias("freq"))
    enc = _encode_words(words, merges).select("word", "n_subwords")
    agg = per.join(enc, "word").groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_words"),
        F.sum(F.col("_cnt") * F.col("n_subwords")).cast("long")
        .alias("n_pieces"),
    )
    return agg.select(
        F.col(id_col).alias("doc_id"), "n_words", "n_pieces",
        F.expr("1000 * n_pieces div n_words").alias("fertility_milli"),
    )


def duckdb_bpe_fertility_sql(docs_rel: str, n_merges: int = 8) -> str:
    """Mirror of learn-then-fertility: ONE tokenization pass (the
    tok CTE), the distinct-word table derived from it feeding the
    SHARED CTE chain, one join + doc rollup — the engine's scan
    shape, mirrored."""
    sep = "chr(31)"
    tok = f"""
        tok AS (
          SELECT doc_id, t.word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM {docs_rel},
               unnest(list_filter(regexp_split_to_array(
                 text, '{ASCII_WS_SPLIT_RE}'),
                 s -> s != '' AND NOT contains(s, {sep})))
               AS t(word)
          GROUP BY 1, 2),
        wrds AS (
          SELECT word, CAST(SUM(cnt) AS BIGINT) AS freq
          FROM tok GROUP BY 1),"""
    return ("WITH" + tok
            + _bpe_cte_chain(docs_rel, n_merges, True,
                             words_rel="wrds") + f""",
        enc AS (
          SELECT word,
                 CAST(len(list_filter(string_split(w, {sep}),
                                      s -> s != '')) AS BIGINT)
                   AS n_subwords
          FROM w{n_merges})
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               CAST(SUM(cnt * n_subwords) AS BIGINT) AS n_pieces,
               1000 * CAST(SUM(cnt * n_subwords) AS BIGINT)
                 // CAST(SUM(cnt) AS BIGINT) AS fertility_milli
        FROM tok JOIN enc USING (word)
        GROUP BY doc_id""")
