"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

Everything is a closed-form column expression (whole-stage codegen,
zero Python), deterministic, and mirrored 1:1 in DuckDB SQL for the
correctness oracle. Heuristics are the standard web-text ones
(stopword ratio, type-token ratio, length stats) scoped to this
corpus's lowercase-alnum text; the same expressions extend to real
text by swapping the tokenizer regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English function-word list — enough signal for n-gram-free
#: heuristic language ID on this corpus; extend for real text.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: BPE-ish sub-token split: runs of letters, runs of digits, or a
#: single other non-space char — a cheap proxy for tokenizer cost.
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _toks() -> Column:
    return F.split(F.col("text"), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, n_bpe) — whitespace tokens, distinct
    types, and BPE-ish sub-token count via regexp extraction."""
    toks = _toks()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0)).alias(
            "n_bpe"
        ),
    )


def quality_score(docs: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """Deterministic quality score in micro-points (0..1,000,000):
    500000·type_token_ratio + 300000·min(1, n_tokens/64) +
    200000·stopword_ratio — computed entirely in *integer* arithmetic
    (floor division) so the value is bit-identical across engines; no
    float rounding ties. The three standard boilerplate/garbage
    signals: lexical diversity, adequate length, function-word rate."""
    toks = _toks()
    n = F.size(toks).cast("long")
    types = F.size(F.array_distinct(toks)).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in EN_STOPWORDS]))
    ).cast("long")
    score = (
        F.floor(types * 500000 / n)
        + F.least(F.lit(300000), F.floor(n * 300000 / 64))
        + F.floor(stop_hits * 200000 / n)
    )
    return docs.select(
        "doc_id", *extra_cols, score.cast("long").alias("quality_ppm")
    )


def lang_id(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio >= threshold → 'en'
    else 'unk'. (The corpus text is synthetic; the decision rule — a
    function-word-rate threshold — is the real-world shape.)"""
    toks = _toks()
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in EN_STOPWORDS]))
    )
    ratio = hits / F.size(toks)
    return docs.select(
        "doc_id",
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk")).alias(
            "lang_pred"
        ),
        F.round(ratio, 6).alias("stopword_ratio"),
    )


#: char-trigram profiles for heuristic language scoring (the classic
#: n-gram-profile method; tiny deliberately — extend per language)
LANG_TRIGRAMS = {
    "en": ("the", "and", "ing", "ion", "ent"),
    "de": ("der", "ein", "ich", "sch", "und"),
    "fr": ("les", "des", "que", "ait", "oir"),
}


def _substr_count(text: Column, s: str) -> Column:
    """Non-overlapping occurrences of literal s — identical semantics
    to the oracle's (len(text) - len(replace(text, s, ''))) / len(s)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(s), F.lit(""))))
        / len(s)
    ).cast("long")


def lang_scores(text: Column) -> dict:
    """Per-language summed trigram occurrence counts (profile order
    preserved) — the shared scoring core of :func:`lang_trigram` and
    ops/codeswitch.py."""
    return {
        lang: sum(
            (_substr_count(text, t) for t in tris), F.lit(0).cast("long")
        )
        for lang, tris in LANG_TRIGRAMS.items()
    }


def lang_best(scores: dict) -> Column:
    """Argmax language over :func:`lang_scores` output — ties keep
    the EARLIER profile, all-zero → 'unk'."""
    best = F.lit("unk")
    best_score = F.lit(0).cast("long")
    # iterate in profile order; strict > keeps the earlier lang on ties
    for lang, sc in scores.items():
        take = sc > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, sc).otherwise(best_score)
    return best


def lang_trigram(docs: DataFrame) -> DataFrame:
    """Character-n-gram language ID: score each language profile by
    summed trigram occurrence counts; argmax wins (ties broken by the
    profile order en, de, fr), all-zero → 'unk'. Pure JVM expressions."""
    text = F.col("text")
    scores = lang_scores(text)
    best = lang_best(scores)
    return docs.select(
        "doc_id",
        best.alias("lang_pred"),
        *[sc.alias(f"score_{lang}") for lang, sc in scores.items()],
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-style (Rae et al. 2021) document-quality rules, the
    subset meaningful on whitespace-tokenized text, in exact integer
    arithmetic (bit-identical across engines):

    - word count within [50, 100000]
    - mean word length within [3, 10] chars (3n <= word_chars <= 10n,
      word_chars = len(text) - (n-1) separator spaces)
    - duplicate-token fraction <= 30% ((n - n_types)*10 <= n*3)

    Returns the metrics plus the combined pass flag, so downstream
    filtering composes (`where(passes_gopher)`)."""
    toks = _toks()
    n = F.size(toks).cast("long")
    types = F.size(F.array_distinct(toks)).cast("long")
    word_chars = (F.length("text") - (n - 1)).cast("long")
    ok_count = (n >= 50) & (n <= 100000)
    ok_wordlen = (word_chars >= 3 * n) & (word_chars <= 10 * n)
    ok_dup = (n - types) * 10 <= n * 3
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        word_chars.alias("word_chars"),
        (n - types).alias("n_dup_tokens"),
        (ok_count & ok_wordlen & ok_dup).alias("passes_gopher"),
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level top-k token n-grams by document frequency THEN
    total count: explode distinct shingles per doc → one groupBy
    (map-side partial agg) → top-k by (df desc, ngram asc). The
    classic corpus-stats job; at scale the only shuffle is the count
    groupBy plus the tiny k-row ordered take."""
    from hickoryspark.ops.dedup import shingles

    counts = (
        docs.select(
            F.explode(F.array_distinct(shingles(F.col("text"), n))).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("df"))
    )
    return (
        counts.orderBy(F.col("df").desc(), F.col("ngram"))
        .limit(k)
        .select("ngram", "df")
    )


def fingerprint(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Document fingerprint: min md5 over token n-gram shingles (the
    winnowing-style 'min-of-rolling-hashes' reduced to its one-band
    form) + full-content hash. Collision of fp_min across docs ⇒
    shared shingle ⇒ near-dup candidate."""
    from hickoryspark.ops.dedup import shingles

    sh = shingles(F.col("text"), shingle_n)
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_hash"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fp_min"),
    )


def readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_sentences, n_words, n_syllables, flesch_milli) —
    Flesch reading ease in milli-points, all-integer arithmetic so the
    value is bit-identical across engines (the quality_score rule).

    Pinned approximations (documented so oracles can reproduce them):
    sentences = maximal runs of ``[.!?]`` (min 1); words = whitespace
    tokens (the house ``split(text, ' ')`` convention, min 1);
    syllables = maximal vowel-group runs ``[aeiouyAEIOUY]+`` (min 1).
    flesch_milli = 206835 - (1015·words) div sentences
                 - (84600·syllables) div words.
    Pure JVM column expressions — no shuffle, no Python.
    """
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
    ).cast("long")
    n_words = F.greatest(F.lit(1), F.size(_toks())).cast("long")
    n_syl = F.greatest(
        F.lit(1),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[aeiouyAEIOUY]+"), 0)
        ),
    ).cast("long")
    return docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syl.alias("n_syllables"),
    ).select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        (
            F.lit(206835)
            - F.expr("(1015 * n_words) div n_sentences")
            - F.expr("(84600 * n_syllables) div n_words")
        ).cast("long").alias("flesch_milli"),
    )


def link_density(nodes: DataFrame) -> DataFrame:
    """``(url, n_text_chars, n_anchor_chars, anchor_char_ppm)`` — the
    boilerpipe-style link-density signal: pages whose visible text is
    mostly anchor text are navigation/boilerplate, not content.

    Pinned semantics: ``n_text_chars`` sums the char length of every
    VISIBLE text node on the page — script/style/noscript rawtext and
    comment data (a text row whose parent is the comment) are
    excluded, since 2 KB of JS would otherwise classify a pure-nav
    page as content; ``<title>`` text stays counted. ``n_anchor_chars``
    sums the same over text nodes having an ``<a>`` ANCESTOR at any
    depth (counted once even under nested anchors — membership is a
    left_semi interval probe); ``anchor_char_ppm = (anchor*1e6) div
    text`` (0 when no text). Every url emits a row.

    Spark shape: one url-equi interval semi-join (the descendant_rel
    pattern) + one url groupBy riding the same partitioning — no
    nested loop, no second shuffle of the text rows; the url universe
    comes from the per-page document-root rows (a map-side filter,
    not a full node-table distinct).
    """
    from hickoryspark.nodes import (
        TYPE_COMMENT as _TC,
        TYPE_DOCUMENT as _TD,
        TYPE_ELEMENT as _TE,
        TYPE_TEXT as _TT,
    )

    hidden = F.col("parent_tag").isin("script", "style", "noscript") | (
        F.col("parent_type") == _TC
    )
    texts = nodes.where(
        (F.col("type") == _TT) & ~F.coalesce(hidden, F.lit(False))
    ).select(
        "url",
        F.col("pre_ord").alias("t_ord"),
        F.length("text").cast("long").alias("t_len"),
    )
    anchors = nodes.where(
        (F.col("type") == _TE) & (F.col("tag") == "a")
    ).select(
        F.col("url").alias("a_url"),
        F.col("pre_ord").alias("a_ord"),
        F.col("subtree_end").alias("a_end"),
    )
    in_anchor = texts.join(
        anchors,
        (texts["url"] == anchors["a_url"])
        & (texts["t_ord"] > anchors["a_ord"])
        & (texts["t_ord"] <= anchors["a_end"]),
        "left_semi",
    ).select("url", "t_ord", F.col("t_len").alias("a_len"))
    per_url = (
        texts.join(in_anchor, ["url", "t_ord"], "left")
        .groupBy("url")
        .agg(
            F.sum("t_len").cast("long").alias("n_text_chars"),
            F.coalesce(F.sum("a_len"), F.lit(0)).cast("long")
            .alias("n_anchor_chars"),
        )
    )
    urls = nodes.where(F.col("type") == _TD).select("url")
    return (
        urls.join(per_url, "url", "left")
        .select(
            "url",
            F.coalesce("n_text_chars", F.lit(0).cast("long"))
            .alias("n_text_chars"),
            F.coalesce("n_anchor_chars", F.lit(0).cast("long"))
            .alias("n_anchor_chars"),
        )
        .withColumn(
            "anchor_char_ppm",
            F.when(
                F.col("n_text_chars") > 0,
                F.expr("(1000000 * n_anchor_chars) div n_text_chars"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_distinct, entropy) — Shannon entropy (nats,
    ROUND6) of the per-document CHARACTER unigram distribution, the
    classic cheap randomness/quality signal (low = repetitive
    template soup, high = base64/binary junk).

    Pinned semantics (oracle-reproducible): characters are the
    ``split(text, '')`` code points (both engines split identically,
    probed); the empty string yields one '' element which is FILTERED,
    so an empty doc has n_chars 0 and entropy NULL. entropy =
    ROUND(ln(N) - sum(c*ln(c))/N, 6) over the histogram counts c —
    the float sum's addend count is the distinct-char count (small),
    so 6-dp rounding is stable across engines (the text_surprisal
    precedent).

    Scale shape: one explode + two map-side-combinable aggregations
    ((doc, char) then doc); no windows, no Python.
    """
    chars = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), ""),
                           lambda c: c != "")).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("long").alias("c"))
    per_doc = hist.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("_clnc"),
    )
    ent = F.round(
        F.log(F.col("n_chars").cast("double"))
        - F.col("_clnc") / F.col("n_chars"), 6)
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias(
            "n_chars"),
        F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias(
            "n_distinct"),
        F.when(F.col("n_chars") > 0, ent).alias("entropy"),
    )


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """Per-doc lexical-diversity profile — ``(doc_id, n_tokens,
    n_types, n_hapax, ttr_milli, hapax_milli)``.

    Type-token ratio and hapax-legomenon rate are the classic
    vocabulary-richness signals (template/spam text repeats a tiny
    vocabulary → low TTR; keyword-stuffed pages sit at the other
    extreme): ``ttr_milli`` = 1000·types div tokens, ``hapax_milli``
    = 1000·hapax div types — truncating integer milli-points (the
    readability rule), 0 on empty docs.

    Tokenization: ASCII-whitespace split, empty tokens dropped (the
    shared gate notion; NOT the single-space `_toks` used by
    token_stats, which counts empty fields).

    Scale shape: explode → (doc, token) count groupBy (map-side
    combinable) → doc rollup reusing the SAME hash partitioning (key
    prefix) — two exchanges total, no windows, pure JVM.
    """
    from hickoryspark.ops.metadata import ASCII_WS_RE

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), ASCII_WS_RE),
                     lambda t: t != "")
        ).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long")
        .alias("n_hapax"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
        F.coalesce("n_hapax", F.lit(0)).cast("long").alias("n_hapax"),
        F.coalesce(
            F.expr("1000 * n_types div n_tokens"), F.lit(0)
        ).cast("long").alias("ttr_milli"),
        F.coalesce(
            F.expr("1000 * n_hapax div n_types"), F.lit(0)
        ).cast("long").alias("hapax_milli"),
    )
