"""Quality-filter ensemble — the RefinedWeb/Gopher-style admission
verdict a curation pipeline actually ships.

The individual signals live in their own ops (gopher rules —
textstats.gopher_quality; repetition — repetition.repetition_signals;
encoding damage — textnorm.mojibake_stats; badwords —
wordfilter.badword_hits). A real pipeline runs them as ONE verdict:
keep/drop plus the FIRST failing rule (the reason column every
curation report groups by). This op is that composition — pinned
thresholds, pinned reason order, no new math.

Pinned semantics (oracle-reproducible):

- reason order (first failure wins): ``gopher`` → ``repetition`` →
  ``mojibake`` → ``badwords``; ``reason`` is NULL iff ``keep``;
- repetition fails when ``dup_line_char_ppm > max_dup_line_char_ppm``
  OR ``top_gram_ppm > max_top_gram_ppm`` OR ``dup_gram_ppm >
  max_dup_gram_ppm`` (defaults 200000 / 200000 / 100000 — the Gopher
  A1.1 20%/20%/10% fractions in integer ppm);
- mojibake fails when ``mojibake_ppm > max_mojibake_ppm`` (default
  1000 = 0.1% damaged chars);
- badwords fail on ANY hit; ``words=None`` disables the rule (the
  flag stays True, matching a pipeline without a blocklist).

Scale shape: every branch reduces to (doc_id, a few BIGINTs/flags)
BEFORE the verdict joins — 3-4 narrow doc_id equi-joins (AQE-planned),
plus the repetition/badword aggregates' own shuffles; the text column
never crosses a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_verdict", "REASON_ORDER"]

REASON_ORDER = ("gopher", "repetition", "mojibake", "badwords")


def quality_verdict(
    docs: DataFrame,
    words: DataFrame | None = None,
    *,
    max_dup_line_char_ppm: int = 200_000,
    max_top_gram_ppm: int = 200_000,
    max_dup_gram_ppm: int = 100_000,
    max_mojibake_ppm: int = 1_000,
    ngram_n: int = 2,
) -> DataFrame:
    """(doc_id, keep, reason) over ``docs(doc_id, text)``."""
    from hickoryspark.ops.repetition import repetition_signals
    from hickoryspark.ops.textnorm import mojibake_stats
    from hickoryspark.ops.textstats import gopher_quality
    from hickoryspark.ops.wordfilter import badword_hits

    g = gopher_quality(docs).select("doc_id", "passes_gopher")
    m = mojibake_stats(docs).select("doc_id", "mojibake_ppm")
    gm = g.join(m, "doc_id")
    rep = repetition_signals(docs, ngram_n).select(
        "doc_id", "dup_line_char_ppm", "top_gram_ppm", "dup_gram_ppm"
    )
    base = gm.join(rep, "doc_id")
    if words is not None:
        bw = badword_hits(docs, words).select(
            "doc_id", "passes_wordfilter")
        base = base.join(bw, "doc_id")
    else:
        base = base.withColumn("passes_wordfilter", F.lit(True))
    fail_rep = (
        (F.col("dup_line_char_ppm") > max_dup_line_char_ppm)
        | (F.col("top_gram_ppm") > max_top_gram_ppm)
        | (F.col("dup_gram_ppm") > max_dup_gram_ppm)
    )
    reason = (
        F.when(~F.col("passes_gopher"), F.lit("gopher"))
        .when(fail_rep, F.lit("repetition"))
        .when(F.col("mojibake_ppm") > max_mojibake_ppm,
              F.lit("mojibake"))
        .when(~F.col("passes_wordfilter"), F.lit("badwords"))
    )
    return base.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )
