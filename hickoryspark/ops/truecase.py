"""Unigram truecasing — case restoration for lowercased text.

Crawled text arrives case-mangled (ALL-CAPS titles, lowercased
social snippets, OCR dumps); truecasing (Lita et al., ACL 2003
"tRuEcasIng" — the unigram baseline) restores each token to its
most-frequent surface form learned from a clean corpus. Used both as
a normalization step before NER-ish extraction and as a quality
signal (distance between observed and restored casing).

Pinned semantics (oracle-mirrored):

- tokenization: ASCII-whitespace split (the pinned Java ``\\s``
  class), empty tokens dropped; output re-joins with a single space
  — inter-token whitespace is NOT preserved;
- model: for every lowercased key, the surface form with the highest
  count; ties break to the lexicographically GREATEST form (one
  max-struct aggregation, no window);
- apply: every token is replaced by the model form for its
  lowercase; tokens without a model entry pass through unchanged;
  documents with no tokens restore to the empty string.

Scale shape: model = two map-side-combinable groupBys on the token
grain; apply = posexplode → model equi-join (AQE broadcasts small
models) → one doc-grain reassembly groupBy. Pure JVM end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["learn_case_model", "truecase"]


def _tokens(col):
    return F.filter(F.split(col, ASCII_WS_RE), lambda t: t != "")


def learn_case_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus → ``(key, form)`` unigram case model (key = lowercased
    token; form = max-count surface form, max-form tiebreak)."""
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("form"))
    counts = (
        toks.groupBy(F.lower(F.col("form")).alias("key"), "form")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        counts.groupBy("key")
        .agg(F.max(F.struct("cnt", "form"))["form"].alias("form"))
    )


def truecase(df: DataFrame, model: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             out_col: str = "restored") -> DataFrame:
    """``(id, text)`` + model → ``(id, restored)``."""
    toks = df.select(
        F.col(id_col),
        F.posexplode_outer(_tokens(F.col(text_col)))
        .alias("pos", "tok"),
    )
    j = toks.join(
        model.withColumnRenamed("form", "_tc_form"),
        F.lower(F.col("tok")) == F.col("key"), "left")
    return (
        j.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.coalesce("_tc_form", "tok")
                                .alias("val"),
                            )
                        )
                    ),
                    lambda s: s["val"],
                ),
                " ",
            ).alias(out_col)
        )
    )
