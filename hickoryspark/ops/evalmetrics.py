"""Extraction-quality evaluation — token-level precision / recall /
F1 of a predicted text column against a gold column (the CleanEval /
boilerplate-benchmark scoring rule: token MULTISET overlap, so a
token predicted twice but present once counts one hit).

This is the measurement half of the extraction stack (extract_main,
boilerplate_strip, to_markdown all claim "main content" — this op
grades such claims against any gold standard at corpus scale).

Exactness: tp / n_pred / n_gold are integers; precision, recall and
F1 are each ONE IEEE division (correctly rounded, identical on every
conformant engine) rounded to 6 places — so the metrics are
hash-comparable cross-engine, per the repo rule that gate outputs be
string/double/bigint only.

Scale: ONE tokenization pass — both sides explode together with a
side tag, the per-(id, token) pair table is a single pivoting groupBy
(map-side partial aggregation), then one final groupBy id. No join
between the sides, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the repo's single-sourced ASCII whitespace class (metadata.py origin;
# chunking/terms/wordfilter import the same — never re-declare it)
from hickoryspark.ops.metadata import ASCII_WS_RE as _WS


def _toks(text_col: str):
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS),
        lambda t: t != "",
    )


def token_prf(
    df: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """(id, tp, n_pred, n_gold, precision, recall, f1) per row of a
    frame carrying predicted and gold text columns. Multiset overlap:
    tp = Σ_token min(count_pred, count_gold). Empty/NULL sides yield
    NULL for the affected ratio (0/0 via try_divide), never a crash;
    rows with BOTH sides empty still appear (tp = n_pred = n_gold =
    0)."""
    ids = df.select(id_col).distinct()
    # ONE tokenization scan: both sides explode together, each token
    # tagged with its side; the per-(id, token) pair table is a single
    # pivoting groupBy — no pred-vs-gold join at all
    tagged = df.select(
        id_col,
        F.explode(
            F.concat(
                F.transform(
                    _toks(pred_col),
                    lambda t: F.struct(t.alias("tok"),
                                       F.lit(1).alias("is_pred")),
                ),
                F.transform(
                    _toks(gold_col),
                    lambda t: F.struct(t.alias("tok"),
                                       F.lit(0).alias("is_pred")),
                ),
            )
        ).alias("e"),
    )
    per_tok = tagged.groupBy(id_col, F.col("e.tok")).agg(
        F.sum("e.is_pred").alias("n_pred"),
        F.sum(1 - F.col("e.is_pred")).alias("n_gold"),
    )
    agg = per_tok.groupBy(id_col).agg(
        F.sum(F.least("n_pred", "n_gold")).alias("tp"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_gold").alias("n_gold"),
    )
    out = ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.col("n_gold"), F.lit(0)).cast("long").alias("n_gold"),
    )
    prec = F.round(F.try_divide(F.col("tp"), F.col("n_pred")), 6)
    rec = F.round(F.try_divide(F.col("tp"), F.col("n_gold")), 6)
    f1 = F.round(
        F.try_divide(2 * F.col("tp"), F.col("n_pred") + F.col("n_gold")), 6
    )
    return out.select(
        id_col, "tp", "n_pred", "n_gold",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
