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

Scale: tokens explode once per side, count per (id, token) with
map-side partial aggregation, one full-outer equi-join on (id, token)
(co-partitioned — same key both sides), one final groupBy id. No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ASCII whitespace tokenization (the repo's pinned Java-\s class)
_WS = "[ \\t\\n\\x0B\\f\\r]+"


def _token_counts(df: DataFrame, id_col: str, text_col: str, side: str):
    toks = df.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), _WS),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    return toks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias(f"n_{side}")
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
    p = _token_counts(df, id_col, pred_col, "pred")
    g = _token_counts(df, id_col, gold_col, "gold")
    per_tok = p.join(g, [id_col, "tok"], "full_outer").select(
        id_col,
        F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.col("n_gold"), F.lit(0)).alias("n_gold"),
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
