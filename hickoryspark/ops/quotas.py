"""Per-host corpus quotas — cap the number of documents any single
site contributes (RefinedWeb/C4-style domain balancing: without a
cap, a handful of mega-hosts dominate the training mix and the corpus
"diversity" is an illusion).

Pinned semantics:

- within a host, the top ``cap`` documents by ``(quality DESC,
  doc_id ASC)`` survive (equal-quality ties keep the smaller ids);
- hostless rows (NULL host) are a bucket like any other;
- output = the surviving rows with their original columns.

Scale shape — the skew story is the whole point: a per-host
``row_number`` window funnels a mega-host's millions of rows through
ONE task (the repo's window-skew lesson). Here NO full-corpus window
exists. The cut is computed on the per-(host, quality) HISTOGRAM
(map-side combinable; rows per host = distinct quality values):

1. cumulative counts over the histogram (a window over histogram
   rows, bounded by distinct-quality cardinality — the
   percentile_buckets pattern);
2. buckets entirely above the cap line join back and pass through
   (plain equi-join, no ordering);
3. ONLY the single straddling bucket per host ("cut bucket") ranks
   its rows by doc_id — a window whose partitions hold just the tied
   rows at the cutoff quality, not the host's corpus.

A mega-host with a million distinct-quality rows therefore shuffles
histogram rows + its tie rows, never sorts the full million in one
frame (unless all million share ONE quality value — then the ties
ARE the data and no exact algorithm avoids co-locating them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["host_quota"]


def host_quota(docs: DataFrame, cap: int, host_col: str = "host",
               quality_col: str = "quality",
               id_col: str = "doc_id") -> DataFrame:
    """docs(host, quality, doc_id, ...) → the per-host top-``cap``
    rows (original columns, original grain)."""
    h, q, i = F.col(host_col), F.col(quality_col), F.col(id_col)
    hist = docs.groupBy(host_col, quality_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    # cumulative rows in STRICTLY better buckets (window over the
    # distinct-value histogram, not the corpus)
    hw = (
        Window.partitionBy(host_col)
        .orderBy(F.col(quality_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "_before", F.coalesce(F.sum("_n").over(hw), F.lit(0)))
    full = cum.where(F.col("_before") + F.col("_n") <= cap).select(
        host_col, quality_col)
    cut = cum.where(
        (F.col("_before") < cap)
        & (F.col("_before") + F.col("_n") > cap)
    ).select(host_col, quality_col,
             (F.lit(cap) - F.col("_before")).alias("_take"))

    # null-safe join conditions: NULL host / NULL quality are real
    # buckets and a name-based equi-join would silently drop them
    fullr = full.withColumnsRenamed(
        {host_col: "_fh", quality_col: "_fq"})
    kept_full = docs.join(
        fullr,
        h.eqNullSafe(F.col("_fh")) & q.eqNullSafe(F.col("_fq")),
        "left_semi",
    )
    # ties at the cutoff quality: rank by id among JUST those rows
    # unhinted join (the round-4 convention): cut has one row per
    # over-cap host — tiny on test corpora, but at RefinedWeb scale
    # that's millions of rows and a forced broadcast would OOM the
    # driver; AQE broadcasts at runtime when it is actually small
    cutr = cut.withColumnsRenamed({host_col: "_ch", quality_col: "_cq"})
    tie_rows = docs.join(
        cutr,
        h.eqNullSafe(F.col("_ch")) & q.eqNullSafe(F.col("_cq")),
    ).drop("_ch", "_cq")
    tw = Window.partitionBy(host_col, quality_col).orderBy(i.asc())
    kept_ties = (
        tie_rows.withColumn("_r", F.row_number().over(tw))
        .where(F.col("_r") <= F.col("_take"))
        .drop("_r", "_take")
    )
    return kept_full.unionByName(kept_ties)
