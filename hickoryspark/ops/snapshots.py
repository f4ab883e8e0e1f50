"""Crawl snapshot diffing — what changed between two crawls.

Recrawl scheduling, incremental corpus refresh, and CDX-style change
tracking all reduce to the same primitive: join two (url, payload)
snapshots and classify every url as added / removed / changed /
unchanged by content hash. This is the batch complement to the
streaming first-seen dedup (spark/streaming.py).

Spark-first shape: one full-outer equi-join on url — a single shuffle
each side (co-partitioned and shuffle-free when both snapshots are
bucketed by url), hashes computed JVM-side with ``md5`` before the
join so the shuffle carries 32-byte digests instead of page bodies.
At 100 TB that hash-early projection is the difference between
shuffling checksums and shuffling the crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA_COLS = ["url", "status", "old_hash", "new_hash"]


def _hashed(df: DataFrame, payload_col: str, out: str, flag: str) -> DataFrame:
    # presence is a column of its own: a NULL payload (failed fetch)
    # must still count as "url was in this snapshot", so status can
    # never be inferred from hash nullness alone
    return df.select(
        "url",
        F.md5(F.col(payload_col).cast("binary")).alias(out),
        F.lit(True).alias(flag),
    )


def crawl_delta(
    old: DataFrame, new: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(url, payload) x2 → (url, status, old_hash, new_hash).

    ``status`` ∈ {'added', 'removed', 'changed', 'unchanged'};
    old_hash/new_hash are the lowercase md5 hex digests of the payload
    bytes (NULL on the absent side — and also for a present-but-NULL
    payload, e.g. a failed fetch; presence is tracked separately, and
    two NULL payloads for the same url compare 'unchanged'). Each
    snapshot must be unique by url — enforce upstream (the extract
    pipeline's sink is); duplicate urls would cross-join ambiguously
    here.
    """
    o = _hashed(old, payload_col, "old_hash", "in_old")
    n = _hashed(new, payload_col, "new_hash", "in_new")
    joined = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(
            F.col("old_hash").eqNullSafe(F.col("new_hash")), "unchanged"
        )
        .otherwise("changed")
    )
    return joined.select(
        "url", status.alias("status"), "old_hash", "new_hash"
    )


def change_stability(obs: DataFrame, url_col: str = "url",
                     changed_col: str = "changed") -> DataFrame:
    """Revisit-scheduling signal from repeated crawl observations:
    ``obs`` is one row per (url, visit) with a boolean ``changed``
    (e.g. ``crawl_delta.status == 'changed'`` across consecutive
    snapshot pairs) → ``(url, n_obs, n_changed, stability_milli)``.

    ``stability_milli`` is the Cho & Garcia-Molina (VLDB 2000)
    frequency estimator's stay-unchanged probability
    ``(n - X + 0.5) / (n + 0.5)`` in EXACT milli-units:
    ``(1000 * (2*(n - X) + 1)) div (2*n + 1)`` — all-integer (the
    readability/pagerank rule: cross-engine gates need
    order-independent arithmetic), monotone in the real estimator, so
    ranking by it orders urls exactly as the float form would.
    Low stability = change often = revisit first; the +0.5 smoothing
    keeps never-changed urls below certainty and single-visit urls
    informative. NULL ``changed`` rows count as observations that did
    not change (a fetch that could not be compared is evidence of
    nothing).

    Scale shape: ONE map-side-combinable groupBy on url — no windows,
    no Python."""
    ch = F.coalesce(F.col(changed_col), F.lit(False))
    agg = obs.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(ch.cast("long")).cast("long").alias("n_changed"),
    )
    return agg.withColumn(
        "stability_milli",
        F.expr("(1000 * (2 * (n_obs - n_changed) + 1)) "
               "div (2 * n_obs + 1)"),
    )
