"""Crawl-frontier priority — the scheduler composition that turns
three independent signal families into one sortable number per
candidate url:

- URL shape (ops/urls.url_features): roots and shallow paths first,
  query-param pages later;
- change history (ops/snapshots.change_stability): pages that change
  often revisit first;
- host politeness (ops/robots.host_crawl_delays): slow hosts pay a
  scheduling penalty so fast hosts fill the fetch pipeline.

Pinned EXACT-INTEGER formula (lower = crawl earlier; every term is a
BIGINT so cross-engine hashes match):

    priority_milli = 1000 * path_depth
                   + 100 * n_params
                   + (0 if is_root else 500)
                   + stability_milli       (default_stability if no
                                            history — an unseen page
                                            ranks between hot and
                                            dead)
                   + delay_ms div 10       (0 if no delay row)

The weights are a documented policy default, not a tuned model — the
point of the op is the JOIN SHAPE and the exact arithmetic; callers
re-weight via the ``w_depth`` / ``w_param`` / ``w_nonroot`` keyword
arguments.

Scale shape: url_features is shuffle-free column work; the stability
join is a url equi-join (the frontier's natural key); the delay join
keys on host (tiny relation — AQE broadcasts it). No windows, no
Python, no global sort (ordering is the consumer's decision —
ops/hosts.frontier_batches already does per-host pacing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frontier_priority", "DEFAULT_STABILITY_MILLI"]

#: stability assumed for never-observed urls
DEFAULT_STABILITY_MILLI = 500

#: pinned weight set (milli-points)
W_DEPTH = 1000
W_PARAM = 100
W_NONROOT = 500


def frontier_priority(
    pages: DataFrame,
    stability: DataFrame | None = None,
    delays: DataFrame | None = None,
    default_stability: int = DEFAULT_STABILITY_MILLI,
    w_depth: int = W_DEPTH,
    w_param: int = W_PARAM,
    w_nonroot: int = W_NONROOT,
) -> DataFrame:
    """pages(url, ...) x stability(url, stability_milli) x
    delays(host, delay_ms) → (url, host, priority_milli)."""
    from hickoryspark.ops.urls import url_features

    f = url_features(pages.select("url"))
    if stability is not None:
        f = f.join(
            stability.select("url", "stability_milli"), "url", "left")
    else:
        f = f.withColumn(
            "stability_milli", F.lit(None).cast("long"))
    if delays is not None:
        f = f.join(delays.select("host", "delay_ms"), "host", "left")
    else:
        f = f.withColumn("delay_ms", F.lit(None).cast("long"))

    priority = (
        F.lit(w_depth) * F.col("path_depth")
        + F.lit(w_param) * F.col("n_params")
        + F.when(F.col("is_root"), F.lit(0)).otherwise(F.lit(w_nonroot))
        + F.coalesce(F.col("stability_milli"),
                     F.lit(default_stability))
        + F.expr("COALESCE(delay_ms, 0) div 10")
    )
    return f.select(
        "url", "host", priority.cast("long").alias("priority_milli"))
