"""Link-graph analytics — PageRank power iteration over crawl edges
(Page/Brin/Motwani/Winograd 1999, the canonical crawl-prioritization
and quality signal; pairs with ops/links.py `extract_links` and
ops/hosts.py frontier batching).

EXACT-INTEGER formulation (the repo's readability/repetition rule):
ranks live in fixed-point units of 1/scale (default 1e-12), every
step is BIGINT multiply / floor-divide / SUM, so the result is
bit-identical regardless of partitioning, aggregation order, or
engine — floating-point PageRank cannot be hash-compared across
engines because summation order differs.

    rank_0(v)   = scale // n
    contrib(u→v) = (rank_i(u) * damping_pct) // (100 * outdeg(u))
    rank_{i+1}(v) = tele + Σ contrib(u→v),
    tele        = (scale * (100 - damping_pct) // 100) // n

Documented simplifications (mirrored exactly by any oracle running
the same recurrence): dangling-node mass is dropped, not
redistributed, and floor-division remainders are not re-normalized —
total mass decays slightly per iteration, relative ordering (the
thing crawlers use) is standard.

Scale design: each iteration is ONE shuffle (groupBy dst with
map-side partial sums); the per-node rank frame joins the edge table
by src — AQE picks broadcast when the node set is small, sort-merge
when it is not. Multi-edges are honored (a page linking twice votes
twice). The loop materializes nothing driver-side except the node
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(id, rank_e12) after ``n_iter`` exact-integer power iterations.

    ``edges``: (src, dst) rows (multi-edges allowed). ``nodes``
    optionally fixes the node universe (single ``id`` column);
    default is every src or dst. ``damping_pct`` is the integer
    damping percentage (85 = the classic 0.85)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    # NOTE: persisted because nodes feeds the count() action AND every
    # iteration's join (otherwise the distinct shuffle re-executes
    # n_iter+1 times inside the final action), and outdeg feeds every
    # iteration; like the dedup group frames, the blocks live until
    # LRU eviction or session end.
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_e12", F.lit(0).cast("long"))
    base = scale // n
    tele = (scale * (100 - damping_pct) // 100) // n
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("_deg")
    ).persist()
    ranks = nodes.select("id", F.lit(base).cast("long").alias("rank_e12"))
    for i in range(n_iter):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("id"))
            .select(
                "dst",
                F.expr(
                    f"(rank_e12 * {damping_pct}) div (100 * _deg)"
                ).alias("_c"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("_c").alias("_in"))
        ranks = (
            nodes.join(sums, nodes["id"] == sums["dst"], "left")
            .select(
                "id",
                (F.lit(tele) + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long")
                .alias("rank_e12"),
            )
        )
        # bound lineage depth for long runs: 3 joins accrue per
        # iteration and the analyzer cost grows superlinearly
        if (i + 1) % 10 == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks
