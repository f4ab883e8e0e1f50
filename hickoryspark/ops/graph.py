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


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(id, depth) — BFS hop distance from a seed set over directed
    crawl edges; NULL depth = not reachable within ``max_depth``.

    The crawl-depth signal (how many clicks from a seed/homepage a
    page sits) is a standard frontier-prioritization and quality
    feature. Unit weights make first-reach minimal, so the frontier
    formulation is exact: round r expands ONLY the nodes settled at
    depth r-1 (join edges on the frontier, distinct dst, anti-join
    the settled set). Two key-shuffles per round, no full-graph
    relaxation — work is proportional to the frontier, not the node
    count, which is what survives a 100x edge-count scale-up.

    ``seeds``: single ``id`` column. ``nodes`` optionally fixes the
    output universe (default: seeds + every src/dst).
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .unionByName(seeds.select(F.col("id")))
            .distinct()
        )
    settled = (
        seeds.select("id").distinct()
        .select("id", F.lit(0).cast("long").alias("depth"))
        # settled feeds every round's anti-join AND the final union;
        # checkpoint cuts the per-round union/join lineage growth
        .localCheckpoint()
    )
    frontier = settled
    for r in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(settled, "id", "left_anti")
            .select("id", F.lit(r).cast("long").alias("depth"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return nodes.join(settled, "id", "left").select("id", "depth")


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**6,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(id, hub_e6, auth_e6) — Kleinberg HITS, exact-integer.

    Same cross-engine rule as :func:`pagerank`: float HITS cannot be
    hash-compared (summation order), so scores are BIGINT fixed-point
    and each half-step renormalizes by the MAX score (L-inf, not L2 —
    integer floor-divide, order-independent):

        auth'(v) = sum_{u->v} hub(u);   auth = auth' * scale // max(auth')
        hub'(u)  = sum_{u->v} auth(v);  hub  = hub' * scale // max(hub')

    Magnitude bound (documented, mirrored by the oracle): the rescale
    numerator is sum * scale <= max_degree * scale^2, so BIGINT is
    safe for degrees up to ~9e6 at the default scale of 1e6 — raise
    degree headroom by LOWERING scale. Each half-step is one
    key-shuffle groupBy + a scalar max aggregate; nodes with no
    in/out edges hold score 0 after the first step (standard).

    EAGER by contract (like kcore): every half-step localCheckpoints
    eagerly, so calling this function runs the 2*n_iter iteration
    jobs immediately and the returned frame is a cheap plan over the
    final checkpointed scores.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.persist()
    edges = edges.persist()
    hub = nodes.select("id", F.lit(scale).cast("long").alias("hub"))
    auth = nodes.select("id", F.lit(scale).cast("long").alias("auth"))
    for _ in range(n_iter):
        raw_auth = (
            edges.join(hub, edges["src"] == hub["id"])
            .groupBy("dst").agg(F.sum("hub").alias("_s"))
        )
        # eager localCheckpoint EVERY half-step (the kcore invariant):
        # _linf_norm references its `raw` subtree TWICE (join side +
        # the max-scalar side), so an un-truncated plan DOUBLES per
        # half-step — measured ~6x wall per iteration (4.2/5.0/21.4/
        # 133s for n_iter=1..4 at 10k edges) and a driver GC-thrash
        # crash at n_iter=5 under the old checkpoint-every-5 policy,
        # which never got the chance to fire.
        auth = _linf_norm(nodes, raw_auth, "dst", "auth", scale) \
            .localCheckpoint(eager=True)
        raw_hub = (
            edges.join(auth, edges["dst"] == auth["id"])
            .groupBy("src").agg(F.sum("auth").alias("_s"))
        )
        hub = _linf_norm(nodes, raw_hub, "src", "hub", scale) \
            .localCheckpoint(eager=True)
    return (
        nodes.join(hub.withColumnRenamed("hub", "hub_e6"), "id", "left")
        .join(auth.withColumnRenamed("auth", "auth_e6"), "id", "left")
        .select(
            "id",
            F.coalesce("hub_e6", F.lit(0)).cast("long").alias("hub_e6"),
            F.coalesce("auth_e6", F.lit(0)).cast("long").alias("auth_e6"),
        )
    )


def _linf_norm(nodes, raw, key, out, scale):
    """nodes left-joined to per-key sums, rescaled to max == scale.

    The max is computed RELATIONALLY (scalar agg cross-joined — AQE
    broadcasts the 1-row side), never collected: the half-step stays
    a single lazy plan."""
    mx = raw.agg(F.max("_s").alias("_mx"))
    return (
        nodes.join(raw, nodes["id"] == raw[key], "left")
        .crossJoin(mx)
        .select(
            "id",
            F.when(
                F.col("_mx").isNotNull() & (F.col("_mx") > 0),
                F.expr(f"(coalesce(_s, 0) * {scale}) div _mx"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias(out),
        )
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Seed-biased exact-integer PageRank — TrustRank (Gyöngyi,
    Garcia-Molina & Pedersen, VLDB 2004): teleportation mass goes
    ONLY to a hand-vetted trusted seed set, so trust flows outward
    from the seeds and link-farm clusters that earn generic PageRank
    earn ~none of it. The standard web-spam demotion signal
    (spam mass = pagerank - trustrank, both in the same fixed-point
    units here).

        rank_0(v)    = scale // n_seeds  if v in seeds else 0
        tele(v)      = (scale*(100-damping_pct)//100) // n_seeds
                       if v in seeds else 0
        rank_{i+1}(v) = tele(v) + Σ (rank_i(u)*damping_pct)
                                    // (100*outdeg(u))

    Same documented simplifications as :func:`pagerank` (dangling
    mass dropped, floor remainders not re-normalized) and the same
    one-shuffle-per-iteration scale shape; ``seeds`` is a single
    ``id`` column (deduplicated here). Node universe = edge
    endpoints ∪ seeds unless ``nodes`` is given."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    sd = seeds.select("id").distinct()
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .unionByName(sd)
            .distinct()
        )
    # flagged node frame feeds every iteration's relabel (and the
    # seed count action) — persist like pagerank's node frame
    nodes = nodes.join(
        sd.withColumn("_s", F.lit(1)), "id", "left"
    ).select("id", F.coalesce(F.col("_s"), F.lit(0)).alias("_seed"))
    nodes = nodes.persist()
    n_s = nodes.where(F.col("_seed") == 1).count()
    if n_s == 0:
        raise ValueError("trustrank needs at least one seed present")
    base = scale // n_s
    tele = (scale * (100 - damping_pct) // 100) // n_s
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("_deg")
    ).persist()
    ranks = nodes.select(
        "id",
        F.when(F.col("_seed") == 1, F.lit(base)).otherwise(F.lit(0))
        .cast("long").alias("rank_e12"))
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
                (F.when(F.col("_seed") == 1, F.lit(tele))
                 .otherwise(F.lit(0))
                 + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long").alias("rank_e12"),
            )
        )
        if (i + 1) % 10 == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks
