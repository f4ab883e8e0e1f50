"""Redirect / canonical chain resolution — following 3xx and
rel=canonical mappings to their final targets is a fixed pre-pass of
every crawl dedup (the chain a→b→c must collapse to c before URL
keys mean anything).

Pointer DOUBLING (the classic parallel list-ranking technique,
Wyllie 1979): each round every node's pointer jumps to its pointer's
pointer, so a chain of length L resolves in ceil(log2 L) rounds — a
32-hop chain costs 5 self-joins, not 32. Terminal nodes (no outgoing
edge) are absorbing: their state row points at themselves with hop
count 0, so joins through them are naturally idempotent and hop
counts stay EXACT chain lengths. Cycles never reach a terminal and
report resolved=0 with the hop budget exhausted.

Scale: each round is ONE equi-join of the state frame with itself
(same key domain — co-partitioned after the first shuffle); the
state is one row per node regardless of edge multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    rounds: int = 5,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, final_id, hops, resolved) for every node: follow the
    functional mapping src→dst up to 2**rounds hops.

    - ``edges`` must be FUNCTIONAL (one outgoing edge per src); if a
      src repeats, the smallest dst wins deterministically.
    - ``resolved`` (BIGINT 1/0): 1 iff ``final_id`` has no outgoing
      edge (a true terminal) — cycles and over-budget chains get 0,
      with ``final_id`` = the node reached after exactly 2**rounds
      hops and ``hops`` = that budget.
    - ``hops`` is the exact chain length for resolved nodes (0 for
      nodes that are already terminal).
    - ``nodes`` optionally fixes the universe; default src ∪ dst.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    f = edges.groupBy(F.col(src).alias("_s")).agg(
        F.min(dst).alias("_d")
    )
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("id"))
            .unionByName(edges.select(F.col(dst).alias("id")))
            .distinct()
        )
    state = nodes.join(f, nodes["id"] == f["_s"], "left").select(
        F.col("id").alias("node"),
        F.coalesce("_d", "id").alias("ptr"),
        F.when(F.col("_s").isNull(), 0).otherwise(1).cast("long")
        .alias("hops"),
    )
    for _ in range(rounds):
        # each round references state TWICE (s and t sides, different
        # join keys — no exchange reuse), so an unpersisted lineage
        # would recompute the base 2^rounds times; materialize the
        # round's state once and truncate the plan
        state = state.localCheckpoint()
        t = state.select(
            F.col("node").alias("t_node"),
            F.col("ptr").alias("t_ptr"),
            F.col("hops").alias("t_hops"),
        )
        # LEFT: a ptr outside the node universe (caller-supplied
        # ``nodes`` narrower than dst's range) keeps its state instead
        # of dropping the row; the final f-join still classifies it
        state = state.join(t, state["ptr"] == t["t_node"], "left").select(
            "node",
            F.coalesce("t_ptr", "ptr").alias("ptr"),
            (F.col("hops") + F.coalesce("t_hops", F.lit(0))).alias("hops"),
        )
    return state.join(f, state["ptr"] == f["_s"], "left").select(
        "node",
        F.col("ptr").alias("final_id"),
        "hops",
        F.when(F.col("_s").isNull(), 1).otherwise(0).cast("long")
        .alias("resolved"),
    )


def pagination_chains(
    nodes: DataFrame,
    rounds: int = 5,
    universe: DataFrame | None = None,
) -> DataFrame:
    """Paginated-sequence resolution over a node table:
    ``(url, next_url, seq_last, hops_to_last, resolved)``.

    A multi-page article declares its order with ``rel="next"`` links
    (``<link>`` or ``<a>``, the ASCII-ws token rule shared with
    ops/license); stitching the pages back into one document needs
    every page keyed by its SEQUENCE — here the chain's LAST page
    (the unique terminal of the functional next-graph). The chain
    walk is :func:`resolve_redirects` (pointer doubling, cycle-safe):
    ``seq_last`` = the terminal url, ``hops_to_last`` = exact distance
    to it, ``resolved`` = 0 for cycles/over-budget chains (same
    contract as redirect resolution).

    Pinned semantics: the FIRST rel-next element in document order
    wins (one outgoing edge per page — later decoys ignored);
    ``next_url`` is the resolved href (NULL for a page that declares
    none); ``universe`` (url one-column frame) fixes the output node
    set — default src ∪ dst of the next-graph, which drops standalone
    pages.

    Scale shape: one url-local min-struct groupBy for the edge
    extraction, then resolve_redirects' log2(2**rounds) equi-join
    rounds (per-round localCheckpoint)."""
    from hickoryspark.nodes import TYPE_ELEMENT
    from hickoryspark.ops.links import resolve_href
    from hickoryspark.ops.metadata import ASCII_WS_RE

    rel_tokens = F.split(
        F.lower(F.coalesce(F.col("attrs")["rel"], F.lit(""))),
        ASCII_WS_RE,
    )
    cand = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & F.col("tag").isin("a", "link")
        & F.col("attrs")["href"].isNotNull()
        & F.array_contains(rel_tokens, "next")
    ).select(
        "url",
        F.struct(F.col("pre_ord"), F.col("attrs")["href"].alias("href"))
        .alias("_first"),
    )
    nxt = cand.groupBy("url").agg(
        F.min("_first")["href"].alias("_href")
    ).select(
        "url",
        resolve_href(F.col("url"), F.col("_href")).alias("next_url"),
    )
    if universe is not None:
        universe = universe.select(
            F.col(universe.columns[0]).alias("id"))
    walked = resolve_redirects(
        nxt, rounds=rounds, nodes=universe,
        src="url", dst="next_url",
    )
    return (
        walked.join(nxt, walked["node"] == nxt["url"], "left")
        .select(
            F.col("node").alias("url"),
            "next_url",
            F.col("final_id").alias("seq_last"),
            F.col("hops").alias("hops_to_last"),
            "resolved",
        )
    )
