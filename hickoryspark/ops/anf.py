"""Approximate Neighbourhood Function — h-hop reach estimation.

ANF (Palmer, Gibbons & Faloutsos, KDD 2002): estimate |N_h(v)| — how
many nodes sit within h hops of v — for every node at once, without
BFS-per-node. The web-graph use: reach is the crawl-frontier value
of a seed, and the reach distribution locates a graph's core vs its
tendrils. The original uses Flajolet-Martin bitmasks; this
implementation composes the repo's KMV bottom-k sketch
(ops/sketch.py) instead — same merge algebra (union then re-take
bottom-k), but every intermediate is BIGINT state that two engines
reproduce bit-exactly, so the gate hash-checks the sketches AND the
estimates, not just their expectation.

Recurrence (pinned):

- ``S_0(v) = {hash(v)}`` (a node reaches itself);
- ``S_r(v) = bottom_k(S_{r-1}(v) ∪ ⋃_{(v,u) ∈ E} S_{r-1}(u))`` over
  the undirected simple graph (canonical_edges normalization);
- after ``hops`` rounds, ``est_reach`` = the KMV estimator (exact
  count below k, ``(k-1)*SPACE/h_k`` once the sketch fills).

Scale shape: state lives as (node, h) rows. Each round is one
adjacency equi-join + a TWO-LEVEL bottom-k (the kmv_state pattern:
a (node, h mod 256) pre-rank bounds every window partition before
the per-node rank — a hub with degree d contributes ≤ (d+1)*k rows
spread over 256 salt slices, never one partition). State is
localCheckpoint-ed every round (it feeds the next round's join — the
kcore plan-growth lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.sketch import KMV_SALTS, KMV_SPACE, _kmv_hash
from hickoryspark.ops.trianglecount import canonical_edges

__all__ = ["neighborhood_reach", "duckdb_anf_sql"]


def _bottom_k(state: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w1 = Window.partitionBy(
        "node", F.pmod(F.col("h"), F.lit(KMV_SALTS))).orderBy("h")
    pruned = (state.distinct()
              .withColumn("_r1", F.row_number().over(w1))
              .where(F.col("_r1") <= k).drop("_r1"))
    w2 = Window.partitionBy("node").orderBy("h")
    return (pruned.withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") <= k).drop("_r2"))


def neighborhood_reach(edges: DataFrame, hops: int = 2, k: int = 32,
                       src_col: str = "src",
                       dst_col: str = "dst") -> DataFrame:
    """Edge list → ``(node, n_state, est_reach)`` after ``hops``
    sketch-propagation rounds (est_reach counts the node itself)."""
    if hops < 0:
        raise ValueError("hops must be >= 0")
    if k < 1:
        raise ValueError("k must be >= 1")
    e = canonical_edges(edges, src_col, dst_col)
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"),
                           F.col("a").alias("nbr")))
    ).localCheckpoint(eager=True)
    nodes = adj.select("node").distinct()
    state = nodes.select(
        "node", _kmv_hash(F.col("node")).alias("h")
    ).localCheckpoint(eager=True)
    for _ in range(hops):
        pulled = (
            adj.join(state.select(F.col("node").alias("s_node"), "h"),
                     adj["nbr"] == F.col("s_node"))
            .select("node", "h")
        )
        state = _bottom_k(
            state.select("node", "h").unionAll(pulled), k
        ).localCheckpoint(eager=True)
    agg = state.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_state"),
        F.max("h").alias("_hk"))
    est = (
        F.when(F.col("n_state") < k, F.col("n_state").cast("double"))
        .otherwise(F.lit(float(k - 1) * float(KMV_SPACE))
                   / F.col("_hk").cast("double"))
    )
    return agg.select("node", "n_state", est.alias("est_reach"))


def duckdb_anf_sql(edges_rel: str, hops: int = 2, k: int = 32,
                   src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror: the recurrence unrolled one CTE pair per hop
    (single global bottom-k window — same result as the two-level
    prune by the superset property)."""
    big = float(k - 1) * float(KMV_SPACE)
    parts = [f"""anf_e AS (
          SELECT DISTINCT LEAST({src}, {dst}) AS a,
                 GREATEST({src}, {dst}) AS b
          FROM {edges_rel}
          WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
            AND {src} <> {dst}
        ), anf_adj AS (
          SELECT a AS node, b AS nbr FROM anf_e
          UNION ALL SELECT b, a FROM anf_e
        ), anf_s0 AS (
          SELECT DISTINCT node,
                 CAST(('0x' || substr(md5(CAST(node AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS h
          FROM anf_adj
        )"""]
    for r in range(1, hops + 1):
        parts.append(f"""anf_u{r} AS (
          SELECT DISTINCT node, h FROM (
            SELECT node, h FROM anf_s{r - 1}
            UNION ALL
            SELECT a.node, s.h
            FROM anf_adj a JOIN anf_s{r - 1} s ON a.nbr = s.node)
        ), anf_s{r} AS (
          SELECT node, h FROM (
            SELECT node, h, ROW_NUMBER() OVER (
              PARTITION BY node ORDER BY h) AS rn
            FROM anf_u{r}) WHERE rn <= {int(k)}
        )""")
    return ("WITH " + ",\n".join(parts) + f"""
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_state,
               CASE WHEN COUNT(*) < {int(k)}
                    THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE {big!r} / CAST(MAX(h) AS DOUBLE)
               END AS est_reach
        FROM anf_s{hops} GROUP BY node""")
