"""Harmonic centrality at scale — HyperBall (Boldi & Vigna, WWW
2014) over the repo's KMV reach sketches.

Closeness-style centralities need |N_h(v)| for every radius h;
HyperBall's insight is that one sketch-propagation pass yields ALL
radii at once, and harmonic centrality

    H(v) = Σ_{h>=1} (|N_h(v)| - |N_{h-1}(v)|) / h

(the per-radius reach DELTAS, inverse-distance weighted) is the
centrality that stays well-defined on disconnected graphs — the
web-graph case. Crawl use: H ranks seeds by how quickly the frontier
grows around them, without per-node BFS.

This implementation reuses ops/anf.py's propagation exactly (KMV
bottom-k states, canonical undirected simple graph, two-level
bottom-k, localCheckpoint per hop) but KEEPS every hop's estimate:
``est_h`` columns join into one row per node and the harmonic sum is
a FIXED expression tree — left-to-right over a small constant number
of doubles, so both engines produce the identical bit pattern (no
aggregation-order nondeterminism; the only floats are the per-hop
KMV estimates, each a single division).

Pinned: ``est_0 = 1`` (a node reaches itself — exact, the sketch
holds one hash); deltas can be slightly negative when two hops'
estimates cross (sketch noise) — they are NOT clamped, the estimator
is what it is and the mirror reproduces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.anf import _bottom_k
from hickoryspark.ops.sketch import KMV_SPACE, _kmv_hash
from hickoryspark.ops.trianglecount import canonical_edges

__all__ = ["hyperball_harmonic", "duckdb_hyperball_sql"]


def _estimate(agg_n, agg_h, k):
    return (
        F.when(agg_n < k, agg_n.cast("double"))
        .otherwise(F.lit(float(k - 1) * float(KMV_SPACE))
                   / agg_h.cast("double"))
    )


def hyperball_harmonic(edges: DataFrame, hops: int = 3, k: int = 32,
                       src_col: str = "src",
                       dst_col: str = "dst") -> DataFrame:
    """Edge list → ``(node, est_1..est_<hops>, harmonic)`` — per-hop
    reach estimates and the inverse-distance-weighted harmonic
    centrality over the ``hops``-radius ball."""
    if hops < 1:
        raise ValueError("hops must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    e = canonical_edges(edges, src_col, dst_col)
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"),
                           F.col("a").alias("nbr")))
    ).localCheckpoint(eager=True)
    state = adj.select("node", _kmv_hash(F.col("node")).alias("h")) \
               .distinct().localCheckpoint(eager=True)
    out = adj.select("node").distinct()
    for r in range(1, hops + 1):
        pulled = (
            adj.join(state.select(F.col("node").alias("s_node"), "h"),
                     adj["nbr"] == F.col("s_node"))
            .select("node", "h")
        )
        state = _bottom_k(
            state.select("node", "h").unionAll(pulled), k
        ).localCheckpoint(eager=True)
        est_r = state.groupBy("node").agg(
            _estimate(F.count(F.lit(1)).cast("long"), F.max("h"), k)
            .alias(f"est_{r}"))
        out = out.join(est_r, "node")
    terms = []
    for r in range(1, hops + 1):
        prev = F.lit(1.0) if r == 1 else F.col(f"est_{r - 1}")
        terms.append((F.col(f"est_{r}") - prev) / F.lit(float(r)))
    harmonic = terms[0]
    for t in terms[1:]:
        harmonic = harmonic + t
    return out.select(
        "node", *[f"est_{r}" for r in range(1, hops + 1)],
        harmonic.alias("harmonic"))


def duckdb_hyperball_sql(edges_rel: str, hops: int = 3, k: int = 32,
                         src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror: the ANF recurrence unrolled with a per-hop
    estimate CTE; harmonic = the same left-to-right expression."""
    big = float(k - 1) * float(KMV_SPACE)

    def est(alias):
        return (f"CASE WHEN COUNT(*) < {int(k)}"
                f" THEN CAST(COUNT(*) AS DOUBLE)"
                f" ELSE {big!r} / CAST(MAX(h) AS DOUBLE) END"
                f" AS {alias}")

    parts = [f"""hb_e AS (
          SELECT DISTINCT LEAST({src}, {dst}) AS a,
                 GREATEST({src}, {dst}) AS b
          FROM {edges_rel}
          WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
            AND {src} <> {dst}
        ), hb_adj AS (
          SELECT a AS node, b AS nbr FROM hb_e
          UNION ALL SELECT b, a FROM hb_e
        ), hb_s0 AS (
          SELECT DISTINCT node,
                 CAST(('0x' || substr(md5(CAST(node AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS h
          FROM hb_adj
        )"""]
    for r in range(1, hops + 1):
        parts.append(f"""hb_u{r} AS (
          SELECT DISTINCT node, h FROM (
            SELECT node, h FROM hb_s{r - 1}
            UNION ALL
            SELECT a.node, s.h
            FROM hb_adj a JOIN hb_s{r - 1} s ON a.nbr = s.node)
        ), hb_s{r} AS (
          SELECT node, h FROM (
            SELECT node, h, ROW_NUMBER() OVER (
              PARTITION BY node ORDER BY h) AS rn
            FROM hb_u{r}) WHERE rn <= {int(k)}
        ), hb_est{r} AS (
          SELECT node, {est(f'est_{r}')} FROM hb_s{r} GROUP BY node
        )""")
    est_cols = ", ".join(f"est_{r}" for r in range(1, hops + 1))
    joins = " ".join(
        f"JOIN hb_est{r} USING (node)" for r in range(1, hops + 1))
    terms = []
    for r in range(1, hops + 1):
        prev = "1.0" if r == 1 else f"est_{r - 1}"
        terms.append(f"(est_{r} - {prev}) / {float(r)!r}")
    harmonic = " + ".join(terms)
    return ("WITH " + ",\n".join(parts) + f"""
        SELECT node, {est_cols}, {harmonic} AS harmonic
        FROM (SELECT DISTINCT node FROM hb_adj) n {joins}""")
