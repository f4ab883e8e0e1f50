"""Community detection — deterministic synchronous label propagation.

Host-graph communities drive crawl curation (a link-farm ring is one
dense community; topical hubs cluster with their satellites) and
corpus mixture analysis. Classic LPA (Raghavan et al. 2007) is
randomized; web-scale pipelines need the DETERMINISTIC variant so
reruns, shards, and engines agree, so this is pinned as:

- graph = undirected simple (the shared
  :func:`~hickoryspark.ops.trianglecount.canonical_edges`
  normalization: NULL endpoints and self-loops drop, parallel /
  reversed edges collapse);
- labels initialize to the node's own key;
- each round, EVERY node simultaneously adopts the label that is
  most frequent among its neighbors' previous-round labels, ties
  broken by smallest label (string order); isolated input rows never
  reach the edge phase (nodes are derived FROM the edges), and a
  node keeps its label only through the tie/majority rule itself —
  every node with a neighbor gets a vote result every round;
- exactly ``rounds`` synchronous rounds (fixed-round semantics: LPA
  convergence is data-dependent and oscillation on bipartite
  structures is real; a pinned round count is reproducible and
  oracle-checkable — callers pick rounds ~ graph diameter).

Scale shape: one adjacency self-representation (each undirected edge
contributes both directions), per round ONE (node, label) groupBy +
ONE min-struct argmax groupBy (never a window) + an equi-join back to
the label table. The label frame is localCheckpoint-ed EVERY round —
it feeds the next round's join and the plan otherwise compounds
(the kcore lesson: Catalyst analysis grows ~3^rounds).

Oracle: :func:`duckdb_labelprop_sql` UNROLLS the recurrence one CTE
pair per round (count → argmax-window → relabel), the bpe/pagerank
mirror convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.trianglecount import canonical_edges

__all__ = ["label_propagation", "community_sizes",
           "duckdb_labelprop_sql"]


def label_propagation(edges: DataFrame, rounds: int = 5,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Edge list → ``(node, label)`` after ``rounds`` synchronous
    deterministic LPA rounds."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = canonical_edges(edges, src_col, dst_col)
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(
            e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    ).localCheckpoint(eager=True)
    labels = (
        adj.select("node").distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    nbr_l = adj.withColumnRenamed("node", "n2")
    for _ in range(rounds):
        votes = (
            nbr_l.join(labels, nbr_l["nbr"] == labels["node"])
            .groupBy(F.col("n2").alias("v_node"), "label")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        pick = votes.groupBy("v_node").agg(
            F.min(F.struct((-F.col("c")).alias("neg"),
                           F.col("label").alias("l")))["l"]
            .alias("new_label"))
        labels = (
            labels.join(pick, labels["node"] == pick["v_node"])
            .select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """LPA output → ``(label, n_nodes)`` community rollup."""
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"))


def duckdb_labelprop_sql(edges_rel: str, rounds: int = 5,
                         src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror: the recurrence unrolled one CTE pair per
    round. ``edges_rel`` must expose ``src``/``dst`` columns."""
    parts = [f"""lp_adj AS (
          SELECT a AS node, b AS nbr FROM (
            SELECT DISTINCT LEAST({src}, {dst}) AS a,
                   GREATEST({src}, {dst}) AS b
            FROM {edges_rel}
            WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
              AND {src} <> {dst})
          UNION ALL
          SELECT b, a FROM (
            SELECT DISTINCT LEAST({src}, {dst}) AS a,
                   GREATEST({src}, {dst}) AS b
            FROM {edges_rel}
            WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
              AND {src} <> {dst})
        ), lp_l0 AS (
          SELECT DISTINCT node, node AS label FROM lp_adj
        )"""]
    for r in range(1, rounds + 1):
        parts.append(f"""lp_c{r} AS (
          SELECT a.node, l.label, COUNT(*) AS c
          FROM lp_adj a JOIN lp_l{r - 1} l ON a.nbr = l.node
          GROUP BY a.node, l.label
        ), lp_p{r} AS (
          SELECT node, label FROM (
            SELECT node, label, ROW_NUMBER() OVER (
              PARTITION BY node ORDER BY c DESC, label ASC) AS rn
            FROM lp_c{r}) WHERE rn = 1
        ), lp_l{r} AS (
          SELECT l.node, p.label
          FROM lp_l{r - 1} l JOIN lp_p{r} p ON l.node = p.node
        )""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, label FROM lp_l{rounds}")
