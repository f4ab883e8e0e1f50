"""k-core decomposition — dense-subgraph extraction by iterative
peeling.

The k-core of a graph is the maximal subgraph where every node has
degree ≥ k (Seidman 1983, "Network structure and minimum degree");
on web/host graphs the high-k cores isolate link farms and tightly
knit spam clusters that triangle counts (ops/trianglecount.py) flag
per node — the core gives the SUBGRAPH. Standard peeling: repeatedly
delete nodes with current degree < k until none remain.

Pinned semantics:

- input is undirected + simple exactly as triangle_counts (self-loops
  and NULLs drop, parallel/reversed edges collapse);
- ``k_core(edges, k)`` returns the surviving node set with each
  node's degree WITHIN the core;
- peeling runs to a FIXPOINT (the k-core is unique and independent of
  deletion order — Seidman), bounded by ``max_rounds`` as a hostile-
  input backstop (a k=2 path peels one node per END per round — depth
  n/2; a "squared" path under k=3 peels one node per round — depth
  n); hitting the bound raises rather than silently returning a
  non-core.

Scale shape: each round is one degree groupBy + two anti-join edge
filters — all key-partitioned; the loop is driver-side with the
surviving edge set localCheckpoint-ed EVERY round (the
resolve_redirects rule: ``low`` feeds two joins, so without plan
truncation the logical plan TRIPLES per round and Catalyst analysis
time explodes exponentially — observed as a multi-minute hang on a
10-node path before the fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.trianglecount import canonical_edges

__all__ = ["k_core"]


def k_core(edges: DataFrame, k: int, src_col: str = "src",
           dst_col: str = "dst", max_rounds: int = 64) -> DataFrame:
    """Edge list → ``(node, degree)`` of the k-core (possibly empty)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = canonical_edges(edges, src_col, dst_col) \
        .localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        )
        low = deg.where(F.col("degree") < k).select("node") \
            .localCheckpoint(eager=True)
        if low.isEmpty():
            return deg
        e = (
            e.join(low.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(low.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core did not converge within {max_rounds} rounds")
