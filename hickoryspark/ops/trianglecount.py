"""Triangle counting + local clustering coefficient on a link graph.

Triangles are the workhorse of web-graph structure analysis: link-farm
and spam-cluster detection (farms are abnormally dense → high local
clustering), community seeding, and graph-quality audits all start
from per-node triangle counts. Runs on any edge list — typically the
host graph (ops/hostgraph.host_edges output).

Algorithm: degree orientation (the node-iterator++ / "forward"
scheme, Schank & Wagner 2005; the standard MapReduce formulation is
Suri & Vassilvitskii WWW'11). Each undirected edge is directed from
its lower endpoint to its higher endpoint in the total order
``(degree, node)``; every triangle then has exactly ONE wedge at its
lowest-order apex, so one wedge self-join plus one closure semi-join
enumerates each triangle once. The orientation is the scale story:
out-degree after orienting is bounded by O(sqrt(m)) even when raw
degree is power-law (a hub of degree 10^6 produces NO wedges at its
apex — its edges all point toward it), so the wedge join never
explodes on skewed web graphs.

Pinned semantics:

- the input is treated as UNDIRECTED and SIMPLE: self-loops and NULL
  endpoints drop, parallel/reversed duplicates collapse via
  (least, greatest) + distinct;
- every node that appears on a surviving edge gets an output row,
  triangle count 0 when it closes none;
- ``cc_milli`` = (2000 * n_triangles) div (degree * (degree - 1)) —
  the local clustering coefficient 2T/(d(d-1)) in truncating integer
  milli-points (exact, hash-stable); 0 when degree < 2.

Scale shape: one distinct on the canonical edge, one degree groupBy,
two equi-joins to attach endpoint degrees, the wedge self-join on the
oriented apex, the closure equi-join on (v, w), and one final count
groupBy — all key-partitioned JVM joins (AQE handles residual skew),
no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_edges", "triangle_counts", "duckdb_triangles_sql"]


def canonical_edges(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """The pinned "undirected + simple" normalization shared by every
    graph-structure op (triangles, k-core): NULL endpoints and
    self-loops drop, parallel/reversed edges collapse to one
    ``(a, b) = (least, greatest)`` row."""
    return (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull()
               & (F.col("x") != F.col("y")))
        .select(F.least("x", "y").alias("a"),
                F.greatest("x", "y").alias("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Edge list → ``(node, degree, n_triangles, cc_milli)``."""
    e = canonical_edges(edges, src_col, dst_col)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"),
                          F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("degree").alias("db")), "b")
    )
    # orient low-(degree, node) -> high; carry the head's rank for the
    # wedge ordering below (field names must match for struct compare)
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    a_low = ra < rb
    oriented = ed.select(
        F.when(a_low, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_low, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_low, rb).otherwise(ra).alias("rv"),
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u"))
        & (F.col("e1.rv") < F.col("e2.rv")),
    ).select(F.col("e1.u").alias("u"), F.col("e1.v").alias("v"),
             F.col("e2.v").alias("w"))
    # rank(v) < rank(w), so the closing edge — if present — is
    # oriented exactly v -> w
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(closing, ["v", "w"], "left_semi")
    per_node = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("v").alias("node")))
        .unionAll(tris.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long").alias("n_triangles"),
    )
    return out.select(
        "node", "degree", "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.expr("(2000 * n_triangles) div (degree * (degree - 1))"),
        ).otherwise(F.lit(0)).cast("long").alias("cc_milli"),
    )


def duckdb_triangles_sql(edges_rel: str, src: str = "src",
                         dst: str = "dst") -> str:
    """DuckDB mirror of :func:`triangle_counts` over ``edges_rel``
    (a relation/CTE name exposing ``src``/``dst`` columns)."""
    return f"""
        WITH tc_e AS (
          SELECT DISTINCT LEAST({src}, {dst}) AS a,
                          GREATEST({src}, {dst}) AS b
          FROM {edges_rel}
          WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
            AND {src} <> {dst}
        ), tc_deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT a AS node FROM tc_e
                UNION ALL SELECT b FROM tc_e)
          GROUP BY node
        ), tc_or AS (
          SELECT CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                      THEN e.a ELSE e.b END AS u,
                 CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                      THEN e.b ELSE e.a END AS v,
                 CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                      THEN db.degree ELSE da.degree END AS dv
          FROM tc_e e
          JOIN tc_deg da ON da.node = e.a
          JOIN tc_deg db ON db.node = e.b
        ), tc_tri AS (
          SELECT e1.u, e1.v, e2.v AS w
          FROM tc_or e1
          JOIN tc_or e2 ON e1.u = e2.u
                       AND (e1.dv, e1.v) < (e2.dv, e2.v)
          WHERE EXISTS (SELECT 1 FROM tc_or c
                        WHERE c.u = e1.v AND c.v = e2.v)
        ), tc_cnt AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM (SELECT u AS node FROM tc_tri
                UNION ALL SELECT v FROM tc_tri
                UNION ALL SELECT w FROM tc_tri)
          GROUP BY node
        )
        SELECT d.node, d.degree,
               CAST(COALESCE(c.n_triangles, 0) AS BIGINT)
                   AS n_triangles,
               CAST(CASE WHEN d.degree >= 2
                         THEN (2000 * COALESCE(c.n_triangles, 0))
                              // (d.degree * (d.degree - 1))
                         ELSE 0 END AS BIGINT) AS cc_milli
        FROM tc_deg d LEFT JOIN tc_cnt c USING (node)"""
