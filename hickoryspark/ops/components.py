"""Connected components over the dedup pair graph — the clustering
step that turns near-duplicate PAIRS into duplicate GROUPS (each doc
labeled with its component representative = the minimum doc_id
reachable through the pair graph).

Algorithm: iterative min-label propagation on the symmetrized edge
list — each round every vertex takes the minimum label among itself
and its neighbors; fixpoint after O(diameter) rounds. Dedup graphs
are near-cliques (docs sharing a signature pairwise connect), so the
diameter is small; for adversarially long path graphs the same loop
shape upgrades to the large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public), which squares the distance per round.

Scale notes: each round is one join + one groupBy on the label frame
(vertex-count rows, never edge^2); `localCheckpoint` every few rounds
truncates the growing lineage so the plan does not deepen linearly
with iterations; convergence is detected by an exact changed-label
count, so termination is data-driven, not a fixed iteration guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(src, dst) pair list → (doc_id, component) with component = min
    reachable vertex id. Vertices are those appearing in any pair.

    Raises RuntimeError if the fixpoint is not reached in ``max_iter``
    rounds (termination must be explicit, not silently wrong labels).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    labels.count()

    # Long-lived drivers (the 77-query parity gate) call this many
    # times; leaking persisted frames accumulates cached partitions, so
    # every working frame is released before returning — edges in a
    # finally (covers the no-fixpoint RuntimeError path too), and the
    # result is cut loose from its cache via an eager localCheckpoint.
    try:
        for it in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges["v"] == labels["doc_id"])
                .groupBy("u")
                .agg(F.min("component").alias("nmin"))
            )
            new_labels = (
                labels.join(
                    neighbor_min, labels["doc_id"] == neighbor_min["u"], "left"
                )
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component")),
                    ).alias("component"),
                )
            )
            if (it + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint()
            else:
                new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                result = labels.localCheckpoint(eager=True)
                labels.unpersist()
                return result
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds"
        )
    finally:
        edges.unpersist()
        labels.unpersist()  # no-op when already released on success


def dedup_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Every document labeled with its duplicate-cluster representative:
    docs in the pair graph get their component minimum, isolated docs
    represent themselves. The final assignment table a dedup pipeline
    keeps (keep rows where doc_id == component)."""
    comp = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
