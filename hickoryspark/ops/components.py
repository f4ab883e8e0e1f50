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
(vertex-count rows, never edge^2); the label frame is eagerly
`localCheckpoint`-ed EVERY round — it feeds two joins per round, so
an un-truncated logical plan multiplies per round and driver-side
Catalyst analysis comes to dominate within ~4 rounds (the kcore
invariant; measured 3.0 -> 78.9 s/round at 2.1M edges under the old
checkpoint-every-5 policy, 0.8 s/round after truncation). Convergence
is detected by an exact changed-label count computed in the SAME pass
that steps the labels, so termination is data-driven, not a fixed
iteration guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
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
        .localCheckpoint(eager=True)
    )

    # Long-lived drivers (the parity gate) call this many times;
    # leaking persisted frames accumulates cached partitions, so edges
    # is released in a finally (covers the no-fixpoint RuntimeError
    # path too). Label frames are localCheckpoint-backed, not
    # CacheManager-cached: superseded rounds' blocks are reclaimed by
    # JVM GC + ContextCleaner (periodic, NOT immediate — and
    # clearCache() does not touch them), so at most O(rounds) copies
    # of the vertex-sized label frame are transiently resident. That
    # bound is the same one the repo's other iterative ops (kcore,
    # pagerank, bpe) already accept for per-round checkpoints.
    try:
        for it in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges["v"] == labels["doc_id"])
                .groupBy("u")
                .agg(F.min("component").alias("nmin"))
            )
            # ONE pass steps the labels AND carries the changed flag
            # (nmin < component; a NULL nmin — no neighbor improvement
            # — is NULL, which the count's filter drops like false),
            # then truncates lineage with an EAGER checkpoint: labels
            # feeds two joins per round, so persist()-only rounds let
            # the logical plan multiply and Catalyst analysis time
            # explode (see module docstring).
            stepped = (
                labels.join(
                    neighbor_min, labels["doc_id"] == neighbor_min["u"], "left"
                )
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component")),
                    ).alias("component"),
                    (F.col("nmin") < F.col("component")).alias("chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = stepped.where("chg").count()
            labels = stepped.select("doc_id", "component")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds"
        )
    finally:
        edges.unpersist()


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
