"""Leakage-safe train/valid/test splits — the dedup-aware split rule
(Lee et al. 2021 §6.2 class of concern: near-duplicates straddling a
train/test boundary leak test data into training).

Pinned semantics (mirrored by the gate oracle):

- input: docs plus a NEAR-DUP PAIR LIST (any of the dedup ops' pair
  outputs); pairs are closed into connected components
  (ops/components.py min-label propagation) and the WHOLE component
  is assigned to one split — a doc's split depends on its component
  representative, never on the doc itself;
- docs in no pair are singleton components (component = own id);
- the split rule is the repo's deterministic permille hash
  (ops/sampling._hash_permille: 24 bits of md5(salt:key) mod 1000)
  over the COMPONENT id, cut by cumulative permille weights in the
  given order — e.g. ``[("train", 900), ("valid", 50), ("test", 50)]``
  puts buckets 0-899 in train, 900-949 in valid, 950-999 in test.
  Weights must sum to 1000 (exact; no silent renormalization).

Scale shape: component closure is the existing pointer-free min-label
propagation (log-bounded rounds over the pair-quotient graph); the
assignment itself is one left join (components is the SMALL side at
real dedup rates — AQE broadcasts it) plus a pure projection. No
windows, no skew funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.components import connected_components
from hickoryspark.ops.sampling import _hash_permille

__all__ = ["leakage_safe_split", "assign_splits"]

DEFAULT_SPLITS: list[tuple[str, int]] = [
    ("train", 900), ("valid", 50), ("test", 50)]


def assign_splits(
    docs: DataFrame,
    components: DataFrame,
    splits: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
    salt: str = "split0",
) -> DataFrame:
    """docs + (doc_id, component) -> all doc columns plus
    ``component`` (own id when absent from ``components``) and
    ``split``."""
    splits = DEFAULT_SPLITS if splits is None else splits
    total = sum(w for _, w in splits)
    if total != 1000 or any(w <= 0 for _, w in splits):
        raise ValueError(
            f"split weights must be positive and sum to 1000, got {splits}")
    comp = components.select(
        F.col("doc_id").alias("_cid"), F.col("component").alias("_comp")
    )
    out = docs.join(comp, docs[id_col] == comp["_cid"], "left").drop("_cid")
    component = F.coalesce(F.col("_comp"), F.col(id_col))
    bucket = _hash_permille(component, salt)
    expr = None
    cum = 0
    for name, w in splits:
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return out.select(
        *[c for c in docs.columns],
        component.cast("long").alias("component"),
        expr.alias("split"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    splits: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    salt: str = "split0",
) -> DataFrame:
    """Close ``pairs`` into components, then :func:`assign_splits`."""
    comps = connected_components(pairs, src=src, dst=dst)
    return assign_splits(docs, comps, splits, id_col=id_col, salt=salt)
