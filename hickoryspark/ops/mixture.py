"""Corpus mixture sampling — hit target per-source weights by
deterministic downsampling (the data-mixture primitive behind every
"X% web, Y% code, Z% books" training recipe; static DoReMi-style
reweighting at the corpus-build stage).

Pinned EXACT-INTEGER semantics (mirrored by the gate oracle):

- ``weights``: stratum -> target permille, each > 0, summing to 1000;
- strata present in the data but NOT in ``weights`` are DROPPED
  (weight 0); weights naming absent strata are ignored for the scale
  computation (they cannot bind);
- the mixture is scaled to the LARGEST total the binding stratum
  (the one minimizing count_s / w_s) allows, downsample-only; every
  stratum keeps rate ``r_s = min_t floor(1000 * count_t * w_s /
  (w_t * count_s))`` permille over strata t present in both sides —
  an EXACT pairwise rational comparison, so the binding stratum
  computes to exactly 1000 (keep all; a single scaled-M formulation
  floors the binding stratum to 999 at non-divisible counts);
- selection is the repo's deterministic permille hash
  (ops/sampling._hash_permille over ``salt:key``) ``< r_s`` — rates
  hold in expectation per stratum; exact-count selection would need a
  global per-stratum rank (a skew funnel) for marginal benefit, so
  the rate rule is the contract (documented).

Scale shape: one map-side-combinable groupBy for the counts, a
K-squared self-join of the TINY stratum table for the pairwise min
(K = #weighted strata), one equi-join of the tiny rate table back
onto the corpus (AQE broadcasts it), one filter. No windows, no skew
funnel, and the rate table never touches the driver. Overflow bound:
1000 * count * 1000 needs count < 9.2e12 rows per stratum (BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hickoryspark.ops.sampling import _hash_permille

__all__ = ["mixture_rates", "mixture_sample"]


def _weights_df(spark: SparkSession, weights: dict[str, int]) -> DataFrame:
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    if sum(weights.values()) != 1000:
        raise ValueError(
            f"weights must sum to 1000, got {sum(weights.values())}")
    # ONE partition, explicitly: createDataFrame over local rows
    # otherwise parallelizes them across defaultParallelism (32)
    # PYTHON-evaluated partitions, and every downstream execution
    # pays a Python-worker round trip per partition — serialized
    # under the cartesian below (measured ~7s for a 4-row table;
    # 0.4s with a single slice).
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(k, int(w)) for k, w in weights.items()], 1
        ),
        "stratum string, w long",
    )


def mixture_rates(
    docs: DataFrame, weights: dict[str, int], stratum: str = "source"
) -> DataFrame:
    """(stratum, n_rows, w, rate_permille) — the per-stratum keep
    rates, fully relational."""
    wdf = _weights_df(docs.sparkSession, weights)
    counts = docs.groupBy(F.col(stratum).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"))
    # coalesce(1) BOTH cartesian inputs: the stratum table is K rows
    # (K = #weighted strata, a plan-time constant), but a
    # CartesianProduct's partition count is left×right — two unforced
    # 32-partition sides made 1,024 near-empty tasks, ~13s of pure
    # task scheduling for a 3x3 product (and AQE does not coalesce
    # through CartesianProduct). 1×1 partitions = 1 task; values are
    # partitioning-independent.
    joined = counts.join(wdf, "stratum").coalesce(1)
    # inner join: unweighted strata drop
    other = joined.select(
        F.col("n_rows").alias("_tn"), F.col("w").alias("_tw"))
    return (
        joined.crossJoin(other)
        .groupBy("stratum", "n_rows", "w")
        .agg(F.min(F.expr("(1000 * _tn * w) div (_tw * n_rows)"))
             .alias("rate_permille"))
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, int],
    stratum: str = "source",
    key: str = "doc_id",
    salt: str = "mix0",
) -> DataFrame:
    """Kept rows (all doc columns + ``rate_permille``) — strata
    downsampled so kept sizes target the ``weights`` mixture."""
    rates = mixture_rates(docs, weights, stratum).select(
        F.col("stratum").alias("_stratum"), "rate_permille")
    return (
        docs.join(rates, docs[stratum] == F.col("_stratum"), "inner")
        .where(_hash_permille(F.col(key), salt) < F.col("rate_permille"))
        .drop("_stratum")
    )
