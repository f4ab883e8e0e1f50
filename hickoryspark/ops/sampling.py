"""Deterministic sampling + sequence packing for training-data mixes.

Every operator is reproducible from the data alone (no RNG state, no
row order dependence) so a re-run — or the DuckDB oracle — lands on
the identical sample:

- ``hash_sample``: keep a row iff a salted md5 of its key falls under
  the rate threshold. Uniform, stable under repartitioning, and
  different salts give independent samples (the standard trick for
  held-out splits).
- ``stratified_sample``: per-stratum quota via window rank — caps any
  one source's contribution to the mix (the "data mixture" op).
- ``pack_sequences``: assign docs to ~token-budget training chunks by
  running token count, windowed PER SOURCE so the cumulative sums
  parallelize (a single global window would funnel the corpus through
  one task at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_permille(key: Column, salt: str) -> Column:
    """Deterministic 0..999 bucket: 24 bits of md5(salt:key) mod 1000.
    Mirrored by the oracle as ('0x' || substr(md5(..),1,6))::BIGINT."""
    h6 = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 6)
    return F.conv(h6, 16, 10).cast("long") % 1000


def hash_sample(
    docs: DataFrame, permille: int, key: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep ~permille/1000 of rows, deterministically by key hash."""
    return docs.where(_hash_permille(F.col(key), salt) < permille)


def stratified_sample(
    docs: DataFrame,
    per_stratum: int,
    stratum: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """At most ``per_stratum`` rows per stratum, the deterministic
    first-N by ``order`` — one window per stratum, no global sort."""
    w = Window.partitionBy(stratum).orderBy(order)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_stratum)
        .drop("_rn")
    )


def pack_sequences(
    docs: DataFrame, token_budget: int, stratum: str = "source"
) -> DataFrame:
    """(doc_id, source, n_tokens, chunk_id): docs packed in doc_id
    order into chunks of ~token_budget tokens per stratum —
    chunk_id = tokens-before-this-doc // budget, so a chunk holds
    consecutive docs until the budget spills. Per-stratum windows keep
    the cumulative sum parallel; the chunk key is (stratum, chunk_id).
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy(stratum)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select("doc_id", stratum, n_tokens.alias("n_tokens"))
        .withColumn("chunk_id", F.floor(cum_before / token_budget).cast("long"))
    )
