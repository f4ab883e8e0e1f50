"""Feature hashing (the "hashing trick", Weinberger et al. ICML 2009)
— the fixed-dimension bag-of-words featurizer linear classifiers and
online learners consume: no vocabulary pass, no dictionary shipping,
just ``bucket = hash(token) mod k`` with a second hash bit supplying
the sign (which makes the estimator unbiased).

Pinned semantics (oracle-reproducible, exact BIGINT):

- tokens: ``split(text, ' ')`` verbatim (the corpus tokenization
  contract);
- ``bucket = ('0x' || md5('fh:' || token)[1:12])::BIGINT mod k`` —
  48 md5 bits, salt ``fh:`` (independent of every other md5 use in
  the repo);
- ``sign = +1`` iff md5 bit 49 (the 13th hex digit's low bit) is 0,
  else ``-1``;
- ``value = sum of signs`` over token OCCURRENCES in the doc (tf
  weighting with signed collisions — the unbiased-collision form);
  zero-sum buckets (colliding +1/-1) keep their row: the consumer
  decides sparsity, the featurizer reports what it computed.

Scale shape: one explode + one (doc_id, bucket) aggregation with
map-side combine; the hash is JVM md5 — no Python, no vocabulary
shuffle, no dictionary broadcast. This is the op that replaces a
vocab-join featurizer when the vocab itself would be the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["feature_hash", "duckdb_feature_hash_sql"]

_SALT = "fh:"


def feature_hash(
    docs: DataFrame, k: int = 1024, text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, bucket, value): signed hashed bag-of-words."""
    toks = F.split(F.col(text_col), " ")
    t = docs.select("doc_id", F.explode(toks).alias("tok"))
    h = F.md5(F.concat(F.lit(_SALT), F.col("tok")))
    bucket = F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % k
    sign = F.when(
        F.conv(F.substring(h, 13, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        t.select("doc_id", bucket.alias("bucket"), sign.alias("_s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("_s").cast("long").alias("value"))
    )


def duckdb_feature_hash_sql(
    docs_rel: str, k: int = 1024, text_col: str = "text"
) -> str:
    """Full mirror: identical salt, hex-slice widths, and sign rule."""
    return f"""
        WITH t AS (
          SELECT doc_id, md5('{_SALT}' || u.tok) AS h
          FROM {docs_rel},
               unnest(string_split({text_col}, ' ')) AS u(tok))
        SELECT doc_id,
               CAST(('0x' || substr(h, 1, 12))::BIGINT % {k} AS BIGINT)
                 AS bucket,
               CAST(SUM(CASE WHEN ('0x' || substr(h, 13, 1))::BIGINT
                                  % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS value
        FROM t
        GROUP BY 1, 2"""
