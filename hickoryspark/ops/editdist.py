"""Edit-distance near-duplicate pairs — typo-level clustering for
short strings (titles, product names, anchor texts).

metadata.duplicate_titles catches EXACT repeats; real crawls also
carry near-misses ("Spark Guide" / "Spark Guide!") that MinHash
misses at short lengths (too few shingles). Classic record-linkage
blocking + Levenshtein verification:

- CANDIDATES: pairs sharing the first ``prefix_len`` characters
  (exact block key) with length difference ≤ ``max_dist`` — a
  length gap > d already forces distance > d, so the band is
  lossless GIVEN the prefix block; the prefix block itself is the
  pinned recall trade-off (strings differing inside the first
  ``prefix_len`` chars are not candidates — standard blocking, the
  gate's oracle encodes the same rule);
- VERIFY: JVM ``levenshtein`` ≤ ``max_dist``; orientation
  ``id_a < id_b``.

Cross-engine contract: Spark's levenshtein is CHARACTER-based while
DuckDB's is BYTE-based (``levenshtein('café','cafe')`` = 1 vs 2 —
probed), so the mirror agrees on ASCII only; the op itself is
correct for any input. Oracle inputs must stay ASCII (pinned,
tested).

Scale shape: one equi-join on the (prefix, length-band) block keys —
every string joins to at most 2·max_dist+1 length buckets via a
small explode, so the join is a plain hash join, never a
theta-join/BNLJ (plan-guarded in tests); AQE handles hot prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["levenshtein_pairs", "duckdb_levenshtein_pairs_sql"]


def levenshtein_pairs(df: DataFrame, text_col: str = "title",
                      id_col: str = "doc_id", max_dist: int = 2,
                      prefix_len: int = 3) -> DataFrame:
    """→ ``(id_a, id_b, dist)`` candidate pairs within
    ``max_dist`` edits (same ``prefix_len``-char block)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.substring(text_col, 1, prefix_len).alias("pfx"),
        F.length(text_col).alias("ln"),
    ).where(F.col("s").isNotNull())
    # left side fans out to every length bucket within the band so
    # the join stays a pure equi-join on (pfx, bucket)
    left = base.select(
        "id", "s", "pfx",
        F.explode(
            F.sequence(F.col("ln") - max_dist, F.col("ln") + max_dist)
        ).alias("lb"),
    )
    right = base.select(
        F.col("id").alias("id_b"), F.col("s").alias("s_b"),
        F.col("pfx").alias("pfx_b"), F.col("ln").alias("lb"),
    )
    pairs = left.join(
        right,
        (left["pfx"] == right["pfx_b"]) & (left["lb"] == right["lb"]),
    ).where(F.col("id") < F.col("id_b"))
    dist = F.levenshtein("s", "s_b")
    return pairs.select(
        F.col("id").alias("id_a"), "id_b",
        dist.cast("long").alias("dist"),
    ).where(F.col("dist") <= max_dist)


def duckdb_levenshtein_pairs_sql(input_rel: str, text_col: str = "title",
                                 id_col: str = "doc_id",
                                 max_dist: int = 2,
                                 prefix_len: int = 3) -> str:
    """DuckDB mirror — ASCII inputs only (byte-vs-char levenshtein)."""
    return f"""
        WITH lv_b AS (
          SELECT {id_col} AS id, {text_col} AS s,
                 substring({text_col}, 1, {prefix_len}) AS pfx,
                 length({text_col}) AS ln
          FROM {input_rel} WHERE {text_col} IS NOT NULL
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM lv_b a JOIN lv_b b
          ON a.pfx = b.pfx AND a.id < b.id
         AND abs(a.ln - b.ln) <= {max_dist}
        WHERE levenshtein(a.s, b.s) <= {max_dist}"""
