"""Content-Security-Policy parsing — serialized CSP policies into
(directive, source) rows, per the W3C CSP3 ABNF.

The security-audit sibling of ops/http.py's cookie/cache parsing:
crawl pipelines aggregate per-host CSP adoption (which hosts set
frame-ancestors? where is unsafe-inline still allowed?) from exactly
this relation.

Pinned semantics (CSP3 §2.2 serialized-policy, oracle-reproducible):

- a policy splits on ``;`` into directive segments, each trimmed of
  ASCII ``[ \\t]``;
- empty segments are skipped; a segment's NAME is its first
  ``[ \\t]``-delimited token, case-folded; a name not matching
  ``^[a-z0-9-]+$`` drops the whole segment (grammar rule);
- a DUPLICATE name within one policy drops the later segment whole
  (CSP3: "a policy MUST NOT contain more than one directive with the
  same name; ignore subsequent ones");
- ``dir_idx`` is the 0-based index among the KEPT directives;
- values are the remaining ``[ \\t]``-separated tokens, emitted one
  row each with 0-based ``src_idx``; a value-less directive (e.g.
  ``upgrade-insecure-requests``) emits ONE row with NULL
  src_idx/value.

Spark shape: pure JVM — split/posexplode + two id-local windows (the
dup-drop rank and the kept-index), one posexplode_outer. No Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_csp", "duckdb_csp_sql"]

_NAME_RE = "^[a-z0-9-]+$"


def parse_csp(policies: DataFrame,
              id_cols: Sequence[str] = ("url", "policy_idx"),
              policy_col: str = "policy") -> DataFrame:
    """``(*id_cols, dir_idx, directive, src_idx, value)`` — one row
    per source token (one NULL-valued row for value-less
    directives)."""
    ids = [F.col(c) for c in id_cols]

    seg = policies.select(
        *ids,
        F.posexplode(F.split(F.col(policy_col), ";"))
        .alias("seg_idx", "_raw"),
    ).withColumn(
        "_seg", F.expr("btrim(_raw, ' \\t')")
    ).withColumn(
        "directive",
        F.lower(F.regexp_extract(F.col("_seg"), r"^([^ \t]+)", 1)),
    ).where(
        (F.col("_seg") != "") & F.col("directive").rlike(_NAME_RE)
    )

    dedup_w = Window.partitionBy(*id_cols, "directive").orderBy("seg_idx")
    idx_w = Window.partitionBy(*id_cols).orderBy("seg_idx")
    kept = (
        seg.withColumn("_dup", F.row_number().over(dedup_w))
        .where(F.col("_dup") == 1)
        .withColumn("dir_idx",
                    (F.row_number().over(idx_w) - 1).cast("long"))
    )

    vals = F.filter(
        F.split(F.regexp_replace(F.col("_seg"), r"^[^ \t]+[ \t]*", ""),
                r"[ \t]+"),
        lambda t: t != "",
    )
    return kept.select(
        *ids, "dir_idx", "directive",
        F.posexplode_outer(
            F.when(F.size(vals) > 0, vals)
        ).alias("src_idx", "value"),
    ).withColumn("src_idx", F.col("src_idx").cast("long"))


def duckdb_csp_sql(policies_rel: str,
                   id_cols: Sequence[str] = ("url", "policy_idx"),
                   policy_col: str = "policy") -> str:
    """Full DuckDB mirror of :func:`parse_csp` — same split, trim,
    grammar filter, dup rule, and index rules."""
    idl = ", ".join(id_cols)
    return f"""
        WITH seg AS (
          SELECT {idl}, u.i - 1 AS seg_idx,
                 trim(lst[u.i], ' ' || chr(9)) AS seg
          FROM (SELECT {idl},
                       string_split({policy_col}, ';') AS lst
                FROM {policies_rel}) t,
               unnest(range(1, len(lst) + 1)) AS u(i)),
        named AS (
          SELECT {idl}, seg_idx, seg,
                 lower(regexp_extract(seg, '^([^ \t]+)', 1))
                     AS directive
          FROM seg
          WHERE seg != ''
            AND regexp_matches(
                  lower(regexp_extract(seg, '^([^ \t]+)', 1)),
                  '^[a-z0-9-]+$')),
        kept AS (
          SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY {idl}
                   ORDER BY seg_idx) - 1 AS BIGINT) AS dir_idx
          FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY {idl}, directive
                    ORDER BY seg_idx) AS _dup
                FROM named)
          WHERE _dup = 1),
        withvals AS (
          SELECT {idl}, dir_idx, directive,
                 list_filter(regexp_split_to_array(
                   regexp_replace(seg, '^[^ \t]+[ \t]*', ''),
                   '[ \t]+'), x -> x != '') AS vals
          FROM kept)
        SELECT {idl}, dir_idx, directive,
               CASE WHEN len(vals) = 0 THEN NULL
                    ELSE CAST(u.i - 1 AS BIGINT) END AS src_idx,
               CASE WHEN len(vals) = 0 THEN NULL
                    ELSE vals[u.i] END AS value
        FROM withvals,
             unnest(range(1, greatest(len(vals), 1) + 1)) AS u(i)"""
