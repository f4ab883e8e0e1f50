"""Quantity / unit-of-measure extraction — numeric facts with units.

Product pages, recipes, spec sheets and scientific text carry their
facts as unit-bearing quantities ("4.7 km", "500 mg", "1.5 GB");
extracting them with EXACT normalized magnitudes enables numeric
filtering/joining at corpus scale (the prices op's sibling for
physical units).

Pinned syntactic rule (this is an extractor, not a semantic parser —
"5 in" the preposition matches, by design):

- a match is ``<number><space?><unit>`` word-bounded; number =
  1-6 integer digits + optional 1-6 fraction digits (the digit caps
  bound the exact arithmetic below — larger magnitudes don't fit the
  BIGINT micro-unit scale and are skipped, documented);
- units are case-SENSITIVE drawn from the pinned table below;
- normalization: ``value_base`` = floor(number × factor) as BIGINT in
  the dimension's base unit — µm for length (mile/foot/inch factors
  are the exact international-yard definitions), ng for mass (the
  exact avoirdupois definitions), bytes for data (SI decimal), µs
  for time. FLOOR is applied to the exact decimal product BEFORE the
  integer cast on BOTH engines (Spark's decimal→long cast truncates
  where DuckDB's rounds — the pinned divergence killer).

Everything is JVM column work sharing ONE factor table with the
generated DuckDB mirror; regexes stay in the Java ∩ RE2 subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_measures", "duckdb_measures_sql", "UNITS",
           "MEASURE_RE"]

#: unit -> (dimension, factor in base units: µm / ng / B / µs)
UNITS = {
    "km": ("length", 1_000_000_000),
    "m": ("length", 1_000_000),
    "cm": ("length", 10_000),
    "mm": ("length", 1_000),
    "mi": ("length", 1_609_344_000),
    "ft": ("length", 304_800),
    "in": ("length", 25_400),
    "kg": ("mass", 1_000_000_000_000),
    "g": ("mass", 1_000_000_000),
    "mg": ("mass", 1_000_000),
    "lb": ("mass", 453_592_370_000),
    "oz": ("mass", 28_349_523_125),
    "TB": ("data", 1_000_000_000_000),
    "GB": ("data", 1_000_000_000),
    "MB": ("data", 1_000_000),
    "KB": ("data", 1_000),
    "ms": ("time", 1_000),
    "s": ("time", 1_000_000),
    "min": ("time", 60_000_000),
    "h": ("time", 3_600_000_000),
}

#: longest-first alternation so "min" beats "mi"+"n" and "ms" beats "m"
_UNIT_ALT = "|".join(
    sorted(UNITS, key=lambda u: (-len(u), u)))

MEASURE_RE = (
    r"\b[0-9]{1,6}([.][0-9]{1,6})? ?(" + _UNIT_ALT + r")\b")

_NUM_RE = r"\A([0-9]{1,6}([.][0-9]{1,6})?)"


def extract_measures(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """text → ``(doc_id, raw, unit, dimension, value_base)``."""
    raw = docs.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(MEASURE_RE), 0)
        ).alias("raw"),
    )
    num = F.regexp_extract("raw", _NUM_RE, 1)
    unit = F.regexp_replace(
        "raw", r"\A[0-9]{1,6}([.][0-9]{1,6})? ?", "")
    dim = None
    fac = None
    for u, (d, f_) in UNITS.items():
        dim = F.when(F.col("unit") == u, F.lit(d)) if dim is None \
            else dim.when(F.col("unit") == u, F.lit(d))
        fac = F.when(F.col("unit") == u, F.lit(f_)) if fac is None \
            else fac.when(F.col("unit") == u, F.lit(f_))
    return (
        raw.select(id_col, "raw", num.alias("num"), unit.alias("unit"))
        .select(
            id_col, "raw", "unit",
            dim.alias("dimension"),
            F.floor(
                F.col("num").cast("decimal(19,6)")
                * fac.cast("decimal(19,0)")
            ).cast("long").alias("value_base"),
        )
    )


def duckdb_measures_sql(input_rel: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB mirror (same regex, factor table, floor-then-cast)."""
    dim_case = " ".join(
        f"WHEN '{u}' THEN '{d}'" for u, (d, _) in UNITS.items())
    fac_case = " ".join(
        f"WHEN '{u}' THEN {f_}" for u, (_, f_) in UNITS.items())
    return f"""
        SELECT {id_col}, raw, unit,
               CASE unit {dim_case} END AS dimension,
               CAST(FLOOR(CAST(num AS DECIMAL(19,6))
                    * CAST(CASE unit {fac_case} END AS DECIMAL(19,0)))
                    AS BIGINT) AS value_base
        FROM (
          SELECT {id_col}, u.x AS raw,
                 regexp_extract(u.x, '{_NUM_RE}', 1) AS num,
                 regexp_replace(u.x,
                   '\\A[0-9]{{1,6}}([.][0-9]{{1,6}})? ?', '') AS unit
          FROM {input_rel},
               unnest(regexp_extract_all({text_col},
                      '{MEASURE_RE}')) AS u(x)
        )"""
