"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, compares
row-count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded to 6).

Two hardenings after CORRECTNESS_r03 (5 hash failures the previous
fetchall()-only replica normalized to green):

- the oracle is collected through BOTH ``fetchall()`` AND the pandas
  path (``.df()``, how the driver evidently collects) and a query only
  passes if the Spark hash matches BOTH oracle hashes;
- a type lint REJECTS any query whose Spark schema or oracle output
  contains DECIMAL / HUGEINT / TIMESTAMP columns — those types render
  differently between the two collection paths (Decimal('123.4000')
  vs float64 123.4), so they are hash-fragile by construction. Keep
  exact decimal arithmetic internal and cast final outputs to
  ROUND(CAST(x AS DOUBLE), 6) / BIGINT / a canonical string.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: DuckDB logical types whose rendering differs between fetchall() and
#: the pandas path — banned from oracle outputs. Matched on prefix so
#: DECIMAL(18,4) and TIMESTAMP WITH TIME ZONE both hit.
_BANNED_ORACLE_TYPES = ("DECIMAL", "HUGEINT", "TIMESTAMP", "TIME", "DATE")


def _norm_cell(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or v is getattr(pd, "NA", object()):
        return "\0"
    if isinstance(v, (bool, np.bool_)):
        return "1" if v else "0"
    if isinstance(v, float):  # np.float64 subclasses float
        if math.isnan(v):
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def _restore_nullable_dtypes(pdf, typed_cols):
    """pandas coerces a nullable int/bool column to float64/object;
    restore extension dtypes so the hash sees ints as ints and NULLs
    as "\\0" on both collection paths. typed_cols: [(name, kind)] with
    kind in {'i', 'b', 'f'} for integral / boolean / floating."""
    for name, kind in typed_cols:
        if kind == "i" and pdf[name].dtype.kind == "f":
            pdf[name] = pdf[name].astype("Int64")
        elif kind == "b" and pdf[name].dtype.kind in ("f", "O"):
            pdf[name] = pdf[name].astype("boolean")
        elif kind == "f" and pdf[name].dtype.kind == "f":
            # SQL NULL arrived as NaN; nullable Float64 maps it back to
            # NA ("\0") — no query legitimately returns IEEE NaN
            pdf[name] = pdf[name].astype("Float64")
    return pdf


def _spark_type_kinds(schema):
    from pyspark.sql import types as T

    out = []
    for f in schema.fields:
        if isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            out.append((f.name, "i"))
        elif isinstance(f.dataType, T.BooleanType):
            out.append((f.name, "b"))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            out.append((f.name, "f"))
    return out


def _duck_type_kinds(cols, types):
    out = []
    for name, t in zip(cols, types):
        ts = str(t).upper()
        if ts in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                  "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            out.append((name, "i"))
        elif ts == "BOOLEAN":
            out.append((name, "b"))
        elif ts in ("DOUBLE", "FLOAT", "REAL"):
            out.append((name, "f"))
    return out


def lint_types(name, spark_schema, duck_types, duck_cols) -> list[str]:
    """Reject hash-fragile output types on either side (see module
    docstring). Returns a list of violation strings (empty = clean)."""
    from pyspark.sql import types as T

    bad = []
    for f in spark_schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            bad.append(f"spark:{f.name}:{f.dataType.simpleString()}")
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType,
                                     T.DateType)):
            bad.append(f"spark:{f.name}:{f.dataType.simpleString()}")
    for cname, t in zip(duck_cols, duck_types):
        ts = str(t).upper()
        if ts.startswith(_BANNED_ORACLE_TYPES):
            bad.append(f"oracle:{cname}:{ts}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from hickoryspark.spark.session import get_spark

    spark = get_spark(8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    qs = E.queries()
    oracles = E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        print(f"     available: {sorted(qs)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            # Arrow-batched collection: plain .collect() deserializes
            # row-by-row through py4j and takes tens of minutes on the
            # multi-million-row pair queries at sf0.1
            pdf = _restore_nullable_dtypes(
                df.toPandas(), _spark_type_kinds(df.schema)
            )
            rows = list(pdf.itertuples(index=False, name=None))
            n_s, h_s = table_hash(list(pdf.columns), rows)
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            # still lint the Spark side — a fragile type in a
            # rows-only query bites the day it grows an oracle
            bad = lint_types(name, df.schema, [], [])
            if bad:
                print(f"FAIL {name}: hash-fragile types {bad}")
                failures.append(name)
            elif n_s == 0:
                print(f"FAIL {name}: rows=0 (no oracle — rows-only check)")
                failures.append(name)
            else:
                print(f"ok   {name}: rows={n_s} (no oracle — rows-only)")
            continue
        try:
            rel = con.sql(sql)
            ocols, otypes = list(rel.columns), list(rel.types)
            bad = lint_types(name, df.schema, otypes, ocols)
            if bad:
                print(f"FAIL {name}: hash-fragile types {bad}")
                failures.append(name)
                continue
            # path 1: fetchall() (tuples of python scalars)
            orows = con.execute(sql).fetchall()
            n_o, h_o = table_hash(ocols, orows)
            # path 2: pandas (how the driver's harness collects) —
            # both must agree with Spark or the gate can diverge from
            # this replica again
            opdf = _restore_nullable_dtypes(
                con.execute(sql).df(), _duck_type_kinds(ocols, otypes)
            )
            n_p, h_p = table_hash(
                list(opdf.columns),
                list(opdf.itertuples(index=False, name=None)),
            )
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if sorted(ocols) != cols:
            print(f"FAIL {name}: cols spark={cols} oracle={sorted(ocols)}")
            failures.append(name)
        elif (n_s, h_s) != (n_o, h_o):
            print(f"FAIL {name}: rows {n_s} vs {n_o}, hash {h_s[:8]} vs {h_o[:8]} (fetchall path)")
            failures.append(name)
        elif (n_s, h_s) != (n_p, h_p):
            print(f"FAIL {name}: rows {n_s} vs {n_p}, hash {h_s[:8]} vs {h_p[:8]} (pandas path)")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={n_s} hash={h_s[:8]}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
