"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, compares
row-count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded to 6).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
            pdf = df.toPandas()
            # toPandas coerces a NULLABLE int/bool column to float64
            # (NULL -> NaN, 5 -> 5.0), which would corrupt the value
            # hash vs the oracle's int/None — restore nullable dtypes
            from pyspark.sql import types as T

            for f in df.schema.fields:
                integral = isinstance(
                    f.dataType,
                    (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
                )
                if integral and pdf[f.name].dtype.kind == "f":
                    pdf[f.name] = pdf[f.name].astype("Int64")
                elif isinstance(f.dataType, T.BooleanType) and \
                        pdf[f.name].dtype.kind in ("f", "O"):
                    pdf[f.name] = pdf[f.name].astype("boolean")
                elif isinstance(f.dataType, (T.DoubleType, T.FloatType)) and \
                        pdf[f.name].dtype.kind == "f":
                    # SQL NULL arrived as NaN; nullable Float64 maps it
                    # back to NA ("\0"), matching the oracle's None
                    # (no query legitimately returns IEEE NaN)
                    pdf[f.name] = pdf[f.name].astype("Float64")
            rows = list(pdf.itertuples(index=False, name=None))
            n_s, h_s = table_hash(list(pdf.columns), rows)
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            if n_s == 0:
                print(f"FAIL {name}: rows=0 (no oracle — rows-only check)")
                failures.append(name)
            else:
                print(f"ok   {name}: rows={n_s} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            n_o, h_o = table_hash(ocols, orows)
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if sorted(ocols) != cols:
            print(f"FAIL {name}: cols spark={cols} oracle={sorted(ocols)}")
            failures.append(name)
        elif (n_s, h_s) != (n_o, h_o):
            print(f"FAIL {name}: rows {n_s} vs {n_o}, hash {h_s[:8]} vs {h_o[:8]}")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={n_s} hash={h_s[:8]}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
