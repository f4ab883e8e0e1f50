"""Per-gate timing sweep — instrumentation, NOT the frozen bench.

Times EVERY ``__spark_entry__.queries()`` entry at the given sf dir:
build the DataFrame (some builders run eager work — streams, iterative
graph rounds) plus a noop-sink write (guide §1.4: every column of
every row computed, no sink cost, no driver collection cost), one
wall-clock number per gate. Output: per-query seconds sorted slowest
first, plus a total. Numbers are cited in OPTIMIZATION_r06.md only;
bench.py stays the frozen driver protocol.

The point is coverage, not precision: on this host a single reading
carries 2-5x phase noise, so use the sweep to RANK queries and spot
structural outliers (a gate 10x its family's band), then re-measure
any suspect in isolation before believing it.

Usage: python tools/bench_gates.py [sf_dir] [query ...]
Env:   SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from hickoryspark.spark.session import get_spark

    spark = get_spark(cpus, app_name="hickoryspark-bench-gates")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm JVM + python worker pool so the first gate doesn't absorb
    # session startup (mirrors bench.py's warmup discipline)
    from pyspark.sql import functions as F

    from hickoryspark.spark.extract import extract_pages
    from hickoryspark.spark.pages import load_pages

    pages = load_pages(spark, sf_dir)
    pages.count()
    extract_pages(
        pages.select("url", "html").limit(cpus * 32).repartition(cpus)
    ).agg(F.count("*")).collect()

    qs = E.queries()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sc.setJobDescription(f"gate: {name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep sweeping; report at the end
            # an errored gate is NOT a measurement: keep it out of
            # timings/total so the ranking and the JSON only carry
            # real readings
            errors[name] = f"{type(e).__name__}: {e}"
            print(f"   ERROR   {name}: {errors[name]}", flush=True)
        else:
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            print(f"{dt:8.3f}s  {name}", flush=True)
        finally:
            # several ops persist internal frames (LSH groups, graph
            # iteration state); don't let storage pressure accumulate
            # across 300+ queries
            spark.catalog.clearCache()

    print("\n=== slowest first ===")
    for name, dt in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}s  {name}")
    total = round(sum(timings.values()), 1)
    print(f"\ntotal {total}s over {len(timings)} gates, {len(errors)} errors")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    if only:
        # a subset re-measurement must never clobber the committed
        # full-sweep artifact (the file OPTIMIZATION_r06.md cites)
        print("(subset run — artifact not written)")
    else:
        out = {"sf_dir": sf_dir, "cpus": cpus, "total_sec": total,
               "gates": timings, "errors": errors}
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "BENCH",
            f"gates_{os.path.basename(sf_dir.rstrip('/'))}.json")
        with open(os.path.abspath(path), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {os.path.abspath(path)}")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
