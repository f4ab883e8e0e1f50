"""Large-scale training-data pipeline operations.

Beyond hickory's own operator inventory, a 100 TB web-text pipeline
needs dedup / similarity / text-analysis primitives. Everything here
is expressed with JVM-side built-in functions (no Python UDFs): one
shuffle per groupBy/join, map-side partial aggregation, broadcast for
small sides. Hash functions are md5 (identical hex in Spark and
DuckDB) so every operator has an exact cross-engine oracle.
"""
