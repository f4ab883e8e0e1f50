"""Spark-side layers of hickoryspark.

- ``session``   : SparkSession builder tuned for the extraction workload.
- ``pages``     : deterministic synthetic Common-Crawl-style ``pages``
  table (url, warc_ts, html, text, lang) generated with pure Spark
  built-ins from the driver's ``documents`` table, plus the matching
  DuckDB SQL so every query has an independent oracle.
- ``nodes_table``: mapInPandas parse → flat node table (the §1.4(2) IR
  of SURVEY.md) — one row per hickory node with pre-order intervals.
- ``selectors_rel``: hickory.select's combinator algebra re-expressed
  as relational operators (filters / windows / joins) over the node
  table (reference: /root/reference/src/cljc/hickory/select.cljc).
- ``extract``   : main-content extraction (boilerplate strip) over
  parsed documents, Arrow-batched.
- ``pipeline``  : the scale job — skew-aware repartition, checkpoint
  resume, per-partition lineage + counters.
"""
