"""Compression-ratio quality signal (zlib/DEFLATE).

Web-scale corpus filters use the deflate compression ratio as a cheap
template/boilerplate/spam detector: machine-generated and highly
repetitive documents compress far better than natural prose (the
signal behind Gopher-style "excessive duplication" rules and many
CommonCrawl cleaning recipes). This operator computes the exact
compressed size per document.

Pinned semantics:

- ``n_bytes`` = UTF-8 byte length of the text;
- ``n_compressed`` = ``len(zlib.compress(utf8, level))`` with the
  level PINNED (default 6 — zlib's own default) so the number is a
  deterministic function of the bytes for a given zlib build;
- ``ratio_milli`` = ``1000 * n_compressed // n_bytes`` (BIGINT), NULL
  when ``n_bytes`` = 0 (the empty document has no ratio);
- rows whose text is NULL are SKIPPED (the NULL-payload convention of
  the mapInPandas parsers).

Scale shape: one mapInPandas pass, no shuffle; compression is
Arrow-batched C-speed zlib, the same cost class as the sanctioned
parse path. Callers repartition first when the input is one file =
one partition (the bench._pages lesson).
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (schema helpers)

__all__ = ["compression_signal", "DEFAULT_LEVEL"]

DEFAULT_LEVEL = 6

_SCHEMA = ("doc_id long, n_bytes long, n_compressed long, "
           "ratio_milli long")


def compression_signal(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       level: int = DEFAULT_LEVEL) -> DataFrame:
    """``(doc_id, n_bytes, n_compressed, ratio_milli)`` per non-NULL
    text row."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, nb, nc, rm = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                raw = text.encode("utf-8")
                comp = len(zlib.compress(raw, level))
                ids.append(doc_id)
                nb.append(len(raw))
                nc.append(comp)
                rm.append(1000 * comp // len(raw) if raw else None)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(nb, dtype="int64"),
                "n_compressed": pd.Series(nc, dtype="int64"),
                "ratio_milli": pd.Series(rm, dtype="Int64"),
            })

    return docs.select(id_col, text_col).mapInPandas(gen, _SCHEMA)
