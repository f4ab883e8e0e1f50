"""Unicode text normalization — the canonicalization stage a training
pipeline runs between extraction and dedup (inconsistent composed /
decomposed forms, stray control bytes, and ragged whitespace make
near-identical documents hash apart and pollute token statistics).

Three deterministic steps, in this exact order (the DuckDB oracle
mirrors it operator for operator):

1. Unicode NFC normalization (canonical composition — 'e' + U+0301
   becomes 'é'; NFC, not NFKC: compatibility forms like ligatures are
   meaningful content and stay).
2. C0/C1 control stripping (except the ASCII whitespace controls
   handled by step 3): [\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]
   removed.
3. ASCII whitespace collapse + trim: runs of [ \\t\\n\\r\\f\\x0B]
   become one space, leading/trailing spaces drop. Deliberately ASCII
   (both engines' \\s differ on Unicode spaces; U+00A0 etc. are
   CONTENT here — fold them earlier in the pipeline if unwanted).

Runs in one mapInPandas pass (Arrow-batched transfer; no shuffle — one
output row per input row), mapping the single scalar implementation
over each batch.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame

_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_WS_RE = re.compile("[ \t\n\r\f\x0b]+")


def normalize_string(s: str) -> str:
    """The three-step normalization — the SINGLE implementation; the
    Spark path maps it over each Arrow batch (string ops in pandas are
    per-element Python either way, so a .str chain would only
    duplicate the logic, not vectorize it)."""
    import unicodedata

    s = unicodedata.normalize("NFC", s)
    s = _CTRL_RE.sub("", s)
    return _WS_RE.sub(" ", s).strip(" ")


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, <text_col>, ...) -> (doc_id, norm_text, changed).

    ``changed`` flags rows the normalization altered — the cheap
    monitor counter for how dirty an incoming crawl slice is."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            src = b[text_col].fillna("")
            norm = src.map(normalize_string)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "norm_text": norm,
                    "changed": (norm != src),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "doc_id long, norm_text string, changed boolean"
    )
