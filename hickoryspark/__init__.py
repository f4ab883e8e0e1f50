"""hickoryspark — a PySpark-native HTML-as-data extraction engine.

Re-implements the semantics of clj-commons/hickory (HTML5 parse ->
hickory node maps -> selector combinator algebra -> render) as a
from-scratch, Spark-first pipeline over tables of web pages:

- ``hickoryspark.html``   : pure-Python HTML5 tokenizer/tree-builder,
  hickory/hiccup data forms, renderer (reference: /root/reference/src).
- ``hickoryspark.nodes``  : flat structure-of-arrays node table with
  pre-order interval labeling (the engine's IR).
- ``hickoryspark.select`` : the selector combinator algebra
  (reference: src/cljc/hickory/select.cljc).
- ``hickoryspark.css``    : CSS selector strings compiled to that
  algebra, for both the interpreter and the relational engine.
- ``hickoryspark.spark``  : Arrow-batched Spark pipeline (mapInArrow),
  node-table relational layer, skew-aware partitioning, lineage.
- ``hickoryspark.ops``    : large-scale training-data ops (dedup,
  similarity search, text analysis, sampling, URL canon, multimodal,
  PDF text) over document/embedding/media tables.
"""

from hickoryspark.css import CssError, css, css_rel
from hickoryspark.html.charset import decode_html, sniff_charset
from hickoryspark.html.core import parse, parse_fragment, as_hickory, as_hiccup
from hickoryspark.html.render import (
    HickoryRenderError,
    hiccup_to_html,
    hickory_to_html,
    html_escape,
    render_doctype,
)

__all__ = [
    "CssError",
    "css",
    "css_rel",
    "decode_html",
    "sniff_charset",
    "parse",
    "parse_fragment",
    "as_hickory",
    "as_hiccup",
    "hickory_to_html",
    "hiccup_to_html",
    "html_escape",
    "render_doctype",
    "HickoryRenderError",
]
__version__ = "0.1.0"
