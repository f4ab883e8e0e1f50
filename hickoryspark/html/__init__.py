"""Pure-Python HTML5 parsing + hickory/hiccup data forms + rendering."""

from hickoryspark.html.core import as_hiccup, as_hickory, parse, parse_fragment
from hickoryspark.html.render import (
    HickoryRenderError,
    hiccup_to_html,
    hickory_to_html,
    html_escape,
    render_doctype,
)

__all__ = [
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
