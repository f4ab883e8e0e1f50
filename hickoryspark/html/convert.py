"""Converters between hickory and hiccup representations.

Port of /root/reference/src/cljc/hickory/convert.cljc. Note
hiccup->hickory is defined BY the parser (render then full reparse,
convert.cljc:13-15) — our parser therefore defines it here too.
"""

from __future__ import annotations

from hickoryspark.html.core import as_hickory, parse, parse_fragment
from hickoryspark.html.render import (
    UNESCAPABLE_CONTENT,
    hiccup_to_html,
    html_escape,
    render_doctype,
)


def hiccup_to_hickory(hiccup_forms):
    """convert.cljc:7-16 — full-document render + reparse."""
    return as_hickory(parse(hiccup_to_html(hiccup_forms)))


def hiccup_fragment_to_hickory(hiccup_forms):
    """convert.cljc:18-26 — fragment render + reparse."""
    return [as_hickory(f) for f in parse_fragment(hiccup_to_html(hiccup_forms))]


class UnescapableContentError(ValueError):
    def __init__(self, message: str, error_location=None) -> None:
        super().__init__(message)
        self.error_location = error_location


def hickory_to_hiccup(dom):
    """convert.cljc:28-54 — direct conversion, no reparse. Iterative."""
    out_holder: list = []
    stack: list[tuple[list, list]] = [(out_holder, [dom])]
    while stack:
        target, todo = stack[-1]
        if not todo:
            stack.pop()
            continue
        node = todo.pop()
        if isinstance(node, str):
            target.append(html_escape(node))
            continue
        if not isinstance(node, dict):
            raise ValueError("Not a valid node: " + repr(node))
        ntype = node.get("type")
        if ntype == "document":
            result: list = []
            target.append(result)
            stack.append((result, list(reversed(node.get("content") or []))))
        elif ntype == "document-type":
            attrs = node.get("attrs") or {}
            target.append(
                render_doctype(
                    attrs.get("name"), attrs.get("publicid"), attrs.get("systemid")
                )
            )
        elif ntype == "element":
            tag = node.get("tag")
            content = node.get("content") or []
            if tag in UNESCAPABLE_CONTENT:
                if not all(isinstance(c, str) for c in content):
                    raise UnescapableContentError(
                        "An unescapable content tag had non-string children.",
                        error_location=node,
                    )
                target.append([tag, dict(node.get("attrs") or {}), *content])
            else:
                form: list = [tag, dict(node.get("attrs") or {})]
                target.append(form)
                stack.append((form, list(reversed(content))))
        elif ntype == "comment":
            target.append("<!--" + "".join(c if isinstance(c, str) else str(c) for c in node.get("content") or []) + "-->")
        else:
            raise ValueError(f"Not a valid node: {node!r}")
    return out_holder[0]
