"""Parse entry points + hickory/hiccup representations.

Mirrors /root/reference/src/clj/hickory/core.clj:
- ``parse``          (core.clj:150-154): full document parse
- ``parse_fragment`` (core.clj:158-163): fragment in <body> context
- ``as_hickory``     (core.clj:107-145): here the identity — our
  tree builder emits hickory-form data directly (no vendor DOM)
- ``as_hiccup``      (core.clj:48-105): hickory tree -> hiccup vectors;
  text nodes re-HTML-escaped, script/style contents kept raw
  (escaping rationale in the reference comment at core.clj:81-92)
"""

from __future__ import annotations

from hickoryspark.html.charset import decode_html
from hickoryspark.html.render import UNESCAPABLE_CONTENT, html_escape, render_doctype
from hickoryspark.html.treebuilder import build_document, build_fragment


def parse(html: str | bytes) -> dict:
    """Parse an entire HTML document into a hickory document tree.

    Byte input goes through charset sniffing (BOM > meta prescan >
    UTF-8 > windows-1252 — html/charset.py), matching what the
    reference inherits from Jsoup's stream parsing (core.clj:150-154).
    """
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    return build_document(html)


def parse_fragment(html: str | bytes) -> list:
    """Parse an HTML fragment (body context) into a list of root nodes."""
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    return build_fragment(html)


def as_hickory(parsed):
    """Identity: ``parse``/``parse_fragment`` already emit hickory form."""
    return parsed


def as_hiccup(parsed):
    """Convert a parsed tree (or single node) to hiccup form.

    Document -> list of child forms (core.clj:67-69); element ->
    [tag, attrs, children...]; comment -> "<!--...-->"; doctype ->
    rendered doctype string; text -> HTML-escaped string. Iterative
    (trampoline-equivalent, core.clj:12-16)."""
    if isinstance(parsed, str):
        return html_escape(parsed)
    if isinstance(parsed, list):
        # a parse_fragment result: one hiccup form per root, mirroring
        # the reference usage (map as-hiccup (parse-fragment ...))
        return [as_hiccup(node) for node in parsed]
    if isinstance(parsed, dict) and parsed.get("type") == "document":
        out: list = []
        _fill_children(out, parsed.get("content") or [])
        return out
    holder: list = []
    _fill_children(holder, [parsed])
    return holder[0]


def _fill_children(out: list, children) -> None:
    """Iteratively convert hickory children into hiccup forms appended to
    ``out``. Uses an explicit work stack; each dict element allocates its
    hiccup vector up front and its children are filled in afterwards."""
    stack: list[tuple[list, list]] = [(out, list(reversed(children)))]
    while stack:
        target, todo = stack[-1]
        if not todo:
            stack.pop()
            continue
        node = todo.pop()
        if isinstance(node, str):
            target.append(html_escape(node))
            continue
        ntype = node.get("type")
        if ntype == "comment":
            target.append("<!--" + "".join(node.get("content") or []) + "-->")
        elif ntype == "document-type":
            attrs = node.get("attrs") or {}
            target.append(
                render_doctype(
                    attrs.get("name"), attrs.get("publicid"), attrs.get("systemid")
                )
            )
        elif ntype == "element":
            tag = node.get("tag")
            form: list = [tag, dict(node.get("attrs") or {})]
            target.append(form)
            content = node.get("content") or []
            if tag in UNESCAPABLE_CONTENT:
                # Raw, never-escaped children (core.clj:93-94).
                for child in content:
                    form.append(child if isinstance(child, str) else str(child))
            elif content:
                stack.append((form, list(reversed(content))))
        else:
            target.append(str(node))
