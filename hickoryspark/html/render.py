"""Renderers: hickory/hiccup data -> HTML bytes.

Byte-identity contract with the reference renderer
(/root/reference/src/cljc/hickory/render.cljc:16-63):
- strings are HTML-escaped with exactly 4 entities
  (utils.cljc:23-46; single-quote NOT escaped)
- void elements emit no close tag (utils.cljc:10-13)
- script/style content emitted raw (utils.cljc:15-17)
- doctype via render-doctype (utils.cljc:58-67)
- attrs in map order as ` k="escaped-v"` (render.cljc:10-14)
- invalid node -> error "Not a valid node: ..." (render.cljc:58-63)

Everything iterative: multi-MB / 10^6-node pages must not hit Python
recursion limits.
"""

from __future__ import annotations

from hickoryspark.html.treebuilder import VOID_ELEMENTS

UNESCAPABLE_CONTENT = frozenset({"script", "style"})


class HickoryRenderError(ValueError):
    """Raised for nodes the renderer does not recognize."""

    def __init__(self, message: str, dom=None) -> None:
        super().__init__(message)
        self.dom = dom


def html_escape(s: str) -> str:
    """Escape exactly &, <, >, \" — the reference's 4-entity rule
    (utils.cljc:27-39). Single quotes are intentionally NOT escaped."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_doctype(name, publicid=None, systemid=None) -> str:
    """utils.cljc:58-67 — empty/nil public/system ids are omitted."""
    out = "<!DOCTYPE " + (name or "")
    if publicid:
        out += ' PUBLIC "' + publicid + '"'
    if systemid:
        out += ' "' + systemid + '"'
    return out + ">"


def _render_attrs(attrs) -> str:
    if not attrs:
        return ""
    return "".join(
        " " + str(k) + '="' + html_escape(str(v)) + '"' for k, v in attrs.items()
    )


_RAW = 0  # emit payload as-is
_NODE = 1  # render payload as a node


def hickory_to_html(dom) -> str:
    """Render a hickory node (map or string) to HTML (render.cljc:16-63)."""
    out: list[str] = []
    stack: list[tuple[int, object]] = [(_NODE, dom)]
    while stack:
        kind, item = stack.pop()
        if kind == _RAW:
            out.append(item)  # type: ignore[arg-type]
            continue
        node = item
        if isinstance(node, str):
            out.append(html_escape(node))
            continue
        if isinstance(node, dict):
            ntype = node.get("type")
            if ntype == "document":
                for child in reversed(node.get("content") or []):
                    stack.append((_NODE, child))
                continue
            if ntype == "document-type":
                attrs = node.get("attrs") or {}
                out.append(
                    render_doctype(
                        attrs.get("name"), attrs.get("publicid"), attrs.get("systemid")
                    )
                )
                continue
            if ntype == "element":
                tag = node.get("tag")
                attrs_str = _render_attrs(node.get("attrs"))
                if tag in VOID_ELEMENTS:
                    out.append("<" + tag + attrs_str + ">")
                elif tag in UNESCAPABLE_CONTENT:
                    out.append("<" + tag + attrs_str + ">")
                    for child in node.get("content") or []:
                        out.append(child if isinstance(child, str) else str(child))
                    out.append("</" + tag + ">")
                else:
                    out.append("<" + tag + attrs_str + ">")
                    stack.append((_RAW, "</" + tag + ">"))
                    for child in reversed(node.get("content") or []):
                        stack.append((_NODE, child))
                continue
            if ntype == "comment":
                # (apply str ...) in the reference stringifies any item
                out.append("<!--" + "".join(
                    c if isinstance(c, str) else str(c)
                    for c in node.get("content") or []
                ) + "-->")
                continue
        raise HickoryRenderError("Not a valid node: " + repr(node), dom=node)
    return "".join(out)


# -- Hiccup rendering (render.cljc:69-141) ----------------------------------


def _render_hiccup_attrs(attrs) -> str:
    """render.cljc:76-90: True-valued attr -> bare name, None -> dropped,
    rendered attr strings sorted."""
    parts = []
    for k, v in (attrs or {}).items():
        if v is True:
            parts.append(str(k))
        elif v is None:
            continue
        else:
            parts.append(str(k) + '="' + html_escape(str(v)) + '"')
    parts.sort()
    joined = " ".join(parts)
    return " " + joined if joined else ""


def hiccup_to_html(hiccup_forms) -> str:
    """Render a sequence of hiccup forms to HTML (render.cljc:116-141).

    Forms are normalized (hiccup_utils.normalize_form) first, like the
    reference."""
    from hickoryspark.html.hiccup_utils import normalize_form

    out: list[str] = []
    stack: list[tuple[int, object]] = [
        (_NODE, normalize_form(f)) for f in reversed(list(hiccup_forms))
    ]
    while stack:
        kind, item = stack.pop()
        if kind == _RAW:
            out.append(item)  # type: ignore[arg-type]
            continue
        form = item
        if not isinstance(form, (list, tuple)):
            out.append(str(form))  # pre-escaped string content
            continue
        tag = form[0]
        attrs = form[1] if len(form) > 1 else {}
        content = form[2:]
        out.append("<" + str(tag) + _render_hiccup_attrs(attrs) + ">")
        if tag not in VOID_ELEMENTS:
            stack.append((_RAW, "</" + str(tag) + ">"))
            for child in reversed(content):
                stack.append((_NODE, child))
    return "".join(out)
