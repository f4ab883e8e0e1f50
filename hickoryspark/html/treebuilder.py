"""From-scratch HTML5 tree builder: token stream -> hickory node tree.

Implements the WHATWG insertion modes the web corpus exercises
(initial / before html / before head / in head / after head / in body /
after body / after html), implied <html><head><body>, p-in-body
auto-close, li/dd/dt/heading/a/td/tr auto-close, void elements, and
fragment parsing in body context.

The output is hickory-form data (maps-as-dicts + strings), exactly the
shape of the reference's `as-hickory`
(/root/reference/src/clj/hickory/core.clj:107-145):
  {"type": "document"|"document-type"|"element"|"comment",
   "tag": str (elements only),
   "attrs": dict|None (None when empty, core.clj:115,139),
   "content": list|None (None when empty, core.clj:129,141)}
Text nodes are bare Python strings (core.clj:33).

Everything is iterative (explicit stacks) — the reference needed
trampolines for the same reason (core.clj:12-16); 2048-deep nesting
must parse (test/cljc/hickory/test/core.cljc:129-148).
"""

from __future__ import annotations

from hickoryspark.html.tokenizer import tokenize

_WS_CHARS = set(" \t\n\f\r")

# hickory's void set, /root/reference/src/cljc/hickory/utils.cljc:10-13
VOID_ELEMENTS = frozenset(
    "area base br col command embed hr img input keygen link meta param "
    "source track wbr".split()
)

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Start tags that close an open <p> in button scope (WHATWG "in body").
_P_CLOSERS = frozenset(
    "address article aside blockquote center details dialog dir div dl "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup "
    "hr li listing main menu nav ol p plaintext pre section summary table "
    "ul xmp dd dt".split()
)

# Boundary elements for the (simplified) "button scope" of <p>.
_P_SCOPE_BOUNDARY = frozenset(
    "html table td th caption applet object marquee template button".split()
)

# WHATWG "special" category (subset used by li/dd/dt auto-close).
_SPECIAL = frozenset(
    "address applet area article aside base basefont bgsound blockquote body "
    "br button caption center col colgroup dd details dir div dl dt embed "
    "fieldset figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6 "
    "head header hgroup hr html iframe img input li link listing main "
    "marquee menu meta nav noembed noframes noscript object ol p param "
    "plaintext pre script section select source style summary table tbody td "
    "template textarea tfoot th thead title tr track ul wbr xmp".split()
)

_IN_HEAD_VOID = frozenset({"base", "basefont", "bgsound", "command", "link", "meta"})
_IN_HEAD_CONTAINERS = frozenset(
    {"title", "style", "script", "noscript", "noframes", "template"}
)

(
    _INITIAL,
    _BEFORE_HTML,
    _BEFORE_HEAD,
    _IN_HEAD,
    _AFTER_HEAD,
    _IN_BODY,
    _AFTER_BODY,
    _AFTER_HTML,
) = range(8)


def _elem(tag: str, attrs: dict | None) -> dict:
    return {
        "type": "element",
        "attrs": attrs if attrs else None,
        "tag": tag,
        "content": [],
    }


def _is_ws(text: str) -> bool:
    for ch in text:
        if ch not in _WS_CHARS:
            return False
    return True


class _Builder:
    def __init__(self) -> None:
        self.document = {"type": "document", "content": []}
        self.stack: list[dict] = []  # open elements
        self.html: dict | None = None
        self.head: dict | None = None
        self.body: dict | None = None
        self.mode = _INITIAL

    # -- insertion helpers ------------------------------------------------

    def _append(self, parent: dict, node) -> None:
        content = parent["content"]
        if isinstance(node, str) and content and isinstance(content[-1], str):
            content[-1] = content[-1] + node
        else:
            content.append(node)

    def _insert_text(self, text: str) -> None:
        self._append(self.stack[-1], text)

    def _insert_element(self, tag: str, attrs: dict | None, push: bool) -> dict:
        node = _elem(tag, attrs)
        self._append(self.stack[-1], node)
        if push:
            self.stack.append(node)
        return node

    def _merge_attrs(self, node: dict, attrs: dict | None) -> None:
        if not attrs:
            return
        existing = node["attrs"] or {}
        for k, v in attrs.items():
            if k not in existing:
                existing[k] = v
        node["attrs"] = existing or None

    def _pop_through(self, tag: str) -> None:
        """Pop open elements up to and including the nearest ``tag``."""
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i]["tag"] == tag:
                del self.stack[i:]
                return

    def _find_open(self, tags, boundary) -> int:
        """Index in stack of nearest open element with tag in ``tags``,
        scanning from the top, stopping at ``boundary`` tags. -1 if none."""
        for i in range(len(self.stack) - 1, -1, -1):
            t = self.stack[i]["tag"]
            if t in tags:
                return i
            if t in boundary:
                return -1
        return -1

    def _p_in_button_scope(self) -> bool:
        return self._find_open(("p",), _P_SCOPE_BOUNDARY) != -1

    def _close_p(self) -> None:
        i = self._find_open(("p",), _P_SCOPE_BOUNDARY)
        if i != -1:
            del self.stack[i:]

    # -- skeleton creation -------------------------------------------------

    def _ensure_html(self, attrs: dict | None = None) -> None:
        if self.html is None:
            self.html = _elem("html", attrs)
            self.document["content"].append(self.html)
            self.stack.append(self.html)

    def _ensure_head(self, attrs: dict | None = None) -> None:
        self._ensure_html()
        if self.head is None:
            self.head = _elem("head", attrs)
            self._append(self.html, self.head)
            self.stack.append(self.head)

    def _pop_head(self) -> None:
        if self.stack and self.stack[-1] is self.head:
            self.stack.pop()

    def _ensure_body(self, attrs: dict | None = None) -> None:
        if self.body is None:
            self.body = _elem("body", attrs)
            self._append(self.html, self.body)
            self.stack.append(self.body)

    # -- main dispatch -----------------------------------------------------

    def feed(self, tokens) -> None:
        for tok in tokens:
            self._process(tok)

    def _process(self, tok) -> None:
        while True:
            mode = self.mode
            if mode == _IN_BODY:
                handled = self._in_body(tok)
            elif mode == _INITIAL:
                handled = self._initial(tok)
            elif mode == _BEFORE_HTML:
                handled = self._before_html(tok)
            elif mode == _BEFORE_HEAD:
                handled = self._before_head(tok)
            elif mode == _IN_HEAD:
                handled = self._in_head(tok)
            elif mode == _AFTER_HEAD:
                handled = self._after_head(tok)
            elif mode == _AFTER_BODY:
                handled = self._after_body(tok)
            else:
                handled = self._after_html(tok)
            if handled:
                return
            # not handled: mode switched; reprocess the same token

    # Each mode handler returns True when the token is consumed.

    def _initial(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext"):
            if _is_ws(tok[1]):
                return True
            self.mode = _BEFORE_HTML
            return False
        if kind == "comment":
            self.document["content"].append({"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            self.document["content"].append(
                {
                    "type": "document-type",
                    "attrs": {"name": tok[1], "publicid": tok[2], "systemid": tok[3]},
                }
            )
            self.mode = _BEFORE_HTML
            return True
        self.mode = _BEFORE_HTML
        return False

    def _before_html(self, tok) -> bool:
        kind = tok[0]
        if kind == "doctype":
            return True
        if kind == "comment":
            self.document["content"].append({"type": "comment", "content": [tok[1]]})
            return True
        if kind in ("text", "rawtext") and _is_ws(tok[1]):
            return True
        if kind == "start" and tok[1] == "html":
            self._ensure_html(tok[2] or None)
            self.mode = _BEFORE_HEAD
            return True
        if kind == "end" and tok[1] not in ("head", "body", "html", "br"):
            return True
        self._ensure_html()
        self.mode = _BEFORE_HEAD
        return False

    def _before_head(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext") and _is_ws(tok[1]):
            return True
        if kind == "comment":
            self._append(self.stack[-1], {"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind == "start":
            if tok[1] == "html":
                self._merge_attrs(self.html, tok[2])
                return True
            if tok[1] == "head":
                self._ensure_head(tok[2] or None)
                self.mode = _IN_HEAD
                return True
        if kind == "end" and tok[1] not in ("head", "body", "html", "br"):
            return True
        self._ensure_head()
        self.mode = _IN_HEAD
        return False

    def _in_head(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext"):
            if _is_ws(tok[1]):
                self._insert_text(tok[1])
                return True
            if self.stack[-1] is not self.head:
                # inside <title>/<script>/... within head
                self._insert_text(tok[1])
                return True
            self._pop_head()
            self.mode = _AFTER_HEAD
            return False
        if kind == "comment":
            self._append(self.stack[-1], {"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind == "start":
            tag = tok[1]
            if tag == "html":
                self._merge_attrs(self.html, tok[2])
                return True
            if tag in _IN_HEAD_VOID:
                self._insert_element(tag, tok[2] or None, push=False)
                return True
            if tag in _IN_HEAD_CONTAINERS:
                self._insert_element(tag, tok[2] or None, push=not tok[3])
                return True
            if tag == "head":
                return True
            self._pop_head()
            self.mode = _AFTER_HEAD
            return False
        if kind == "end":
            tag = tok[1]
            if self.stack[-1] is not self.head and tag == self.stack[-1]["tag"]:
                node = self.stack.pop()
                if not node["content"]:
                    node["content"] = None
                return True
            if tag == "head":
                self._pop_head()
                self.mode = _AFTER_HEAD
                return True
            if tag in ("body", "html", "br"):
                self._pop_head()
                self.mode = _AFTER_HEAD
                return False
            return True  # ignore other end tags
        return True

    def _after_head(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext") and _is_ws(tok[1]):
            self._insert_text(tok[1])
            return True
        if kind == "comment":
            self._append(self.stack[-1], {"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind == "start":
            tag = tok[1]
            if tag == "html":
                self._merge_attrs(self.html, tok[2])
                return True
            if tag == "body":
                self._ensure_body(tok[2] or None)
                self.mode = _IN_BODY
                return True
            if tag in _IN_HEAD_VOID and self.head is not None:
                node = _elem(tag, tok[2] or None)
                self._append(self.head, node)
                return True
            if tag in _IN_HEAD_CONTAINERS and self.head is not None:
                node = _elem(tag, tok[2] or None)
                self._append(self.head, node)
                if not tok[3]:
                    self.stack.append(node)
                return True
        if kind == "end" and self.stack and self.stack[-1]["tag"] == tok[1] \
                and self.stack[-1] is not self.html:
            node = self.stack.pop()
            if not node["content"]:
                node["content"] = None
            return True
        if kind == "end" and tok[1] not in ("body", "html", "br"):
            return True
        self._ensure_body()
        self.mode = _IN_BODY
        return False

    def _in_body(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext"):
            self._insert_text(tok[1])
            return True
        if kind == "comment":
            self._append(self.stack[-1], {"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind == "start":
            return self._in_body_start(tok)
        if kind == "end":
            return self._in_body_end(tok)
        return True

    def _in_body_start(self, tok) -> bool:
        _, tag, attrs, self_closing = tok
        attrs = attrs or None
        if tag == "html":
            self._merge_attrs(self.html, tok[2])
            return True
        if tag == "body":
            self._merge_attrs(self.body, tok[2])
            return True
        if tag in ("head", "frameset"):
            return True  # ignored in body
        if tag in _P_CLOSERS and self._p_in_button_scope():
            self._close_p()
        if tag in ("li", "dd", "dt"):
            closers = ("li",) if tag == "li" else ("dd", "dt")
            for i in range(len(self.stack) - 1, -1, -1):
                t = self.stack[i]["tag"]
                if t in closers:
                    del self.stack[i:]
                    break
                if t in _SPECIAL and t not in ("address", "div", "p"):
                    break
        elif tag in _HEADINGS:
            if self.stack[-1]["tag"] in _HEADINGS:
                self.stack.pop()
        elif tag == "a":
            i = self._find_open(("a",), ("html", "body"))
            if i != -1:
                del self.stack[i:]
        elif tag == "button":
            i = self._find_open(("button",), ("html", "body"))
            if i != -1:
                del self.stack[i:]
        elif tag in ("td", "th"):
            i = self._find_open(("td", "th"), ("table", "html"))
            if i != -1:
                del self.stack[i:]
        elif tag == "tr":
            i = self._find_open(("tr", "td", "th"), ("table", "html"))
            if i != -1:
                del self.stack[i:]
        elif tag in ("option", "optgroup"):
            if self.stack[-1]["tag"] == "option":
                self.stack.pop()
        if tag in VOID_ELEMENTS:
            self._insert_element(tag, attrs, push=False)
        else:
            self._insert_element(tag, attrs, push=not self_closing)
        return True

    def _in_body_end(self, tok) -> bool:
        tag = tok[1]
        if tag == "body":
            if self.body is not None:
                self.mode = _AFTER_BODY
            return True
        if tag == "html":
            self.mode = _AFTER_BODY
            return False
        if tag == "p" and not self._p_in_button_scope():
            # </p> with no open p inserts an empty p (WHATWG "in body").
            self._insert_element("p", None, push=False)
            return True
        if tag == "br":
            # </br> is treated as <br>.
            self._insert_element("br", None, push=False)
            return True
        if tag in VOID_ELEMENTS:
            return True  # end tags of void elements are ignored
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if node["tag"] == tag:
                del self.stack[i:]
                return True
            if node is self.body or node is self.html:
                break
        return True  # no matching open element: ignore

    def _after_body(self, tok) -> bool:
        kind = tok[0]
        if kind in ("text", "rawtext") and _is_ws(tok[1]):
            self._append(self.body, tok[1])
            return True
        if kind == "comment":
            self._append(self.html, {"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind == "end" and tok[1] == "html":
            self.mode = _AFTER_HTML
            return True
        self.mode = _IN_BODY
        return False

    def _after_html(self, tok) -> bool:
        kind = tok[0]
        if kind == "comment":
            self.document["content"].append({"type": "comment", "content": [tok[1]]})
            return True
        if kind == "doctype":
            return True
        if kind in ("text", "rawtext") and _is_ws(tok[1]):
            self._append(self.body, tok[1])
            return True
        self.mode = _IN_BODY
        return False

    # -- finalization --------------------------------------------------------

    def finish(self) -> dict:
        self._ensure_html()
        if self.head is None:
            self._ensure_head()
            self._pop_head()
        self._ensure_body()
        _normalize_empties(self.document)
        return self.document


def _normalize_empties(root: dict) -> None:
    """Iteratively convert empty content lists to None (core.clj:129,141)."""
    stack = [root]
    while stack:
        node = stack.pop()
        if not isinstance(node, dict):
            continue
        content = node.get("content")
        if isinstance(content, list):
            if not content:
                node["content"] = None
            else:
                stack.extend(c for c in content if isinstance(c, dict))


def build_document(html: str) -> dict:
    """Parse a full HTML document string into a hickory document tree."""
    b = _Builder()
    b.feed(tokenize(html))
    return b.finish()


def build_fragment(html: str) -> list:
    """Parse an HTML fragment in <body> context; returns the list of root
    nodes (hickory maps / strings), mirroring hickory's parse-fragment
    (/root/reference/src/clj/hickory/core.clj:158-163)."""
    b = _Builder()
    b._ensure_html()
    b._ensure_head()
    b._pop_head()
    b._ensure_body()
    b.mode = _IN_BODY
    b.feed(tokenize(html))
    body = b.body
    _normalize_empties(b.document)
    return list(body["content"]) if body["content"] else []
