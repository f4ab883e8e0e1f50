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

from hickoryspark.html.tokenizer import _FC_BREAKOUT, tokenize

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

# WHATWG formatting elements (active-formatting-elements machinery).
_FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
# Elements that push a marker onto the active formatting list.
_AFE_MARKERS = frozenset(
    {"td", "th", "caption", "applet", "object", "marquee", "template"}
)
# Insertion points that trigger foster parenting for non-table content.
_TABLE_CTX = frozenset({"table", "tbody", "thead", "tfoot", "tr"})
# Start tags handled by the table-structure rules (implied tbody/tr,
# orphan-ignore outside a table).
_TABLE_INTERNAL = frozenset(
    {"td", "th", "tr", "tbody", "thead", "tfoot", "caption", "col", "colgroup"}
)
# Tags allowed directly inside table context without fostering.
_TABLE_ALLOWED = frozenset({"script", "style", "template", "form"})

# WHATWG 13.2.6.5 foreign-content breakout list: these start tags pop
# the open SVG/MathML subtree and reprocess as HTML. (<font> joins
# only when it carries a color/face/size attribute.) Canonical copy
# lives in tokenizer.py, whose RCDATA suppression mirrors this rule.
_BREAKOUT = _FC_BREAKOUT
# MathML text integration points: children parse as HTML (except
# mglyph/malignmark start tags).
_MATHML_TEXT_IP = frozenset({"mi", "mo", "mn", "ms", "mtext"})
# SVG HTML integration points: children parse fully as HTML.
_SVG_HTML_IP = frozenset({"foreignobject", "desc", "title"})
_ANNOTATION_XML_HTML = frozenset({"text/html", "application/xhtml+xml"})
# "Has a <table> in table scope" barriers (WHATWG 13.2.4.2): a cell or
# caption (or the classic scope barriers) between here and the nearest
# open table means that table is NOT in scope.
_TABLE_SCOPE_BOUNDARY = (
    "html", "td", "th", "caption", "applet", "object", "marquee", "template",
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
        # WHATWG form element pointer: nested <form> start tags ignored
        self.form: dict | None = None
        # Active formatting elements: node dicts + "marker" sentinels
        # (WHATWG 13.2.4.3) — drives misnested-formatting reconstruction.
        self.afe: list = []
        # id(child dict) -> parent dict, for foster parenting (nodes have
        # no parent pointers; the hickory shape must stay 4 keys).
        self.parents: dict[int, dict] = {}
        # id(node) -> "svg" | "math" for foreign-namespace elements.
        # Namespace is builder-internal only: hickory output keeps the
        # 4-key shape, and the reference lowercases BOTH tag and attr
        # names in as-hickory (core.clj:111,140 via lower-case-keyword),
        # so the WHATWG camelCase/xlink adjustments Jsoup performs are
        # invisible in hickory form — what IS visible, and implemented
        # here, is the TREE SHAPE: breakout, integration points, and
        # foreign self-closing.
        self.ns: dict[int, str] = {}

    # -- insertion helpers ------------------------------------------------

    def _append(self, parent: dict, node) -> None:
        content = parent["content"]
        if isinstance(node, str) and content and isinstance(content[-1], str):
            content[-1] = content[-1] + node
        else:
            content.append(node)
            if isinstance(node, dict):
                self.parents[id(node)] = parent

    def _insert_text(self, text: str) -> None:
        cur = self.stack[-1]
        if cur.get("tag") in _TABLE_CTX and not _is_ws(text):
            self._foster_insert(text)
            return
        self._append(cur, text)

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
        scanning from the top, stopping at ``boundary`` tags. -1 if
        none. Foreign integration points (WHATWG default scope list:
        SVG foreignObject/desc/title, MathML text IPs and
        annotation-xml) are universal barriers — an open <p> outside
        ``<svg><desc>`` must not be closable from inside it."""
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            t = node["tag"]
            ns = self.ns.get(id(node))
            if ns is None:
                if t in tags:
                    return i
                if t in boundary:
                    return -1
            elif (ns == "svg" and t in _SVG_HTML_IP) or (
                ns == "math"
                and (t in _MATHML_TEXT_IP or t == "annotation-xml")
            ):
                return -1
        return -1

    def _p_in_button_scope(self) -> bool:
        return self._find_open(("p",), _P_SCOPE_BOUNDARY) != -1

    def _honor_self_closing(self, self_closing: bool, tag: str = "") -> bool:
        """WHATWG ignores the self-closing flag on non-void HTML
        elements ('<div/>' stays open); it is honored on the foreign
        roots themselves ('<svg/>' inserts-and-pops per 'in body').
        Elements INSIDE foreign content go through _foreign_token,
        which always honors the flag."""
        return self_closing and tag in ("svg", "math")

    # -- foreign content (WHATWG 13.2.6.5) ---------------------------------

    def _is_html_ip(self, node: dict) -> bool:
        """HTML integration point: children parse fully as HTML."""
        ns = self.ns.get(id(node))
        if ns == "svg":
            return node["tag"] in _SVG_HTML_IP
        if ns == "math" and node["tag"] == "annotation-xml":
            enc = (node["attrs"] or {}).get("encoding", "")
            return enc.lower() in _ANNOTATION_XML_HTML
        return False

    def _foreign_rules_apply(self, tok) -> bool:
        """The tree-construction dispatcher (WHATWG 13.2.6): foreign
        rules apply unless the adjusted current node is an HTML
        element or an integration point receiving a start/text token."""
        if not self.ns or not self.stack:
            return False  # fast path: page has no foreign elements
        cur = self.stack[-1]
        ns = self.ns.get(id(cur))
        if ns is None:
            return False
        kind = tok[0]
        if ns == "math" and cur["tag"] in _MATHML_TEXT_IP:
            if kind == "start" and tok[1] not in ("mglyph", "malignmark"):
                return False
            if kind in ("text", "rawtext"):
                return False
        if (
            ns == "math"
            and cur["tag"] == "annotation-xml"
            and kind == "start"
            and tok[1] == "svg"
        ):
            return False
        if self._is_html_ip(cur) and kind in ("start", "text", "rawtext"):
            return False
        return True

    def _foreign_token(self, tok) -> bool:
        kind = tok[0]
        if kind == "text":
            self._append(self.stack[-1], tok[1])
            return True
        if kind == "rawtext":
            # The tokenizer's RAWTEXT switch (script/style/...) does
            # not exist in foreign content — an svg <script>'s children
            # are markup, not script data. Re-tokenize the swallowed
            # span and process the tokens (the matching end tag was
            # already emitted separately, so nesting stays balanced).
            from hickoryspark.html.tokenizer import tokenize

            for t in tokenize(tok[1]):
                self._process(t)
            return True
        if kind == "comment":
            data = tok[1]
            if data.startswith("[CDATA["):
                # CDATA sections are TEXT in foreign content (the
                # tokenizer's bogus-comment path is the HTML-content
                # behavior); recover the span. Content containing a
                # bare '>' tokenized short — acceptable approximation
                # without tokenizer/tree feedback.
                text = data[7:]
                if text.endswith("]]"):
                    text = text[:-2]
                if text:
                    self._append(self.stack[-1], text)
                return True
            self._append(
                self.stack[-1], {"type": "comment", "content": [data]}
            )
            return True
        if kind == "doctype":
            return True
        if kind == "start":
            _, tag, attrs, self_closing = tok
            attrs = attrs or None
            if tag in _BREAKOUT or (
                tag == "font"
                and attrs
                and ({"color", "face", "size"} & set(attrs))
            ):
                # pop until an integration point or HTML element, then
                # reprocess the token by the HTML rules
                while self.stack:
                    cur = self.stack[-1]
                    cns = self.ns.get(id(cur))
                    if (
                        cns is None
                        or self._is_html_ip(cur)
                        or (cns == "math" and cur["tag"] in _MATHML_TEXT_IP)
                    ):
                        break
                    self.stack.pop()
                return False  # same mode; dispatcher now picks HTML rules
            node = _elem(tag, attrs)
            self._append(self.stack[-1], node)
            self.ns[id(node)] = self.ns[id(self.stack[-1])]
            if not self_closing:
                self.stack.append(node)
            return True
        if kind == "end":
            tag = tok[1]
            for i in range(len(self.stack) - 1, -1, -1):
                node = self.stack[i]
                if self.ns.get(id(node)) is None:
                    # reached an HTML element: HTML rules take the token
                    return self._in_body_end(tok)
                if node["tag"] == tag:
                    del self.stack[i:]
                    return True
            return True
        return True

    def _close_p(self) -> None:
        i = self._find_open(("p",), _P_SCOPE_BOUNDARY)
        if i != -1:
            del self.stack[i:]

    # -- active formatting elements (WHATWG 13.2.4.3, simplified) ----------

    def _push_afe(self, node: dict) -> None:
        # Noah's-ark clause: at most 3 identical (tag, attrs) entries
        # since the last marker.
        count = 0
        for i in range(len(self.afe) - 1, -1, -1):
            e = self.afe[i]
            if e == "marker":
                break
            if e["tag"] == node["tag"] and e["attrs"] == node["attrs"]:
                count += 1
                if count == 3:
                    self.afe.pop(i)
                    break
        self.afe.append(node)

    def _clear_afe_to_marker(self) -> None:
        while self.afe:
            if self.afe.pop() == "marker":
                return

    def _reconstruct_afe(self) -> None:
        """Re-open formatting elements that were implicitly closed
        (e.g. ``<p><b>x<p>y`` — the second p is still bold)."""
        afe = self.afe
        if not afe:
            return
        stack_ids = {id(s) for s in self.stack}
        last = afe[-1]
        if last == "marker" or id(last) in stack_ids:
            return
        i = len(afe) - 1
        while i > 0:
            prev = afe[i - 1]
            if prev == "marker" or id(prev) in stack_ids:
                break
            i -= 1
        for j in range(i, len(afe)):
            e = afe[j]
            clone = _elem(e["tag"], dict(e["attrs"]) if e["attrs"] else None)
            self._append(self.stack[-1], clone)
            self.stack.append(clone)
            afe[j] = clone

    def _detach(self, node: dict) -> None:
        parent = self.parents.get(id(node))
        if parent is None:
            return
        content = parent.get("content")
        if content:
            for k, c in enumerate(content):
                if c is node:
                    del content[k]
                    break

    def _adoption_agency_end(self, tag: str) -> bool:
        """End tag for a formatting element: the WHATWG adoption agency
        algorithm (13.2.6.4.7), including furthest-block reparenting —
        ``<b><p>para</b>after`` becomes ``<b></b><p><b>para</b>after</p>``."""
        top = self.stack[-1] if self.stack else None
        if (
            top is not None
            and top.get("tag") == tag
            and not any(e is top for e in self.afe if e != "marker")
        ):
            self.stack.pop()
            return True
        for _ in range(8):  # outer loop
            fe = None
            fi = -1
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e == "marker":
                    break
                if e["tag"] == tag:
                    fe, fi = e, i
                    break
            if fe is None:
                return self._generic_end(tag)
            si = -1
            for k, s in enumerate(self.stack):
                if s is fe:
                    si = k
                    break
            if si == -1:
                self.afe.pop(fi)
                return True
            fbi = -1
            for j in range(si + 1, len(self.stack)):
                if self.stack[j]["tag"] in _SPECIAL:
                    fbi = j
                    break
            if fbi == -1:
                del self.stack[si:]
                self.afe.pop(fi)
                return True
            fb = self.stack[fbi]
            common_ancestor = self.stack[si - 1] if si > 0 else self.body
            bookmark = fi
            node_i = fbi
            last_node = fb
            inner = 0
            while True:  # inner loop: walk up from fb toward fe
                inner += 1
                node_i -= 1
                node = self.stack[node_i]
                if node is fe:
                    break
                nai = -1
                for k in range(len(self.afe) - 1, -1, -1):
                    if self.afe[k] is node:
                        nai = k
                        break
                if inner > 3 and nai != -1:
                    self.afe.pop(nai)
                    if nai < bookmark:
                        bookmark -= 1
                    nai = -1
                if nai == -1:
                    del self.stack[node_i]
                    if node_i < si:
                        si -= 1
                    continue
                clone = _elem(node["tag"], dict(node["attrs"]) if node["attrs"] else None)
                self.afe[nai] = clone
                self.stack[node_i] = clone
                self.parents[id(clone)] = self.parents.get(id(node))
                if last_node is fb:
                    bookmark = nai + 1
                self._detach(last_node)
                self._append(clone, last_node)
                last_node = clone
            self._detach(last_node)
            if common_ancestor.get("tag") in _TABLE_CTX:
                self._foster_insert(last_node)
            else:
                self._append(common_ancestor, last_node)
            # move fb's children into a clone of fe; attach clone to fb
            fe_clone = _elem(tag, dict(fe["attrs"]) if fe["attrs"] else None)
            kids = fb["content"]
            fb["content"] = []
            fe_clone["content"] = kids
            for c in kids:
                if isinstance(c, dict):
                    self.parents[id(c)] = fe_clone
            self._append(fb, fe_clone)
            # afe: remove fe, insert clone at the bookmark
            fi2 = -1
            for k in range(len(self.afe) - 1, -1, -1):
                if self.afe[k] is fe:
                    fi2 = k
                    break
            if fi2 != -1:
                self.afe.pop(fi2)
                if fi2 < bookmark:
                    bookmark -= 1
            self.afe.insert(min(bookmark, len(self.afe)), fe_clone)
            # stack: remove fe, insert clone immediately below fb
            si2 = -1
            fbi2 = -1
            for k, s in enumerate(self.stack):
                if s is fe:
                    si2 = k
                elif s is fb:
                    fbi2 = k
            if si2 != -1:
                del self.stack[si2]
                if fbi2 > si2:
                    fbi2 -= 1
            self.stack.insert(fbi2 + 1, fe_clone)
        return True

    # -- foster parenting ---------------------------------------------------

    def _foster_insert(self, node_or_text) -> None:
        """Insert misplaced table content BEFORE the open table."""
        ti = self._find_open(("table",), ("html",))
        if ti == -1:
            # no open table (reachable via adoption-agency stack
            # surgery): plain append, never index stack[-1] by accident
            self._append(self.stack[-1], node_or_text)
            return
        table = self.stack[ti]
        parent = self.parents.get(id(table)) or self.body or self.html or self.document
        content = parent["content"]
        idx = len(content)
        for k, c in enumerate(content):
            if c is table:
                idx = k
                break
        if isinstance(node_or_text, str):
            if idx > 0 and isinstance(content[idx - 1], str):
                content[idx - 1] = content[idx - 1] + node_or_text
            else:
                content.insert(idx, node_or_text)
            return
        content.insert(idx, node_or_text)
        self.parents[id(node_or_text)] = parent

    # -- skeleton creation -------------------------------------------------

    def _ensure_html(self, attrs: dict | None = None) -> None:
        if self.html is None:
            self.html = _elem("html", attrs)
            self.document["content"].append(self.html)
            self.parents[id(self.html)] = self.document
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
        if self._foreign_rules_apply(tok):
            # svg/math opened inside a head <template>: same foreign
            # dispatch as in body (breakout, integration points,
            # honored self-closing)
            return self._foreign_token(tok)
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
                self._insert_element(tag, tok[2] or None, push=True)
                if tag == "template":
                    self.afe.append("marker")
                return True
            if tag == "head":
                return True
            if self._find_open(("template",), ("html",)) != -1:
                # inside a head <template>: elements insert in place
                # (simplified "in template") instead of force-closing
                # the head and leaking into body
                if tag in _TABLE_INTERNAL:
                    return self._table_internal_start(
                        tag, tok[2] or None, tok[3]
                    )
                sc = self._honor_self_closing(tok[3], tag)
                node = self._insert_element(
                    tag, tok[2] or None,
                    push=tag not in VOID_ELEMENTS and not sc,
                )
                if tag in ("svg", "math"):
                    # foreign root: later tokens hit the dispatch above
                    self.ns[id(node)] = "svg" if tag == "svg" else "math"
                return True
            self._pop_head()
            self.mode = _AFTER_HEAD
            return False
        if kind == "end":
            tag = tok[1]
            if tag == "template":
                i = self._find_open(("template",), ("html",))
                if i != -1:
                    del self.stack[i:]
                    self._clear_afe_to_marker()
                return True
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
        if kind in ("text", "rawtext"):
            if _is_ws(tok[1]) or self.stack[-1] is not self.html:
                # ws, or content of an in-head container opened after
                # </head> (<script>/<style>/<title> between head and
                # body) — must not leak into <body> as text
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
        if self._foreign_rules_apply(tok):
            return self._foreign_token(tok)
        kind = tok[0]
        skip_lf, self._skip_lf = getattr(self, "_skip_lf", False), False
        if kind in ("text", "rawtext"):
            text = tok[1]
            if skip_lf and text.startswith("\n"):
                # WHATWG: the LF right after <pre>/<listing>/<textarea>
                # is ignored
                text = text[1:]
                if not text:
                    return True
            if self.afe and self.stack[-1].get("tag") not in _TABLE_CTX:
                self._reconstruct_afe()
            self._insert_text(text)
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
        if tag in _TABLE_INTERNAL:
            return self._table_internal_start(tag, attrs, self_closing)
        if tag in _P_CLOSERS and self._p_in_button_scope():
            self._close_p()
        if tag == "table":
            # WHATWG "in table": a <table> start tag closes the open
            # table only when that table is in *table scope* — td/th/
            # caption (and the applet/object/marquee/template scope
            # barriers) block the search, so a table opened inside a
            # cell legally nests (the "in cell" mode routes it through
            # "in body", which plain-inserts it).
            i = self._find_open(("table",), _TABLE_SCOPE_BOUNDARY)
            if i != -1:
                del self.stack[i:]
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
            # spec: an open <a> in the formatting list runs the
            # adoption agency for "a", then any leftover open <a> is
            # removed from the stack and the list
            has_open_a = any(
                e != "marker" and e["tag"] == "a"
                for e in reversed(self.afe)
            )
            if has_open_a:
                self._adoption_agency_end("a")
                for i in range(len(self.afe) - 1, -1, -1):
                    e = self.afe[i]
                    if e != "marker" and e["tag"] == "a":
                        self.afe.pop(i)
                        break
                i = self._find_open(("a",), ("html", "body"))
                if i != -1:
                    del self.stack[i : i + 1]
        elif tag == "button":
            i = self._find_open(("button",), ("html", "body"))
            if i != -1:
                del self.stack[i:]
        elif tag == "form":
            if self.form is not None:
                return True  # form element pointer set: ignore (spec)
            if self.stack[-1].get("tag") in _TABLE_CTX:
                # "in table": insert the form and pop it immediately
                self.form = self._insert_element(tag, attrs, push=False)
                return True
        elif tag in ("option", "optgroup"):
            if self.stack[-1]["tag"] == "option":
                self.stack.pop()

        in_table_ctx = (
            self.stack[-1].get("tag") in _TABLE_CTX and tag not in _TABLE_ALLOWED
        )
        # WHATWG "in body": only formatting tags and "any other start
        # tag" reconstruct; special-cased tags (p, div, li, h1...) do
        # not — their formatting re-opens lazily at the next text token.
        if not in_table_ctx and (tag in _FORMATTING or tag not in _SPECIAL):
            self._reconstruct_afe()
        sc = self._honor_self_closing(self_closing, tag)
        if tag in VOID_ELEMENTS:
            if in_table_ctx:
                self._foster_insert(_elem(tag, attrs))
            else:
                self._insert_element(tag, attrs, push=False)
            return True
        if in_table_ctx:
            node = _elem(tag, attrs)
            self._foster_insert(node)
            if not sc:
                self.stack.append(node)
        else:
            node = self._insert_element(tag, attrs, push=not sc)
        if tag in ("svg", "math"):
            # foreign root: subsequent tokens dispatch to foreign rules
            self.ns[id(node)] = "svg" if tag == "svg" else "math"
        if not sc:
            if tag in _FORMATTING:
                self._push_afe(node)
            elif tag in _AFE_MARKERS:
                self.afe.append("marker")
        if tag == "form":
            self.form = node
        if tag in ("pre", "listing", "textarea"):
            self._skip_lf = True
        return True

    def _close_caption_or_colgroup(self) -> None:
        """Row/cell tokens end an open <caption>/<colgroup> ("in
        caption": a table-structure token closes the caption)."""
        i = self._find_open(("caption", "colgroup"), ("table", "html"))
        if i != -1:
            was_caption = self.stack[i]["tag"] == "caption"
            del self.stack[i:]
            if was_caption:
                self._clear_afe_to_marker()

    #: the table-structure vocabulary — "clear the stack back to a
    #: table context" stops here (WHATWG 13.2.6.4.9-13; template is a
    #: spec-listed stop in every "clear back to ... context" list)
    _TABLE_STRUCTURE = frozenset(
        {"table", "tbody", "thead", "tfoot", "tr", "td", "th",
         "caption", "colgroup", "template", "html"}
    )

    def _clear_to_table_context(self) -> None:
        """WHATWG "clear the stack back to a table context": fostered
        elements opened while a table was current (e.g. <table><b>...)
        sit on the stack ABOVE the table and must be popped before a
        table-structure tag is processed — otherwise the implied
        tbody/tr would nest inside the fostered element and the table
        would render empty."""
        while self.stack and self.stack[-1]["tag"] not in self._TABLE_STRUCTURE:
            self.stack.pop()

    def _pop_table_scope(self, i: int) -> None:
        """Pop stack[i:], clearing the AFE list to its marker for each
        popped cell/caption (they pushed one on entry — a leaked marker
        would silently disable formatting reconstruction later)."""
        popped = self.stack[i:]
        del self.stack[i:]
        for node in popped:
            if node["tag"] in ("td", "th", "caption"):
                self._clear_afe_to_marker()

    def _table_internal_start(self, tag, attrs, self_closing) -> bool:
        """Table-structure start tags: implied tbody/tr (WHATWG "in
        table"/"in table body" modes), orphans outside a table ignored
        (parse error per the "in body" rules — jsoup does the same).

        Inside a <template> with no table below it, the spec's "in
        template" mode routes these tokens through the table modes
        whose clear-back stops at the template boundary — so
        ``<template><tr><td>`` keeps its rows (previously dropped as
        orphans) and ``<table><template><td>`` puts the cell inside
        the template, not the outer table. Contents stay children of
        the template element, matching the reference's parser (Jsoup
        keeps template children in the element — it has no separate
        content fragment — and hickory reads ``.childNodes``)."""
        ti = self._find_open(("table",), ("html",))
        tmpl = self._find_open(("template",), ("html",))
        if ti == -1 or tmpl > ti:
            if tmpl == -1:
                return True  # no open table or template: ignore
            # in-template: emulate the table modes with the template
            # as the clear-back boundary
            if tag in ("td", "th"):
                i = self._find_open(
                    ("td", "th"), ("tr", "template", "html")
                )
                if i != -1:
                    self._pop_table_scope(i)
            elif tag == "tr":
                while True:
                    i = self._find_open(
                        ("tr", "td", "th"), ("template", "html")
                    )
                    if i == -1:
                        break
                    self._pop_table_scope(i)
            elif tag != "col":
                while True:
                    i = self._find_open(
                        ("tbody", "thead", "tfoot", "caption", "colgroup",
                         "tr", "td", "th"),
                        ("template", "html"),
                    )
                    if i == -1:
                        break
                    self._pop_table_scope(i)
            self._insert_element(tag, attrs, push=tag != "col")
            if tag in ("td", "th", "caption"):
                self.afe.append("marker")
            return True
        self._clear_to_table_context()
        if tag in ("tbody", "thead", "tfoot", "caption", "colgroup"):
            # pop EVERY open row-group/row/cell back to the table: a
            # single pop would leave an unclosed <tr> capturing the new
            # group (consecutive unclosed sections are common crawl HTML)
            while True:
                i = self._find_open(
                    ("tbody", "thead", "tfoot", "caption", "colgroup",
                     "tr", "td", "th"),
                    ("table", "html"),
                )
                if i == -1:
                    break
                self._pop_table_scope(i)
            self._insert_element(tag, attrs, push=True)
            if tag == "caption":
                self.afe.append("marker")
            return True
        if tag == "col":
            if self.stack[-1].get("tag") != "colgroup":
                while True:
                    i = self._find_open(
                        ("tbody", "thead", "tfoot", "caption", "tr", "td", "th"),
                        ("table", "html"),
                    )
                    if i == -1:
                        break
                    self._pop_table_scope(i)
                self._insert_element("colgroup", None, push=True)
            self._insert_element("col", attrs, push=False)
            return True
        if tag == "tr":
            # close the open cell AND the open row (both, not just the
            # topmost): <tr><td>a<tr> must yield sibling rows
            while True:
                i = self._find_open(("tr", "td", "th"), ("table", "html"))
                if i == -1:
                    break
                self._pop_table_scope(i)
            self._close_caption_or_colgroup()
            if self._find_open(("tbody", "thead", "tfoot"), ("table", "html")) == -1:
                self._insert_element("tbody", None, push=True)
            self._insert_element("tr", attrs, push=True)
            return True
        # td / th
        i = self._find_open(("td", "th"), ("table", "html"))
        if i != -1:
            self._pop_table_scope(i)
        if self._find_open(("tr",), ("table", "html")) == -1:
            self._close_caption_or_colgroup()
            if self._find_open(("tbody", "thead", "tfoot"), ("table", "html")) == -1:
                self._insert_element("tbody", None, push=True)
            self._insert_element("tr", None, push=True)
        self._insert_element(tag, attrs, push=True)
        self.afe.append("marker")
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
        if tag in _FORMATTING:
            return self._adoption_agency_end(tag)
        if tag == "form":
            self.form = None
        return self._generic_end(tag)

    def _generic_end(self, tag: str) -> bool:
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if node["tag"] == tag:
                del self.stack[i:]
                if tag in _AFE_MARKERS:
                    self._clear_afe_to_marker()
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
