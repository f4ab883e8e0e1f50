"""From-scratch HTML5 tokenizer (string-scanning, iterative, stack-free).

Produces a flat token stream for the tree builder. Implements the
WHATWG tokenizer states the web corpus exercises: data, tag open/name,
attributes (quoted/unquoted/valueless, lowercased names, first-wins
duplicates), character references, comments (incl. bogus), DOCTYPE
(incl. PUBLIC/SYSTEM ids), RAWTEXT (script/style/xmp/...) and RCDATA
(title/textarea), and EOF-in-tag discard.

Reference behavior pinned by the corpus (parser itself is jsoup in the
reference and explicitly an implementation detail, README.md:23-26):
- lowercased tag/attr names (src/clj/hickory/core.clj:93,140 and
  src/cljc/hickory/select.cljc:220-222)
- valueless attr -> "" (test/cljc/hickory/test/select.cljc:19)
- entity decode in text/attrs but not script/style
  (test/cljc/hickory/test/core.cljc:109-127, render.cljc:20-22)
- truncated `</body` swallows to '>' and the bogus end tag is ignored
  (test/cljc/hickory/test/render.cljc:42-43)
- doctype name lowercased, empty public/system ids as ""
  (test/cljc/hickory/test/core.cljc:19, render.cljc:42-43)

Tokens (tuples, first element is the kind):
  ("doctype", name, publicid, systemid)
  ("start", tag, attrs_dict, self_closing)
  ("end", tag)
  ("comment", data)
  ("text", decoded_text)
  ("rawtext", raw_text)       # script/style contents, never decoded
"""

from __future__ import annotations

from hickoryspark.html.entities import decode_entities

_WS = "\t\n\f\r "
_LETTERS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

# Elements whose content is consumed as RAWTEXT (no entity decode, no tags).
RAWTEXT_ELEMENTS = frozenset(
    {"script", "style", "xmp", "iframe", "noembed", "noframes"}
)
# Elements whose content is RCDATA (entity decode, no tags).
RCDATA_ELEMENTS = frozenset({"title", "textarea"})

# WHATWG 13.2.6.5 foreign-content breakout list (minus <font>, which
# joins only with a color/face/size attribute) and the integration-
# point elements. Canonical copies live here because the tree builder
# imports the tokenizer; treebuilder.py aliases them.
_FC_BREAKOUT = frozenset(
    "b big blockquote body br center code dd div dl dt em embed h1 h2 h3 "
    "h4 h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s "
    "small span strong strike sub sup table tt u ul var".split()
)
_FC_IP = frozenset(
    {"foreignobject", "desc", "title",  # SVG HTML integration points
     "mi", "mo", "mn", "ms", "mtext",   # MathML text IPs
     "annotation-xml"}
)


def preprocess(s: str) -> str:
    """WHATWG input-stream preprocessing: newline normalization."""
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s


def _skip_ws(s: str, pos: int, n: int) -> int:
    while pos < n and s[pos] in _WS:
        pos += 1
    return pos


def _parse_tag_body(s: str, pos: int, n: int):
    """Parse attributes + tag close starting right after the tag name.

    Returns (attrs, self_closing, pos_after_gt) or None on EOF-in-tag.
    """
    attrs: dict[str, str] = {}
    self_closing = False
    while True:
        pos = _skip_ws(s, pos, n)
        if pos >= n:
            return None
        c = s[pos]
        if c == "/":
            if pos + 1 < n and s[pos + 1] == ">":
                return attrs, True, pos + 2
            pos += 1  # stray '/': parse error, ignore
            continue
        if c == ">":
            return attrs, False, pos + 1
        # Attribute name.
        name_start = pos
        while pos < n and s[pos] not in _WS and s[pos] not in "/=>":
            pos += 1
        name = s[name_start:pos].lower()
        if not name:
            # '=' with no name: consume to avoid stalling (parse error).
            pos += 1
            continue
        pos = _skip_ws(s, pos, n)
        value = ""
        if pos < n and s[pos] == "=":
            pos = _skip_ws(s, pos + 1, n)
            if pos >= n:
                return None
            q = s[pos]
            if q == '"' or q == "'":
                end = s.find(q, pos + 1)
                if end == -1:
                    return None  # EOF in attribute value
                value = decode_entities(s[pos + 1 : end], in_attribute=True)
                pos = end + 1
            else:
                val_start = pos
                while pos < n and s[pos] not in _WS and s[pos] != ">":
                    pos += 1
                value = decode_entities(s[val_start:pos], in_attribute=True)
        if name not in attrs:
            attrs[name] = value
    # unreachable


def _parse_doctype(s: str, pos: int, n: int):
    """Parse a DOCTYPE starting right after '<!doctype'. Returns (token, pos)."""
    pos = _skip_ws(s, pos, n)
    name_start = pos
    while pos < n and s[pos] not in _WS and s[pos] != ">":
        pos += 1
    name = s[name_start:pos].lower()
    publicid = ""
    systemid = ""
    pos = _skip_ws(s, pos, n)
    rest_upper = s[pos : pos + 6].upper()
    if rest_upper.startswith("PUBLIC"):
        pos = _skip_ws(s, pos + 6, n)
        publicid, pos = _read_doctype_id(s, pos, n)
        pos = _skip_ws(s, pos, n)
        if pos < n and s[pos] in "\"'":
            systemid, pos = _read_doctype_id(s, pos, n)
    elif rest_upper.startswith("SYSTEM"):
        pos = _skip_ws(s, pos + 6, n)
        systemid, pos = _read_doctype_id(s, pos, n)
    gt = s.find(">", pos)
    pos = n if gt == -1 else gt + 1
    return ("doctype", name, publicid, systemid), pos


def _read_doctype_id(s: str, pos: int, n: int):
    if pos < n and (s[pos] == '"' or s[pos] == "'"):
        q = s[pos]
        end = s.find(q, pos + 1)
        if end == -1:
            return s[pos + 1 :], n
        return s[pos + 1 : end], end + 1
    return "", pos


def _find_rawtext_end(s: str, pos: int, tag: str, n: int) -> int:
    """Index of the '<' of the matching ``</tag`` end tag, or -1.

    Case-insensitive WITHOUT lowercasing the haystack: str.lower() is
    not length-preserving (e.g. U+0130 lowers to two chars), which
    would desynchronize indices and corrupt the token stream."""
    k = 2 + len(tag)
    i = s.find("</", pos)
    while i != -1:
        if s[i + 2 : i + k].lower() == tag:
            j = i + k
            if j >= n or s[j] in _WS or s[j] in "/>":
                return i
        i = s.find("</", i + 1)
    return -1


def tokenize(s: str):
    """Yield tokens for an HTML document/fragment string."""
    s = preprocess(s)
    n = len(s)
    pos = 0
    rawtext: tuple[str, bool] | None = None  # (tag, decode_entities?)
    # open svg/math depth: the RCDATA tokenizer switch does not exist
    # in foreign content (an svg <title>'s children are markup — the
    # WHATWG switch happens via tree-construction feedback for
    # HTML-namespace elements only). The counter is the feedback
    # approximation a pure tokenizer can carry. RAWTEXT (script/style)
    # is NOT suppressed here: those spans stay swallowed and the tree
    # builder re-tokenizes them only when the element really is
    # foreign — the builder knows the true tree state (breakout
    # subtrees like <svg><div><script> have left foreign content even
    # though svg is still open), the tokenizer does not. RCDATA can't
    # use that trick because its text is entity-decoded already.
    #
    # The counter mirrors the tree builder's BREAKOUT rule so an
    # unclosed <svg> cannot suppress RCDATA for the document's whole
    # tail: an HTML breakout start tag pops foreign elements down to
    # the nearest integration point (or all of them), so it resets
    # `foreign` to the foreign depth recorded when that IP opened
    # (`ip_marks`, one entry per open IP — breakout never crosses a
    # foreignObject/desc/title or MathML text IP; annotation-xml is
    # counted unconditionally, the builder's encoding-attr check being
    # invisible at this layer). A nested <svg> inside an IP therefore
    # resets correctly too, not just top-level foreign roots.
    foreign = 0
    # (ip tag name, foreign depth at open) per open integration point —
    # the name is checked on end tags so a STRAY end tag naming an IP
    # element (</title> with only a foreignObject open) cannot pop the
    # wrong mark and desync the suppression heuristic for the subtree
    ip_marks: list[tuple[str, int]] = []
    while pos < n:
        if rawtext is not None:
            tag, decode = rawtext
            rawtext = None
            end = _find_rawtext_end(s, pos, tag, n)
            if end == -1:
                text = s[pos:]
                if text:
                    yield (
                        ("text", decode_entities(text)) if decode else ("rawtext", text)
                    )
                pos = n
                continue
            text = s[pos:end]
            if text:
                yield (("text", decode_entities(text)) if decode else ("rawtext", text))
            pos = end
            # fall through: the '</tag' end tag is parsed below
        lt = s.find("<", pos)
        if lt == -1:
            if pos < n:
                yield ("text", decode_entities(s[pos:]))
            break
        if lt > pos:
            yield ("text", decode_entities(s[pos:lt]))
        pos = lt
        nxt = s[pos + 1] if pos + 1 < n else ""
        if nxt in _LETTERS:
            # Start tag.
            name_start = pos + 1
            i = name_start
            while i < n and s[i] not in _WS and s[i] not in "/>":
                i += 1
            name = s[name_start:i].lower()
            parsed = _parse_tag_body(s, i, n)
            if parsed is None:
                break  # EOF in tag: discard rest (eof-in-tag)
            attrs, self_closing, pos = parsed
            yield ("start", name, attrs, self_closing)
            ip_depth = ip_marks[-1][1] if ip_marks else 0
            if foreign > ip_depth and (
                name in _FC_BREAKOUT
                or (name == "font"
                    and any(a in attrs for a in ("color", "face", "size")))
            ):
                # builder pops foreign elements down to the nearest IP
                # (or all of them when no IP is open)
                foreign = ip_depth
            if name in ("svg", "math"):
                if not self_closing:
                    foreign += 1
            elif foreign > 0 and name in _FC_IP and not self_closing:
                ip_marks.append((name, foreign))
            # self-closing flag does NOT suppress RAWTEXT/RCDATA: the
            # tree builder ignores '/' on non-void HTML elements
            # (WHATWG), so '<script/>' still swallows to '</script>'
            elif name in RAWTEXT_ELEMENTS:
                rawtext = (name, False)
            elif name in RCDATA_ELEMENTS and foreign == 0:
                rawtext = (name, True)
        elif nxt == "/":
            i = pos + 2
            if i >= n:
                break  # '</' at EOF: discard
            c = s[i]
            if c == ">":
                pos = i + 1  # '</>': ignored entirely
                continue
            if c in _LETTERS:
                name_start = i
                while i < n and s[i] not in _WS and s[i] not in "/>":
                    i += 1
                name = s[name_start:i].lower()
                parsed = _parse_tag_body(s, i, n)
                if parsed is None:
                    break  # EOF in end tag: discard (e.g. trailing '</body')
                _attrs, _sc, pos = parsed
                yield ("end", name)
                if name in ("svg", "math") and foreign > 0:
                    foreign -= 1
                    # IPs below the closed root are no longer open
                    while ip_marks and ip_marks[-1][1] > foreign:
                        ip_marks.pop()
                elif foreign > 0 and name in _FC_IP and ip_marks:
                    # closing an IP implicitly closes any nested
                    # foreign roots opened inside it (the builder pops
                    # to the MATCHING element) — reset to the depth
                    # recorded at that IP's open. Scan for the nearest
                    # mark with the same tag: a stray end tag naming a
                    # different IP element must not pop anything.
                    for k in range(len(ip_marks) - 1, -1, -1):
                        if ip_marks[k][0] == name:
                            foreign = ip_marks[k][1]
                            del ip_marks[k:]
                            break
            else:
                # Bogus comment: '</' followed by non-letter.
                gt = s.find(">", i)
                data = s[i:] if gt == -1 else s[i:gt]
                yield ("comment", data)
                pos = n if gt == -1 else gt + 1
        elif nxt == "!":
            if s.startswith("<!--", pos):
                i = pos + 4
                # Abrupt closings: <!--> and <!--->
                if s.startswith(">", i):
                    yield ("comment", "")
                    pos = i + 1
                    continue
                if s.startswith("->", i):
                    yield ("comment", "")
                    pos = i + 2
                    continue
                end1 = s.find("-->", i)
                end2 = s.find("--!>", i)
                if end1 == -1 and end2 == -1:
                    yield ("comment", s[i:])
                    pos = n
                elif end2 != -1 and (end1 == -1 or end2 < end1):
                    yield ("comment", s[i:end2])
                    pos = end2 + 4
                else:
                    yield ("comment", s[i:end1])
                    pos = end1 + 3
            elif s[pos + 2 : pos + 9].lower() == "doctype":
                token, pos = _parse_doctype(s, pos + 9, n)
                yield token
            else:
                # Bogus comment (includes <![CDATA[ in HTML content).
                i = pos + 2
                gt = s.find(">", i)
                data = s[i:] if gt == -1 else s[i:gt]
                yield ("comment", data)
                pos = n if gt == -1 else gt + 1
        elif nxt == "?":
            # Bogus comment per spec ('<?xml ...>' etc.).
            i = pos + 1
            gt = s.find(">", i)
            data = s[i:] if gt == -1 else s[i:gt]
            yield ("comment", data)
            pos = n if gt == -1 else gt + 1
        else:
            # Literal '<' (incl. at EOF).
            yield ("text", "<")
            pos += 1
