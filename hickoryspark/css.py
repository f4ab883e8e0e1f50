"""CSS selector strings compiled to the hickory selector algebra.

The reference exposes combinator FUNCTIONS only (select.cljc) — users
hand-compose ``(s/child (s/tag :nav) (s/class "item"))``. This module
adds the front-end the reference never had: ``css("nav > .item")``
parses a CSS selector string once and compiles it to BOTH engines —
``css`` returns an interpreter selector (``select.select``-compatible
``loc -> loc | None``) and ``css_rel`` a relational selector
(``selectors_rel.select_rel``-compatible ``nodes -> DataFrame``) from
the SAME AST, so the two stay in lockstep by construction.

Supported subset (everything else raises ``CssError`` — no silent
wrong results):

- type ``div``, universal ``*``, ``#id``, ``.class``
- ``[attr]``, ``[attr=v]``, ``[attr~=v]``, ``[attr|=v]``, ``[attr^=v]``,
  ``[attr$=v]``, ``[attr*=v]`` (value bare or single/double quoted,
  no backslash escapes)
- ``:first-child``, ``:last-child``, ``:only-child``, ``:root``,
  ``:nth-child(An+B|odd|even|k)``, ``:nth-last-child(..)``,
  ``:nth-of-type(..)``, ``:nth-last-of-type(..)``, ``:only-of-type``,
  ``:first-of-type``, ``:last-of-type``, ``:empty``,
  ``:not(compound)``, ``:is(compound, ...)`` / ``:where(compound, ...)``
  (compound branches only — a complex selector inside raises), and
  ``:has(rel, ...)`` with relative compounds ``X`` / ``> X`` / ``+ X``
  / ``~ X`` (maps to the reference's has-descendant / has-child /
  precede-adjacent / precede, select.cljc:531-723)
- combinators: descendant (space), ``>``, ``+``, ``~``; ``,`` for OR

Semantics notes:

- ``An+B`` is CSS-exact (``i >= 0``), not the reference's bare modular
  stride (select.cljc:297-327 matches every position ≡ B mod A, i < 0
  included). The compiler closes the gap INSIDE the algebra: for
  A > 0 < B-A it conjoins ``not(nth(0, B-jA))`` exclusions for the
  below-B residue positions; for A < 0 it expands the finite position
  set into an ``or`` of exact matches. Both stay pure leaf/combinator
  compositions, so interpreter and relational compilations agree
  without new primitives. Term counts are capped (hostile-selector
  guard): a pathological B raises.
- Per the reference, id and class matching is case-insensitive
  (select.cljc:232-251) and ``:nth-child`` requires an ELEMENT parent
  (``<html>``'s parent is the document, so ``html:nth-child(1)`` does
  not match — select.cljc:265-274). Attr VALUES in ``[a=v]`` compare
  case-sensitively (CSS default).
- ``:nth-of-type`` variants (incl. ``:first-of-type``/``:last-of-type``)
  need the compound's type selector (the engine's nth-of-type is
  tag-parameterized, select.cljc:329-351); ``*:nth-of-type(2)`` raises.
- ``:empty`` is CSS-exact: any element or text child makes the element
  non-empty; comment children are ignored (their data string is a
  child of the COMMENT node, never of the element).
- ``:where`` compiles identically to ``:is`` (they differ only in
  specificity, which selection does not use).

Relational compilation collapses every Column-level simple of a
compound into ONE ``where`` conjunction — pushed into the scan inside
whole-stage codegen — so ``css_rel("a.item[href]")`` plans exactly
like the hand-built predicate; only ``:not`` (an anti-join in the
algebra) and combinators introduce joins. ``of-type`` pseudos need
the ``with_type_rank`` columns; the compiled selector adds the rank
window itself when the input table lacks them.
"""

from __future__ import annotations

import re

from hickoryspark import select as S

__all__ = ["CssError", "css", "css_rel", "parse_css"]

#: expansion/exclusion guard: a selector like :nth-child(-n+100000)
#: would otherwise compile to 100000 or-terms
MAX_NTH_TERMS = 256

_IDENT_RE = re.compile(r"[A-Za-z_][-\w]*")
_NTH_ANB_RE = re.compile(r"^([+-]?\d*)n(?:\s*([+-])\s*(\d+))?$")
_NTH_INT_RE = re.compile(r"^[+-]?\d+$")
_ATTR_RE = re.compile(
    r"\[\s*([A-Za-z_][-\w]*)\s*"
    r"(?:([~|^$*]?=)\s*(?:\"([^\"]*)\"|'([^']*)'|([^\]\s]+))\s*)?\]"
)

#: pseudo-classes implying element-ness (their reference selectors
#: start with an element/element-child check)
_ELEMENT_PSEUDOS = {
    "first-child", "last-child", "only-child", "root",
    "nth-child", "nth-last-child",
    "nth-of-type", "nth-last-of-type", "only-of-type",
    "first-of-type", "last-of-type",
}


class CssError(ValueError):
    """Unsupported or malformed CSS selector string."""


def _parse_nth(arg: str) -> tuple[int, int]:
    """'odd' | 'even' | 'An+B' | 'k' -> (A, B)."""
    a = arg.strip().lower()
    if a == "odd":
        return 2, 1
    if a == "even":
        return 2, 0
    m = _NTH_ANB_RE.match(a)
    if m:
        coef = m.group(1)
        A = -1 if coef == "-" else int(coef) if coef not in ("", "+") else 1
        B = int(m.group(3)) if m.group(3) else 0
        if m.group(2) == "-":
            B = -B
        return A, B
    if _NTH_INT_RE.match(a):
        return 0, int(a)
    raise CssError(f"bad nth argument: {arg!r}")


class _Parser:
    """Recursive-descent over the raw string (a pure regex tokenizer
    can't pair :not's parentheses across quoted attr values)."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def err(self, what: str) -> CssError:
        return CssError(f"{what} at offset {self.i} in {self.s!r}")

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> bool:
        j = self.i
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1
        return self.i > j

    def parse_selector_list(self) -> tuple:
        out = [self.parse_complex()]
        self.skip_ws()
        while self.peek() == ",":
            self.i += 1
            out.append(self.parse_complex())
            self.skip_ws()
        return ("or", out)

    def parse_complex(self) -> tuple:
        self.skip_ws()
        head = self.parse_compound()
        chain = []
        while True:
            had_ws = self.skip_ws()
            ch = self.peek()
            if ch == "" or ch == ",":
                break
            if ch in ">+~":
                self.i += 1
                self.skip_ws()
                chain.append((ch, self.parse_compound()))
            elif had_ws:
                chain.append((" ", self.parse_compound()))
            else:
                raise self.err(f"unexpected {ch!r}")
        return ("chain", head, chain)

    def parse_compound(self) -> list:
        simples = []
        while True:
            ch = self.peek()
            if ch == "*":
                self.i += 1
                simples.append(("universal",))
            elif ch == "#":
                self.i += 1
                simples.append(("id", self._ident("id")))
            elif ch == ".":
                self.i += 1
                simples.append(("class", self._ident("class name")))
            elif ch == "[":
                m = _ATTR_RE.match(self.s, self.i)
                if not m:
                    raise self.err("bad attribute selector")
                self.i = m.end()
                name, op = m.group(1), m.group(2)
                val = next((g for g in m.group(3, 4, 5) if g is not None), None)
                simples.append(("attr", name, op, val))
            elif ch == ":":
                self.i += 1
                simples.append(self._pseudo())
            elif _IDENT_RE.match(self.s, self.i):
                if simples:
                    # 'a.x b' reaches here only via a parser bug; a
                    # type selector is only valid compound-initial
                    raise self.err("type selector must come first")
                simples.append(("tag", self._ident("tag")))
            else:
                break
        if not simples:
            raise self.err("empty compound selector")
        return simples

    def _ident(self, what: str) -> str:
        m = _IDENT_RE.match(self.s, self.i)
        if not m:
            raise self.err(f"expected {what}")
        self.i = m.end()
        return m.group(0)

    def _pseudo(self) -> tuple:
        name = self._ident("pseudo-class name").lower()
        if name in ("first-child", "last-child", "only-child", "root",
                    "only-of-type", "first-of-type", "last-of-type",
                    "empty"):
            return (name,)
        if name in ("nth-child", "nth-last-child",
                    "nth-of-type", "nth-last-of-type"):
            arg = self._paren_raw()
            return (name, *_parse_nth(arg))
        if name == "not":
            if self.peek() != "(":
                raise self.err(":not needs parentheses")
            self.i += 1
            self.skip_ws()
            inner = self.parse_compound()
            self.skip_ws()
            if self.peek() != ")":
                raise self.err("unclosed :not(")
            self.i += 1
            return ("not", inner)
        if name in ("is", "where"):
            return ("is", self._compound_list(f":{name}"))
        if name == "has":
            return ("has", self._relative_list())
        raise CssError(f"unsupported pseudo-class :{name}")

    def _compound_list(self, what: str) -> list:
        """Comma-separated COMPOUND branches inside parentheses (the
        supported :is/:where subset; a complex selector raises)."""
        if self.peek() != "(":
            raise self.err(f"{what} needs parentheses")
        self.i += 1
        branches = []
        while True:
            self.skip_ws()
            branches.append(self.parse_compound())
            self.skip_ws()
            ch = self.peek()
            if ch == ",":
                self.i += 1
                continue
            if ch == ")":
                self.i += 1
                return branches
            raise self.err(
                f"{what} supports compound branches only (expected , or ))")

    def _relative_list(self) -> list:
        """:has argument: comma-separated relative compounds, each an
        optional leading combinator (>, +, ~; default descendant) plus
        ONE compound."""
        if self.peek() != "(":
            raise self.err(":has needs parentheses")
        self.i += 1
        branches = []
        while True:
            self.skip_ws()
            comb = " "
            if self.peek() in ">+~":
                comb = self.peek()
                self.i += 1
                self.skip_ws()
            branches.append((comb, self.parse_compound()))
            self.skip_ws()
            ch = self.peek()
            if ch == ",":
                self.i += 1
                continue
            if ch == ")":
                self.i += 1
                return branches
            raise self.err(
                ":has supports one relative compound per branch "
                "(expected , or ))")

    def _paren_raw(self) -> str:
        if self.peek() != "(":
            raise self.err("pseudo-class needs an argument")
        j = self.s.find(")", self.i + 1)
        if j < 0:
            raise self.err("unclosed parenthesis")
        arg = self.s[self.i + 1:j]
        self.i = j + 1
        return arg


def parse_css(s: str) -> tuple:
    """Parse a CSS selector string to the shared AST (or raise
    ``CssError``)."""
    if not s or not s.strip():
        raise CssError("empty selector")
    p = _Parser(s)
    ast = p.parse_selector_list()
    p.skip_ws()
    if p.i != len(s):
        raise p.err("trailing input")
    return ast


# ---------------------------------------------------------------------------
# CSS-exact An+B over the reference's modular stride: the extra
# exact-position terms both compilers conjoin/union (see module
# docstring). (A, B) -> ("plain" | "exclude" | "expand", payload).
# ---------------------------------------------------------------------------

def _nth_plan(A: int, B: int) -> tuple[str, list[int]]:
    # size the term list ARITHMETICALLY before materializing anything:
    # a hostile ':nth-child(-n+2000000000)' must raise CssError, not
    # build a two-billion-element list on the way to the guard
    if A == 0:
        return "plain", []  # exact position: already CSS-exact
    if A > 0:
        # below-B residue positions the modular stride wrongly admits
        n_excl = max(B - 1, 0) // A
        if n_excl > MAX_NTH_TERMS:
            raise CssError(f"nth offset too large: {A}n+{B}")
        excl = [p for j in range(1, n_excl + 1) if (p := B - j * A) >= 1]
        return ("exclude", excl) if excl else ("plain", [])
    # A < 0: finite CSS match set {B, B+A, ...} ∩ [1, inf)
    n_pos = 0 if B < 1 else (B - 1) // (-A) + 1
    if n_pos > MAX_NTH_TERMS:
        raise CssError(f"nth expansion too large: {A}n+{B}")
    return "expand", list(range(B, 0, A))


def _compound_tag(simples: list) -> str | None:
    for s in simples:
        if s[0] == "tag":
            return s[1].lower()
    return None


def _implies_element(simple: tuple) -> bool:
    k = simple[0]
    return (k in ("tag", "universal", "id", "class", "attr")
            or k in _ELEMENT_PSEUDOS)


# ---------------------------------------------------------------------------
# Interpreter compilation (select.py algebra)
# ---------------------------------------------------------------------------

#: Java regex \s (ASCII-only) — the class the relational engine splits
#: on; Python's bare str.split()/\s would add Unicode whitespace and
#: break the two-engine lockstep (review repro: ' '-separated
#: tokens)
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

_ATTR_OPS = {
    "=": lambda v, t: v == t,
    "~=": lambda v, t: bool(t) and t in _ASCII_WS.split(v),
    "|=": lambda v, t: v == t or v.startswith(t + "-"),
    "^=": lambda v, t: bool(t) and v.startswith(t),
    "$=": lambda v, t: bool(t) and v.endswith(t),
    "*=": lambda v, t: bool(t) and t in v,
}


def _never(loc):
    return None


def _non_comment(loc):
    """any child node EXCEPT a comment — the CSS :empty notion of
    content (a comment's data string is the comment's own child, so it
    never reaches a direct-child walk of the element)."""
    return None if loc.type_name() == "comment" else loc


def _nth_terms_interp(base, exact, A: int, B: int):
    """base(A,B)/exact(k) are the engine's nth constructors; returns
    the CSS-exact selector list to AND (or a single or-selector)."""
    kind, pos = _nth_plan(A, B)
    if kind == "plain":
        return base(A, B)
    if kind == "exclude":
        return S.and_(base(A, B), *[S.not_(exact(p)) for p in pos])
    if not pos:
        return _never
    return S.or_(*[exact(p) for p in pos])


def _compile_simple_interp(simple: tuple, comp_tag: str | None):
    k = simple[0]
    if k == "tag":
        return S.tag(simple[1])
    if k == "universal":
        return S.element
    if k == "id":
        return S.id_(simple[1])
    if k == "class":
        return S.cls(simple[1])
    if k == "attr":
        _, name, op, val = simple
        if op is None:
            return S.attr(name)
        if op not in _ATTR_OPS:
            raise CssError(f"unsupported attr operator {op!r}")
        f = _ATTR_OPS[op]
        return S.attr(name, lambda v, _f=f, _t=val: _f(v, _t))
    if k == "first-child":
        return S.first_child
    if k == "last-child":
        return S.last_child
    if k == "only-child":
        return S.and_(S.first_child, S.last_child)
    if k == "root":
        return S.root
    if k == "only-of-type":
        if comp_tag is None:
            raise CssError(
                ":only-of-type needs a type selector in its compound "
                "(the engine's nth-of-type is tag-parameterized)")
        return S.and_(S.nth_of_type(0, 1, comp_tag),
                      S.nth_last_of_type(0, 1, comp_tag))
    if k == "nth-child":
        return _nth_terms_interp(
            S.nth_child, lambda p: S.nth_child(0, p), simple[1], simple[2])
    if k == "nth-last-child":
        return _nth_terms_interp(
            S.nth_last_child, lambda p: S.nth_last_child(0, p),
            simple[1], simple[2])
    if k in ("nth-of-type", "nth-last-of-type"):
        if comp_tag is None:
            raise CssError(
                f":{k} needs a type selector in its compound (the "
                "engine's nth-of-type is tag-parameterized)")
        ctor = S.nth_of_type if k == "nth-of-type" else S.nth_last_of_type
        return _nth_terms_interp(
            lambda a, b: ctor(a, b, comp_tag),
            lambda p: ctor(0, p, comp_tag), simple[1], simple[2])
    if k in ("first-of-type", "last-of-type"):
        if comp_tag is None:
            raise CssError(
                f":{k} needs a type selector in its compound (the "
                "engine's nth-of-type is tag-parameterized)")
        ctor = S.nth_of_type if k == "first-of-type" else S.nth_last_of_type
        return ctor(0, 1, comp_tag)
    if k == "empty":
        return S.not_(S.has_child(_non_comment))
    if k == "not":
        return S.not_(_compile_compound_interp(simple[1]))
    if k == "is":
        sels = [_compile_compound_interp(c) for c in simple[1]]
        return sels[0] if len(sels) == 1 else S.or_(*sels)
    if k == "has":
        sels = [_compile_has_branch_interp(comb, comp)
                for comb, comp in simple[1]]
        return sels[0] if len(sels) == 1 else S.or_(*sels)
    raise CssError(f"unsupported simple selector {k!r}")


def _compile_has_branch_interp(comb: str, comp: list):
    inner = _compile_compound_interp(comp)
    if comb == " ":
        return S.has_descendant(inner)
    if comb == ">":
        return S.has_child(inner)
    # sibling forms anchor at the candidate itself (always an element —
    # the compound compiler conjoins element-ness)
    if comb == "+":
        return S.precede_adjacent(S.element, inner)
    return S.precede(S.element, inner)


def _compile_compound_interp(simples: list):
    sels = []
    if not any(_implies_element(s) for s in simples):
        sels.append(S.element)  # CSS compounds match elements only
    comp_tag = _compound_tag(simples)
    sels.extend(_compile_simple_interp(s, comp_tag) for s in simples)
    return sels[0] if len(sels) == 1 else S.and_(*sels)


_COMBINATORS_INTERP = {
    " ": S.descendant, ">": S.child, "+": S.follow_adjacent, "~": S.follow,
}


def _compile_ast_interp(ast: tuple):
    kind = ast[0]
    if kind == "or":
        sels = [_compile_ast_interp(c) for c in ast[1]]
        return sels[0] if len(sels) == 1 else S.or_(*sels)
    _, head, chain = ast
    cur = _compile_compound_interp(head)
    for comb, comp in chain:
        cur = _COMBINATORS_INTERP[comb](cur, _compile_compound_interp(comp))
    return cur


def css(s: str):
    """Compile a CSS selector string to an interpreter selector usable
    with ``select.select`` / ``select.select_locs``."""
    return _compile_ast_interp(parse_css(s))


# ---------------------------------------------------------------------------
# Relational compilation (selectors_rel algebra) — Column-level simples
# of a compound fuse into one pushed-down `where` conjunction.
# ---------------------------------------------------------------------------

def _ast_uses_of_type(ast) -> bool:
    if isinstance(ast, tuple) and ast and isinstance(ast[0], str):
        if ast[0] in ("nth-of-type", "nth-last-of-type", "only-of-type",
                      "first-of-type", "last-of-type"):
            return True
    if isinstance(ast, (tuple, list)):
        return any(_ast_uses_of_type(x) for x in ast)
    return False


def css_rel(s: str):
    """Compile a CSS selector string to a relational selector usable
    with ``selectors_rel.select_rel`` (``nodes -> DataFrame``)."""
    from pyspark.sql import functions as F

    from hickoryspark.spark import selectors_rel as R

    def attr_col(name, op, val):
        if op is None:
            return R.p_attr(name)
        v = R.attr_value(name)
        if op == "=":
            pred = v == F.lit(val)
        elif op == "~=":
            # same ASCII class + empty-operand guard as the
            # interpreter's _ASCII_WS split (an unguarded empty val
            # would match the empty edge token F.split leaves on
            # whitespace-padded values)
            pred = F.lit(bool(val)) & F.array_contains(
                F.split(v, r"[ \t\n\x0B\f\r]+"), val)
        elif op == "|=":
            pred = (v == F.lit(val)) | v.startswith(val + "-")
        elif op == "^=":
            pred = F.lit(bool(val)) & v.startswith(val)
        elif op == "$=":
            pred = F.lit(bool(val)) & v.endswith(val)
        elif op == "*=":
            pred = F.lit(bool(val)) & v.contains(val)
        else:
            raise CssError(f"unsupported attr operator {op!r}")
        return R.p_attr(name, pred)

    def nth_col(base, A, B):
        kind, pos = _nth_plan(A, B)
        if kind == "plain":
            return base(A, B)
        if kind == "exclude":
            out = base(A, B)
            for p in pos:
                out = out & ~base(0, p)
            return out
        if not pos:
            return F.lit(False)
        out = base(0, pos[0])
        for p in pos[1:]:
            out = out | base(0, p)
        return out

    def simple_col(simple, comp_tag):
        """Column for a simple, or None when it needs the join algebra
        (:not)."""
        k = simple[0]
        if k == "tag":
            return R.p_tag(simple[1])
        if k == "universal":
            return R.p_element()
        if k == "id":
            return R.p_id(simple[1])
        if k == "class":
            return R.p_class(simple[1])
        if k == "attr":
            return attr_col(simple[1], simple[2], simple[3])
        if k == "first-child":
            return R.p_first_child()
        if k == "last-child":
            return R.p_last_child()
        if k == "only-child":
            return R.p_first_child() & R.p_last_child()
        if k == "root":
            return R.p_root()
        if k == "only-of-type":
            if comp_tag is None:
                raise CssError(
                    ":only-of-type needs a type selector in its "
                    "compound (the engine's nth-of-type is "
                    "tag-parameterized)")
            return (R.p_nth_of_type(0, 1, comp_tag)
                    & R.p_nth_last_of_type(0, 1, comp_tag))
        if k == "nth-child":
            return nth_col(R.p_nth_child, simple[1], simple[2])
        if k == "nth-last-child":
            return nth_col(R.p_nth_last_child, simple[1], simple[2])
        if k in ("nth-of-type", "nth-last-of-type"):
            if comp_tag is None:
                raise CssError(
                    f":{k} needs a type selector in its compound (the "
                    "engine's nth-of-type is tag-parameterized)")
            ctor = (R.p_nth_of_type if k == "nth-of-type"
                    else R.p_nth_last_of_type)
            return nth_col(
                lambda a, b: ctor(a, b, comp_tag), simple[1], simple[2])
        if k in ("first-of-type", "last-of-type"):
            if comp_tag is None:
                raise CssError(
                    f":{k} needs a type selector in its compound (the "
                    "engine's nth-of-type is tag-parameterized)")
            ctor = (R.p_nth_of_type if k == "first-of-type"
                    else R.p_nth_last_of_type)
            return ctor(0, 1, comp_tag)
        if k == "is":
            # fuses to one OR Column when every branch is pure-column;
            # None sends the compound to the join algebra
            return is_cols(simple[1])
        if k in ("not", "has", "empty"):
            return None
        raise CssError(f"unsupported simple selector {k!r}")

    def fuse_cols(simples):
        """The compound-to-Column recipe, single-sourced for standalone
        compounds AND :is branches: one AND conjunction (element-ness
        added when no simple implies it), or None when any simple needs
        the join algebra (:not/:has/:empty or a join-needing nested
        :is)."""
        conj = None
        if not any(_implies_element(x) for x in simples):
            conj = R.p_element()
        ct = _compound_tag(simples)
        for sm in simples:
            col = simple_col(sm, ct)  # nested :is recurses here
            if col is None:
                return None
            conj = col if conj is None else conj & col
        return conj

    def is_cols(branches):
        """One OR Column for :is(...) when every branch fuses, else
        None."""
        outs = []
        for comp in branches:
            conj = fuse_cols(comp)
            if conj is None:
                return None
            outs.append(conj)
        out = outs[0]
        for col in outs[1:]:
            out = out | col
        return out

    def has_branch_rel(comb, comp):
        inner = compile_compound(comp)
        if comb == " ":
            return R.has_descendant_rel(inner)
        if comb == ">":
            return R.has_child_rel(inner)
        anchor = R.where(R.p_element())
        if comb == "+":
            return R.precede_adjacent_rel(anchor, inner)
        return R.precede_rel(anchor, inner)

    def compile_compound(simples):
        conj = fuse_cols(simples)
        if conj is not None:  # pure-column compound: one pushed filter
            return R.where(conj)
        comp_tag = _compound_tag(simples)
        cols, joins = [], []
        if not any(_implies_element(x) for x in simples):
            cols.append(R.p_element())
        for sm in simples:
            col = simple_col(sm, comp_tag)
            if col is not None:
                cols.append(col)
            elif sm[0] == "not":  # anti-join in the algebra
                joins.append(R.not_rel(compile_compound(sm[1])))
            elif sm[0] == "empty":
                joins.append(R.not_rel(R.has_child_rel(
                    R.where(~R.p_node_type("comment")))))
            elif sm[0] == "is":  # some branch needs the join algebra
                branch_sels = [compile_compound(c) for c in sm[1]]
                joins.append(branch_sels[0] if len(branch_sels) == 1
                             else R.or_rel(*branch_sels))
            elif sm[0] == "has":
                branch_sels = [has_branch_rel(c, comp) for c, comp in sm[1]]
                joins.append(branch_sels[0] if len(branch_sels) == 1
                             else R.or_rel(*branch_sels))
            else:  # pragma: no cover — parser emits no other join kind
                raise CssError(f"unsupported simple selector {sm[0]!r}")
        sels = []
        if cols:
            conj = cols[0]
            for col in cols[1:]:
                conj = conj & col
            sels.append(R.where(conj))
        sels.extend(joins)
        return sels[0] if len(sels) == 1 else R.and_rel(*sels)

    combinators = {
        " ": R.descendant_rel, ">": R.child_rel,
        "+": R.follow_adjacent_rel, "~": R.follow_rel,
    }

    def compile_ast(ast):
        kind = ast[0]
        if kind == "or":
            sels = [compile_ast(c) for c in ast[1]]
            return sels[0] if len(sels) == 1 else R.or_rel(*sels)
        _, head, chain = ast
        cur = compile_compound(head)
        for comb, comp in chain:
            cur = combinators[comb](cur, compile_compound(comp))
        return cur

    ast = parse_css(s)
    inner = compile_ast(ast)
    if not _ast_uses_of_type(ast):
        return inner

    def with_rank(nodes):
        if "tag_sib_pos" not in nodes.columns:
            nodes = R.with_type_rank(nodes)
        return inner(nodes)

    return with_rank
