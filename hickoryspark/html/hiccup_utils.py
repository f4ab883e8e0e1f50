"""Hiccup-form utilities: CSS tag sugar + normalization.

Port of /root/reference/src/cljc/hickory/hiccup_utils.cljc semantics:
tag-well-formed? (:38-66), tag-name (:68-81), class-names (:83-106),
id (:108-119), expand-content-seqs (:121-146), normalize-element
(:148-172; map attrs REPLACE tag-sugar attrs, comment at 169-170),
normalize-form (:174-193).

Hiccup forms here are Python lists [tag, attrs?, child...]; tags are
strings (Clojure keywords/symbols map to their name strings).
"""

from __future__ import annotations

from collections.abc import Iterator


def _name(tag) -> str:
    if isinstance(tag, str):
        return tag
    # the reference requires a named value (keyword/symbol/string,
    # hiccup_utils.cljc) — a list/None/number tag is a malformed form;
    # stringifying it would render repr garbage into HTML
    raise ValueError(f"Not a valid hiccup tag: {tag!r}")


def _first_idx(a: int, b: int) -> int:
    """Lesser index that is not -1 (hiccup_utils.cljc:5-20)."""
    if a == -1:
        return b
    if b == -1:
        return a
    return min(a, b)


def split_keep_trailing_empty(s: str, sep: str) -> list[str]:
    """Split keeping trailing empty strings (hiccup_utils.cljc:30-36)."""
    return s.split(sep)


def tag_well_formed(tag_elem) -> bool:
    """hiccup_utils.cljc:38-66 — validates ':div#id.c1.c2' sugar."""
    s = _name(tag_elem)
    hash_idx = s.find("#")
    dot_idx = s.find(".")
    tag_cutoff = _first_idx(hash_idx, dot_idx)
    if len(s) == 0:
        return False
    if tag_cutoff != -1 and tag_cutoff <= 0:
        return False
    if hash_idx != -1:
        if s.find("#", hash_idx + 1) != -1:  # at most one id
            return False
        next_dot = s.find(".", hash_idx + 1)
        if not (hash_idx + 1 < _first_idx(next_dot, len(s))):  # nonempty id
            return False
    if hash_idx != -1 and dot_idx != -1 and not hash_idx < dot_idx:
        return False  # id must come before classes
    if dot_idx != -1:
        classes = s[dot_idx + 1 :]
        if not all(len(c) > 0 for c in split_keep_trailing_empty(classes, ".")):
            return False
    return True


def tag_name(tag_elem) -> str:
    """hiccup_utils.cljc:68-81."""
    s = _name(tag_elem)
    cutoff = _first_idx(s.find("#"), s.find("."))
    return s if cutoff == -1 else s[:cutoff]


def class_names(tag_elem) -> list[str]:
    """hiccup_utils.cljc:83-106."""
    s = _name(tag_elem)
    classes: list[str] = []
    curr_dot = s.find(".")
    while curr_dot != -1:
        next_dot = s.find(".", curr_dot + 1)
        next_hash = s.find("#", curr_dot + 1)
        cutoff = _first_idx(next_dot, next_hash)
        if cutoff == -1:
            classes.append(s[curr_dot + 1 :])
        else:
            classes.append(s[curr_dot + 1 : cutoff])
        curr_dot = next_dot
    return classes


def tag_id(tag_elem) -> str | None:
    """hiccup_utils.cljc:108-119 (named ``id`` in the reference)."""
    s = _name(tag_elem)
    hash_idx = s.find("#")
    if hash_idx == -1:
        return None
    next_dot = s.find(".", hash_idx)
    if next_dot == -1:
        return s[hash_idx + 1 :]
    return s[hash_idx + 1 : next_dot]


def expand_content_seqs(content) -> list:
    """hiccup_utils.cljc:121-146 — splice generator/iterator children one
    level deep. Python analogue of seq?: non-list, non-string iterables
    (generators, tuples-as-seqs are kept; we treat generators/iterators
    as seqs, vectors/lists as nodes)."""
    result: list = []
    for item in content:
        if isinstance(item, (Iterator, range)):
            result.extend(item)
        else:
            result.append(item)
    return result


def normalize_element(hiccup_form) -> list:
    """hiccup_utils.cljc:148-172. Map attrs replace tag-sugar attrs."""
    tag_elem = hiccup_form[0]
    content = list(hiccup_form[1:])
    if not tag_well_formed(tag_elem):
        raise ValueError(
            f"Invalid input: Tag element{_name(tag_elem)}is not well-formed."
        )
    t_name = tag_name(tag_elem).lower()
    t_classes = class_names(tag_elem)
    t_id = tag_id(tag_elem)
    tag_attrs = {"id": t_id, "class": " ".join(t_classes) if t_classes else None}
    if content and isinstance(content[0], dict):
        map_attrs, content = content[0], content[1:]
    else:
        map_attrs = None
    attrs = dict(tag_attrs)
    if map_attrs:
        attrs.update(map_attrs)
    return [t_name, attrs, *content]


def normalize_form(form):
    """hiccup_utils.cljc:174-193 — recursive normalization, iteratively."""
    if isinstance(form, str):
        return form
    root = normalize_element(form)
    root[2:] = expand_content_seqs(root[2:])
    # Iterative recursion over vector children.
    stack = [root]
    while stack:
        node = stack.pop()
        for i in range(2, len(node)):
            child = node[i]
            if isinstance(child, (list, tuple)):  # tuples are forms too
                norm = normalize_element(list(child))
                norm[2:] = expand_content_seqs(norm[2:])
                node[i] = norm
                stack.append(norm)
    return root
