"""Shared ASCII-case-insensitive regex builders — the single source
for every op that matches known-ASCII needles case-insensitively
(soft404 error phrases, paywall teasers, tech-stack fingerprints).

Per-letter ``[Xx]`` classes instead of ``(?i)``: Java's inline flag
folds ASCII only while RE2's applies Unicode simple folding (U+017F
ſ folds to 's' in RE2 alone), so ``(?i)`` would let the two engines
disagree on non-ASCII subjects. Explicit classes are byte-identical
in both (the soft404 lesson).
"""

from __future__ import annotations

__all__ = ["ascii_ci_phrase", "ascii_ci_literal"]


def ascii_ci_phrase(phrase: str) -> str:
    """Case-class pattern for a needle KNOWN to be regex-safe
    (letters, digits, spaces): non-alpha chars pass through
    unescaped. Use :func:`ascii_ci_literal` for arbitrary needles."""
    return "".join(
        f"[{c.upper()}{c.lower()}]" if c.isalpha() else c
        for c in phrase
    )


def ascii_ci_literal(needle: str) -> str:
    """Case-class pattern for an arbitrary ASCII needle: alpha chars
    become classes, ``[0-9_/-]`` stay literal, everything else is
    backslash-escaped (Java ∩ RE2 both accept escaping any
    punctuation)."""
    out = []
    for c in needle:
        if c.isalpha():
            out.append(f"[{c.upper()}{c.lower()}]")
        elif c.isdigit() or c in "-_/":
            out.append(c)
        else:
            out.append("\\" + c)
    return "".join(out)
