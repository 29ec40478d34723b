"""Shared brute-force oracle helpers for the ExactSubstr / repetition
tests: ONE tokenizer regex and ONE interval-merge twin, so a semantics
change cannot silently diverge between test files (they import from here;
the third implementation under test is functions/spans.merge_token_spans)."""

from __future__ import annotations

import re

TOK = re.compile(r"[a-z_][a-z0-9_]*")


def tok(t: str) -> list[str]:
    return TOK.findall(t.lower())


def merge(ps: list[int], L: int) -> list[tuple[int, int]]:
    """Sorted-position interval merge, twin of merge_token_spans
    (adjacent spans merge: p == last end is contiguous)."""
    out: list[list[int]] = []
    for p in sorted(ps):
        if out and p <= out[-1][1]:
            out[-1][1] = max(out[-1][1], p + L)
        else:
            out.append([p, p + L])
    return [tuple(x) for x in out]
