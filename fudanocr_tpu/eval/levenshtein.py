"""Host-side Levenshtein rectification of decoded sequences.

Equivalent of stroke-level-decomposition/util.py:44-47,176-182: if a decoded
stroke string is not a legal decomposition, snap it to the nearest legal one
by edit distance. Runs on host, outside the device hot loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

try:
    import Levenshtein as _lev

    def edit_distance(a: str, b: str) -> int:
        return _lev.distance(a, b)
except ImportError:  # pragma: no cover — Levenshtein is baked in here
    def edit_distance(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]


class SequenceRectifier:
    """Snap decoded strings to the nearest member of a legal-sequence set."""

    def __init__(self, legal_sequences: Sequence[str]):
        self.legal = list(legal_sequences)
        self.legal_set = set(self.legal)

    def __call__(self, s: str) -> str:
        if s in self.legal_set:
            return s
        best, best_d = s, None
        for cand in self.legal:
            d = edit_distance(s, cand)
            if best_d is None or d < best_d:
                best, best_d = cand, d
        return best
