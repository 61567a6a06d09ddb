"""Unit-cost Levenshtein edit distance, numpy row-DP.

The exact-verify kernel for prefix-blocked fuzzy dedup
(stages/dedup.edit_distance_pairs). Unit costs (insertion,
deletion, substitution all 1) over Unicode CODEPOINTS — note DuckDB's
``levenshtein`` counts UTF-8 BYTES, so the SQL oracle agrees exactly on
ASCII text (the driver corpus) and counts multi-byte substitutions
higher; the codepoint definition is the linguistically meaningful one. Reference analogue: none (the reference
has no string-similarity op); this is part of the brief's dedup family.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Edit distance between two strings.

    Row DP with the inner row fully vectorized: the substitution/deletion
    candidates are one ``np.minimum`` over the previous row, and the
    left-to-right insertion dependency ``cur[j] = min(cand[j], cur[j-1]+1)``
    collapses to a single ``np.minimum.accumulate`` via the standard
    ``t[j] - j`` transform (cur[j] = j + min_{k<=j}(t[k] - k)). O(len(a))
    Python iterations, O(len(a)*len(b)) work — fine for the truncated
    (≤ a few hundred chars) texts the blocked verify feeds it.
    """
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    if len(ca) == 0:
        return len(cb)
    if len(cb) == 0:
        return len(ca)
    if len(ca) < len(cb):  # fewer Python iterations over the shorter side
        ca, cb = cb, ca
    j = np.arange(len(cb) + 1, dtype=np.int64)
    prev = j.copy()
    t = np.empty(len(cb) + 1, dtype=np.int64)
    for i, ch in enumerate(ca, 1):
        t[0] = i
        np.minimum(prev[:-1] + (cb != ch), prev[1:] + 1, out=t[1:])
        t -= j
        np.minimum.accumulate(t, out=t)
        t += j
        prev, t = t, prev
    return int(prev[-1])
