"""SQL-compatible rounding.

``numpy.round`` rounds half-to-even (banker's); SQL ``ROUND`` (DuckDB,
Postgres) rounds half away from zero. Exact halfway cases are common for
ratios of small integers (e.g. 105/128 = 0.8203125), so every float column
that is compared against a SQL oracle must round half-AWAY on the Ray side.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Element-wise round-half-away-from-zero to ``decimals`` places.

    Precision domain: exact w.r.t. decimal semantics while
    ``|x| * 10**decimals`` stays well inside 2**52 (beyond that the scaling
    multiply itself rounds — the same double-precision limit SQL ROUND has).
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**decimals
    # "+ 0.0" collapses -0.0 to +0.0: the driver's value hash compares BITS,
    # and a skew that rounds to zero from below must hash like the oracle's
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale + 0.0
