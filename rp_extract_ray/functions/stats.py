"""Statistical summary kernels.

Re-derivation of the reference's 7-stat kernel ``calc_statistical_features``
(/root/reference/rp_extract.py:218-232): per row of a 2-D matrix compute
mean, population variance (float64), population skew, PEARSON kurtosis
(``fisher=False`` — Matlab convention), median, min, max; any NaN in the
result (e.g. skew/kurt of a zero-variance row) becomes 0.

Two variants:

* :func:`seven_stats` — dense matrix, stats along ``axis``; exact reference
  semantics (used for MVD/TSSD/TRH-analogue stats-of-stats).
* :func:`seven_stats_nan` — NaN-aware along axis 1; NaN cells mark "outside
  the window" (sliding windows at conversation starts are shorter than K).
  This is what lets the sliding-window SSD stage run fully vectorized over a
  whole partition with conversation-boundary masking instead of a Python loop
  per row (a hot-path requirement; SURVEY.md §7.3).

All moments are population moments (``bias=True`` in scipy terms), matching
``scipy.stats.skew`` / ``scipy.stats.kurtosis(fisher=False)`` defaults used by
the reference.
"""

from __future__ import annotations

import numpy as np

from rp_extract_ray.schema import N_STATS


def seven_stats(matrix: np.ndarray, axis: int = 1) -> np.ndarray:
    """7-stat summary per row (axis=1) or column (axis=0) of ``matrix``.

    Returns shape ``(matrix.shape[1-axis], 7)`` float64, columns ordered as
    :data:`rp_extract_ray.schema.STAT_NAMES`. NaN -> 0 like the reference
    (/root/reference/rp_extract.py:230).
    """
    m = np.asarray(matrix, dtype=np.float64)
    if axis == 0:
        m = m.T
    if m.ndim != 2:
        raise ValueError(f"expected 2-D matrix, got shape {m.shape}")
    n = m.shape[1]
    out = np.empty((m.shape[0], N_STATS), dtype=np.float64)
    mean = m.mean(axis=1)
    dev = m - mean[:, None]
    m2 = np.mean(dev * dev, axis=1)
    m3 = np.mean(dev**3, axis=1)
    m4 = np.mean(dev**4, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = m3 / m2**1.5
        kurt = m4 / (m2 * m2)  # Pearson (fisher=False)
    out[:, 0] = mean
    out[:, 1] = m2  # population variance, ddof=0 (np.var default)
    out[:, 2] = skew
    out[:, 3] = kurt
    out[:, 4] = np.median(m, axis=1)
    out[:, 5] = m.min(axis=1) if n else np.nan
    out[:, 6] = m.max(axis=1) if n else np.nan
    out[np.isnan(out)] = 0.0
    return out


def nan_sorted_percentiles(
    sorted_w: np.ndarray, cnt: np.ndarray, qs: np.ndarray
) -> np.ndarray:
    """Percentiles (numpy 'linear' interpolation) from a row-sorted window
    matrix whose NaNs sit at the row ends. ``cnt`` = valid count per row.
    Returns (len(qs), N); rows with cnt==0 yield 0.0.

    This replaces ``np.nanpercentile``/``np.nanmedian`` on 2-D input, which
    fall back to a Python loop per row (``apply_along_axis``) — the single
    ``np.sort`` path is ~100x faster on (N, K) window matrices.
    """
    n = sorted_w.shape[0]
    rows = np.arange(n)
    safe = np.maximum(cnt, 1)
    out = np.empty((len(qs), n), dtype=np.float64)
    for i, q in enumerate(np.asarray(qs, dtype=np.float64)):
        pos = (safe - 1) * (q / 100.0)
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        vals = sorted_w[rows, lo] * (1.0 - frac) + sorted_w[rows, hi] * frac
        out[i] = np.where(cnt > 0, vals, 0.0)
    return out


def seven_stats_nan(
    windows: np.ndarray, sorted_w: np.ndarray | None = None, cnt: np.ndarray | None = None
) -> np.ndarray:
    """NaN-aware 7-stat summary along axis 1 of a ``(N, K)`` window matrix.

    NaN cells are "not in this window" (masked by conversation boundaries).
    Rows that are entirely NaN yield all-zero stats. Output ``(N, 7)``.
    ``sorted_w``/``cnt`` may be passed in when the caller already sorted the
    matrix (shared with the percentile computation).
    """
    w = np.asarray(windows, dtype=np.float64)
    if w.ndim != 2:
        raise ValueError(f"expected 2-D window matrix, got shape {w.shape}")
    valid = ~np.isnan(w)
    if cnt is None:
        cnt = valid.sum(axis=1)
    cnt = np.asarray(cnt)
    safe_cnt = np.maximum(cnt, 1.0)
    filled0 = np.where(valid, w, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = filled0.sum(axis=1) / safe_cnt
        dev = np.where(valid, w - mean[:, None], 0.0)
        m2 = (dev * dev).sum(axis=1) / safe_cnt
        m3 = (dev**3).sum(axis=1) / safe_cnt
        m4 = (dev**4).sum(axis=1) / safe_cnt
        skew = m3 / m2**1.5
        kurt = m4 / (m2 * m2)
    if sorted_w is None:
        sorted_w = np.sort(w, axis=1)  # NaNs sort to the row end
    n = w.shape[0]
    rows = np.arange(n)
    last = np.maximum(cnt, 1) - 1
    out = np.empty((n, N_STATS), dtype=np.float64)
    out[:, 0] = mean
    out[:, 1] = m2
    out[:, 2] = skew
    out[:, 3] = kurt
    out[:, 4] = nan_sorted_percentiles(sorted_w, cnt, np.array([50.0]))[0]
    out[:, 5] = sorted_w[:, 0]          # min = first sorted
    out[:, 6] = sorted_w[rows, last]    # max = last valid
    empty = cnt == 0
    if empty.any():
        out[empty] = 0.0
    out[np.isnan(out)] = 0.0
    return out


def standardize_params(mean: np.ndarray, var: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean, std) with zero-variance columns mapped to std=1 — sklearn
    ``StandardScaler`` convention used by the reference
    (/root/reference/rp_classify.py:28-37)."""
    std = np.sqrt(np.asarray(var, dtype=np.float64))
    std = np.where(std == 0.0, 1.0, std)
    return np.asarray(mean, dtype=np.float64), std
