"""Sliding-window statistical descriptor stage (SSD-analogue).

Re-derivation of the reference's Statistical Spectrum Descriptor over
transcripts: at every turn ``(conv_id, ts)`` compute the 7-stat summary
(mean, population var, skew, Pearson kurtosis, median, min, max — NaN->0;
/root/reference/rp_extract.py:218-232) of each tracked per-turn series over
the window of the last K turns of the same conversation (expanding until K at
conversation start), plus p25/p75 percentiles. One feature row per input turn
— the reference's ``return_segment_features=True`` point-in-time mode
(/root/reference/rp_extract.py:797-800) generalized to every turn.

Zero temporal leakage by construction: the window matrix for row *i* is built
exclusively from rows ``i-K+1..i`` of the sorted partition, masked to this
row's entity run — no future row can enter (verified by the future-poisoning
property test, SURVEY.md §5c).

Vectorization: ONE ``sliding_window_view`` over the whole sorted partition per
series, entity-boundary cells masked to NaN, then the NaN-aware 7-stat kernel
along axis 1. No per-conversation Python loop.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view

from ray.data import Dataset

from rp_extract_ray.functions.stats import nan_sorted_percentiles, seven_stats_nan
from rp_extract_ray.schema import DEFAULT_WINDOW_TURNS, STAT_NAMES, TRACKED_SERIES
from rp_extract_ray.stages.lag import gap_seconds
from rp_extract_ray.stages.partition import SaltSpec, partitioned_apply

PCTL = (25.0, 75.0)


def window_matrix(series: np.ndarray, k: int, starts: np.ndarray) -> np.ndarray:
    """(N, K) matrix: row i = series[i-k+1..i], cells outside row i's entity
    run set to NaN. Left edge padded with NaN."""
    n = len(series)
    padded = np.concatenate([np.full(k - 1, np.nan), series.astype(np.float64, copy=False)])
    w = sliding_window_view(padded, k).copy()  # row i covers source rows i-k+1..i
    src = np.arange(n)[:, None] - (k - 1) + np.arange(k)[None, :]
    w[src < starts[:, None]] = np.nan
    return w


def window_stat_columns(
    pdf_sorted: pd.DataFrame,
    series_cols: Sequence[str],
    k: int,
    starts: np.ndarray,
    pctl: Sequence[float] = PCTL,
) -> dict[str, np.ndarray]:
    """Compute {series}_w{stat} columns for a sorted partition frame."""
    out: dict[str, np.ndarray] = {}
    for c in series_cols:
        w = window_matrix(pdf_sorted[c].to_numpy(dtype=np.float64), k, starts)
        cnt = (~np.isnan(w)).sum(axis=1)
        sorted_w = np.sort(w, axis=1)  # one sort feeds median/min/max/pctl
        stats = seven_stats_nan(w, sorted_w=sorted_w, cnt=cnt)
        for j, s in enumerate(STAT_NAMES):
            out[f"{c}_w{s}"] = stats[:, j]
        out[f"{c}_wcount"] = cnt.astype(np.int64)
        if len(pctl):
            q = nan_sorted_percentiles(sorted_w, cnt, np.asarray(pctl))
            for j, p in enumerate(pctl):
                out[f"{c}_wp{int(p)}"] = q[j]
    return out


def make_window_frame_fn(
    series_cols: Sequence[str] = TRACKED_SERIES,
    k: int = DEFAULT_WINDOW_TURNS,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    add_gap: bool = True,
    pctl: Sequence[float] = PCTL,
):
    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if add_gap and "gap_s" not in pdf.columns:
            pdf["gap_s"] = gap_seconds(pdf[ts_col].to_numpy(), starts)
        cols = window_stat_columns(pdf, series_cols, k, starts, pctl)
        return pdf.assign(**cols)

    return fn


def add_window_features(
    ds: Dataset,
    series_cols: Sequence[str] = TRACKED_SERIES,
    *,
    k: int = DEFAULT_WINDOW_TURNS,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    pctl: Sequence[float] = PCTL,
    num_partitions: int = 64,
    salt: SaltSpec | None = None,
) -> Dataset:
    """Append per-turn sliding-window features. With ``salt``, requires
    ``salt.overlap >= k``: a window reaches k-1 rows back, and the gap_s of
    its earliest member needs one predecessor more — the first ghost row's
    gap is uncomputable and must stay outside every real row's window."""
    if salt is not None and salt.overlap < k:
        raise ValueError(f"salt.overlap={salt.overlap} < k={k}: windows would truncate")
    fn = make_window_frame_fn(series_cols, k, entity_col, ts_col, pctl=pctl)
    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols or (ts_col, "turn_idx"),
        num_partitions=num_partitions,
        salt=salt,
    )
