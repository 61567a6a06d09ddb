"""Lag / lead / gap / forward-fill (backfill) within entity, vectorized.

These are the point-in-time primitives of the engine (SURVEY.md §7.2-4). All
functions here operate on an entity-sorted partition frame (as delivered by
``stages.partition.partitioned_apply``) using entity-boundary masks — one
numpy shift per feature over the whole partition, never a per-entity loop.

Causality: ``lag_k``/``gap``/``ffill`` read only rows at or before the current
row; they are safe under salted chunking with ``overlap >= k``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.stages.partition import SaltSpec, partitioned_apply


def _run_ends(starts: np.ndarray) -> np.ndarray:
    """Per-row exclusive end index of this row's entity run."""
    n = len(starts)
    if n == 0:
        return starts.astype(np.int64)
    change = np.empty(n, dtype=bool)
    change[:-1] = starts[1:] != starts[:-1]
    change[-1] = True
    bounds = np.flatnonzero(change) + 1  # exclusive end of each run
    run_id = np.cumsum(np.concatenate([[False], change[:-1]]))
    return bounds[run_id]


def shifted(values: np.ndarray, k: int, starts: np.ndarray) -> np.ndarray:
    """``values[i-k]`` where ``i-k`` stays inside this row's entity run, else
    NaN/NaT/None. Positive ``k`` is a lag; negative ``k`` is a lead (reads the
    future — only for explicitly non-point-in-time columns)."""
    n = len(values)
    idx = np.arange(n) - k
    valid = idx >= starts if k >= 0 else idx < _run_ends(starts)
    if values.dtype.kind in ("M", "m"):
        out = np.full(n, np.datetime64("NaT"), dtype=values.dtype)
    elif values.dtype == object:
        out = np.full(n, None, dtype=object)
    else:
        out = np.full(n, np.nan, dtype=np.float64)
        values = values.astype(np.float64, copy=False)
    src = np.clip(idx, 0, max(n - 1, 0))
    out[valid] = values[src][valid]
    return out


def gap_seconds(ts: np.ndarray, starts: np.ndarray, fill_first: float = 0.0) -> np.ndarray:
    """Seconds since the previous turn of the same entity; ``fill_first`` at
    entity starts (the reference's first-sample convention)."""
    ts_i = ts.astype("datetime64[us]").astype(np.int64)
    n = len(ts_i)
    gap = np.empty(n, dtype=np.float64)
    gap[1:] = (ts_i[1:] - ts_i[:-1]) / 1e6
    gap[0] = fill_first
    is_start = np.arange(n) == starts
    gap[is_start] = fill_first
    return gap


def ffill_within(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Forward-fill NaN within each entity run (backfill primitive): last
    non-null value at or before each row, never crossing an entity boundary."""
    n = len(values)
    v = values.astype(np.float64, copy=True)
    has = ~np.isnan(v)
    idx = np.where(has, np.arange(n), -1)
    idx = np.maximum.accumulate(idx)
    valid = (idx >= 0) & (idx >= starts)
    out = np.full(n, np.nan)
    out[valid] = v[idx[valid]]
    return out


def ewma_within(
    values: np.ndarray, starts: np.ndarray, alpha: float, window: int
) -> np.ndarray:
    """Bounded-window exponentially weighted mean within each entity run.

    ``ewma_t = Σ_{j<window} (1-α)^j · x_{t-j} / Σ_{j} (1-α)^j`` over the rows
    of the same run (position-distance weights; NaN inputs contribute
    nothing, their weight drops from the denominator — pandas
    ``ewm(adjust=True)`` semantics restricted to the window). Bounding the
    window keeps every weight ≥ (1-α)^{window-1}: the unbounded recursion's
    scaled-cumsum vectorization overflows float64 past ~6k rows, and a
    64-row window already carries >1-1e-6 of the mass at α=0.2.

    Vectorized as ``window`` full-array shifts — no per-entity loop; causal
    (reads only rows at or before t), safe under salting with
    ``overlap >= window - 1``.
    """
    v = values.astype(np.float64, copy=False)
    n = len(v)
    num = np.zeros(n)
    den = np.zeros(n)
    for j in range(window):
        w = (1.0 - alpha) ** j
        s = v if j == 0 else shifted(v, j, starts)
        m = ~np.isnan(s)
        num[m] += w * s[m]
        den[m] += w
    out = np.full(n, np.nan)
    nz = den > 0
    out[nz] = num[nz] / den[nz]
    return out


def cumulative_within(
    pdf: pd.DataFrame, starts: np.ndarray, col: str
) -> dict[str, np.ndarray]:
    """Running (unbounded-preceding) sum / count / min / max of ``col``
    within each entity run — SQL ``ROWS UNBOUNDED PRECEDING`` semantics,
    null values skipped. Count is cumsum-minus-run-base (pure numpy, exact
    in int64); the float sum uses pandas' C groupby cumsum keyed by the run
    start index, NOT the partition-global cumsum-minus-base trick — the
    global prefix mixes every earlier entity's magnitudes into the
    subtraction, so one entity with ~1e9 values catastrophically cancels a
    later entity's ~1e1 sums (caught by the feature_matrix
    future-poisoning test). Min/max likewise use groupby cummin/cummax."""
    v = pdf[col].to_numpy(dtype=np.float64)
    notnull = ~np.isnan(v)
    cn = np.cumsum(notnull.astype(np.int64))
    base_n = cn[starts] - notnull[starts].astype(np.int64)
    g = pd.Series(v).groupby(starts)
    csum = (
        pd.Series(np.where(notnull, v, 0.0)).groupby(starts).cumsum().to_numpy()
    )
    return {
        f"{col}_csum": csum,
        f"{col}_ccount": cn - base_n,
        f"{col}_cmin": g.cummin().to_numpy(),
        f"{col}_cmax": g.cummax().to_numpy(),
    }


def rolling_quantile_within(
    values: np.ndarray, starts: np.ndarray, k: int, q: float
) -> np.ndarray:
    """Trailing ``k``-row quantile of ``values`` within each entity run —
    SQL ``quantile_cont(q) OVER (... ROWS k-1 PRECEDING AND CURRENT ROW)``
    semantics (``median`` is ``q=0.5``): linear interpolation between order
    statistics, window NULLs skipped, min_periods=1 (a run's first row sees
    a 1-row window).

    Vectorized as ``k`` full-array shifts stacked into an (n, k) matrix and
    ONE ``np.nanquantile`` along axis 1 — no per-entity or per-row loop.
    Positions before the run start land as NaN in the matrix, which is
    exactly the "window clipped at the entity boundary" semantics. Causal
    (reads rows at or before t only); safe under salting with
    ``overlap >= k - 1``. Memory is the k× value copy — callers pick small
    windows (k ≤ ~64) per the same bound as ``ewma_within``.
    """
    import warnings

    v = values.astype(np.float64, copy=False)
    mat = np.stack(
        [v if j == 0 else shifted(v, j, starts) for j in range(k)], axis=1
    )
    with warnings.catch_warnings():
        # all-NaN window (current value null at a run start) -> NaN, the
        # SQL "window holds only NULLs -> NULL" case; suppress the warning
        warnings.simplefilter("ignore", category=RuntimeWarning)
        return np.nanquantile(mat, q, axis=1)


def add_rolling_quantile(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    k: int,
    q: float = 0.5,
    suffix: str | None = None,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
    salt: SaltSpec | None = None,
) -> Dataset:
    """Append the trailing ``k``-row quantile_cont(``q``) of each value
    column per entity (default suffix ``_rq50`` style from ``q``). One
    entity-hash exchange via ``partitioned_apply``; the kernel is
    :func:`rolling_quantile_within`. The robust-smoothing counterpart of
    ``add_ewma_features`` — a rolling median is the outlier-resistant
    trend feature a mean/EWMA can't give (reference analogue: the
    per-segment median aggregation of M20, rp_extract.py per SURVEY.md
    §2.3, generalized to a causal sliding window)."""
    if salt is not None and salt.overlap < k - 1:
        raise ValueError(f"salt.overlap={salt.overlap} < window horizon {k - 1}")
    sfx = suffix if suffix is not None else f"_rq{int(round(q * 100))}"

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        for c in value_cols:
            pdf[f"{c}{sfx}"] = rolling_quantile_within(
                pdf[c].to_numpy(dtype=np.float64), starts, k, q
            )
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions, salt=salt,
    )


def rank_within(
    pdf: pd.DataFrame, starts: np.ndarray, col: str
) -> dict[str, np.ndarray]:
    """SQL ``rank()`` / ``percent_rank()`` of ``col`` over the WHOLE entity
    run (not causal — a ranking feature, not a point-in-time one; document
    accordingly where used). Ties share the min rank; percent_rank =
    (rank-1)/(n-1), 0 for single-row runs."""
    g = pdf.groupby(starts, sort=False)[col]
    rank = g.rank(method="min").to_numpy()
    sizes = g.transform("size").to_numpy(dtype=np.float64)
    pr = np.where(sizes > 1, (rank - 1) / np.maximum(sizes - 1, 1), 0.0)
    return {f"{col}_rank": rank.astype(np.int64), f"{col}_prank": pr}


def rolling_corr_within(
    x: np.ndarray, y: np.ndarray, starts: np.ndarray, k: int
) -> np.ndarray:
    """Trailing-window Pearson correlation of two columns within each
    entity run (SQL ``corr(x, y) OVER (... ROWS k-1 PRECEDING)``): k
    shifted full-array views accumulate the five windowed sums — no
    per-entity loop; causal; salt-safe with ``overlap >= k - 1``. NULL
    (NaN) where the window has < 2 rows or either side has zero variance,
    matching DuckDB's windowed ``corr``. Assumes non-null inputs (the
    shifted NaNs here mark run boundaries, not data nulls)."""
    xf = x.astype(np.float64, copy=False)
    yf = y.astype(np.float64, copy=False)
    # rebase per run: corr is shift-invariant and raw magnitudes (epoch
    # seconds ~1e9) would eat float64 precision in the squared sums
    xf = xf - xf[starts]
    yf = yf - yf[starts]
    n_rows = len(xf)
    n = np.zeros(n_rows)
    sx = np.zeros(n_rows)
    sy = np.zeros(n_rows)
    for j in range(k):
        xs = shifted(xf, j, starts)
        n += ~np.isnan(xs)
        sx += np.nan_to_num(xs)
        sy += np.nan_to_num(shifted(yf, j, starts))
    with np.errstate(invalid="ignore", divide="ignore"):
        mx, my = sx / n, sy / n
    # second pass on window-mean-centered deviations: the one-pass
    # n*Σxy - ΣxΣy form cancels catastrophically for large-offset series
    # (measured: epoch-seconds y failed the 6-decimal oracle gate)
    cxy = np.zeros(n_rows)
    cxx = np.zeros(n_rows)
    cyy = np.zeros(n_rows)
    for j in range(k):
        xs = shifted(xf, j, starts)
        ys = shifted(yf, j, starts)
        dx = np.nan_to_num(xs - mx)
        dy = np.nan_to_num(ys - my)
        cxy += dx * dy
        cxx += dx * dx
        cyy += dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        out = cxy / np.sqrt(cxx * cyy)
    out[(n < 2) | (cxx <= 0) | (cyy <= 0)] = np.nan
    return out


def add_rolling_corr(
    ds: Dataset,
    x_col: str,
    y_col: str,
    *,
    k: int = 16,
    out_col: str | None = None,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
    salt: SaltSpec | None = None,
) -> Dataset:
    """Rolling correlation column ``<x>_<y>_corr`` (see
    :func:`rolling_corr_within`)."""
    if salt is not None and salt.overlap < k - 1:
        raise ValueError(f"salt.overlap={salt.overlap} < window horizon {k - 1}")
    out_col = out_col or f"{x_col}_{y_col}_corr"

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        pdf[out_col] = rolling_corr_within(
            pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), starts, k
        )
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions, salt=salt,
    )


def edge_values_within(
    pdf: pd.DataFrame, starts: np.ndarray, col: str
) -> dict[str, np.ndarray]:
    """SQL ``first_value()`` / ``last_value()`` of ``col`` over the WHOLE
    entity run in stream order (last_value with the full-frame
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING semantics).
    Pure indexing — ``starts`` already holds each row's run-start index and
    ``_run_ends`` its exclusive end; no group loop."""
    v = pdf[col].to_numpy()
    ends = _run_ends(starts)
    return {f"{col}_first": v[starts], f"{col}_last": v[ends - 1]}


def cume_dist_within(
    pdf: pd.DataFrame, starts: np.ndarray, col: str
) -> dict[str, np.ndarray]:
    """SQL ``cume_dist()`` of ``col`` within the entity run: fraction of run
    rows with value <= this row's (peer groups share the max rank).
    Null values follow ORDER BY's NULLS LAST — they are the final peer
    group, so their cume_dist is 1.0 (pandas rank leaves them NaN; the
    size transform already counts them in ``n``)."""
    g = pdf.groupby(starts, sort=False)[col]
    r = g.rank(method="max").to_numpy(dtype=np.float64)
    n = g.transform("size").to_numpy(dtype=np.float64)
    r = np.where(np.isnan(r), n, r)
    return {f"{col}_cumedist": r / n}


def add_edge_features(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    cume: bool = True,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
) -> Dataset:
    """first/last value (and optionally cume_dist) per entity run — the
    remaining SQL window-function family (non-causal whole-run features,
    like ``add_rank_features``; not salted: they read the full run)."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        for c in value_cols:
            for name, arr in edge_values_within(pdf, starts, c).items():
                pdf[name] = arr
            if cume:
                for name, arr in cume_dist_within(pdf, starts, c).items():
                    pdf[name] = arr
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def add_ewma_features(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    alpha: float = 0.2,
    window: int = 16,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
    salt: SaltSpec | None = None,
) -> Dataset:
    """EWMA column ``<c>_ewma`` per value column (see :func:`ewma_within`)."""
    if salt is not None and salt.overlap < window - 1:
        raise ValueError(f"salt.overlap={salt.overlap} < window horizon {window - 1}")

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        for c in value_cols:
            pdf[f"{c}_ewma"] = ewma_within(pdf[c].to_numpy(), starts, alpha, window)
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions, salt=salt,
    )


def add_cumulative_features(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
) -> Dataset:
    """Running sum/count/min/max per entity (unbounded window — not salted:
    the running state looks back arbitrarily far, like ffill)."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        for c in value_cols:
            for name, arr in cumulative_within(pdf, starts, c).items():
                pdf[name] = arr
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def add_rank_features(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
) -> Dataset:
    """Whole-entity rank/percent_rank per value column (non-causal)."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        for c in value_cols:
            for name, arr in rank_within(pdf, starts, c).items():
                pdf[name] = arr
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def make_lag_frame_fn(
    value_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    ffill_cols: Sequence[str] = (),
    gap: bool = True,
):
    """Build the per-partition fn computing lag/lead/gap/ffill columns."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if gap:
            pdf["gap_s"] = gap_seconds(pdf[ts_col].to_numpy(), starts)
        for c in value_cols:
            v = pdf[c].to_numpy()
            for k in lags:
                pdf[f"{c}_lag{k}"] = shifted(v, k, starts)
            for k in leads:
                pdf[f"{c}_lead{k}"] = shifted(v, -k, starts)
        for c in ffill_cols:
            pdf[f"{c}_ffill"] = ffill_within(pdf[c].to_numpy(dtype=np.float64), starts)
        return pdf

    return fn


def add_lag_features(
    ds: Dataset,
    value_cols: Sequence[str],
    *,
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    ffill_cols: Sequence[str] = (),
    gap: bool = True,
    num_partitions: int = 64,
    salt: SaltSpec | None = None,
) -> Dataset:
    if salt is not None:
        if ffill_cols:
            # forward-fill looks back UNBOUNDED (the last non-null can be
            # arbitrarily far); a salted chunk only carries `overlap` context
            raise ValueError("ffill is not causal-bounded; run it unsalted")
        horizon = max([*lags, 1])
        if salt.overlap < horizon:
            raise ValueError(
                f"salt.overlap={salt.overlap} < max lag horizon {horizon}"
            )
        if leads and salt.lead_overlap < max(leads):
            # backward ghosts give PAST context only; a lead at a chunk tail
            # needs the next chunk's head rows (forward ghosts) or it is
            # silently NaN where the unsalted path has real values
            raise ValueError(
                f"salt.lead_overlap={salt.lead_overlap} < max lead horizon "
                f"{max(leads)}; set SaltSpec(lead_overlap=...)"
            )
    fn = make_lag_frame_fn(
        value_cols, lags, leads, entity_col, ts_col, ffill_cols=ffill_cols, gap=gap
    )
    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols or (ts_col,),
        num_partitions=num_partitions,
        salt=salt,
    )


def transition_counts(
    ds,
    *,
    entity_col: str = "conv_id",
    state_col: str = "role",
    order_cols=("ts", "turn_idx"),
    num_partitions: int | None = None,
):
    """First-order transition matrix of a per-entity state sequence: counts
    of consecutive ``(state, next state)`` pairs in event order — the
    turn-taking / tool-chain structure miner for transcript corpora (which
    role follows which, which tool chains into which).

    One entity-hash exchange orders each entity's rows; consecutive pairs
    are a shifted-slice compare (runs never cross entities — the last row
    of each run is masked); per-partition pair counts merge through
    ``grouped_reduce``'s keyed exchange. Output: (from_state, to_state, n).
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"from_state": [], "to_state": [], "n": pd.Series([], dtype=np.int64)}
            )
        st = pdf[state_col].to_numpy()
        # a pair (i, i+1) is valid iff row i+1 belongs to the same run
        run_start = np.unique(starts)
        valid = np.ones(m - 1, dtype=bool)
        valid[run_start[1:] - 1] = False
        d = pd.DataFrame({"from_state": st[:-1][valid], "to_state": st[1:][valid]})
        g = d.groupby(["from_state", "to_state"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    partial = partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols,
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )
    return grouped_reduce(
        partial, ["from_state", "to_state"], {"n": ("n", "sum")}, combine_first=False
    )


def ntile_within(starts: np.ndarray, k: int) -> np.ndarray:
    """SQL ``NTILE(k)`` bucket of each row within its entity run, in the
    frame's (already sorted) row order: the first ``n % k`` buckets take
    ``n // k + 1`` rows, the rest ``n // k`` — exactly DuckDB/ANSI NTILE.
    Fully vectorized from the per-row run-start indices."""
    r = np.arange(len(starts), dtype=np.int64) - starts  # 0-based pos in run
    run_starts = np.unique(starts)
    sizes = np.diff(np.append(run_starts, len(starts)))
    n = np.repeat(sizes, sizes).astype(np.int64)  # run size per row
    q, rem = n // k, n % k
    big_span = rem * (q + 1)
    in_big = r < big_span
    bucket = np.where(
        in_big,
        r // np.maximum(q + 1, 1),
        rem + (r - big_span) // np.maximum(q, 1),
    )
    return (bucket + 1).astype(np.int64)


def add_ntile(
    ds: Dataset,
    k: int,
    *,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    out_col: str = "tile",
    num_partitions: int = 64,
) -> Dataset:
    """Append the NTILE(k)-by-order bucket per entity (one exchange)."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        pdf[out_col] = ntile_within(starts, k)
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def longest_streak(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    state_col: str = "role",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = 64,
) -> Dataset:
    """Per entity: the longest run of consecutive equal ``state_col`` values
    in event order, and that state (ties -> the earliest run) — the
    repetition / loop-detection miner for transcript curation (an agent
    stuck calling the same tool shows up as a long streak).

    One entity exchange; run lengths are one vectorized diff/cumsum pass
    (gaps-and-islands on value changes), the per-entity argmax a single
    ordered groupby head."""
    import numpy as np

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        m = len(pdf)
        if m == 0:
            return pd.DataFrame(
                {entity_col: [], "streak_state": [],
                 "streak_len": pd.Series([], dtype=np.int64)}
            )
        st = pdf[state_col].to_numpy()
        is_run_start = np.zeros(m, dtype=bool)
        is_run_start[np.unique(starts)] = True
        brk = is_run_start.copy()
        brk[1:] |= st[1:] != st[:-1]
        island = np.cumsum(brk) - 1
        ilen = np.bincount(island)
        istart = np.flatnonzero(brk)
        d = pd.DataFrame(
            {
                entity_col: pdf[entity_col].to_numpy()[istart],
                "streak_state": st[istart],
                "streak_len": ilen.astype(np.int64),
            }
        )
        # earliest-longest per entity: stable sort by length desc only
        d = d.sort_values("streak_len", ascending=False, kind="mergesort")
        return (
            d.groupby(entity_col, sort=False).head(1).reset_index(drop=True)
        )

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def throttle_keep_mask(
    ts_us: np.ndarray, new_run: np.ndarray, gap_us: int
) -> np.ndarray:
    """Sequential throttle: within each run (``new_run`` marks run starts;
    ``ts_us`` ascending within runs), keep a row iff its ts is strictly
    more than ``gap_us`` after the last KEPT row — the true stateful fold
    (rate-limit / alert-throttle), unlike the lag-gap debounce whose window
    is measured from the previous event kept-or-not.

    The fold is inherently sequential per run, but the loop advances by
    ``searchsorted`` jumps from kept row to kept row — iteration count =
    number of KEPT rows, which is bounded by ``run_time_span / gap_us``
    per run regardless of event density. That is the scale contract: cost
    follows output size (throttled events), not input rows.
    """
    n = len(ts_us)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    bounds = np.flatnonzero(new_run)
    ends = np.concatenate([bounds[1:], [n]])
    for s, e in zip(bounds, ends):
        run = ts_us[s:e]
        i = s
        while i < e:
            keep[i] = True
            # first index strictly past the kept row's window
            i = s + int(np.searchsorted(run, ts_us[i] + gap_us, side="right"))
    return keep


def rolling_distinct_within(
    codes: np.ndarray,
    starts: np.ndarray,
    k: int,
    valid: np.ndarray | None = None,
) -> np.ndarray:
    """Distinct count of ``codes`` over the trailing ``k``-row window
    within each run (``starts`` = per-row run-start indices, the
    partitioned_apply contract) — the per-entity windowed-cardinality
    feature (distinct actions/tools/pages in the last k turns).

    Vectorized as k(k-1)/2 shifted-view equality comparisons: window
    position i-d counts iff it is the LAST occurrence of its value inside
    the window (no nearer position d' < d holds the same code) and lies
    inside the row's run (d <= i - starts[i]). O(k^2) full-column numpy
    ops, no Python row loop — the right trade for the small window sizes
    this feature uses (k <= ~32); larger windows want a per-run sort-based
    kernel instead.

    ``valid`` (optional bool mask): positions marked False are NULL codes —
    they never count toward the distinct total and never suppress another
    position (SQL ``list_distinct`` drops NULLs; a NaN-cast int64 sentinel
    would otherwise count as a phantom code).
    """
    n = len(codes)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    if valid is None:
        valid = np.ones(n, dtype=bool)
    depth = np.arange(n, dtype=np.int64) - starts

    def shifted(arr: np.ndarray, d: int, fill) -> np.ndarray:
        if d == 0:
            return arr
        s = np.empty(n, dtype=arr.dtype)
        s[:d] = fill
        s[d:] = arr[:-d]
        return s

    kk = min(k, n)
    views = [shifted(codes, d, 0) for d in range(kk)]
    vviews = [shifted(valid, d, False) for d in range(kk)]
    for d in range(kk):
        in_run = depth >= d
        dup = np.zeros(n, dtype=bool)
        for d2 in range(d):
            dup |= (views[d] == views[d2]) & vviews[d2]
        out += (in_run & vviews[d] & ~dup).astype(np.int64)
    return out
