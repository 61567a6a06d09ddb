"""Single-process pandas/numpy oracle.

The correctness reference demanded by the north rule: feature vectors produced
by the distributed engine must be ``numpy.allclose`` to this oracle (the
analogue of the reference's Matlab golden intermediates,
/root/reference/rp_extract.py:539-675). Deliberately naive and sequential:
plain pandas groupby-apply / rolling loops, scipy.stats moments — a different
code path from the engine (no shared windowing code beyond the schema).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rp_extract_ray.schema import STAT_NAMES


def _token_count(text: str) -> int:
    # re.ASCII so \w/\s match the engine's RE2 (pyarrow) and DuckDB semantics
    import re

    return len(re.findall(r"\w+|[^\w\s]", text or "", flags=re.ASCII))


def oracle_enrich(pdf: pd.DataFrame, session_gap_s: float = 1800.0) -> pd.DataFrame:
    """Sorted per-turn frame with text_len/token_est/gap_s/session_id — the
    oracle for stages.turns + stages.lag + stages.session."""
    out = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    out["text_len"] = out["text"].fillna("").map(len)
    out["token_est"] = out["text"].fillna("").map(_token_count)
    rows = []
    for _, g in out.groupby("conv_id", sort=False):
        g = g.copy()
        gap = g["ts"].diff().dt.total_seconds().fillna(0.0)
        g["gap_s"] = gap
        g["session_id"] = (gap > session_gap_s).cumsum().astype(np.int32)
        rows.append(g)
    return pd.concat(rows, ignore_index=True)


def _stats7(arr: np.ndarray) -> list[float]:
    """Reference 7-stat kernel semantics (population moments, Pearson
    kurtosis = scipy.stats.kurtosis(fisher=False), NaN->0;
    /root/reference/rp_extract.py:218-232). Moments written out longhand so
    this stays an independent code path from the engine kernel."""
    mu = float(np.mean(arr))
    dev = arr - mu
    m2 = float(np.mean(dev**2))
    m3 = float(np.mean(dev**3))
    m4 = float(np.mean(dev**4))
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = np.divide(m3, m2**1.5)
        kurt = np.divide(m4, m2**2)
    vals = [
        mu,
        m2,
        float(skew),
        float(kurt),
        float(np.median(arr)),
        float(np.min(arr)),
        float(np.max(arr)),
    ]
    return [0.0 if np.isnan(v) else v for v in vals]


def oracle_window_features(
    pdf_enriched: pd.DataFrame,
    series_cols=("text_len", "token_est", "gap_s"),
    k: int = 16,
    pctl=(25.0, 75.0),
) -> pd.DataFrame:
    """Per-turn sliding-window stats via an explicit per-row loop (slow,
    obviously-correct)."""
    out = pdf_enriched.copy()
    ncols = {}
    for c in series_cols:
        for s in STAT_NAMES:
            ncols[f"{c}_w{s}"] = []
        for p in pctl:
            ncols[f"{c}_wp{int(p)}"] = []
    for _, g in out.groupby("conv_id", sort=False):
        for c in series_cols:
            v = g[c].to_numpy(dtype=np.float64)
            for i in range(len(v)):
                w = v[max(0, i - k + 1) : i + 1]
                st = _stats7(w)
                for s, val in zip(STAT_NAMES, st):
                    ncols[f"{c}_w{s}"].append(val)
                q = np.percentile(w, pctl)
                for j, p in enumerate(pctl):
                    ncols[f"{c}_wp{int(p)}"].append(
                        0.0 if np.isnan(q[j]) else float(q[j])
                    )
    for name, vals in ncols.items():
        out[name] = vals
    return out


def oracle_lags(
    pdf_enriched: pd.DataFrame, value_cols, lags=(1,), leads=()
) -> pd.DataFrame:
    out = pdf_enriched.copy()
    g = out.groupby("conv_id", sort=False)
    for c in value_cols:
        for k in lags:
            out[f"{c}_lag{k}"] = g[c].shift(k)
        for k in leads:
            out[f"{c}_lead{k}"] = g[c].shift(-k)
    return out


def oracle_rhythm(
    pdf_enriched: pd.DataFrame,
    series_cols=("text_len", "token_est", "gap_s"),
    seg_len: int = 16,
    step_width: int = 1,
    skip: int = 1,
    n_mod: int = 60,
    log_transform: bool = True,
    weighting: bool = True,
) -> dict:
    """Per-conv rhythm features via explicit loops (independent of the engine
    kernels): returns {conv_id: {rp, rh, rh2, mvd, ssd, tssd, trh,
    n_segments, segments: [...]}}."""
    out = {}
    import math

    nfft = 2 ** max(
        math.ceil(math.log2(max(seg_len, 1))), math.ceil(math.log2(2 * n_mod + 1))
    )
    f = np.arange(1, n_mod + 1, dtype=np.float64)
    wcurve = 1.0 / (f / 4.0 + 4.0 / f)
    for cid, g in pdf_enriched.groupby("conv_id", sort=False):
        n = len(g)
        # segment plan (reference M4 semantics)
        if n < seg_len:
            out[cid] = {"n_segments": 0, "n_turns": n}
            continue
        stride = seg_len * step_width
        sk = skip
        usable = n - 2 * sk * seg_len
        if usable < seg_len:
            sk, stride = 0, seg_len
            usable = n
        m = (usable - seg_len) // stride + 1
        plan = [sk * seg_len + stride * j for j in range(m)]
        series = np.stack([g[c].to_numpy(dtype=np.float64) for c in series_cols])
        if log_transform:
            series = np.log1p(np.maximum(series, 0.0))
        segs = []
        for p in plan:
            B = series[:, p : p + seg_len]
            ssd = np.concatenate([_stats7(B[i]) for i in range(B.shape[0])])
            mag = np.abs(np.fft.rfft(B, n=nfft, axis=1))[:, 1 : n_mod + 1] / seg_len
            rh = mag.sum(axis=0)
            magw = mag * wcurve[None, :] if weighting else mag
            rh2 = magw.sum(axis=0)
            rp = magw.reshape(-1)
            # MVD on PRE-weighting magnitudes (reference rp_extract.py:713-716)
            mvd = np.concatenate([_stats7(mag[:, i]) for i in range(n_mod)])
            segs.append({"ssd": ssd, "rh": rh, "rh2": rh2, "rp": rp, "mvd": mvd})
        rp_m = np.median(np.stack([s["rp"] for s in segs]), axis=0)
        rh_m = np.median(np.stack([s["rh"] for s in segs]), axis=0)
        ssd_mat = np.stack([s["ssd"] for s in segs])
        rh_mat = np.stack([s["rh"] for s in segs])
        out[cid] = {
            "n_segments": m,
            "n_turns": n,
            "plan": plan,
            "segments": segs,
            "rp": rp_m,
            "rh": rh_m,
            "ssd": ssd_mat.mean(axis=0),
            "mvd": np.stack([s["mvd"] for s in segs]).mean(axis=0),
            "tssd": np.concatenate([_stats7(ssd_mat[:, i]) for i in range(ssd_mat.shape[1])]),
            "trh": np.concatenate([_stats7(rh_mat[:, i]) for i in range(rh_mat.shape[1])]),
        }
    return out


def oracle_asof(
    left: pd.DataFrame,
    right: pd.DataFrame,
    entity_col="conv_id",
    ts_col="ts",
    value_cols=("value",),
    direction="backward",
    tolerance_s=None,
) -> pd.DataFrame:
    l = left.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    r = right.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    return pd.merge_asof(
        l,
        r[[entity_col, ts_col, *value_cols]],
        on=ts_col,
        by=entity_col,
        direction=direction,
        tolerance=tol,
    )
