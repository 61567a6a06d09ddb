"""Fluctuation (modulation-spectrum) kernels — RP/RH/MVD analogues.

Re-derivation of the reference's rhythm feature math over per-turn series
instead of bark-band sonograms:

* 2nd FFT over the window's time axis, zero-padded to a power of two,
  DC excluded, magnitudes kept for mod-frequency bins ``1..n_mod``
  (/root/reference/rp_extract.py:689-711, ``mod_ampl_limit``).
* Fluctuation-strength weighting curve ``w(f) = 1/(f/4 + 4/f)`` peaking at
  4 cycles per unit (/root/reference/rp_extract.py:726-739).
* RH = sum of the (pre-weighting) modulation magnitudes across series
  (/root/reference/rp_extract.py:719-721); RH2 = same post-weighting
  (:745-747); MVD = 7-stat summary per mod-frequency across series
  (:714-716).

"Series" here (text_len, token_est, gap_s, ...) play the role of the
reference's 24 bark bands; "turns" play the role of spectrogram frames.
"""

from __future__ import annotations

import numpy as np

from rp_extract_ray.functions.stats import seven_stats
from rp_extract_ray.schema import N_MOD_FREQ


def nextpow2(n: int) -> int:
    """Smallest p with 2**p >= n (/root/reference/rp_extract.py:109-122)."""
    return int(np.ceil(np.log2(max(n, 1))))


def modulation_spectrum(
    segments: np.ndarray, n_mod: int = N_MOD_FREQ
) -> np.ndarray:
    """|FFT| over the turn axis of segment matrices.

    ``segments``: (m, n_series, seg_len) float64 — m segment windows.
    Returns (m, n_series, n_mod): magnitude at mod-frequency bins 1..n_mod
    (DC excluded), zero-padded so at least ``n_mod`` positive bins exist.
    Normalized by segment length (the reference's fixed /256,
    /root/reference/rp_extract.py:705 — here made length-invariant).
    """
    m, n_series, seg = segments.shape
    nfft = 2 ** max(nextpow2(seg), nextpow2(2 * n_mod + 1))
    spec = np.fft.rfft(segments, n=nfft, axis=2)
    mag = np.abs(spec[:, :, 1 : n_mod + 1]) / seg
    return mag


def fluctuation_weights(n_mod: int = N_MOD_FREQ, mod_freq_res: float = 1.0) -> np.ndarray:
    """Weighting curve over mod-frequency bins 1..n_mod, peak at 4 units
    (/root/reference/rp_extract.py:726-739)."""
    f = (np.arange(1, n_mod + 1, dtype=np.float64)) * mod_freq_res
    return 1.0 / (f / 4.0 + 4.0 / f)


def rhythm_features_for_segments(
    segments: np.ndarray,
    n_mod: int = N_MOD_FREQ,
    weighting: bool = True,
    mod_freq_res: float = 1.0,
    filterbank: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Per-segment rhythm descriptor set.

    Returns dict with (flattened, series-major where 2-D):
      ``rp``  (m, n_series*n_mod)  — weighted modulation matrix
      ``rh``  (m, n_mod)           — pre-weighting sum across series
      ``rh2`` (m, n_mod)           — post-weighting sum across series
      ``mvd`` (m, n_mod*7)         — 7 stats per mod-freq across series
      ``ssd`` (m, n_series*7)      — 7 stats per series over raw turns
    """
    m, n_series, _seg = segments.shape
    ssd = np.stack(
        [seven_stats(segments[j]).reshape(-1) for j in range(m)]
    ) if m else np.empty((0, n_series * 7))
    mag = modulation_spectrum(segments, n_mod)
    if filterbank is not None:
        # M10 analogue: compress the mod-freq axis through triangular bands
        mag = mag @ filterbank.T
        n_mod = filterbank.shape[0]
    rh = mag.sum(axis=1)  # pre-weighting (/root/reference/rp_extract.py:719-721)
    # MVD from PRE-weighting magnitudes, like the reference (rp_extract.py:713-716
    # runs calc_statistical_features before the fluctuation-strength loop at :726)
    mvd = (
        np.stack([seven_stats(mag[j].T).reshape(-1) for j in range(m)])
        if m
        else np.empty((0, n_mod * 7))
    )
    if weighting:
        mag = mag * fluctuation_weights(n_mod, mod_freq_res)[None, None, :]
    rh2 = mag.sum(axis=1)
    rp = mag.reshape(m, n_series * n_mod)
    return {"rp": rp, "rh": rh, "rh2": rh2, "mvd": mvd, "ssd": ssd}


def segment_plan(
    n_turns: int,
    seg_len: int,
    step_width: int = 1,
    skip_leadin_fadeout: int = 1,
) -> np.ndarray:
    """Segment start offsets (analogue of the reference's window plan,
    /root/reference/rp_extract.py:484-514).

    Long inputs skip ``skip_leadin_fadeout`` segments at each end and stride
    ``seg_len*step_width``; inputs too short for that fall back to skip=0 /
    stride=seg_len (the reference's short-file fallback, :493-505); inputs
    shorter than one segment yield no positions (the caller records the conv
    in the errors sidecar — the reference raises at :511-514).
    """
    if n_turns < seg_len:
        return np.empty(0, dtype=np.int64)
    stride = seg_len * step_width
    skip = skip_leadin_fadeout
    usable = n_turns - 2 * skip * seg_len
    if usable < seg_len:
        skip, stride = 0, seg_len
        usable = n_turns
    m = (usable - seg_len) // stride + 1
    return skip * seg_len + stride * np.arange(m, dtype=np.int64)
