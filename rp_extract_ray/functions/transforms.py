"""Per-series transform kernels — the psychoacoustic-chain analogues.

The reference's extraction chain applies a sequence of toggleable transforms
to each band matrix before the modulation FFT (M10-M14,
/root/reference/rp_extract.py:240-375): mel filterbank projection, spectral
masking, dB, phon (piecewise table interpolation), sone (piecewise power
curve). The transcript analogues here operate on per-turn series / modulation
bins and are plain vectorized numpy, broadcastable into any stage:

* :func:`triangular_filterbank` — M10: project n input bins onto m
  overlapping triangular bands (a mel-like compression of the
  modulation-frequency axis).
* :func:`piecewise_table_map` — M13: np.interp against a small lookup table
  (the phon equal-loudness analogue; table broadcast to workers as a
  constant).
* :func:`compressive_map` — M14: the sone-style piecewise map
  ``2**((x-a)/b)`` above a knee, power law below.
"""

from __future__ import annotations

import numpy as np


def triangular_filterbank(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix of overlapping triangular bands covering the
    input bins (uniform centers; the mel analogue for modulation bins —
    /root/reference/rp_extract.py:240-277 does the same with librosa)."""
    if n_out < 1 or n_in < 2:
        raise ValueError("need n_in >= 2 and n_out >= 1")
    centers = np.linspace(0, n_in - 1, n_out + 2)
    fb = np.zeros((n_out, n_in))
    x = np.arange(n_in, dtype=np.float64)
    for j in range(n_out):
        lo, c, hi = centers[j], centers[j + 1], centers[j + 2]
        up = (x - lo) / max(c - lo, 1e-9)
        down = (hi - x) / max(hi - c, 1e-9)
        fb[j] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def apply_filterbank(mat: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """Project the last axis of ``mat`` through the filterbank (matrix
    multiply — one BLAS call per batch, constants broadcast)."""
    return mat @ fb.T


def piecewise_table_map(
    x: np.ndarray, table_x: np.ndarray, table_y: np.ndarray
) -> np.ndarray:
    """Piecewise-linear lookup-table transform (the phon-curve analogue,
    /root/reference/rp_extract.py:326-365): vectorized np.interp with
    clamped ends."""
    return np.interp(x, table_x, table_y)


def compressive_map(x: np.ndarray, knee: float = 40.0, div: float = 10.0, p: float = 2.642) -> np.ndarray:
    """Sone-style piecewise map (/root/reference/rp_extract.py:369-375):
    ``2**((x-knee)/div)`` for x >= knee else ``(x/knee)**p``."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        lo = np.power(np.maximum(x, 0.0) / knee, p)
    return np.where(x >= knee, 2.0 ** ((x - knee) / div), lo)
