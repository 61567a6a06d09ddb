"""Distributed PCA over an embedding column.

Scale shape: the ONLY distributed work is one map pass emitting bounded
moment partials per block — n (scalar), Σx (d), ΣxxT (d×d, 32 KB at
d=64) — that the driver combines into the covariance matrix (the same
bounded-partial pattern as ``stages/kmeans.py``); the eigendecomposition
is O(d³) driver-side math on a d×d matrix, and the projection is a
broadcast matmul per batch. No shuffle anywhere. At 100 TB the pass is
read-bound and the driver state stays d² doubles regardless of rows.

Correctness gates: the covariance matrix (the distributed part) against a
DuckDB ``covar_pop`` oracle; the eigenvalue spectrum against an
INDEPENDENT longhand Jacobi solver (pipelines/oracle_literals.py).
EigenVECTORS are not oracle-gated — on near-degenerate spectra (random
embeddings) they are numerically unstable under summation order — the
projection is property-tested instead (orthonormal components, variance
ordering, equality with a single-process PCA up to per-component sign).

Reference analogue: none (no linear algebra beyond the DSP transforms);
this is part of the brief's embedding-pipeline family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _as_matrix(col) -> np.ndarray:
    # shared zero-copy list/tensor-column -> (n, d) float64 kernel
    from rp_extract_ray.stages.simsearch import _as_matrix as _m

    return _m(col)


def covariance_moments(ds: Dataset, vec_col: str = "embedding"):
    """(n, mean (d,), cov (d,d)) — population covariance from one
    distributed pass of per-block (n, Σx, ΣxxT) partials."""

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:  # empty block: contribute nothing
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.binary()),
                    "ss": pa.array([], pa.binary()),
                }
            )
        X = _as_matrix(b.column(vec_col))
        s = X.sum(axis=0)
        ss = X.T @ X
        return pa.table(
            {
                "n": pa.array([len(X)], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "ss": pa.array([ss.tobytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("covariance_moments: empty input")
    s = None
    ss = None
    for srow, ssrow in zip(parts["s"], parts["ss"]):
        sv = np.frombuffer(srow, dtype=np.float64)
        ssv = np.frombuffer(ssrow, dtype=np.float64)
        s = sv if s is None else s + sv
        ss = ssv if ss is None else ss + ssv
    d = len(s)
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def embedding_covariance(
    ds: Dataset, vec_col: str = "embedding", *, round_to: int | None = 6
):
    """The d×d population covariance as a long (i, j, cov) pandas frame —
    the oracle-gated surface of the distributed moment pass."""
    import pandas as pd

    from rp_extract_ray.functions.rounding import round_half_away

    _, _, cov = covariance_moments(ds, vec_col)
    d = cov.shape[0]
    i, j = np.meshgrid(np.arange(d, dtype=np.int64), np.arange(d, dtype=np.int64), indexing="ij")
    c = cov.ravel()
    if round_to is not None:
        c = round_half_away(c, round_to) + 0.0  # -0.0 -> 0.0 (hash identity)
    return pd.DataFrame({"i": i.ravel(), "j": j.ravel(), "cov": c})


def pca_fit(ds: Dataset, k: int, vec_col: str = "embedding"):
    """(components (k,d) row-major, eigvals (k,), mean (d,)) — top-k
    principal axes by eigendecomposition of the driver-combined
    covariance. Deterministic sign convention: each component's
    largest-|value| entry is made positive."""
    _, mean, cov = covariance_moments(ds, vec_col)
    w, V = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(w)[::-1][:k]
    comps = V[:, idx].T
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return comps, w[idx], mean


def pca_project(
    ds: Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> Dataset:
    """Append the k-dim projection as a ``list<double>`` column — broadcast
    matmul per batch (ray.put once, zero-copy read per task)."""
    import ray

    ref = ray.put((components, mean))

    def proj(b: pa.Table) -> pa.Table:
        comps, mu = ray.get(ref)
        if len(b) == 0:
            return b.append_column(
                out_col, pa.array([], pa.list_(pa.float64()))
            )
        X = _as_matrix(b.column(vec_col))
        Z = (X - mu) @ comps.T
        return b.append_column(
            out_col, pa.array(list(Z), pa.list_(pa.float64()))
        )

    return ds.map_batches(proj, batch_format="pyarrow")
