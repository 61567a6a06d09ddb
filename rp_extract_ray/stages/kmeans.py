"""Distributed Lloyd k-means over an embedding column.

The iterative-algorithm pattern the Dataset API can't express alone: small
mutable state (the k×d centroid matrix) lives on the driver, is broadcast
per round via ``ray.put``, and each round is ONE ``map_batches`` pass whose
partials are k rows per block (cluster sums + counts) — the only data that
ever leaves a worker. Assignment math is a single BLAS matmul per batch
(distance via the expanded |x|²-2x·c+|c|² form); no shuffle at any point,
so the per-round cost is a linear scan regardless of cluster count.

The reference has no clustering (its only trained state is the KNN
classifier, classes_io.py per SURVEY.md §2.4/ST3); k-means is the seed
step for IVF similarity search (stages/simsearch.py uses a driver-sample
fit — this is the full-corpus scale path) and for embedding-space corpus
bucketing in curation pipelines.

Determinism: seeds are the vectors of the ``n_clusters`` smallest ids
(found with a map-side top-k prune, no sort shuffle), rounds are fixed
(no data-dependent early stop), empty clusters keep their centroid, and
ties in argmin resolve to the lowest cluster id. Partial sums merge
additively, so results are partition-invariant up to float-sum ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from rp_extract_ray.stages.simsearch import _as_matrix


def _seed_centroids(
    ds: Dataset, vec_col: str, id_col: str, n_clusters: int
) -> np.ndarray:
    """Vectors of the n_clusters smallest ids: per-block top-k prune, tiny
    driver merge (same shape as pipelines/relational.distributed_topk)."""

    def small(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[(id_col, "ascending")])
        return b.take(idx[:n_clusters])

    seed = (
        ds.select_columns([id_col, vec_col])
        .map_batches(small, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col, ignore_index=True)
        .head(n_clusters)
    )
    return np.stack(seed[vec_col].to_numpy()).astype(np.float64)


def kmeans_lloyd(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    n_iter: int = 5,
) -> np.ndarray:
    """Fit and return the (n_clusters, d) centroid matrix."""
    C = _seed_centroids(ds, vec_col, id_col, n_clusters)
    k = len(C)
    scols = [f"s{i}" for i in range(C.shape[1])]
    vecs = ds.select_columns([vec_col])

    for _ in range(n_iter):
        ref = ray.put(C)

        def partial(b: pa.Table) -> pd.DataFrame:
            Cl = ray.get(ref)
            X = _as_matrix(b.column(vec_col)).astype(np.float64)
            d2 = (X * X).sum(1)[:, None] - 2.0 * X @ Cl.T + (Cl * Cl).sum(1)[None, :]
            a = d2.argmin(1)
            onehot = a[:, None] == np.arange(k)[None, :]
            sums = onehot.T.astype(np.float64) @ X
            out = pd.DataFrame(sums, columns=scols)
            out.insert(0, "cluster", np.arange(k, dtype=np.int64))
            out["n"] = onehot.sum(0).astype(np.int64)
            return out

        parts = vecs.map_batches(partial, batch_format="pyarrow").to_pandas()
        merged = parts.groupby("cluster", sort=True).sum()
        n = merged["n"].to_numpy()
        sums = merged[scols].to_numpy()
        nz = n > 0
        C = C.copy()
        C[nz] = sums[nz] / n[nz, None]
    return C


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> Dataset:
    """Append nearest-centroid ids (pure map over the broadcast matrix)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    # stateless TASKS, not an actor pool: ray.get of the broadcast matrix is
    # a cheap local object-store read, and a task pool scales to every free
    # CPU instead of a fixed actor count (and never operator-fuses with /
    # caps upstream stages) — same rationale as the asof broadcast path
    def assign(b: pa.Table) -> pa.Table:
        C = ray.get(ref)
        X = _as_matrix(b.column(vec_col)).astype(np.float64)
        d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
        a = d2.argmin(1).astype(np.int64)
        return b.append_column(out_col, pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow")
