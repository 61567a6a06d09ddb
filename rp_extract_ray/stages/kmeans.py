"""Distributed Lloyd k-means over an embedding column.

The iterative-algorithm pattern the Dataset API can't express alone: small
mutable state (the k×d centroid matrix) lives on the driver and is broadcast
per round, while the corpus stays PINNED in the object store. This is the
documented "drop to raw Ray tasks" case — a Dataset re-execution per Lloyd
round would re-read the parquet and re-convert the ``list<float>`` column
k×n_iter times and pay the streaming executor's fixed startup once per
round. Instead:

1. ONE ``materialize()`` of the (id, vector) projection — the only Dataset
   execution in the fit; blocks live in the (spillable) object store.
2. ONE pre-conversion task per block turning the Arrow list column into a
   float64 matrix (``_as_matrix`` flatten+reshape, no per-element work);
   the (ids, X) pair is stored once and mapped zero-copy into every round.
3. Per round: one ``@ray.remote`` partial task per block returning k rows
   (cluster sums + counts) — the only data that ever leaves a worker — with
   a fan-in tree merge (``_MERGE_FAN``-ary) so the driver never holds more
   than a handful of k×d partials regardless of block count. Assignment
   math is a single BLAS matmul per block (expanded |x|²-2x·c+|c|² form);
   no shuffle at any point.

The reference has no clustering (its only trained state is the KNN
classifier, classes_io.py per SURVEY.md §2.4/ST3); k-means is the seed
step for IVF similarity search (stages/simsearch.py uses a driver-sample
fit — this is the full-corpus scale path) and for embedding-space corpus
bucketing in curation pipelines.

Determinism: seeds are the vectors of the ``n_clusters`` smallest ids
(found with a per-block top-k prune, no sort shuffle), rounds are fixed
(no data-dependent early stop), empty clusters keep their centroid, ties
in argmin resolve to the lowest cluster id, and partials merge additively
in stable block order, so results are partition-invariant up to float-sum
ordering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.stages.simsearch import _as_matrix

_MERGE_FAN = 64


@ray.remote
def _prep_block(id_col: str, vec_col: str, *tbls: pa.Table):
    """Arrow block(s) → (ids int64, X float64 matrix), stored once per group.

    Accepts several input blocks so tiny materialized blocks coalesce into
    one pinned matrix — per-round task count tracks ROWS, not however many
    slivers the read produced."""
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    X = _as_matrix(tbl.column(vec_col)).astype(np.float64)
    return ids, X


@ray.remote
def _seed_partial(blk, n_clusters: int):
    """Per-block prune: the n_clusters smallest ids and their vectors."""
    ids, X = blk
    if len(ids) == 0:
        return ids, X
    kk = min(n_clusters, len(ids))
    part = np.argpartition(ids, kk - 1)[:kk]
    order = part[np.argsort(ids[part], kind="stable")]
    return ids[order], X[order]


@ray.remote
def _round_partial(blk, C: np.ndarray):
    """One Lloyd assignment pass over a pinned block: k×(d+1) partials."""
    ids, X = blk
    k = len(C)
    if X.shape[0] == 0:
        return np.zeros((k, C.shape[1])), np.zeros(k, dtype=np.int64)
    d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
    a = d2.argmin(1)
    onehot = a[:, None] == np.arange(k)[None, :]
    sums = onehot.T.astype(np.float64) @ X
    return sums, onehot.sum(0).astype(np.int64)


@ray.remote
def _seed_merge(n_clusters: int, *parts):
    """Keep the n_clusters smallest ids across a group of seed partials."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 1))
    ids = np.concatenate([p[0] for p in parts])
    X = np.concatenate([p[1] for p in parts], axis=0)
    order = np.argsort(ids, kind="stable")[:n_clusters]
    return ids[order], X[order]


@ray.remote
def _merge_partials(*parts):
    sums = parts[0][0].copy()
    counts = parts[0][1].copy()
    for s, n in parts[1:]:
        sums += s
        counts += n
    return sums, counts


def _tree_merge(refs: list):
    """Fan-in merge so the driver fetches O(_MERGE_FAN) partials, not O(B)."""
    while len(refs) > _MERGE_FAN:
        refs = [
            _merge_partials.remote(*refs[i : i + _MERGE_FAN])
            for i in range(0, len(refs), _MERGE_FAN)
        ]
    return ray.get(_merge_partials.remote(*refs)) if len(refs) > 1 else ray.get(refs[0])


def _pinned_blocks(ds: Dataset, id_col: str, vec_col: str) -> list:
    """Materialize the (id, vector) projection and pre-convert each block.

    The ONE full Dataset execution of the fit. Multi-pass algorithms earn
    their cache: the projection is the two columns Lloyd's actually reads,
    blocks stay in the object store (spilling, not driver heap), and each
    is converted to a numpy matrix exactly once instead of once per round.
    """
    mat = ds.select_columns([id_col, vec_col]).materialize()
    refs = mat.to_arrow_refs()
    # coalesce sliver blocks: one pinned matrix per ~TARGET_ROWS rows (a
    # 64-d float64 matrix at 65k rows is ~32 MB — object-store friendly),
    # capped at the natural block count so big corpora stay 1:1
    target_rows = 65536
    groups = max(1, min(len(refs), -(-mat.count() // target_rows)))
    step = -(-len(refs) // groups)
    return [
        _prep_block.remote(id_col, vec_col, *refs[i : i + step])
        for i in range(0, len(refs), step)
    ]


def _seed_centroids(blocks: list, n_clusters: int) -> np.ndarray:
    """Vectors of the n_clusters smallest ids: per-block prune, tiny
    driver merge (same shape as pipelines/relational.distributed_topk)."""
    refs = [_seed_partial.remote(b, n_clusters) for b in blocks]
    while len(refs) > _MERGE_FAN:
        refs = [
            _seed_merge.remote(n_clusters, *refs[i : i + _MERGE_FAN])
            for i in range(0, len(refs), _MERGE_FAN)
        ]
    _, X = ray.get(_seed_merge.remote(n_clusters, *refs))
    return X.astype(np.float64)


def kmeans_lloyd(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    n_iter: int = 5,
) -> np.ndarray:
    """Fit and return the (n_clusters, d) centroid matrix."""
    blocks = _pinned_blocks(ds, id_col, vec_col)
    C = _seed_centroids(blocks, n_clusters)
    for _ in range(n_iter):
        cref = ray.put(C)
        refs = [_round_partial.remote(b, cref) for b in blocks]
        sums, n = _tree_merge(refs)
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
