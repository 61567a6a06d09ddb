"""Deterministic dataset splitting, corpus mixing, and value histograms.

The three everyday training-data-prep operators the reference has no
analogue for (its nearest is the driver-side train/test split inside
`classify.py` cross-validation — SURVEY.md §2.4 ST3, reference
rp_classify.py cross_validate):

* ``hash_split`` — assign every row to train/val/test by a Knuth
  multiplicative hash of a stable key. Zero shuffle, reproducible across
  runs AND cluster sizes (no RNG state), and exactly replicable in SQL so
  the oracle gates row-level assignments, not just counts. This is how
  100 TB corpora are split in practice: the split must not change when the
  file layout or worker count does, which rules out ``Dataset.split`` /
  ``random_sample`` (both partition-dependent).
* ``weighted_mix`` — per-source Bernoulli downsampling to target corpus
  mixing weights (the "wiki 3x, crawl 0.1x" recipe every LLM data pipeline
  runs). Same hash gate, thresholded per group; stateless vectorized
  filter, zero shuffle.
* ``value_histogram`` — fixed-width binning + per-bin count/sum. The
  distribution-profiling op behind quality-score cutoffs; one
  distinct-bins exchange via grouped_reduce (map-side combined), never a
  raw-row shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_KNUTH = np.uint64(2654435761)
_SEED_MIX = np.uint64(2654435769)
_MASK32 = np.uint64(0xFFFFFFFF)


def _hash32(keys: np.ndarray, seed: int) -> np.ndarray:
    """(key * 2654435761 + seed * 2654435769) mod 2^32 — the repo-wide
    deterministic sampling hash (stages/partition.py, pipelines/relational
    deterministic_sample); uint64 arithmetic, masked to 32 bits so the SQL
    oracle's BIGINT expression computes the identical value.

    Keys must be integer-valued (every split/mix caller casts to int64
    first). String ids should be mapped to a stable integer surrogate
    upstream — NOT hashed here with stable_hash, which would break the
    SQL-replicability contract these operators are built on."""
    return (
        keys.astype(np.uint64) * _KNUTH + np.uint64(seed) * _SEED_MIX
    ) & _MASK32


def hash_split(
    ds: Dataset,
    key_col: str,
    fractions: "list[tuple[str, float]]",
    *,
    seed: int = 1,
    split_col: str = "split",
    n_buckets: int = 10_000,
) -> Dataset:
    """Add ``split_col`` assigning each row to one of the named splits.

    ``fractions`` is an ordered list of ``(name, fraction)`` summing to 1.
    The hash bucket ``h(key) % n_buckets`` is compared against cumulative
    integer thresholds ``round(cumfrac * n_buckets)`` — integer cutoffs so
    the SQL CASE expression reproduces assignments bit-exactly. Rows with
    equal keys always land in the same split (leak-safe dedup-aware
    splitting when ``key_col`` is a document/group id).

    Scale: stateless per-batch ``np.searchsorted`` over the cutoff table;
    no shuffle, no driver state, assignment independent of partitioning.
    """
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = [n for n, _ in fractions]
    cuts, acc = [], 0.0
    for _, f in fractions:
        acc += f
        cuts.append(int(round(acc * n_buckets)))
    cuts[-1] = n_buckets  # close the last interval against fp drift
    cut_arr = np.asarray(cuts[:-1], dtype=np.int64)  # searchsorted edges

    def assign(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (_hash32(k, seed) % np.uint64(n_buckets)).astype(np.int64)
        idx = np.searchsorted(cut_arr, bucket, side="right")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx, type=pa.int32()), pa.array(names)
        ).cast(pa.string())
        return b.append_column(split_col, lab)

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_mix(
    ds: Dataset,
    key_col: str,
    group_col: str,
    weights: "dict[str, float]",
    *,
    default_rate: float = 1.0,
    seed: int = 1,
) -> Dataset:
    """Deterministic per-group Bernoulli mix: keep a row iff
    ``h(key) mod 2^32 < weight[group] * 2^32`` (groups absent from
    ``weights`` use ``default_rate``). Weights must be in [0, 1] — this is
    the downsampling half of corpus mixing; upsampling (weight > 1) is a
    separate replication op so row identity stays unique.

    Scale: the weight table is a bounded dict baked into the task closure
    (serialized once per task, not per batch); the filter is a stateless
    vectorized compare — zero shuffle, layout-independent.
    """
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0,1], got {w}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    # integer thresholds: floor(w * 2^32), same expression as the oracle
    thr = {g: np.uint64(int(w * 2**32)) for g, w in weights.items()}
    default_thr = np.uint64(int(default_rate * 2**32))

    def filt(b: pa.Table) -> pa.Table:
        import pandas as pd

        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = _hash32(k, seed)
        groups = b.column(group_col).to_pandas()
        t = (
            groups.map({g: int(v) for g, v in thr.items()})
            .fillna(int(default_thr))
            .to_numpy(dtype=np.uint64)
        )
        return b.filter(pa.array(h < t))

    return ds.map_batches(filt, batch_format="pyarrow")


def value_histogram(
    ds: Dataset,
    col: str,
    width: float,
    *,
    origin: float = 0.0,
    sum_col: str | None = "s",
    bin_col: str = "bin",
    count_col: str = "n",
    num_partitions: int | None = None,
) -> Dataset:
    """Fixed-width histogram: ``bin = floor((v - origin) / width)`` with
    per-bin row count and (optionally) value sum.

    Scale shape: the binning is a stateless vectorized map; the reduction
    rides ``grouped_reduce`` whose map-side combine shrinks the exchange to
    distinct-bins-per-block — the shuffle carries at most
    ``value_range / width`` rows per block regardless of data size (the
    same bounded-exchange argument as approx_quantiles' partial
    histograms, stages/groupops.py).
    """
    from rp_extract_ray.stages.groupops import grouped_reduce

    if not width > 0:
        raise ValueError(f"width must be > 0, got {width}")

    def binit(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor((v - origin) / width).astype(np.int64)
        cols = {bin_col: pa.array(bins)}
        if sum_col is not None:
            cols["_v"] = pa.array(v)
        return pa.table(cols)

    how = {count_col: (bin_col, "count")}
    if sum_col is not None:
        how[sum_col] = ("_v", "sum")
    return grouped_reduce(
        ds.map_batches(binit, batch_format="pyarrow"),
        bin_col,
        how,
        num_partitions=num_partitions,
    )


def replicate_weighted(
    ds: Dataset,
    key_col: str,
    group_col: str,
    weights: "dict[str, float]",
    *,
    default_weight: float = 1.0,
    seed: int = 1,
) -> Dataset:
    """Deterministic upsampling — the other half of corpus mixing
    (``weighted_mix`` handles weights <= 1): every row is emitted
    ``floor(w)`` times plus one more iff ``h(key) mod 2^32 <
    frac(w) * 2^32``, so a source with weight 2.5 contributes each doc
    twice and half the docs (hash-chosen, layout-independent) a third
    time. Expected multiplicity is exactly ``w``; the assignment is
    reproducible across runs, partitionings, and cluster sizes.

    Scale: stateless per-batch ``np.repeat`` over row indices — zero
    shuffle; the weight table is a bounded closure constant. Weight 0
    drops the group (consistent with ``weighted_mix``'s 0-rate).
    """
    import pandas as pd

    for g, w in list(weights.items()) + [("<default>", default_weight)]:
        if w < 0:
            raise ValueError(f"weight for {g!r} must be >= 0, got {w}")
    base = {g: int(np.floor(w)) for g, w in weights.items()}
    frac_thr = {
        g: np.uint64(int((w - np.floor(w)) * 2**32)) for g, w in weights.items()
    }
    default_base = int(np.floor(default_weight))
    default_frac = np.uint64(int((default_weight - np.floor(default_weight)) * 2**32))

    def rep(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = _hash32(k, seed)
        groups = b.column(group_col).to_pandas()
        nbase = groups.map(base).fillna(default_base).to_numpy(dtype=np.int64)
        thr = (
            groups.map({g: int(v) for g, v in frac_thr.items()})
            .fillna(int(default_frac))
            .to_numpy(dtype=np.uint64)
        )
        reps = nbase + (h < thr)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), reps)
        return b.take(pa.array(idx))

    return ds.map_batches(rep, batch_format="pyarrow")
