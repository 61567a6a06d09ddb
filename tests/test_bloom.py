"""Bloom filter kernel + bloom-accelerated semi join."""

import numpy as np
import pandas as pd

import ray.data as rd

from rp_extract_ray.functions.bloom import (
    bloom_accumulate,
    bloom_contains,
    bloom_merge,
    bloom_params,
)
from rp_extract_ray.stages.join import bloom_semi_join, semi_anti_join


def test_no_false_negatives():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**62, 20_000)
    n_bits, k = bloom_params(len(keys), fpp=0.01)
    words = bloom_accumulate(keys, n_bits, k)
    assert bloom_contains(keys, words, n_bits, k).all()


def test_fpp_near_target():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**62, 50_000)
    probes = rng.integers(2**62, 2**63, 50_000)  # disjoint range
    n_bits, k = bloom_params(len(keys), fpp=0.01)
    words = bloom_accumulate(keys, n_bits, k)
    fp = bloom_contains(probes, words, n_bits, k).mean()
    assert fp < 0.03  # 3x headroom over the 1% design point


def test_merge_equals_union():
    rng = np.random.default_rng(2)
    a, b = rng.integers(0, 2**62, (2, 5000))
    n_bits, k = bloom_params(10_000, 0.01)
    merged = bloom_merge(
        bloom_accumulate(a, n_bits, k), bloom_accumulate(b, n_bits, k)
    )
    both = bloom_accumulate(np.concatenate([a, b]), n_bits, k)
    assert (merged == both).all()


def test_string_keys():
    keys = np.array([f"doc-{i}" for i in range(1000)], dtype=object)
    n_bits, k = bloom_params(1000, 0.01)
    words = bloom_accumulate(keys, n_bits, k)
    assert bloom_contains(keys, words, n_bits, k).all()


def _sides(seed=5, n_big=4000, n_keys=600):
    rng = np.random.default_rng(seed)
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 2000, n_big).astype(np.int64),
            "v": rng.normal(size=n_big).round(4),
        }
    )
    keys = pd.DataFrame({"k": rng.choice(2000, n_keys, replace=False).astype(np.int64)})
    return big, keys


def test_bloom_semi_join_exact_equals_plain():
    # broadcast_keys_limit=0 forces the BLOOM path (the default would
    # collapse 600 keys to the broadcast filter, tested separately below)
    big, keys = _sides()
    got = bloom_semi_join(
        rd.from_pandas(big).repartition(9),
        rd.from_pandas(keys).repartition(4),
        on="k", num_partitions=4, broadcast_keys_limit=0,
    ).to_pandas()
    want = semi_anti_join(
        rd.from_pandas(big), rd.from_pandas(keys), on="k", num_partitions=4
    ).to_pandas()
    canon = lambda d: d.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v"]]
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_bloom_semi_join_broadcast_collapse_equals_plain():
    """Default path for small key sides: the auto-collapsed broadcast
    filter gives the same exact answer as the distributed semi join."""
    big, keys = _sides(seed=9)
    got = bloom_semi_join(
        rd.from_pandas(big).repartition(9),
        rd.from_pandas(keys).repartition(4),
        on="k", num_partitions=4,  # default limit -> collapse
    ).to_pandas()
    want = semi_anti_join(
        rd.from_pandas(big), rd.from_pandas(keys), on="k", num_partitions=4
    ).to_pandas()
    canon = lambda d: d.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v"]]
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_bloom_semi_join_approx_is_superset():
    big, keys = _sides(seed=6)
    approx = bloom_semi_join(
        rd.from_pandas(big), rd.from_pandas(keys), on="k", exact=False,
        fpp=0.01, broadcast_keys_limit=0,
    ).to_pandas()
    exact = big[big.k.isin(set(keys.k))]
    # every true match survives (no false negatives) ...
    assert set(map(tuple, exact[["k", "v"]].to_numpy())) <= set(
        map(tuple, approx[["k", "v"]].to_numpy())
    )
    # ... and strays stay near the design fpp
    assert len(approx) - len(exact) <= 0.05 * (len(big) - len(exact)) + 5


def test_bloom_semi_join_computed_keys_lineage():
    """Keys side as a COMPUTED lineage (filter over the raw frame): the
    "count" hint can't answer from metadata, so the join must take the
    materialize-once fallback — and still be exact through BOTH the
    broadcast collapse and the forced bloom path."""
    big, keys_all = _sides(seed=3)
    keys_ds = (
        rd.from_pandas(keys_all)
        .repartition(4)
        .filter(lambda r: r["k"] % 2 == 0)
    )
    keys_pd = keys_all[keys_all["k"] % 2 == 0]
    want = semi_anti_join(
        rd.from_pandas(big), rd.from_pandas(keys_pd), on="k", num_partitions=4
    ).to_pandas()
    canon = lambda d: d.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v"]]
    for limit in (2_000_000, 0):  # broadcast collapse, then forced bloom
        got = bloom_semi_join(
            rd.from_pandas(big).repartition(9), keys_ds,
            on="k", num_partitions=4, broadcast_keys_limit=limit,
        ).to_pandas()
        pd.testing.assert_frame_equal(canon(got), canon(want))
