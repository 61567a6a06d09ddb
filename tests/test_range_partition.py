"""Range partitioner: disjoint key ranges, sorted files, lossless layout."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from rp_extract_ray.stages.partition import (
    RANGE_PART_COL,
    add_range_part,
    range_partition_bounds,
    write_range_sorted,
)


def _df(n=5000, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "conv_id": rng.integers(0, 800, n).astype(np.int64),
            "ts": rng.uniform(0, 1e6, n).round(3),
            "v": rng.normal(size=n).round(4),
        }
    )


def test_bounds_deterministic_and_balanced():
    df = _df()
    b1 = range_partition_bounds(rd.from_pandas(df).repartition(7), "conv_id", 8)
    b2 = range_partition_bounds(rd.from_pandas(df).repartition(2), "conv_id", 8)
    assert (b1 == b2).all() and len(b1) == 7
    parted = add_range_part(rd.from_pandas(df), "conv_id", b1).to_pandas()
    sizes = parted.groupby(RANGE_PART_COL).size()
    # sampled-quantile balance: no partition more than ~2.5x the mean
    assert sizes.max() < 2.5 * sizes.mean()
    assert len(sizes) == 8


def test_write_range_sorted_layout(tmp_path):
    df = _df(3000)
    out = str(tmp_path / "ranged")
    bounds = write_range_sorted(
        rd.from_pandas(df), out, "conv_id", order_cols=("ts",), num_partitions=4
    )
    assert len(bounds) == 3
    ranges = []
    total = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith(f"{RANGE_PART_COL}="):
            continue
        part = pq.read_table(os.path.join(out, d)).to_pandas()
        total += len(part)
        keys = part["conv_id"].to_numpy()
        ranges.append((int(d.split("=")[1]), keys.min(), keys.max()))
        # sorted within partition by (key, ts)
        tup = list(zip(part["conv_id"], part["ts"]))
        assert tup == sorted(tup)
    assert total == len(df)  # lossless
    ranges.sort()
    for (p0, _, hi), (p1, lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint, globally ordered key ranges
    # round-trip content identical
    back = pd.concat(
        [pq.read_table(os.path.join(out, d)).to_pandas()
         for d in sorted(os.listdir(out)) if d.startswith(f"{RANGE_PART_COL}=")],
        ignore_index=True,
    ).sort_values(["conv_id", "ts", "v"], ignore_index=True)
    src = df.sort_values(["conv_id", "ts", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(back[["conv_id", "ts", "v"]], src)
