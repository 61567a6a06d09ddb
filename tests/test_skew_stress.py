"""Skew stress: one conversation 3000x the median flows through the salted
window path and payload-light backfill without whole-conv co-location."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rp_extract_ray.stages.partition import SaltSpec
from rp_extract_ray.stages.turns import add_turn_stats
from rp_extract_ray.stages.window import add_window_features

K = 16


@pytest.fixture(scope="module")
def skewed():
    rng = np.random.default_rng(17)
    frames = []
    for cid, n in [("giant", 60_000)] + [(f"small_{i}", 20) for i in range(50)]:
        ts = 1_700_000_000_000_000 + np.cumsum(
            rng.integers(1, 60_000_000, size=n)
        )
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": cid,
                    "turn_idx": np.arange(n, dtype=np.int32),
                    "text_len": rng.integers(0, 2000, size=n),
                    "token_est": rng.integers(0, 400, size=n),
                    "ts": ts.astype("datetime64[us]"),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_salted_windows_on_giant_conv(skewed):
    salt = SaltSpec(chunk_turns=4096, overlap=K)
    ds = rd.from_pandas(skewed.sample(frac=1.0, random_state=3))  # shuffled arrival
    out = add_window_features(
        ds, ("text_len", "token_est", "gap_s"), k=K, num_partitions=16, salt=salt
    ).to_pandas()
    assert len(out) == len(skewed)

    # spot-check rows deep inside the giant conversation against a local calc
    giant = skewed[skewed.conv_id == "giant"].reset_index(drop=True)
    got = (
        out[out.conv_id == "giant"].sort_values("turn_idx").reset_index(drop=True)
    )
    gap = giant["ts"].diff().dt.total_seconds().fillna(0.0).to_numpy()
    for i in [0, 5, 4095, 4096, 4100, 20_000, 59_999]:  # incl. chunk borders
        lo = max(0, i - K + 1)
        w = giant["text_len"].to_numpy(dtype=np.float64)[lo : i + 1]
        assert np.isclose(got.loc[i, "text_len_wmean"], w.mean()), i
        assert np.isclose(got.loc[i, "text_len_wmax"], w.max()), i
        gw = gap[lo : i + 1]
        assert np.isclose(got.loc[i, "gap_s_wmean"], gw.mean()), i
