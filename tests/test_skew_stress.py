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


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)[
        sorted(df.columns)
    ]


def test_fused_salted_backfill_bit_equal(skewed):
    """The salted fused flagship kernel (sessionize + windows in one salted
    exchange, session ids re-based by the two-pass chunk-offset merge) must
    be bit-equal to the unsalted fused path — including across the giant
    conversation's chunk borders and for both offset delivery modes."""
    from rp_extract_ray.pipelines.flagship import feature_backfill

    ds = rd.from_pandas(skewed.sample(frac=1.0, random_state=7))
    base = feature_backfill(
        ds, None, k=K, num_partitions=16, add_stats=False,
        series_cols=("text_len", "token_est", "gap_s"),
    ).to_pandas()
    salted = feature_backfill(
        ds, None, k=K, num_partitions=16, add_stats=False,
        series_cols=("text_len", "token_est", "gap_s"),
        salt_chunk_turns=4096,
    ).to_pandas()
    a, b = _sorted_frame(base), _sorted_frame(salted)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # sanity: the giant conversation actually crossed many chunks
    assert skewed.conv_id.value_counts().max() > 4096 * 10


def test_fused_salted_copartition_offsets(skewed):
    """Same equality with the distributed (co-partitioned) offset delivery —
    the 10^12-turn path where the offset table never touches the driver."""
    from rp_extract_ray.stages.session import salted_session_apply
    from rp_extract_ray.stages.window import window_stat_columns

    ds = rd.from_pandas(skewed.sample(frac=1.0, random_state=11))

    def finish(pdf, starts):
        return pdf.assign(
            **window_stat_columns(pdf, ("text_len", "gap_s"), K, starts)
        )

    out_b = salted_session_apply(
        ds, finish, gap_threshold_s=1800.0, num_partitions=16,
        chunk_turns=4096, overlap=K, offsets="broadcast",
    ).to_pandas()
    out_c = salted_session_apply(
        ds, finish, gap_threshold_s=1800.0, num_partitions=16,
        chunk_turns=4096, overlap=K, offsets="copartition",
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted_frame(out_b), _sorted_frame(out_c), check_exact=True
    )


def test_payload_light_salted_round_trip(tmp_path_factory):
    """Payload-light backfill with salt_chunk_turns: text round-trips
    byte-equal and features match the unsalted payload-light run."""
    import ray.data as rd2

    from rp_extract_ray.pipelines.flagship import feature_backfill_payload_light
    from rp_extract_ray.synth import write_corpus

    d = str(tmp_path_factory.mktemp("plsalt"))
    p = write_corpus(d, n_convs=40, seed=9, mean_turns=30)
    import os

    shards = (
        sorted(
            os.path.join(p["transcripts"], f)
            for f in os.listdir(p["transcripts"])
        )
        if os.path.isdir(p["transcripts"])
        else [p["transcripts"]]
    )
    ev = rd2.read_parquet(p["conv_events"])
    base = feature_backfill_payload_light(
        shards, ev, k=8, num_partitions=8
    ).to_pandas()
    ev2 = rd2.read_parquet(p["conv_events"])
    salted = feature_backfill_payload_light(
        shards, ev2, k=8, num_partitions=8, salt_chunk_turns=64
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted_frame(base), _sorted_frame(salted), check_exact=True
    )


def test_salted_auto_falls_back_to_copartition(skewed):
    """offsets='auto' past broadcast_limit must NOT collect the offset table
    driver-side: it falls back to the distributed two-pass and still matches
    the unsalted result; explicit 'post' raises instead."""
    from rp_extract_ray.stages.session import salted_session_apply, sessionize

    ds = rd.from_pandas(skewed.sample(frac=1.0, random_state=13))
    base = sessionize(
        ds, order_cols=("ts", "turn_idx"), num_partitions=8
    ).to_pandas()
    got = salted_session_apply(
        ds, None, gap_threshold_s=1800.0, num_partitions=8,
        chunk_turns=4096, offsets="auto", broadcast_limit=3,  # force fallback
    ).to_pandas()
    a = _sorted_frame(base)
    b = _sorted_frame(got)
    assert (a["session_id"].to_numpy() == b["session_id"].to_numpy()).all()

    with pytest.raises(ValueError, match="broadcast_limit"):
        salted_session_apply(
            ds, None, gap_threshold_s=1800.0, num_partitions=8,
            chunk_turns=4096, offsets="post", broadcast_limit=3,
        ).to_pandas()
