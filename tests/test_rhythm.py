"""Rhythm-analogue features (RP/RH/RH2/MVD/SSD + TSSD/TRH) vs the loop-based
oracle; fixed dimensions pinned like the reference doctest
(/root/reference/rp_extract.py:424-445)."""

import numpy as np
import pytest
import ray.data as rd

from rp_extract_ray.pipelines import oracle as O
from rp_extract_ray.stages.rhythm import rhythm_features
from rp_extract_ray.stages.turns import add_turn_stats

SEG, NMOD = 16, 60
NSER = 3
ORDER = ("ts", "turn_idx")


@pytest.fixture(scope="module")
def conv_features(corpus):
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = rhythm_features(ds, seg_len=SEG, n_mod=NMOD, order_cols=ORDER, num_partitions=8)
    return ds.to_pandas().set_index("conv_id").sort_index()


@pytest.fixture(scope="module")
def oracle_features(enriched_oracle):
    return O.oracle_rhythm(enriched_oracle, seg_len=SEG, n_mod=NMOD)


def test_dimensions(conv_features):
    row = conv_features[conv_features.n_segments > 0].iloc[0]
    assert len(row["rp"]) == NSER * NMOD
    assert len(row["rh"]) == NMOD
    assert len(row["mvd"]) == NMOD * 7
    assert len(row["ssd"]) == NSER * 7
    assert len(row["tssd"]) == NSER * 7 * 7
    assert len(row["trh"]) == NMOD * 7


def test_matches_oracle(conv_features, oracle_features):
    assert set(conv_features.index) == set(oracle_features)
    n_checked = 0
    for cid, exp in oracle_features.items():
        got = conv_features.loc[cid]
        assert got["n_segments"] == exp["n_segments"], cid
        if exp["n_segments"] == 0:
            assert np.isnan(np.asarray(got["rp"], dtype=np.float64)).all()
            continue
        for k in ("rp", "rh", "ssd", "mvd", "tssd", "trh"):
            a = np.asarray(got[k], dtype=np.float64)
            assert np.allclose(a, exp[k], equal_nan=True), (cid, k)
        n_checked += 1
    assert n_checked >= 5  # corpus has several convs with >= SEG turns


def test_per_segment_mode(corpus, oracle_features):
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = rhythm_features(
        ds, seg_len=SEG, n_mod=NMOD, order_cols=ORDER, per_segment=True, num_partitions=8
    )
    got = ds.to_pandas()
    exp_total = sum(v["n_segments"] for v in oracle_features.values())
    assert len(got) == exp_total
    for cid, g in got.groupby("conv_id"):
        exp = oracle_features[cid]
        g = g.sort_values("seg_idx")
        assert list(g["turn_start"]) == exp["plan"]
        for i, (_, row) in enumerate(g.iterrows()):
            for k in ("rp", "rh", "rh2", "mvd", "ssd"):
                assert np.allclose(
                    np.asarray(row[k], dtype=np.float64), exp["segments"][i][k]
                ), (cid, i, k)
        break  # one conv checked in depth; totals checked above


def test_segment_ts_is_causal(corpus):
    """ts_end of each segment row equals the ts of its last member turn —
    the as-of point at which the vector is available."""
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = rhythm_features(
        ds, seg_len=SEG, n_mod=NMOD, order_cols=ORDER, per_segment=True, num_partitions=8
    )
    got = ds.to_pandas()
    src = t.to_pandas().sort_values(["conv_id", "ts", "turn_idx"])
    for _, row in got.head(50).iterrows():
        g = src[src.conv_id == row["conv_id"]].reset_index(drop=True)
        assert g.loc[row["turn_start"] + SEG - 1, "ts"] == row["ts_end"]


def test_dominant_mod_freq(conv_features, oracle_features):
    for cid, exp in oracle_features.items():
        if exp["n_segments"] == 0:
            continue
        got = conv_features.loc[cid]
        assert got["dominant_mod_freq"] == int(np.argmax(exp["rh"])) + 1
        break


def test_transform_toggles(corpus):
    """M10/M13/M14 analogues: filterbank compresses the mod axis; piecewise
    maps transform series; both flow through the full stage."""
    from rp_extract_ray.functions.transforms import (
        compressive_map,
        piecewise_table_map,
        triangular_filterbank,
    )

    fb = triangular_filterbank(16, 6)
    assert fb.shape == (6, 16)
    assert (fb.sum(axis=1) > 0).all()
    x = np.array([0.0, 20.0, 40.0, 60.0])
    y = compressive_map(x)
    assert y[2] == 1.0 and y[3] == 4.0 and 0 <= y[1] < 1
    t = piecewise_table_map(np.array([5.0]), np.array([0.0, 10.0]), np.array([0.0, 100.0]))
    assert t[0] == 50.0

    tcorp, _ = corpus
    ds = add_turn_stats(rd.from_arrow(tcorp))
    out = rhythm_features(
        ds, seg_len=SEG, n_mod=16, filterbank_out=6,
        series_map=lambda s: compressive_map(s, knee=4.0),
        order_cols=ORDER, num_partitions=8,
    ).to_pandas()
    row = out[out.n_segments > 0].iloc[0]
    assert len(row["rh"]) == 6             # mod axis compressed 16 -> 6
    assert len(row["rp"]) == NSER * 6
    assert len(row["mvd"]) == 6 * 7
