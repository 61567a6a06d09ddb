"""Streaming ring-buffer featurizer, time-grid regularization,
compute-or-load caching."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rp_extract_ray.pipelines import oracle as O
from rp_extract_ray.stages.ring import streaming_window_features
from rp_extract_ray.stages.timegrid import time_grid_aggregate
from rp_extract_ray.stages.turns import add_turn_stats
from rp_extract_ray.state.checkpoint import compute_or_load

K = 8


def test_ring_matches_bulk_oracle(corpus, enriched_oracle):
    """The streaming actor over a conv-sorted stream must produce the same
    window features as the bulk oracle — state carried across batches (the
    corpus is fed in many small batches; conversations span several)."""
    t, _ = corpus
    sorted_pdf = (
        t.to_pandas().sort_values(["conv_id", "ts", "turn_idx"], ignore_index=True)
    )
    src = add_turn_stats(rd.from_pandas(sorted_pdf))
    got = (
        streaming_window_features(src, k=K, batch_size=64)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    exp = O.oracle_window_features(enriched_oracle, k=K).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    assert len(got) == len(exp)
    for c in exp.columns:
        if "_w" not in c and c not in ("gap_s", "session_id"):
            continue
        a = got[c].to_numpy(dtype=np.float64)
        b = exp[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c


def test_time_grid(corpus):
    t, _ = corpus
    out = time_grid_aggregate(
        rd.from_arrow(t), entity_col="conv_id", value_col="text_len"
        if "text_len" in t.column_names else None, interval_s=3600.0,
    ).to_pandas()
    pdf = t.to_pandas()
    exp = (
        pdf.assign(bucket=pdf["ts"].dt.floor("1h"))
        .groupby(["conv_id", "bucket"])
        .size()
        .rename("n")
        .reset_index()
    )
    got = out.sort_values(["conv_id", "bucket"], ignore_index=True)
    exp = exp.sort_values(["conv_id", "bucket"], ignore_index=True)
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["bucket"].to_numpy() == exp["bucket"].to_numpy()).all()


def test_compute_or_load(corpus, tmp_path_factory):
    t, _ = corpus
    out = str(tmp_path_factory.mktemp("col"))
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return rd.from_arrow(t)

    a = compute_or_load(out, make, num_partitions=4).to_pandas()
    assert calls["n"] == 1
    b = compute_or_load(out, make, num_partitions=4).to_pandas()
    assert calls["n"] == 1  # second call served from cache
    assert len(a) == len(b) == t.num_rows
