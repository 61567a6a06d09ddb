"""Checkpointed resumable output, lineage metrics sidecar, multimodal
plumbing."""

import os
import shutil

import numpy as np
import pytest
import ray
import ray.data as rd

from rp_extract_ray.state.checkpoint import (
    completed_partitions,
    read_partitioned,
    write_partitioned,
)
from rp_extract_ray.state.metrics import MetricsSink, drain_metrics
from rp_extract_ray.stages.multimodal import (
    MediaFeatureExtractor,
    extract_media_features,
    synth_media_table,
)
from rp_extract_ray.stages.partition import partitioned_apply


def test_checkpoint_write_resume(corpus, tmp_path_factory):
    t, _ = corpus
    out = str(tmp_path_factory.mktemp("ckpt"))
    r1 = write_partitioned(rd.from_arrow(t), out, num_partitions=8)
    assert r1["rows_written"] == t.num_rows
    assert completed_partitions(out) == set(r1["written"])

    # simulate a crash that lost two partitions: remove their data + markers
    # and the terminal manifest
    lost = r1["written"][:2]
    for p in lost:
        os.remove(os.path.join(out, f"part-{p:05d}.parquet"))
        os.remove(os.path.join(out, f"part-{p:05d}.done"))
    os.remove(os.path.join(out, "_manifest.json"))

    r2 = write_partitioned(rd.from_arrow(t), out, num_partitions=8)
    assert sorted(r2["written"]) == sorted(lost)          # only lost work redone
    assert set(r2["skipped"]) == set(r1["written"]) - set(lost)

    back = read_partitioned(out).to_pandas()
    assert len(back) == t.num_rows
    # byte-equal text round-trip through the partitioned layout
    src = t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    back = back.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert (back["text"].fillna("") == src["text"].fillna("")).all()


def test_metrics_sidecar(corpus):
    t, _ = corpus
    sink = MetricsSink.remote()
    ds = partitioned_apply(
        rd.from_arrow(t),
        lambda pdf, starts: pdf,
        num_partitions=8,
        metrics_sink=sink,
        metrics_stage="identity",
    )
    n = ds.count()
    m = drain_metrics(sink)
    assert n == t.num_rows
    assert m["rows_in"].sum() == t.num_rows
    assert (m["rows_in"] == m["rows_out"]).all()
    assert (m["stage"] == "identity").all()
    assert (m["wall_s"] >= 0).all()
    assert m["part_id"].nunique() == len(m)


def test_multimodal_fake_pipeline():
    media = synth_media_table(48)
    out = extract_media_features(rd.from_arrow(media), mode="fake", batch_size=16)
    pdf = out.to_pandas()
    assert len(pdf) == 48
    assert "payload" not in pdf.columns  # payload never leaves the stage
    feats = np.stack(pdf["media_feat"].to_numpy())
    assert feats.shape == (48, MediaFeatureExtractor.FEAT_DIM)
    assert np.allclose(feats.sum(axis=1), 1.0)  # normalized histograms
    # deterministic
    pdf2 = extract_media_features(rd.from_arrow(media), mode="fake").to_pandas()
    a = np.stack(pdf.sort_values("media_id")["media_feat"].to_numpy())
    b = np.stack(pdf2.sort_values("media_id")["media_feat"].to_numpy())
    assert np.allclose(a, b)


def test_multimodal_stub_raises():
    ex = MediaFeatureExtractor(mode="stub")
    with pytest.raises(NotImplementedError, match="codec"):
        ex._decode(b"\x00\x01", "image")
