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


def test_wav_codec_roundtrip_24bit():
    """From-scratch RIFF codec: 24-bit write -> parse is value-exact,
    including negative samples (sign extension)."""
    import numpy as np

    from rp_extract_ray.functions.wav import parse_wav_bytes, write_wav24_bytes

    rng = np.random.default_rng(7)
    x = rng.integers(-(2**23), 2**23 - 1, size=(500, 2), dtype=np.int32)
    buf = write_wav24_bytes(22050, x)
    rate, sampwidth, data = parse_wav_bytes(buf)
    assert rate == 22050 and sampwidth == 3
    assert data.shape == (500, 2)
    assert (data == x).all()


def test_wav_parse_16bit_and_normalize():
    import struct

    import numpy as np

    from rp_extract_ray.functions.wav import normalize_pcm, parse_wav_bytes

    x = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    payload = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    buf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(payload)) + payload)
    rate, w, data = parse_wav_bytes(buf)
    assert (rate, w) == (16000, 2)
    assert (data[:, 0] == x).all()
    norm = normalize_pcm(data[:, 0], w)
    # reference divisor = 2**(8*2)/2 = 32768 (audiofile_read.py:44-51)
    assert abs(norm[3] - 32767 / 32768) < 1e-12
    assert norm[4] == -1.0


def test_media_extractor_wav_mode():
    """Real decode path end-to-end: WAV payload column -> 7-stat features."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.functions.wav import write_wav24_bytes
    from rp_extract_ray.stages.multimodal import extract_media_features

    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):
        sig = (rng.normal(scale=2**20, size=400)).astype(np.int32)
        rows.append(
            {"media_id": i, "kind": "audio",
             "payload": write_wav24_bytes(16000, sig), "mime": "audio/wav"}
        )
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = extract_media_features(ds, mode="wav").to_pandas()
    assert "payload" not in out.columns
    f = np.stack(out.sort_values("media_id")["media_feat"].to_numpy())
    assert f.shape == (8, 16)
    assert (f[:, 8] == 400).all()          # n_samples slot
    assert (np.abs(f[:, 0]) < 0.05).all()  # mean of centered noise ~ 0
    assert (f[:, 1] > 0).all()             # variance > 0


def test_plan_frame_samples():
    """Frame-sample plan: exact per-video frame counts and timestamps,
    vectorized expansion, fan-out cap honored, non-videos excluded."""
    import pyarrow as pa
    import ray.data as rd

    from rp_extract_ray.stages.multimodal import plan_frame_samples, synth_media_table

    t = synth_media_table(n=40, seed=3)
    out = (
        plan_frame_samples(rd.from_arrow(t), fps=2.0, max_frames_per_video=16)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"], ignore_index=True)
    )
    src = t.to_pandas().set_index("media_id")
    vids = src[src["kind"] == "video"]
    assert set(out["media_id"]) == set(vids.index)
    for mid, g in out.groupby("media_id"):
        dur = int(vids.loc[mid, "duration_ms"])
        exp_n = min(int(dur / 500.0) + 1, 16)
        assert len(g) == exp_n, mid
        assert list(g["frame_idx"]) == list(range(exp_n))
        assert (g["frame_ts_ms"].to_numpy() == (g["frame_idx"].to_numpy() * 500)).all()


def test_plan_resize():
    """Resize plan: aspect-preserving dims, never upscaled, null for
    non-image rows."""
    import numpy as np
    import ray.data as rd

    from rp_extract_ray.stages.multimodal import plan_resize, synth_media_table

    t = synth_media_table(n=40, seed=3)
    out = plan_resize(rd.from_arrow(t), max_dim=128).to_pandas()
    for _, r in out.iterrows():
        if r["kind"] != "image":
            assert r["target_width"] is None or np.isnan(r["target_width"])
            continue
        tw, th = int(r["target_width"]), int(r["target_height"])
        assert max(tw, th) <= 128
        assert tw <= r["width"] and th <= r["height"]  # never upscale
        # aspect preserved within rounding (relative: extreme ratios round
        # a 1-pixel step into a large absolute ratio change)
        ar = r["width"] / r["height"]
        assert abs(tw / th - ar) / ar < 0.1


def test_media_plans_null_metadata():
    """NULL duration/width/height/kind must not crash the plan stages:
    null-duration videos plan zero frames; null-dim or null-kind rows get
    null resize targets."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rp_extract_ray.stages.multimodal import plan_frame_samples, plan_resize

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "kind": pa.array(["video", "video", "image", None]),
            "payload": pa.array([b"x"] * 4, pa.binary()),
            "mime": pa.array(["m"] * 4),
            "width": pa.array([None, 100, None, 50], pa.int32()),
            "height": pa.array([None, 100, 80, 50], pa.int32()),
            "sample_rate": pa.array([None] * 4, pa.int32()),
            "duration_ms": pa.array([None, 2000, None, None], pa.int32()),
        }
    )
    frames = plan_frame_samples(rd.from_arrow(t), fps=1.0).to_pandas()
    assert set(frames["media_id"]) == {2}  # null-duration video -> 0 frames
    assert len(frames) == 3  # 0,1000,2000 ms
    rs = plan_resize(rd.from_arrow(t), max_dim=64).to_pandas().set_index("media_id")
    assert pd.isna(rs.loc[3, "target_width"])  # image with null width
    assert pd.isna(rs.loc[4, "target_width"])  # null kind
    assert pd.isna(rs.loc[1, "target_width"])  # video


def test_decode_bridge_subprocess(tmp_path):
    """S3 external-decoder bridge (/root/reference/audiofile_read.py:139-212)
    with an injected WAV-emitting command: missing-binary fallthrough, happy
    path, nonzero-rc error, and no-decoder error — all reference behaviors."""
    import numpy as np
    import pytest

    from rp_extract_ray.functions.decode_bridge import (
        DecoderError,
        decode_bytes_via_subprocess,
    )
    from rp_extract_ray.functions.wav import write_wav24_bytes

    sig = (np.arange(100) * 1000 - 50000).astype(np.int32)
    payload = write_wav24_bytes(8000, sig)

    # first tool missing on the system -> silently falls through to `cp`,
    # which "decodes" by emitting the WAV bytes (payload already is WAV)
    decoders = [
        (["definitely-not-a-decoder-xyz", "{in}", "{out}"], (".mp3",)),
        (["cp", "{in}", "{out}"], (".mp3",)),
    ]
    rate, w, data, cmd = decode_bytes_via_subprocess(payload, "mp3", decoders)
    assert (rate, w, cmd) == (8000, 3, "cp")
    assert (data[:, 0] == sig).all()

    # eligible decoder runs and fails -> hard DecoderError (ref :193-195)
    bad = [(["sh", "-c", "exit 3", "{in}", "{out}"], (".mp3",))]
    with pytest.raises(DecoderError):
        decode_bytes_via_subprocess(payload, ".mp3", bad)

    # no decoder supports the extension -> OSError naming the candidates
    with pytest.raises(OSError, match="no appropriate decoder"):
        decode_bytes_via_subprocess(payload, ".ogg", decoders)

    # no_extension_check runs the first tool on ANY extension (ref :190)
    rate2, _, data2, _ = decode_bytes_via_subprocess(
        payload, ".ogg", decoders[1:], no_extension_check=True
    )
    assert rate2 == 8000 and (data2[:, 0] == sig).all()


def test_media_extractor_subprocess_mode():
    """mode='subprocess' through the actor pool equals mode='wav' features
    when the injected decoder emits the same WAV bytes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.functions.wav import write_wav24_bytes
    from rp_extract_ray.stages.multimodal import extract_media_features

    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        sig = (rng.normal(scale=2**19, size=256)).astype(np.int32)
        rows.append(
            {"media_id": i, "kind": "audio",
             "payload": write_wav24_bytes(16000, sig), "mime": "audio/mpeg"}
        )
    df = pd.DataFrame(rows)
    cp_decoder = [(["cp", "{in}", "{out}"], (".mp3",))]
    via_sub = (
        extract_media_features(
            rd.from_pandas(df), mode="subprocess", decoder_cmds=cp_decoder
        )
        .to_pandas().sort_values("media_id")
    )
    via_wav = (
        extract_media_features(rd.from_pandas(df), mode="wav")
        .to_pandas().sort_values("media_id")
    )
    np.testing.assert_allclose(
        np.stack(via_sub["media_feat"].to_numpy()),
        np.stack(via_wav["media_feat"].to_numpy()),
    )
