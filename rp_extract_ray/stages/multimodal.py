"""Multimodal (binary-payload) column stages — Ray plumbing real, codecs stubbed.

The reference's decode path shells out to ffmpeg/mpg123/lame
(/root/reference/audiofile_read.py:139-212); those binaries and the image/
audio libraries are not in this container, so the DECODE KERNEL is stubbed —
either a clearly-marked NotImplementedError or a deterministic fake — while
everything Ray-side is real and tested: schema (opaque ``binary`` payload +
typed metadata), actor-pool signature, batch sizing for large rows, output
layout.

At 100 TB the rules encoded here: small ``batch_size`` (large rows), actor
pools with per-actor codec state, payload column dropped as soon as features
are extracted (never shuffle decoded tensors)."""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),        # image | audio | video
        pa.field("payload", pa.binary()),     # opaque encoded bytes
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),        # typed metadata (nullable)
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 21) -> pa.Table:
    """Deterministic fake media rows for plumbing tests (payload bytes are
    seeded noise, not decodable)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.bytes(int(rng.integers(256, 4096))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "width": pa.array(rng.integers(32, 2048, n, dtype=np.int32)),
            "height": pa.array(rng.integers(32, 2048, n, dtype=np.int32)),
            "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
            "duration_ms": pa.array(rng.integers(100, 60000, n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode -> feature-extract binary payloads.

    ``mode='wav'`` is a REAL decode path: uncompressed RIFF/PCM payloads are
    parsed by the from-scratch numpy codec (functions/wav.py — the S1
    `wavio.readwav` analogue, no external libs) and featurized with the
    reference's normalize -> mono-project -> 7-stat chain (M1-M3 + M15).
    ``mode='subprocess'`` is the reference's external-decoder bridge
    (S3/S5, /root/reference/audiofile_read.py:139-212) made real:
    ``functions/decode_bridge.py`` shells the payload through an injectable
    command list (ffmpeg/mpg123/lame by default) to a temp WAV, parses it
    with the S1 codec, and featurizes like ``mode='wav'`` — proven here with
    an injected WAV-emitting command, and working unchanged wherever ffmpeg
    exists on PATH. ``mode='stub'`` raises NotImplementedError from the
    decode kernel (the honest placeholder for in-process COMPRESSED codecs —
    mp3/jpeg/h264 libs are not in this environment); ``mode='fake'``
    produces a deterministic payload-derived feature vector so the full
    pipeline (schema, batching, output layout) is testable end-to-end
    regardless of codec availability.
    """

    FEAT_DIM = 16

    def __init__(
        self,
        mode: Literal["stub", "fake", "wav", "subprocess"] = "fake",
        decoder_cmds: list | None = None,
    ):
        # per-actor init: decoder templates resolved once, real impl loads
        # codec/model state here
        self.mode = mode
        self.decoder_cmds = decoder_cmds

    def _decode(self, payload: bytes, kind: str, mime: str = "") -> np.ndarray:
        if self.mode == "stub":
            raise NotImplementedError(
                "compressed-media codecs unavailable in this environment; "
                "plug a real decoder here (PIL / torchaudio / pyav)"
            )
        if self.mode == "subprocess":
            from rp_extract_ray.functions.decode_bridge import (
                MIME_EXT,
                decode_bytes_via_subprocess,
            )
            from rp_extract_ray.functions.wav import normalize_pcm

            ext = MIME_EXT.get(mime, ".mp3")
            rate, sampwidth, data, _cmd = decode_bytes_via_subprocess(
                payload, ext, self.decoder_cmds
            )
            return normalize_pcm(data, sampwidth).mean(axis=1)
        if self.mode == "wav":
            from rp_extract_ray.functions.wav import normalize_pcm, parse_wav_bytes

            rate, sampwidth, data = parse_wav_bytes(payload)
            mono = normalize_pcm(data, sampwidth).mean(axis=1)  # M1/M3
            return mono
        # deterministic fake: byte histogram as the 'decoded signal'
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        return arr

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from rp_extract_ray.functions.stats import seven_stats

        mimes = (
            batch["mime"] if "mime" in batch.columns else [""] * len(batch)
        )
        feats = np.zeros((len(batch), self.FEAT_DIM), dtype=np.float64)
        for i, (payload, kind, mime) in enumerate(
            zip(batch["payload"], batch["kind"], mimes)
        ):
            sig = self._decode(payload, kind, mime)
            if self.mode in ("wav", "subprocess"):
                st = seven_stats(sig[None, :])[0]  # M15 kernel on the signal
                rms = float(np.sqrt(np.mean(sig * sig))) if len(sig) else 0.0
                feats[i, :9] = [*st, rms, float(len(sig))]
            else:
                hist, _ = np.histogram(sig, bins=self.FEAT_DIM, range=(0, 256))
                feats[i] = hist / max(len(sig), 1)
        out = batch.drop(columns=["payload"])  # NEVER ship payloads downstream
        out["media_feat"] = [row for row in feats]
        return out


def extract_media_features(
    ds: Dataset,
    mode: Literal["stub", "fake", "wav", "subprocess"] = "fake",
    *,
    decoder_cmds: list | None = None,
    batch_size: int = 64,       # large binary rows -> small batches
    concurrency=(1, 8),
    num_cpus: float = 1,
) -> Dataset:
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": mode, "decoder_cmds": decoder_cmds},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def plan_frame_samples(
    ds: Dataset,
    *,
    fps: float = 1.0,
    max_frames_per_video: int = 64,
) -> Dataset:
    """Video frame-sampling PLAN: one output row per sampled frame.

    The flat_map-shaped half of frame sampling is pure arithmetic and fully
    real: each ``kind='video'`` row expands to ``(media_id, frame_idx,
    frame_ts_ms)`` rows at ``fps`` (capped at ``max_frames_per_video`` —
    the cap is the skew guard: a 10-hour video cannot fan out unboundedly),
    vectorized with repeat/arange — no per-row Python loop. The frame
    EXTRACTION kernel that would consume this plan (seek + decode at
    frame_ts_ms) is the same stubbed codec seam as
    :class:`MediaFeatureExtractor` — downstream, each planned row + the
    payload feeds an actor-pool decode stage and the payload is dropped
    before any shuffle."""

    def expand(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = b.filter(pc.equal(b.column("kind"), "video"))
        if len(vids) == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                    "frame_ts_ms": pa.array([], pa.int32()),
                }
            )
        # nullable metadata: a NULL duration arrives as NaN whose int64 cast
        # is garbage (INT64_MIN) — such rows plan zero frames
        dur = np.nan_to_num(
            vids.column("duration_ms")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            nan=-1.0,
        )
        interval_ms = 1000.0 / fps
        n_frames = np.where(
            dur < 0,
            0,
            np.minimum((dur / interval_ms).astype(np.int64) + 1, max_frames_per_video),
        )
        ids = np.repeat(
            vids.column("media_id").to_numpy(zero_copy_only=False), n_frames
        )
        # frame_idx = 0..n_i-1 per video, one concatenated arange
        total = int(n_frames.sum())
        starts = np.concatenate([[0], np.cumsum(n_frames)[:-1]])
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_frames)
        ts = (idx * interval_ms).astype(np.int32)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame_idx": pa.array(idx.astype(np.int32)),
                "frame_ts_ms": pa.array(ts),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


def plan_resize(
    ds: Dataset,
    *,
    max_dim: int = 256,
) -> Dataset:
    """Image resize PLAN: aspect-preserving target dimensions per image.

    The dimension math (the real half) is vectorized: scale =
    max_dim / max(width, height), clamped to 1.0 (never upscale), target
    dims rounded and floored at 1. The pixel-resampling kernel is the
    stubbed codec seam. Non-image rows pass through with null targets."""

    def plan(b: pa.Table) -> pa.Table:
        w = b.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = b.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        # fill_null(False): a NULL kind must read as "not an image", not as
        # a None poisoning the boolean mask arithmetic below
        is_img = np.asarray(
            pa.compute.fill_null(
                pa.compute.equal(b.column("kind"), "image"), False
            )
        )
        # nullable dims: NaN width/height -> null target (mask), and the
        # arithmetic below must not propagate NaN into the int cast
        known = np.isfinite(w) & np.isfinite(h)
        w_safe = np.where(known, w, 1.0)
        h_safe = np.where(known, h, 1.0)
        scale = np.minimum(
            1.0, max_dim / np.maximum(np.maximum(w_safe, h_safe), 1.0)
        )
        tw = np.maximum(np.rint(w_safe * scale), 1).astype(np.int32)
        th = np.maximum(np.rint(h_safe * scale), 1).astype(np.int32)
        mask = ~(is_img & known)
        b = b.append_column(
            "target_width", pa.array(tw, type=pa.int32(), mask=mask)
        )
        return b.append_column(
            "target_height", pa.array(th, type=pa.int32(), mask=mask)
        )

    return ds.map_batches(plan, batch_format="pyarrow")
