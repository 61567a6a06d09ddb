"""From-scratch WAV (RIFF/PCM) byte codec — numpy only, no stdlib `wave`.

Re-derivation of the reference's pure-Python WAV path (S1
/root/reference/wavio.py:15-76 ``_wav2array``/``readwav``, W10 ``:79-124``
``writewav24``, normalization /root/reference/audiofile_read.py:44-51): the
reference walks the file through the ``wave`` module; here the RIFF container
is parsed directly from the byte buffer with ``np.frombuffer`` so the SAME
kernel serves an in-pipeline ``binary`` column (multimodal stage) without
any file handle — the engine's payload rows never touch disk.

Semantics preserved exactly:
* 8-bit samples are unsigned, wider samples signed little-endian.
* 24-bit samples expand to int32 with sign extension.
* ``normalize_pcm`` divides by 2**(8*sampwidth)/2 — including the
  reference's 8-bit quirk (unsigned bytes divided by 128, range (0, 2);
  documented at audiofile_read.py:42-48) — bug-for-bug compatible.
* The 24-bit writer emits unscaled little-endian frames.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_wav_bytes(buf: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, sampwidth, data[(n, channels)]) from a RIFF/WAVE byte buffer.

    Uncompressed PCM only (format tag 1), like the reference's reader.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, nchannels, rate, _byte_rate, _block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != 1:
        raise ValueError(f"compressed WAV (format tag {tag}) not supported")
    sampwidth = bits // 8
    if sampwidth < 1 or sampwidth > 4:
        raise ValueError(f"unsupported sample width {sampwidth}")
    frame = sampwidth * nchannels
    usable = (len(data) // frame) * frame
    raw = np.frombuffer(data[:usable], dtype=np.uint8)
    if sampwidth == 3:
        b = raw.reshape(-1, 3).astype(np.int32)
        x = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = (x ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
        samples = x
    elif sampwidth == 1:
        samples = raw.astype(np.int32)  # unsigned 8-bit
    else:
        dt = np.dtype(f"<i{sampwidth}")
        samples = raw.view(dt).astype(np.int32)
    return int(rate), int(sampwidth), samples.reshape(-1, nchannels)


def normalize_pcm(data: np.ndarray, sampwidth: int) -> np.ndarray:
    """Scale integer PCM to float — reference normalize_wav semantics
    (divisor 2**(8*w)/2; audiofile_read.py:44-51)."""
    divisor = float(2 ** (8 * sampwidth) / 2)
    return np.asarray(data, dtype=np.float64) / divisor


def write_wav24_bytes(rate: int, data: np.ndarray) -> bytes:
    """24-bit PCM WAV bytes from int-valued data (1-D mono or (n, ch)) —
    the W10 writer, unscaled like the reference."""
    a = np.asarray(data)
    a32 = np.asarray(np.rint(a) if a.dtype.kind == "f" else a, dtype=np.int32)
    if a32.ndim == 1:
        a32 = a32[:, None]
    n, ch = a32.shape
    le = np.empty((n, ch, 3), dtype=np.uint8)
    le[:, :, 0] = a32 & 0xFF
    le[:, :, 1] = (a32 >> 8) & 0xFF
    le[:, :, 2] = (a32 >> 16) & 0xFF
    payload = le.tobytes()
    block = 3 * ch
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 24)
    # RIFF word alignment: an odd-length data chunk (mono with odd sample
    # count -> 3*n odd) carries one zero pad byte AFTER the payload; the
    # chunk-size field stays the unpadded length and the RIFF size counts
    # the pad (strict readers require this; our parser skips it via size&1)
    pad = b"\x00" if len(payload) % 2 else b""
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload) + len(pad)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(payload)),
            payload,
            pad,
        ]
    )
    return out
