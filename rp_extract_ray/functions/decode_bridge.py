"""External subprocess decoder bridge (S3/S5/S7 —
/root/reference/audiofile_read.py:139-212, 215-244).

The reference decodes compressed audio (mp3/flac/m4a/aiff, and video audio
tracks) by shelling out to the first available external tool — ffmpeg,
mpg123, lame — writing a temp WAV, then parsing it with the in-process WAV
reader. The MECHANISM re-expressed here is the same: payload bytes -> temp
input file -> first matching+available command from an ordered template list
-> temp output WAV -> from-scratch RIFF parse (functions/wav.py). Command
templates are INJECTABLE (``{in}`` / ``{out}`` placeholders), so the bridge
is fully testable with a fake WAV-emitting command even though this container
ships none of the real codec binaries; with ffmpeg on PATH the defaults work
unchanged.

Reference-parity behaviors: per-extension command eligibility with an
``no_extension_check`` override (:175-191), missing-binary fallthrough to the
next tool (OSError errno 2, :196-200), nonzero-return-code hard error
(:193-195), and "no decoder found" naming every candidate (:206-210).

Scale note: this runs INSIDE map_batches workers (one subprocess per row,
bounded by the stage's cpu slots); temp files live on node-local disk and
are removed before return — nothing driver-side, nothing shuffled.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np


class DecoderError(RuntimeError):
    """Decoder ran but failed (reference DecoderException,
    /root/reference/audiofile_read.py:118-128)."""

    def __init__(self, msg: str, command: list[str] | None = None):
        super().__init__(msg)
        self.command = command


# (command template, supported extensions) in priority order — the
# reference's cmd_list/cmd_types pairs (/root/reference/audiofile_read.py:172-186)
DEFAULT_DECODERS: list[tuple[list[str], tuple[str, ...]]] = [
    (
        ["ffmpeg", "-v", "1", "-y", "-i", "{in}", "{out}"],
        (".mp2", ".mp3", ".mp4", ".m4a", ".aif", ".aiff", ".flac"),
    ),
    (["mpg123", "-q", "-w", "{out}", "{in}"], (".mp3",)),
    (["lame", "--quiet", "--decode", "{in}", "{out}"], (".mp3",)),
]

MIME_EXT = {
    "audio/mpeg": ".mp3",
    "audio/mp4": ".m4a",
    "audio/flac": ".flac",
    "audio/x-flac": ".flac",
    "audio/aiff": ".aiff",
    "audio/x-aiff": ".aiff",
    "video/mp4": ".mp4",
}


def decode_bytes_via_subprocess(
    payload: bytes,
    ext: str,
    decoders: list[tuple[list[str], tuple[str, ...]]] | None = None,
    *,
    no_extension_check: bool = False,
    timeout: float = 120.0,
) -> tuple[int, int, np.ndarray, str]:
    """Decode compressed bytes to PCM via the first eligible external tool.

    Returns ``(rate, sampwidth, data, command_name)`` where data is the
    (n_samples, n_channels) int array from the S1 WAV parser. Raises
    :class:`DecoderError` if an eligible decoder runs and fails, ``OSError``
    if no eligible decoder exists on the system (both reference-parity)."""
    from rp_extract_ray.functions.wav import parse_wav_bytes

    if decoders is None:
        decoders = DEFAULT_DECODERS
    ext = ext.lower() if ext.startswith(".") else "." + ext.lower()

    in_fd, in_path = tempfile.mkstemp(suffix=ext)
    out_fd, out_path = tempfile.mkstemp(suffix=".wav")
    os.close(out_fd)
    try:
        with os.fdopen(in_fd, "wb") as f:
            f.write(payload)
        for template, types in decoders:
            if not (no_extension_check or ext in types):
                continue
            cmd = [a.replace("{in}", in_path).replace("{out}", out_path)
                   for a in template]
            try:
                rc = subprocess.call(
                    cmd,
                    timeout=timeout,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
            except FileNotFoundError:
                continue  # tool not installed -> next candidate (ref :196-200)
            if rc != 0:
                raise DecoderError(
                    f"decoder failed with return code {rc}", command=cmd
                )
            with open(out_path, "rb") as f:
                wav_bytes = f.read()
            rate, sampwidth, data = parse_wav_bytes(wav_bytes)
            return rate, sampwidth, data, template[0]
        names = ", ".join(t[0] for t, _ in decoders)
        raise OSError(
            f"no appropriate decoder found for {ext}; checked: {names}"
        )
    finally:
        for p in (in_path, out_path):
            try:
                os.unlink(p)
            except OSError:
                pass
