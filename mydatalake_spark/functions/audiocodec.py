"""Dependency-free audio codec: WAV (RIFF) with 16-bit / 8-bit PCM.

[extension] The audio sibling of functions/imagecodec.py: canonical
uncompressed WAV decodes with numpy + struct alone, making the audio
modality live end-to-end in this container — real header parse, real
sample decode, real signal features (duration / RMS / peak /
zero-crossing rate). Compressed audio (MP3/AAC/OGG) stays behind the
import-gated pyav path, same tiering as images.

Detection is STRICT (RIFF/WAVE magic + a well-formed PCM fmt chunk +
a data chunk whose length fits the payload), so arbitrary binary
payloads cannot misroute into the audio path — the same
misdetection-proofing contract as the image codec.

Pure bytes/ndarray transforms, no Spark imports: they slot into the
``mapInPandas`` batch iterators in functions/multimodal.py and test
without a session.
"""

from __future__ import annotations

import struct

import numpy as np

# (mime, n_channels, sample_rate, n_samples)
AudioMeta = tuple[str, int, int, int]


def _parse_wav(payload: bytes) -> tuple[AudioMeta, dict] | None:
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= len(payload):
            (audio_format, n_channels, sample_rate, _byte_rate,
             block_align, bits) = struct.unpack_from("<HHIIHH", payload, body)
            fmt = (audio_format, n_channels, sample_rate, block_align, bits)
        elif cid == b"data":
            if body + size > len(payload):
                return None  # declared data longer than the payload
            data = (body, size)
        pos = body + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        return None
    audio_format, n_channels, sample_rate, block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):  # PCM only
        return None
    if n_channels < 1 or sample_rate <= 0:
        return None
    bytes_per_frame = n_channels * (bits // 8)
    if block_align != bytes_per_frame or data[1] % bytes_per_frame != 0:
        return None
    n_samples = data[1] // bytes_per_frame
    mime = "audio/wav"
    return (mime, n_channels, sample_rate, n_samples), {
        "offset": data[0],
        "size": data[1],
        "bits": bits,
    }


def parse_wav_meta(payload: bytes | None) -> AudioMeta | None:
    """``(mime, n_channels, sample_rate, n_samples)`` for a decodable
    PCM WAV payload (strict chunk validation), else None."""
    if payload is None:
        return None
    parsed = _parse_wav(payload)
    return parsed[0] if parsed is not None else None


def decode_wav(
    payload: bytes | None,
) -> "tuple[np.ndarray, int] | None":
    """Decode to (float32 array of shape (n_samples, n_channels) in
    [-1, 1], sample_rate), or None if not a supported PCM WAV."""
    if payload is None:
        return None
    parsed = _parse_wav(payload)
    if parsed is None:
        return None
    (_, n_channels, sample_rate, n_samples), info = parsed
    if info["bits"] == 16:
        raw = np.frombuffer(
            payload, dtype="<i2", count=n_samples * n_channels,
            offset=info["offset"],
        )
        samples = raw.astype(np.float32) / 32768.0
    else:  # 8-bit WAV is unsigned, centered at 128
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=n_samples * n_channels,
            offset=info["offset"],
        )
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    return samples.reshape(n_samples, n_channels), sample_rate


def encode_wav(arr: "np.ndarray", sample_rate: int) -> bytes:
    """(n_samples, n_channels) float in [-1, 1] → 16-bit PCM WAV bytes
    (round-trips ``decode_wav`` up to the int16 quantization)."""
    if arr.ndim == 1:
        arr = arr[:, None]
    n_samples, n_channels = arr.shape
    pcm = np.clip(np.asarray(arr, dtype=np.float64) * 32768.0,
                  -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(arr: "np.ndarray", sample_rate: int) -> dict:
    """Deterministic signal features over the channel-mean waveform:
    duration (s), RMS, absolute peak, and zero-crossing rate (sign
    changes per sample). The slots a learned audio embedding would
    replace 1:1."""
    mono = arr.mean(axis=1, dtype=np.float64)
    n = len(mono)
    crossings = int(np.count_nonzero(np.diff(np.signbit(mono)))) if n > 1 else 0
    return {
        "duration_s": float(n / sample_rate),
        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        "peak": float(np.max(np.abs(mono))) if n else 0.0,
        "zcr": float(crossings / (n - 1)) if n > 1 else 0.0,
    }
