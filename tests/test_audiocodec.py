"""WAV PCM codec + live audio feature paths."""

import math

import numpy as np
import pytest

from mydatalake_spark.functions.audiocodec import (
    audio_features,
    decode_wav,
    encode_wav,
    parse_wav_meta,
)
from mydatalake_spark.functions.multimodal import (
    audio_features_wav,
    decode_audio_meta,
)


def _sine(freq=440.0, sr=8000, seconds=0.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * math.pi * freq * t)).astype(np.float32)


def test_wav_round_trip_within_quantization():
    wave = _sine()
    payload = encode_wav(wave, 8000)
    assert parse_wav_meta(payload) == ("audio/wav", 1, 8000, 4000)
    arr, sr = decode_wav(payload)
    assert sr == 8000 and arr.shape == (4000, 1)
    assert np.max(np.abs(arr[:, 0] - wave)) < 1.0 / 32768 + 1e-6


def test_wav_stereo_shape_preserved():
    stereo = np.stack([_sine(440), _sine(220)], axis=1)
    arr, sr = decode_wav(encode_wav(stereo, 16000))
    assert arr.shape == (4000 * 2, 2) or arr.shape == (stereo.shape[0], 2)
    assert np.max(np.abs(arr - stereo)) < 1.0 / 32768 + 1e-6


def test_strict_detection_rejects_lookalikes():
    for payload in (
        b"RIFF1234WAVEnothing real here",
        b"RIFF" + b"\x00" * 100,
        b"just text",
        b"",
        # declared data chunk longer than the payload
        b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
        + b"\x01\x00\x01\x00\x40\x1f\x00\x00\x80\x3e\x00\x00\x02\x00\x10\x00"
        + b"data\xff\xff\x00\x00",
    ):
        assert parse_wav_meta(payload) is None
        assert decode_wav(payload) is None


def test_audio_features_known_signal():
    # constant-amplitude square wave: rms == peak == amp, zcr exact
    sr, amp, n = 8000, 0.25, 800
    wave = amp * np.where(np.arange(n) // 4 % 2 == 0, 1.0, -1.0)
    f = audio_features(wave[:, None], sr)
    assert abs(f["duration_s"] - 0.1) < 1e-9
    assert abs(f["rms"] - amp) < 1e-6
    assert abs(f["peak"] - amp) < 1e-6
    # sign flips every 4 samples: 199 flips over 799 diffs
    assert abs(f["zcr"] - 199 / 799) < 1e-9


def test_spark_audio_meta_and_features(spark):
    wave = _sine(seconds=0.25)
    rows = [
        (1, bytearray(encode_wav(wave, 8000))),
        (2, bytearray(b"opaque non-audio payload")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    meta = {r.doc_id: r.audio_meta for r in decode_audio_meta(df).collect()}
    assert meta[1].mime == "audio/wav"
    assert (meta[1].n_channels, meta[1].sample_rate, meta[1].n_samples) == (
        1, 8000, 2000,
    )
    assert meta[2].mime is None and meta[2].n_bytes == 24
    assert meta[3].mime is None and meta[3].n_bytes is None

    feats = {r.doc_id: r for r in audio_features_wav(df).collect()}
    assert abs(feats[1].duration_s - 0.25) < 1e-9
    assert abs(feats[1].rms - 0.5 / math.sqrt(2)) < 1e-3
    assert feats[2].rms is None and feats[3].rms is None
