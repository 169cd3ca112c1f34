"""Y4M video codec: pure-python/numpy round-trip, strict detection,
Spark e2e through the mapInPandas plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mydatalake_spark.functions.videocodec import (
    decode_y4m_luma,
    encode_y4m,
    parse_y4m_meta,
    video_features,
)


def _clip(n=4, h=6, w=8, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w)).astype(np.uint8)


def test_round_trip_exact():
    frames = _clip()
    payload = encode_y4m(frames, fps=(30, 1))
    meta = parse_y4m_meta(payload)
    assert meta == ("video/x-yuv4mpeg", 8, 6, 30, 1, "Cmono", 4)
    got = decode_y4m_luma(payload)
    assert got.shape == frames.shape and (got == frames).all()


def test_c420_and_c444_luma_extraction():
    # hand-build a 2x2 C444 stream: Y then U then V planes per frame
    y = bytes([10, 20, 30, 40])
    u = bytes([1, 2, 3, 4])
    v = bytes([5, 6, 7, 8])
    payload = (b"YUV4MPEG2 W2 H2 F25:1 C444\n"
               + b"FRAME\n" + y + u + v)
    meta = parse_y4m_meta(payload)
    assert meta == ("video/x-yuv4mpeg", 2, 2, 25, 1, "C444", 1)
    luma = decode_y4m_luma(payload)
    assert luma.tolist() == [[[10, 20], [30, 40]]]
    # C420 with odd dimensions is rejected (fractional plane)
    assert parse_y4m_meta(b"YUV4MPEG2 W3 H3 F25:1 C420\nFRAME\n" +
                          bytes(14)) is None


def test_strict_detection_rejects_garbage():
    assert parse_y4m_meta(None) is None
    assert parse_y4m_meta(b"") is None
    assert parse_y4m_meta(b"RIFF....WAVE") is None
    assert parse_y4m_meta(b"YUV4MPEG2 W0 H4 F25:1 Cmono\nFRAME\n") is None
    # truncated frame plane -> zero complete frames -> None
    assert parse_y4m_meta(
        b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n" + bytes(10)
    ) is None


def test_video_features_model():
    frames = np.stack([
        np.full((2, 2), 10, np.uint8),
        np.full((2, 2), 30, np.uint8),
        np.full((2, 2), 20, np.uint8),
    ])
    f = video_features(frames, 10, 1)
    assert f["n_frames"] == 3
    assert f["duration_s"] == pytest.approx(0.3)
    assert f["mean_luma"] == pytest.approx(20.0)
    assert f["min_frame_luma"] == 10.0 and f["max_frame_luma"] == 30.0
    assert f["motion"] == pytest.approx(15.0)   # |30-10|,|20-30| -> 20,10


def test_spark_decode_meta_features_and_frame_sampling(spark):
    from mydatalake_spark.functions.multimodal import (
        decode_video_meta,
        sample_frames,
        video_features_y4m,
        y4m_frame_decoder,
    )

    clips = [
        (1, bytearray(encode_y4m(_clip(n=5, seed=1), fps=(5, 1)))),
        (2, bytearray(encode_y4m(_clip(n=2, seed=2), fps=(1, 1)))),
        (3, bytearray(b"not a video")),
        (4, None),
    ]
    df = spark.createDataFrame(clips, "doc_id long, media binary")

    meta = {r.doc_id: r.video_meta
            for r in decode_video_meta(df).collect()}
    assert meta[1].mime == "video/x-yuv4mpeg" and meta[1].n_frames == 5
    assert meta[1].fps_num == 5 and meta[1].width == 8
    assert meta[2].n_frames == 2
    assert meta[3].mime is None and meta[3].n_bytes == 11
    assert meta[4].mime is None and meta[4].n_bytes is None

    feats = {r.doc_id: r for r in video_features_y4m(df).collect()}
    assert feats[1].n_frames == 5
    assert feats[1].duration_s == pytest.approx(1.0)
    assert feats[3].n_frames is None

    # frame sampling: clip 1 at 5 fps sampled every 600 ms ->
    # t=0,200,400,600,800 keeps t=0, 600 -> 2 frames; clip 2 at 1 fps
    # sampled every 600 -> t=0,1000 both kept
    rows = sample_frames(
        df, id_cols=["doc_id"], decoder=y4m_frame_decoder(600)
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r.frame_idx)
        # sampled frames are themselves decodable single-frame Y4M
        assert parse_y4m_meta(bytes(r.frame))[6] == 1
    assert per == {1: [0, 1], 2: [0, 1]}
