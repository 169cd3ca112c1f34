"""Dependency-free BMP/PPM codec + live multimodal paths."""

import numpy as np
import pytest

from mydatalake_spark.functions.imagecodec import (
    channel_features,
    decode_image,
    encode_bmp,
    encode_ppm,
    parse_image_meta,
    resize_nearest,
)
from mydatalake_spark.functions.multimodal import (
    decode_media_meta,
    media_features,
    resize_image_np,
)


def _img(h=5, w=7, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# ----------------------------------------------------------- pure codec


def test_ppm_round_trip_bit_exact():
    a = _img()
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    assert parse_image_meta(encode_ppm(a)) == ("image/x-portable-pixmap", 7, 5)


def test_bmp_round_trip_bit_exact_with_row_padding():
    # width 7 * 3 = 21 bytes → stride pads to 24: exercises padding
    a = _img()
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    assert parse_image_meta(encode_bmp(a)) == ("image/bmp", 7, 5)


def test_strict_detection_rejects_lookalike_bytes():
    # "BM"/"P6" prefixes without consistent geometry must NOT decode —
    # this is what protects arbitrary text payloads from misrouting
    for payload in (
        b"BM this is text that merely starts with the magic",
        b"P6 totally not a pixmap",
        b"P6\n3 3\n255\nshort",          # declared 27 raster bytes, has 5
        b"BM" + b"\x00" * 60,            # bitcount/compression wrong
        b"",
    ):
        assert parse_image_meta(payload) is None
        assert decode_image(payload) is None


def test_ppm_header_comments_and_whitespace():
    a = _img(2, 2)
    raw = b"P6\n# a comment\n2 2\n# another\n255\n" + a.tobytes()
    assert np.array_equal(decode_image(raw), a)


def test_resize_nearest_shapes_and_identity():
    a = _img(8, 8)
    assert resize_nearest(a, 4, 2).shape == (2, 4, 3)
    assert np.array_equal(resize_nearest(a, 8, 8), a)
    # constant image stays constant through resize
    c = np.full((5, 5, 3), 9, dtype=np.uint8)
    assert np.array_equal(resize_nearest(c, 3, 7), np.full((7, 3, 3), 9, np.uint8))


def test_channel_features_known_values():
    c = np.full((4, 4, 3), 255, dtype=np.uint8)
    f = channel_features(c, thumb=2)
    assert f.shape == (10,)
    assert np.allclose(f[:3], 1.0)   # means
    assert np.allclose(f[3:6], 0.0)  # stds
    assert np.allclose(f[6:], 1.0)   # thumbnail


# ------------------------------------------------- live Spark-side paths


@pytest.fixture(scope="module")
def media_mixed(spark):
    a = _img(6, 4, seed=1)
    rows = [
        (1, bytearray(encode_ppm(a))),
        (2, bytearray(encode_bmp(a))),
        (3, bytearray(b"just some opaque bytes")),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, media binary"), a


def test_decode_media_meta_real_for_uncompressed(media_mixed):
    df, _ = media_mixed
    got = {r.doc_id: r.media_meta for r in decode_media_meta(df).collect()}
    assert got[1].mime == "image/x-portable-pixmap"
    assert (got[1].width, got[1].height) == (4, 6)
    assert got[2].mime == "image/bmp"
    assert (got[2].width, got[2].height) == (4, 6)
    assert got[3].mime == "image/fake"   # fallback unchanged
    assert got[4].mime is None


def test_media_features_real_vs_fake_routing(media_mixed):
    df, a = media_mixed
    got = {r.doc_id: r.features for r in media_features(df, dim=16).collect()}
    # ppm and bmp carry the SAME pixels ⇒ identical real features
    assert got[1] == got[2]
    expected_mean = a.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(got[1][:3], expected_mean, atol=1e-6)
    assert len(got[1]) == 16 and got[1][-1] == 0.0  # zero-padded to dim
    assert got[3] is not None and got[3] != got[1]  # fake path
    assert got[4] is None


def test_resize_image_np_end_to_end(media_mixed):
    df, a = media_mixed
    out = {
        r.doc_id: r.media
        for r in resize_image_np(df, width=2, height=3).collect()
    }
    dec = decode_image(bytes(out[1]))
    assert dec.shape == (3, 2, 3)
    assert np.array_equal(dec, resize_nearest(a, 2, 3))
    assert out[3] is None  # undecodable routes to null, not garbage
    assert out[4] is None


def test_resize_image_np_rejects_unknown_format(media_mixed):
    df, _ = media_mixed
    with pytest.raises(ValueError, match="ppm"):
        resize_image_np(df, out_format="png")


def test_image_neardup_end_to_end_via_real_features(spark):
    """Cross-module composition: PPM bytes → live decode →
    channel-stat features → embedding-cosine near-dup. The two
    almost-identical images pair up; the unrelated ones don't."""
    from pyspark.sql import functions as F

    from mydatalake_spark.functions.multimodal import media_features
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    near = base.copy()
    # edit a pixel the 3x3 thumbnail (rows/cols 0,5,10) does NOT
    # sample: only the global mean/std stats move, by ~1/256
    near[1, 1] = [0, 0, 0]
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(near))),
        (3, bytearray(encode_ppm(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)))),
        (4, bytearray(encode_ppm(255 - base))),  # inverted: far away
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, media binary")
    feats = media_features(media, dim=16).select(
        F.col("doc_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(feats, threshold=0.999).collect()
    }
    assert (1, 2) in pairs
    assert all({a, b} == {1, 2} for a, b in pairs), pairs
