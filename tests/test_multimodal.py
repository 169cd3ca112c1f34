"""Multimodal plumbing tests: binary columns + Arrow-batched decode /
feature extraction (codec is the documented deterministic fake)."""

import pytest
from pyspark.sql import types as T

from mydatalake_spark.functions.multimodal import (
    decode_media_meta,
    fake_decode_meta,
    media_features,
    resize_image,
    sample_frames,
    with_fake_media,
)


@pytest.fixture(scope="module")
def media_df(spark, documents):
    return with_fake_media(documents.limit(50))


def test_media_schema_is_binary(media_df):
    assert isinstance(media_df.schema["media"].dataType, T.BinaryType)


def test_decode_media_meta(media_df):
    out = decode_media_meta(media_df)
    meta_type = out.schema["media_meta"].dataType
    assert isinstance(meta_type, T.StructType)
    rows = out.select("doc_id", "text", "media_meta").collect()
    assert len(rows) == 50
    for r in rows:
        m = r.media_meta
        assert m.n_bytes == len(r.text.encode())
        assert 64 <= m.width < 64 + 512
        assert m.mime == "image/fake"
        # decoder is deterministic: re-derive driver-side
        expected = fake_decode_meta(r.text.encode())
        assert m.content_hash == expected["content_hash"]


def test_media_features_shape_and_determinism(media_df):
    out = media_features(media_df, dim=8)
    rows = {r.doc_id: r.features for r in out.collect()}
    assert len(rows) == 50
    assert all(len(v) == 8 for v in rows.values())
    # second run identical (Arrow round trip is value-stable)
    rows2 = {r.doc_id: r.features for r in media_features(media_df, dim=8).collect()}
    assert rows == rows2
    assert all(0.0 <= x < 1.0 for v in rows.values() for x in v)


def test_null_payloads_pass_through(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, media binary")
    out = decode_media_meta(df).collect()
    assert out[0].media_meta.mime is None
    feats = media_features(df).collect()
    assert feats[0].features is None


def test_real_codecs_are_gated(media_df):
    from mydatalake_spark.functions.multimodal import _HAVE_PIL

    if not _HAVE_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            resize_image(media_df)
    # sample_frames no longer raises without pyav: it falls back to
    # the live zero-dependency Y4M decoder (functions/videocodec.py).
    # Non-Y4M payloads fail the strict magic check and yield no
    # frames — nothing misroutes, nothing crashes.
    assert sample_frames(media_df).count() == 0


def test_resize_image_with_pil(spark):
    # Skips in this container (no Pillow); on an image-enabled cluster
    # the gated codec must be live, not a stub.
    pil = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    pil.new("RGB", (8, 6), (250, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, media binary"
    )
    out = resize_image(df, width=4, height=4).collect()
    img = pil.open(io.BytesIO(bytes(out[0].media)))
    assert img.size == (4, 4)


def test_bounded_chunks_property(spark):
    """Batch-bytes bound (the executor-OOM vector for wide binary
    rows): under random payload sizes, every chunk is ≤ the bound
    unless it is a single indivisible row, and concatenation
    reproduces the input exactly."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from mydatalake_spark.functions.multimodal import bounded_payload_chunks

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=4096),
                       min_size=0, max_size=40),
        max_bytes=st.integers(min_value=1, max_value=8192),
    )
    def check(sizes, max_bytes):
        pdf = pd.DataFrame({
            "doc_id": range(len(sizes)),
            "media": [None if s == 0 else b"x" * s for s in sizes],
        })
        chunks = list(bounded_payload_chunks([pdf], "media", max_bytes))
        for c in chunks:
            total = sum(0 if p is None else len(p) for p in c["media"])
            assert total <= max_bytes or len(c) == 1
        if sizes:
            cat = pd.concat(chunks) if chunks else pd.DataFrame()
            assert list(cat["doc_id"]) == list(range(len(sizes)))
        else:
            assert chunks == []

    check()


def test_oversized_payloads_bounded_end_to_end(spark):
    """Feed payloads far larger than the byte bound through
    decode_media_meta and the sample_frames fan-out with
    max_batch_bytes=64 KiB: every row still processes (indivisible
    rows go through alone rather than being dropped) and results equal
    the unbounded run — the bound changes memory shape, not output."""
    rows = [(i, bytearray((b"%03d" % i) * 100_000)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    bound = 64 * 1024      # each payload is ~300 KB > the bound

    meta = {r.doc_id: r.media_meta.n_bytes
            for r in decode_media_meta(df, max_batch_bytes=bound).collect()}
    assert meta == {i: 300_000 for i in range(6)}

    def head_decoder(payload):
        return [(0, bytearray(bytes(payload)[:4]))]

    bounded = sorted(
        (r.doc_id, bytes(r.frame))
        for r in sample_frames(df, id_cols=["doc_id"],
                               decoder=head_decoder,
                               max_batch_bytes=bound).collect()
    )
    unbounded = sorted(
        (r.doc_id, bytes(r.frame))
        for r in sample_frames(df, id_cols=["doc_id"],
                               decoder=head_decoder).collect()
    )
    assert bounded == unbounded
    assert len(bounded) == 6


def test_sample_frames_fan_out_with_injected_decoder(media_df):
    """The Spark-side plumbing (schema, Arrow batching, one row per
    frame) is real and runs without any AV library: inject a
    deterministic fake codec that cuts the payload into 4-byte
    'frames'."""

    def fake_decoder(payload):
        b = bytes(payload)
        return [(i, bytearray(b[i * 4:(i + 1) * 4]))
                for i in range((len(b) + 3) // 4)][:3]

    out = sample_frames(
        media_df, id_cols=["doc_id"], decoder=fake_decoder
    )
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "frame_idx", "frame"
    ]
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: bytes(r.media) for r in media_df.collect()
           if r.media is not None}
    for doc_id, frames in by_doc.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))       # dense frame ids
        first = next(f for f in frames if f.frame_idx == 0)
        assert bytes(first.frame) == src[doc_id][:4]  # content preserved
    # null payloads produce no frames, non-null produce >= 1
    assert set(by_doc) == set(src)
