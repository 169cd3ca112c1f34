"""Multimodal (image/audio/video) column support.

[extension] SURVEY.md §2 extension surface: media travel as opaque
``binary`` columns plus a typed metadata struct; decode / feature
extraction / resize / frame sampling run as Arrow-batched Pandas
functions over ``mapInPandas`` — the only layer where Python touches
the bytes. All Spark-side plumbing (schemas, batch iteration,
partitioning) is real. The codec layer is tiered:

- **uncompressed images (BMP 24-bit, PPM P6): fully live** via the
  dependency-free numpy codec in functions/imagecodec.py — real
  header parse, pixel decode, nearest-neighbor resize
  (:func:`resize_image_np`), channel-statistics features. Detection
  is strict (declared geometry must account for the byte length), so
  non-image payloads can never misroute here;
- compressed images / video: import-gated behind PIL / pyav
  (``NotImplementedError`` with the library absent, as in this
  container);
- anything undecodable falls back to the clearly-marked deterministic
  fake codec, keeping every pipeline runnable end-to-end.

Scale notes (100 TB): binary payloads dominate row width, so
- keep media in their own table keyed by content hash; join metadata,
  don't carry bytes through transforms;
- ``mapInPandas`` streams Arrow record batches — bound batch bytes via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large (a 10 MB image × 10k default batch rows would OOM the worker);
- feature extraction is embarrassingly parallel: no shuffle, scales
  linearly with executors.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)


# Default Python-side working-set bound for media batches. The Arrow
# transfer is already row-bounded (session.py maxRecordsPerBatch); this
# bounds BYTES, which row counts can't see — 2048 rows of 10 MB video
# is 20 GB, far past worker memory.
MAX_BATCH_BYTES = 64 * 1024 * 1024


def bounded_payload_chunks(
    batches: Iterator["object"],
    payload_col: str,
    max_bytes: int = MAX_BATCH_BYTES,
) -> Iterator["object"]:
    """Re-chunk incoming pandas batches so each yielded chunk carries
    at most ``max_bytes`` of payload.

    Properties (asserted by tests/test_multimodal.py):
    - every chunk's payload total is ≤ max_bytes, UNLESS the chunk is a
      single row whose payload alone exceeds the bound (an indivisible
      row is passed through alone, never silently dropped);
    - concatenating the chunks reproduces the input rows in order.

    Every media operator maps over chunks from this generator, so its
    per-iteration working set — and anything proportional to it, like
    decoded frames — is bounded regardless of upstream row width.
    """
    for pdf in batches:
        sizes = [
            0 if p is None else len(p) for p in pdf[payload_col]
        ]
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            if acc + s > max_bytes and i > start:
                yield pdf.iloc[start:i]
                start, acc = i, 0
            acc += s
        if start < len(pdf):
            yield pdf.iloc[start:]


def fake_decode_meta(payload: bytes | None) -> dict[str, Any]:
    """DETERMINISTIC FAKE decoder (no image libs in this container):
    derives pseudo-dimensions from a crc32 of the bytes. Replace with a
    PIL/ffprobe-backed implementation in production."""
    if payload is None:
        return {"mime": None, "width": None, "height": None,
                "n_bytes": None, "content_hash": None}
    h = zlib.crc32(payload)
    return {
        "mime": "image/fake",
        "width": 64 + (h & 0x1FF),
        "height": 64 + ((h >> 9) & 0x1FF),
        "n_bytes": len(payload),
        "content_hash": h,
    }


def _decode_meta(payload: bytes | None) -> dict[str, Any]:
    """Tiered metadata decode: the real numpy codec for uncompressed
    images (strict detection), the deterministic fake for everything
    else. Codec-independent fields (n_bytes, content_hash) are
    identical either way."""
    if payload is not None:
        from .imagecodec import parse_image_meta

        meta = parse_image_meta(payload)
        if meta is not None:
            mime, width, height = meta
            return {
                "mime": mime,
                "width": width,
                "height": height,
                "n_bytes": len(payload),
                "content_hash": zlib.crc32(payload),
            }
    return fake_decode_meta(payload)


def decode_media_meta(
    df: DataFrame, payload_col: str = "media", out_col: str = "media_meta",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """Attach the typed metadata struct by decoding each payload in
    Arrow batches (mapInPandas — the batch shape is the real
    production plumbing; BMP/PPM payloads decode for real, the rest
    via the fake codec). Working set bounded by ``max_batch_bytes``
    via :func:`bounded_payload_chunks`."""
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, MEDIA_META_TYPE)]
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            pdf = pdf.copy()
            pdf[out_col] = [
                _decode_meta(bytes(p) if p is not None else None)
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def media_features(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    dim: int = 16,
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """(id, feature array<float>[dim]) via an Arrow-batched extractor.
    Uncompressed image payloads get REAL features (per-channel
    mean/std + grayscale thumbnail, functions/imagecodec.py), padded
    or truncated to ``dim``; undecodable payloads get the
    deterministic fake (chunked crc32s scaled to [0,1)). A real model
    (CLIP etc.) slots into the same iterator without touching the
    Spark plan."""
    import math

    import numpy as np
    import pandas as pd

    from .imagecodec import channel_features, decode_image

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    thumb = max(int(math.isqrt(max(dim - 6, 0))), 1)

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            feats = []
            for p in pdf[payload_col]:
                if p is None:
                    feats.append(None)
                    continue
                b = bytes(p)
                arr = decode_image(b)
                if arr is not None:
                    vec = channel_features(arr, thumb=thumb)[:dim]
                    vec = np.pad(vec, (0, dim - len(vec)))
                else:
                    vec = np.array(
                        [
                            zlib.crc32(b, i) % 10_000 / 10_000.0
                            for i in range(dim)
                        ],
                        dtype=np.float32,
                    )
                feats.append(vec.astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(extract, schema=out_schema)


def resize_image(
    df: DataFrame,
    payload_col: str = "media",
    width: int = 224,
    height: int = 224,
    out_format: str = "PNG",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """Resize every image payload to ``width×height`` (PIL codec,
    re-encoded as ``out_format``), payload column replaced in place.

    Requires Pillow: the codec is import-gated, so on a cluster with
    Pillow installed this path is live; in this container (no image
    libs) it raises up front with a clear message. The mapInPandas
    batch plumbing is identical either way."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "resize_image needs Pillow; this environment has no image "
            "libraries. Install Pillow and the same call works — the "
            "codec below is already wired."
        )
    import io

    import pandas as pd

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            pdf = pdf.copy()

            def _resize(p):
                if p is None:
                    return None
                img = Image.open(io.BytesIO(bytes(p)))
                buf = io.BytesIO()
                img.resize((width, height)).save(buf, format=out_format)
                return bytearray(buf.getvalue())

            pdf[payload_col] = [_resize(p) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(do, schema=df.schema)


def resize_image_np(
    df: DataFrame,
    payload_col: str = "media",
    width: int = 224,
    height: int = 224,
    out_format: str = "ppm",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """LIVE resize for uncompressed images (BMP 24-bit / PPM P6) —
    the zero-dependency numpy codec: decode → nearest-neighbor sample
    → re-encode as ``out_format`` ('ppm' or 'bmp'). Payloads that are
    not decodable uncompressed images pass through as null (callers
    route those to the PIL path or drop them); payload column replaced
    in place, same mapInPandas plumbing as :func:`resize_image`."""
    import pandas as pd

    from .imagecodec import (
        decode_image,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    if out_format not in ("ppm", "bmp"):
        raise ValueError("out_format must be 'ppm' or 'bmp'")
    encode = encode_ppm if out_format == "ppm" else encode_bmp

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            pdf = pdf.copy()

            def _resize(p):
                if p is None:
                    return None
                arr = decode_image(bytes(p))
                if arr is None:
                    return None
                return bytearray(encode(resize_nearest(arr, width, height)))

            pdf[payload_col] = [_resize(p) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(do, schema=df.schema)


def _av_frame_decoder(every_ms: int):
    """Real pyav decode path (import-gated): container → demux video →
    keep one frame per ``every_ms`` of presentation time, re-encoded
    as PNG bytes. Lives behind the injectable ``decoder`` seam so the
    Spark plumbing is testable without an AV library present."""
    import io

    import av  # noqa: F401 — gated import; raises ImportError upstream
    from PIL import Image  # noqa: F401

    def decode(payload: bytes):
        frames = []
        with av.open(io.BytesIO(bytes(payload))) as container:
            stream = container.streams.video[0]
            next_ts_ms = 0
            for frame in container.decode(stream):
                t_ms = float(frame.time or 0) * 1000
                if t_ms >= next_ts_ms:
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    frames.append((len(frames), bytearray(buf.getvalue())))
                    next_ts_ms += every_ms
        return frames

    return decode


def sample_frames(
    df: DataFrame,
    payload_col: str = "media",
    id_cols: list[str] | None = None,
    every_ms: int = 1000,
    decoder=None,
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW per sampled frame —
    (id columns..., frame_idx, frame payload). The fan-out is
    explode-like but map-only (mapInPandas, no shuffle); frames can be
    written partition-aligned with their source videos.

    ``decoder(payload) -> [(frame_idx, frame_bytes), ...]`` is
    injectable: pass a real codec (the pyav path above is wired and
    used automatically when the library is importable) or a
    deterministic fake in tests. Without pyav and without an explicit
    decoder this raises NotImplementedError up front — the Spark-side
    plumbing (schema, Arrow batching, fan-out shape) is identical and
    IS tested either way."""
    import pandas as pd

    from pyspark.sql import types as T

    if decoder is None:
        try:
            decoder = _av_frame_decoder(every_ms)
        except ImportError:
            # live zero-dependency fallback: uncompressed Y4M decodes
            # with numpy alone (functions/videocodec.py); strict magic
            # validation means compressed containers simply yield no
            # frames rather than misrouting — install pyav (plus
            # Pillow) to cover MP4/WebM, or pass decoder= explicitly.
            decoder = y4m_frame_decoder(every_ms)

    ids = id_cols or [c for c in df.columns if c != payload_col][:1]
    keep = df.select(*ids, payload_col)
    fields = [keep.schema[c] for c in ids]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("frame_idx", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def fan_out(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # bounding INPUT chunk bytes also bounds the fan-out OUTPUT per
        # yielded frame-batch (frames are proportional to input bytes)
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            out: dict[str, list] = {c: [] for c in ids}
            out["frame_idx"] = []
            out["frame"] = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                frames = [] if payload is None else decoder(payload)
                for idx, fb in frames:
                    for c in ids:
                        out[c].append(row[c])
                    out["frame_idx"].append(idx)
                    out["frame"].append(fb)
            yield pd.DataFrame(out)

    return keep.mapInPandas(fan_out, schema=out_schema)


AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)


def decode_audio_meta(
    df: DataFrame, payload_col: str = "media", out_col: str = "audio_meta",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """Attach the typed audio metadata struct — LIVE for PCM WAV
    payloads (functions/audiocodec.py, strict RIFF validation); other
    payloads get a null-mime struct with the codec-independent fields
    (n_bytes, content_hash) still populated. Same bounded-batch
    mapInPandas plumbing as :func:`decode_media_meta`."""
    import pandas as pd

    from .audiocodec import parse_wav_meta

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, AUDIO_META_TYPE)]
    )

    def meta_of(p) -> dict[str, Any]:
        if p is None:
            return {k.name: None for k in AUDIO_META_TYPE.fields}
        b = bytes(p)
        parsed = parse_wav_meta(b)
        base = {"n_bytes": len(b), "content_hash": zlib.crc32(b)}
        if parsed is None:
            return {"mime": None, "n_channels": None, "sample_rate": None,
                    "n_samples": None, **base}
        mime, n_channels, sample_rate, n_samples = parsed
        return {"mime": mime, "n_channels": n_channels,
                "sample_rate": sample_rate, "n_samples": n_samples, **base}

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            pdf = pdf.copy()
            pdf[out_col] = [meta_of(p) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def audio_features_wav(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """(id, duration_s, rms, peak, zcr) — REAL signal features for PCM
    WAV payloads via the zero-dependency decoder; undecodable payloads
    yield a null row (route them to the pyav path or drop). Map-only,
    no shuffle: scales linearly with executors."""
    import pandas as pd

    from .audiocodec import audio_features, decode_wav

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            rows = {c: [] for c in
                    (id_col, "duration_s", "rms", "peak", "zcr")}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                decoded = None if p is None else decode_wav(bytes(p))
                feats = (
                    audio_features(*decoded) if decoded is not None
                    else {"duration_s": None, "rms": None,
                          "peak": None, "zcr": None}
                )
                rows[id_col].append(rid)
                for k in ("duration_s", "rms", "peak", "zcr"):
                    rows[k].append(feats[k])
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, schema=out_schema)


def with_fake_media(
    df: DataFrame, text_col: str = "text", out_col: str = "media"
) -> DataFrame:
    """Test helper: synthesize a deterministic binary payload from a
    text column (stands in for real image bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


VIDEO_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)


def decode_video_meta(
    df: DataFrame, payload_col: str = "media", out_col: str = "video_meta",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """Attach the typed video metadata struct — LIVE for Y4M payloads
    (functions/videocodec.py, strict YUV4MPEG2 validation); other
    payloads get a null-mime struct with the codec-independent fields
    (n_bytes, content_hash) still populated. Same bounded-batch
    mapInPandas plumbing as decode_media_meta / decode_audio_meta."""
    import pandas as pd

    from .videocodec import parse_y4m_meta

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, VIDEO_META_TYPE)]
    )

    def meta_of(p) -> dict[str, Any]:
        if p is None:
            return {k.name: None for k in VIDEO_META_TYPE.fields}
        b = bytes(p)
        parsed = parse_y4m_meta(b)
        base = {"n_bytes": len(b), "content_hash": zlib.crc32(b)}
        if parsed is None:
            return {"mime": None, "width": None, "height": None,
                    "fps_num": None, "fps_den": None,
                    "colorspace": None, "n_frames": None, **base}
        mime, w, h, fn, fd, cs, nf = parsed
        return {"mime": mime, "width": w, "height": h,
                "fps_num": fn, "fps_den": fd, "colorspace": cs,
                "n_frames": nf, **base}

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            pdf = pdf.copy()
            pdf[out_col] = [meta_of(p) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def y4m_frame_decoder(every_ms: int = 1000):
    """Live zero-dependency ``decoder`` for :func:`sample_frames`:
    decodes Y4M payloads with the numpy codec and keeps one luma frame
    per ``every_ms`` of presentation time (re-encoded as single-frame
    mono Y4M bytes, so sampled frames stay self-describing payloads).
    Non-Y4M payloads yield no frames — strict magic validation means
    nothing misroutes."""
    from .videocodec import decode_y4m_luma, encode_y4m, parse_y4m_meta

    def decode(payload: bytes):
        b = bytes(payload)
        meta = parse_y4m_meta(b)
        if meta is None:
            return []
        _mime, _w, _h, fn, fd, _cs, _nf = meta
        luma = decode_y4m_luma(b)
        frames = []
        next_ms = 0.0
        for i in range(luma.shape[0]):
            t_ms = i * 1000.0 * fd / fn
            if t_ms >= next_ms:
                frames.append(
                    (len(frames), bytearray(encode_y4m(luma[i:i + 1],
                                                       (fn, fd))))
                )
                next_ms += every_ms
        return frames

    return decode


def video_features_y4m(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    max_batch_bytes: int = MAX_BATCH_BYTES,
) -> DataFrame:
    """(id, n_frames, duration_s, mean_luma, min_frame_luma,
    max_frame_luma, motion) — REAL per-clip signal features for Y4M
    payloads via the zero-dependency decoder; undecodable payloads
    yield a null row (route them to the pyav path or drop). Map-only,
    no shuffle: scales linearly with executors."""
    import pandas as pd

    from .videocodec import decode_y4m_luma, parse_y4m_meta, video_features

    cols = ("n_frames", "duration_s", "mean_luma",
            "min_frame_luma", "max_frame_luma", "motion")
    out_schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField("n_frames", T.IntegerType())]
        + [T.StructField(c, T.DoubleType()) for c in cols[1:]]
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in bounded_payload_chunks(
            batches, payload_col, max_batch_bytes
        ):
            rows: dict[str, list] = {id_col: []}
            rows.update({c: [] for c in cols})
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                meta = None if p is None else parse_y4m_meta(bytes(p))
                rows[id_col].append(rid)
                if meta is None:
                    for c in cols:
                        rows[c].append(None)
                    continue
                _m, _w, _h, fn, fd, _cs, _nf = meta
                feats = video_features(decode_y4m_luma(bytes(p)), fn, fd)
                for c in cols:
                    rows[c].append(feats[c])
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, schema=out_schema)
