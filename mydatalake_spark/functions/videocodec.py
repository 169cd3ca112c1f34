"""Dependency-free video codec: Y4M (YUV4MPEG2), uncompressed planar.

[extension] The video sibling of functions/imagecodec.py (BMP/PPM) and
functions/audiocodec.py (WAV): YUV4MPEG2 is the canonical UNcompressed
motion format (mjpegtools lineage, the interchange format of ffmpeg's
rawvideo pipelines), and it decodes with bytes + numpy alone — real
header parse, real frame-plane decode, real per-frame luma features —
so the video modality is live end-to-end in this container.
Compressed video (H.264/VP9/AV1 in MP4/WebM) stays behind the
import-gated pyav path in functions/multimodal.py, the same tiering as
images and audio.

Detection is STRICT ("YUV4MPEG2 " magic + well-formed W/H/F params +
frame payloads that fit), so arbitrary binary payloads cannot misroute
into the video path — the misdetection-proofing contract shared by all
three codecs.

Format (public spec, mjpegtools y4m): one ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A<n>:<d>] [C<space>]\\n``,
then per frame ``FRAME[<params>]\\n`` followed by raw planar samples —
Y (w·h bytes) then U,V subplanes per the colorspace (C420: w/2·h/2
each; C444: w·h each; Cmono: none).

Pure bytes/ndarray transforms, no Spark imports: they slot into the
``mapInPandas`` batch iterators in functions/multimodal.py and test
without a session.
"""

from __future__ import annotations

import numpy as np

# (mime, width, height, fps_num, fps_den, colorspace, n_frames)
VideoMeta = tuple[str, int, int, int, int, str, int]

_MAGIC = b"YUV4MPEG2 "

_PLANE_FACTOR = {  # bytes per frame = factor * w * h (must divide evenly)
    "C420": 1.5, "C420jpeg": 1.5, "C420paldv": 1.5, "C420mpeg2": 1.5,
    "C422": 2.0,
    "C444": 3.0,
    "Cmono": 1.0,
}


def _parse_header(payload: bytes):
    if not payload.startswith(_MAGIC):
        return None
    nl = payload.find(b"\n", 0, 512)
    if nl < 0:
        return None
    try:
        params = payload[len(_MAGIC):nl].decode("ascii").split()
    except UnicodeDecodeError:
        return None
    w = h = None
    fps_num, fps_den = 25, 1
    cs = "C420"
    for p in params:
        if p.startswith("W"):
            w = int(p[1:]) if p[1:].isdigit() else None
        elif p.startswith("H"):
            h = int(p[1:]) if p[1:].isdigit() else None
        elif p.startswith("F") and ":" in p:
            a, _, b = p[1:].partition(":")
            if a.isdigit() and b.isdigit() and int(b) > 0:
                fps_num, fps_den = int(a), int(b)
        elif p.startswith("C"):
            cs = p
    if not w or not h or cs not in _PLANE_FACTOR:
        return None
    frame_bytes = int(_PLANE_FACTOR[cs] * w * h)
    if frame_bytes <= 0 or int(_PLANE_FACTOR[cs] * w * h) != \
            _PLANE_FACTOR[cs] * w * h:
        return None  # subsampled colorspace needs even dimensions
    return w, h, fps_num, fps_den, cs, frame_bytes, nl + 1


def _frame_offsets(payload: bytes, start: int, frame_bytes: int):
    """Yield the byte offset of each frame's sample plane; stops at
    the first malformed FRAME marker or truncated plane."""
    pos = start
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            return
        nl = payload.find(b"\n", pos + 5, pos + 5 + 256)
        if nl < 0:
            return
        body = nl + 1
        if body + frame_bytes > n:
            return
        yield body
        pos = body + frame_bytes


def parse_y4m_meta(payload: bytes | None) -> VideoMeta | None:
    """``(mime, width, height, fps_num, fps_den, colorspace,
    n_frames)`` for a decodable Y4M payload (strict validation), else
    None."""
    if payload is None:
        return None
    hdr = _parse_header(bytes(payload))
    if hdr is None:
        return None
    w, h, fn, fd, cs, frame_bytes, start = hdr
    n_frames = sum(1 for _ in _frame_offsets(bytes(payload), start,
                                             frame_bytes))
    if n_frames == 0:
        return None
    return ("video/x-yuv4mpeg", w, h, fn, fd, cs, n_frames)


def decode_y4m_luma(payload: bytes | None) -> "np.ndarray | None":
    """Decode to a (n_frames, height, width) uint8 array of LUMA (Y)
    planes — the grayscale video tensor every downstream feature
    (motion, thumbnails, embeddings) starts from. Chroma subplanes are
    skipped by offset, not decoded. None if not a supported Y4M."""
    if payload is None:
        return None
    b = bytes(payload)
    hdr = _parse_header(b)
    if hdr is None:
        return None
    w, h, _fn, _fd, _cs, frame_bytes, start = hdr
    planes = [
        np.frombuffer(b, dtype=np.uint8, count=w * h, offset=off)
        .reshape(h, w)
        for off in _frame_offsets(b, start, frame_bytes)
    ]
    if not planes:
        return None
    return np.stack(planes)


def encode_y4m(
    frames: "np.ndarray", fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n, h, w) uint8 luma tensor → mono Y4M bytes (round-trips
    ``decode_y4m_luma`` exactly — mono carries no chroma loss)."""
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
           .encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(frames[i], dtype=np.uint8)
                   .tobytes())
    return b"".join(out)


def video_features(luma: "np.ndarray", fps_num: int, fps_den: int) -> dict:
    """Deterministic per-clip features over the luma tensor: duration,
    per-frame mean brightness extremes, and mean absolute frame-to-
    frame luma delta (the classic cheap motion score / shot-change
    signal). The slots a learned video embedding would replace 1:1."""
    means = luma.mean(axis=(1, 2), dtype=np.float64)
    n = len(means)
    motion = (
        float(np.mean(np.abs(np.diff(means)))) if n > 1 else 0.0
    )
    return {
        "n_frames": n,
        "duration_s": float(n * fps_den / fps_num),
        "mean_luma": float(means.mean()),
        "min_frame_luma": float(means.min()),
        "max_frame_luma": float(means.max()),
        "motion": motion,
    }
