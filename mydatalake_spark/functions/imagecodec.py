"""Dependency-free image codec: BMP (24-bit BI_RGB) and PPM (P6).

[extension] The container has no image libraries, but two classic
uncompressed formats are fully decodable with numpy alone — which
turns the multimodal layer's "codec is stubbed" caveat into a live
end-to-end path for uncompressed payloads: real header parse, real
pixel decode, real nearest-neighbor resize, real channel-statistics
features. Compressed formats (PNG/JPEG/video) remain import-gated
behind PIL/pyav exactly as before; this module is the zero-dependency
floor, not a PIL replacement.

Detection is deliberately STRICT — magic bytes alone are not enough,
because arbitrary binary (or text) payloads may start with "BM" or
"P6". A payload is only accepted when its declared geometry accounts
for the actual byte length (exact row-stride arithmetic), so
misdetection of non-image bytes is effectively impossible and the
fake-codec fallback behavior for such payloads is unchanged.

All functions are plain bytes/ndarray transforms — no Spark imports —
so they slot into the existing ``mapInPandas`` batch iterators in
functions/multimodal.py and are unit-testable without a session.
"""

from __future__ import annotations

import struct

import numpy as np

# (mime, width, height) header parse result
ImageMeta = tuple[str, int, int]


def _parse_bmp_header(payload: bytes) -> tuple[ImageMeta, dict] | None:
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        header_size = struct.unpack_from("<I", payload, 14)[0]
        if header_size < 40:  # BITMAPINFOHEADER or later
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bitcount = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if planes != 1 or bitcount != 24 or compression != 0:
        return None
    flipped = height > 0  # positive height ⇒ bottom-up row order
    h = abs(height)
    if width <= 0 or h <= 0:
        return None
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    if data_offset < 54 or len(payload) < data_offset + stride * h:
        return None
    return ("image/bmp", width, h), {
        "offset": data_offset,
        "stride": stride,
        "flipped": flipped,
    }


def _parse_ppm_header(payload: bytes) -> tuple[ImageMeta, dict] | None:
    if not payload.startswith(b"P6"):
        return None
    # header = "P6" ws width ws height ws maxval single-ws, then raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        fields.append(int(payload[start:pos]))
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        return None
    pos += 1  # exactly one whitespace byte before the raster
    width, height, maxval = fields
    if width <= 0 or height <= 0 or maxval != 255:
        return None
    if len(payload) < pos + width * height * 3:
        return None
    return ("image/x-portable-pixmap", width, height), {"offset": pos}


def parse_image_meta(payload: bytes | None) -> ImageMeta | None:
    """``(mime, width, height)`` if the payload is a decodable
    uncompressed image (strict geometry check), else None."""
    if payload is None:
        return None
    for parser in (_parse_bmp_header, _parse_ppm_header):
        parsed = parser(payload)
        if parsed is not None:
            return parsed[0]
    return None


def decode_image(payload: bytes | None) -> "np.ndarray | None":
    """Decode to an (height, width, 3) uint8 RGB array, or None if the
    payload is not a supported uncompressed image."""
    if payload is None:
        return None
    bmp = _parse_bmp_header(payload)
    if bmp is not None:
        (_, w, h), info = bmp
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=info["stride"] * h,
            offset=info["offset"],
        ).reshape(h, info["stride"])[:, : w * 3].reshape(h, w, 3)
        if info["flipped"]:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR → RGB
    ppm = _parse_ppm_header(payload)
    if ppm is not None:
        (_, w, h), info = ppm
        return (
            np.frombuffer(
                payload, dtype=np.uint8, count=w * h * 3,
                offset=info["offset"],
            )
            .reshape(h, w, 3)
            .copy()
        )
    return None


def encode_ppm(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → PPM P6 bytes (round-trips decode_image)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def encode_bmp(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    pixel_bytes = raster.tobytes()
    file_size = 54 + len(pixel_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835,
        0, 0,
    )
    return header + pixel_bytes


def resize_nearest(
    arr: "np.ndarray", width: int, height: int
) -> "np.ndarray":
    """Nearest-neighbor resize via integer index sampling — pure numpy
    fancy indexing, no interpolation kernel needed for thumbnail /
    model-input normalization."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


def channel_features(arr: "np.ndarray", thumb: int = 2) -> "np.ndarray":
    """Deterministic image features: per-channel mean/std (6 values)
    followed by a ``thumb×thumb`` grayscale thumbnail (row-major),
    all scaled to [0, 1] float32 — the shape a downstream embedding
    model slot replaces 1:1."""
    flat = arr.reshape(-1, 3).astype(np.float64)
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)]) / 255.0
    gray = arr.astype(np.float64).mean(axis=2)
    tiny = resize_nearest(gray[..., None], thumb, thumb)[..., 0] / 255.0
    return np.concatenate([stats, tiny.ravel()]).astype(np.float32)
