"""Minimal PNG encode (and a decode used by tests) over stdlib zlib — no
codec libraries exist in this environment, and PNG's uncompressed-pipeline
subset (8-bit RGB, filter 0) needs only zlib + CRC32. This makes the
reference's annotated-image side output (MotionDetector.java:133-177,
imwrite at :155) REAL rather than stubbed: frames are annotated with
detection rectangles in numpy (CV6, MotionDetector.java:63-66) and written
as valid PNG files any image viewer opens.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# reference draws green boxes: Scalar(0, 255, 0) BGR (MotionDetector.java:64)
BOX_BGR = (0, 255, 0)
BOX_THICKNESS = 2


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_bgr(frame: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> PNG bytes (8-bit RGB, filter 0 scanlines)."""
    h, w, _ = frame.shape
    rgb = frame[:, :, ::-1]  # PNG stores RGB; frames are BGR like OpenCV
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)  # leading 0 = filter type None
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_bgr(data: bytes) -> np.ndarray:
    """Inverse of encode_png_bgr (filter-0 8-bit RGB only) — used by tests
    to prove the files roundtrip; not a general PNG reader."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert (bit_depth, color_type) == (8, 2), "unsupported PNG subset"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, 3)[:, :, ::-1].copy()


def draw_boxes_bgr(
    frame: np.ndarray, boxes: list[tuple[int, int, int, int]]
) -> np.ndarray:
    """CV6: green rectangles on a copy of the frame
    (MotionDetector.java:63-66 — cv2.rectangle, thickness 2)."""
    out = frame.copy()
    h, w = out.shape[:2]
    for x, y, bw, bh in boxes:
        x0, y0 = max(0, x), max(0, y)
        x1, y1 = min(w, x + bw), min(h, y + bh)
        t = BOX_THICKNESS
        out[y0 : min(y0 + t, h), x0:x1] = BOX_BGR  # top
        out[max(y1 - t, 0) : y1, x0:x1] = BOX_BGR  # bottom
        out[y0:y1, x0 : min(x0 + t, w)] = BOX_BGR  # left
        out[y0:y1, max(x1 - t, 0) : x1] = BOX_BGR  # right
    return out


def annotate_png(
    pixels: bytes, rows: int, cols: int, boxes: list[tuple[int, int, int, int]]
) -> bytes | None:
    """Full CV6+CV7 step: raw BGR payload + boxes -> annotated PNG bytes.
    None on an invalid payload (caller skips the write, like the reference
    logs-and-continues)."""
    if pixels is None or len(pixels) != rows * cols * 3:
        return None
    frame = np.frombuffer(pixels, dtype=np.uint8).reshape(rows, cols, 3)
    return encode_png_bgr(draw_boxes_bgr(frame, boxes))
