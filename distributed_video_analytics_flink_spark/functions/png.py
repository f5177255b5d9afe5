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
# Same per-image pixel budget as the animated decoders (sources/apng.py,
# sources/gif.py): a declared-dimensions sanity fence on untrusted input.
_MAX_PIXELS = 64 * 1024 * 1024

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


def unfilter_scanlines(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering: ``raw`` is the zlib-decompressed
    byte stream of ``h`` scanlines, each 1 filter byte + w*ch samples.
    Returns (h, w*ch) uint8. Shared by decode_png and the APNG frame
    decoder (sources/apng.py) — fdAT payloads are filtered exactly like
    IDAT, over the FRAME's width, so the one implementation serves both.
    Raises ValueError on truncation or an unknown filter type."""
    stride = w * ch
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        f, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: wrapping prefix-sum per channel lane
            lanes = line.reshape(w, ch)
            cur = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur = line + prior  # uint8 wraps
        elif f in (3, 4):  # Average / Paeth: sequential in x
            # plain-list arithmetic with _paeth inlined: numpy scalar
            # indexing costs ~100 ns per access vs ~10 ns for a list —
            # a ~5x win on the only per-sample loop left, which APNG
            # moved onto a per-frame video path (real-world encoders
            # emit adaptive filtering, heavily Paeth; r10 review)
            cur_l = [0] * stride
            prior_l = prior.tolist()
            line_l = line.tolist()
            if f == 3:
                for x in range(stride):
                    a = cur_l[x - ch] if x >= ch else 0
                    cur_l[x] = (line_l[x] + ((a + prior_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = cur_l[x - ch] if x >= ch else 0
                    b = prior_l[x]
                    c = prior_l[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    cur_l[x] = (line_l[x] + pr) & 0xFF
            cur = np.array(cur_l, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = cur
        prior = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """General 8-bit PNG decode over stdlib zlib: color types 0 (gray),
    2 (RGB), 6 (RGBA — alpha dropped), all five scanline filters
    (None/Sub/Up/Average/Paeth), non-interlaced. Returns (H, W, 3) uint8
    BGR — the pipeline's frame format. This closes the multimodal ingest
    loop: the engine can re-read its own annotated side-output PNGs (CV7)
    and arbitrary externally-produced 8-bit PNGs with zero codec
    dependency. Filters None/Sub/Up unfilter vectorized per scanline
    (Sub is a wrapping uint8 prefix-sum per channel lane); Average/Paeth
    are sequential in x by construction, so those scanlines take the
    list-arithmetic loop in unfilter_scanlines (~358 ms for a worst-case
    all-Paeth 640x480 RGBA frame — a real price on APNG's per-frame
    path, priced in SCALE.md; stills and the engine's own filter-0
    side-outputs never pay it).

    Raises ValueError on non-PNG bytes or unsupported subsets (16-bit,
    palette, interlaced) — callers treat that as PERMISSIVE skip."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            if len(payload) < 13:
                # struct.error is not ValueError: without this check a
                # truncated IHDR would escape the PERMISSIVE guards at
                # every ingest call site and kill the task
                raise ValueError("truncated IHDR")
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in (0, 2, 6):
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible dimensions {w}x{h}")
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    # BOUNDED decompress: IDAT is untrusted (PERMISSIVE ingest reads
    # arbitrary files); a plain zlib.decompress is a decompression bomb —
    # max_length caps output at exactly the declared scanline need, same
    # fix as the APNG frame path (sources/apng.py).
    try:
        raw = zlib.decompressobj().decompress(idat, h * (1 + w * ch))
    except zlib.error as exc:
        raise ValueError(f"bad IDAT deflate: {exc}") from exc
    out = unfilter_scanlines(raw, w, h, ch)
    px = out.reshape(h, w, ch)
    if ch == 1:
        rgb = np.repeat(px, 3, axis=2)
    elif ch == 4:
        rgb = px[:, :, :3]
    else:
        rgb = px
    return rgb[:, :, ::-1].copy()  # RGB -> BGR
