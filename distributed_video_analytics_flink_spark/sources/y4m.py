"""Codec-free video pixel decode: YUV4MPEG2 (.y4m) reader, pure stdlib+numpy.

The reference decodes real frames with OpenCV ``VideoCapture``
(VideoEventCreator.java:54-96). This container ships no codec library, so
compressed formats stay behind an honest stub — but Y4M is an UNcompressed
interchange format (the one ffmpeg/mjpegtools use for raw pipes): a text
header, then each frame as a ``FRAME\\n`` marker followed by raw planar YUV
bytes. Parsing it needs nothing beyond byte slicing, which makes the video
path end-to-end REAL on genuine video bytes: binaryFile scan -> Y4M frame
slices -> integer-exact YUV->BGR -> (optional) bicubic resize -> the same
base64-BGR wire rows the Kafka producer emits.

Format (public spec, shipped as doc/y4m.txt with mjpegtools):
  ``YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip|t|b|m] [A<n>:<d>] [C<space>] ...\\n``
  then per frame: ``FRAME[ params]\\n`` + planar Y, then subsampled Cb, Cr.
Supported colorspaces: C420 family (420, 420jpeg, 420mpeg2, 420paldv —
identical plane layout, chroma siting differences are sub-pixel and
irrelevant to nearest-neighbor upsampling), C422, C444, Cmono.

YUV->BGR uses the classic BT.601 limited-range fixed-point formulas
(integer arithmetic, deterministic across platforms):
  C = Y-16, D = U-128, E = V-128
  R = clip((298*C + 409*E + 128) >> 8)
  G = clip((298*C - 100*D - 208*E + 128) >> 8)
  B = clip((298*C + 516*D + 128) >> 8)
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "


class Y4MError(ValueError):
    """Malformed Y4M input (callers treat like any corrupt-file case)."""


@dataclass(frozen=True)
class Y4MHeader:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    header_len: int  # bytes up to and including the terminating \n

    @property
    def fps(self) -> float:
        return self.fps_num / self.fps_den if self.fps_den else 0.0

    @property
    def frame_bytes(self) -> int:
        y = self.width * self.height
        if self.colorspace == "mono":
            return y
        if self.colorspace.startswith("420"):
            # chroma planes are ceil(w/2) x ceil(h/2)
            return y + 2 * (((self.width + 1) // 2) * ((self.height + 1) // 2))
        if self.colorspace.startswith("422"):
            return y + 2 * (((self.width + 1) // 2) * self.height)
        if self.colorspace.startswith("444"):
            return 3 * y
        raise Y4MError(f"unsupported colorspace C{self.colorspace}")


def parse_y4m_header(data: bytes) -> Y4MHeader:
    if not data.startswith(Y4M_MAGIC):
        raise Y4MError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n", 0, 512)
    if nl < 0:
        raise Y4MError("unterminated Y4M header")
    width = height = 0
    fps_num, fps_den = 30, 1
    colorspace = "420"  # spec default when no C tag is present
    for tag in data[len(Y4M_MAGIC) : nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        try:
            if key == b"W":
                width = int(val)
            elif key == b"H":
                height = int(val)
            elif key == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif key == b"C":
                colorspace = val.decode("ascii")
            # I (interlace), A (aspect), X (extensions) don't affect decode
        except (ValueError, UnicodeDecodeError) as exc:
            raise Y4MError(f"bad Y4M header tag {tag!r}") from exc
    if width <= 0 or height <= 0:
        raise Y4MError("Y4M header missing W/H")
    hdr = Y4MHeader(width, height, fps_num, fps_den, colorspace, nl + 1)
    hdr.frame_bytes  # validates the colorspace eagerly
    return hdr


def _yuv_to_bgr(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(H,W) planes -> (H,W,3) uint8 BGR; integer-exact BT.601 limited."""
    c = y.astype(np.int32) - 16
    d = u.astype(np.int32) - 128
    e = v.astype(np.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def _gray_to_bgr(y: np.ndarray) -> np.ndarray:
    c = ((298 * (y.astype(np.int32) - 16) + 128) >> 8)
    g = np.clip(c, 0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def decode_y4m(
    data: bytes, max_frames: int | None = None
) -> tuple[Y4MHeader, Iterator[np.ndarray]]:
    """Parse header and return (header, iterator of (H, W, 3) BGR frames).

    Frame slicing is pure offset math over the raw buffer — the whole file
    is never copied, and a truncated final frame simply ends the stream
    (PERMISSIVE, matching the engine's corrupt-input stance)."""
    hdr = parse_y4m_header(data)

    def frames() -> Iterator[np.ndarray]:
        w, h = hdr.width, hdr.height
        cw, ch = (w + 1) // 2, (h + 1) // 2
        fsize = hdr.frame_bytes
        pos = hdr.header_len
        emitted = 0
        while max_frames is None or emitted < max_frames:
            nl = data.find(b"\n", pos, pos + 256)
            if nl < 0 or not data[pos : pos + 5] == b"FRAME":
                return
            start = nl + 1
            if start + fsize > len(data):
                return  # truncated tail: stop, don't raise
            y = np.frombuffer(data, np.uint8, w * h, start).reshape(h, w)
            if hdr.colorspace == "mono":
                yield _gray_to_bgr(y)
            elif hdr.colorspace.startswith("420"):
                u = np.frombuffer(data, np.uint8, cw * ch, start + w * h).reshape(ch, cw)
                v = np.frombuffer(
                    data, np.uint8, cw * ch, start + w * h + cw * ch
                ).reshape(ch, cw)
                # nearest-neighbor 2x2 upsample, cropped to the luma grid
                u2 = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w]
                v2 = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w]
                yield _yuv_to_bgr(y, u2, v2)
            elif hdr.colorspace.startswith("422"):
                u = np.frombuffer(data, np.uint8, cw * h, start + w * h).reshape(h, cw)
                v = np.frombuffer(data, np.uint8, cw * h, start + w * h + cw * h).reshape(h, cw)
                u2 = np.repeat(u, 2, 1)[:, :w]
                v2 = np.repeat(v, 2, 1)[:, :w]
                yield _yuv_to_bgr(y, u2, v2)
            else:  # 444
                u = np.frombuffer(data, np.uint8, w * h, start + w * h).reshape(h, w)
                v = np.frombuffer(data, np.uint8, w * h, start + 2 * w * h).reshape(h, w)
                yield _yuv_to_bgr(y, u, v)
            pos = start + fsize
            emitted += 1

    return hdr, frames()


def probe_y4m(data: bytes) -> dict:
    """Container-metadata probe (the Y4M twin of sources/mp4.py::probe_mp4):
    header fields + frame count by offset arithmetic — no pixel work."""
    hdr = parse_y4m_header(data)
    n = 0
    pos = hdr.header_len
    while True:
        nl = data.find(b"\n", pos, pos + 256)
        if nl < 0 or data[pos : pos + 5] != b"FRAME" or nl + 1 + hdr.frame_bytes > len(data):
            break
        n += 1
        pos = nl + 1 + hdr.frame_bytes
    return {
        "duration_s": (n / hdr.fps) if hdr.fps else None,
        "width": float(hdr.width),
        "height": float(hdr.height),
        "n_frames": n,
        "codec": f"y4m/{hdr.colorspace}",
        "fps": hdr.fps,
    }


def encode_y4m(frames_yuv: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
               fps: tuple[int, int] = (30, 1), colorspace: str = "420jpeg") -> bytes:
    """Assemble a C420 Y4M byte stream from (Y, U, V) planes — the test/
    fixture writer (FIXTURES.md): goldens need real Y4M bytes on disk and
    round-trip through the same header/frame framing the reader parses."""
    if not frames_yuv:
        raise Y4MError("need at least one frame")
    h, w = frames_yuv[0][0].shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    parts = [head.encode("ascii")]
    for y, u, v in frames_yuv:
        parts.append(b"FRAME\n")
        parts.append(y.astype(np.uint8).tobytes())
        parts.append(u.astype(np.uint8).tobytes())
        parts.append(v.astype(np.uint8).tobytes())
    return b"".join(parts)
