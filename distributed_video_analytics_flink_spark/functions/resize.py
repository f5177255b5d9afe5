"""Bicubic image resize in pure vectorized numpy (T5 — the producer resizes
every frame to 640x480 with cv2.INTER_CUBIC, VideoEventCreator.java:75,
target dims :40-41). No codec/CV library exists in this container, so this
implements the same algorithm directly: separable convolution with the
Catmull-Rom-family cubic kernel OpenCV uses (a = -0.75), half-pixel-center
source mapping, replicated borders.

Not claimed bit-identical to OpenCV (border mode and fixed-point rounding
differ in the last ULP); golden tests pin THIS implementation's exact
outputs plus the analytic invariants any correct bicubic has (constant
images are fixed points, linear ramps are preserved in the interior).
"""

from __future__ import annotations

import numpy as np

_A = -0.75  # OpenCV's bicubic coefficient


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    w = np.zeros_like(ax)
    m1 = ax <= 1
    m2 = (ax > 1) & (ax < 2)
    w[m1] = (_A + 2) * ax[m1] ** 3 - (_A + 3) * ax[m1] ** 2 + 1
    w[m2] = _A * ax[m2] ** 3 - 5 * _A * ax[m2] ** 2 + 8 * _A * ax[m2] - 4 * _A
    return w


def _axis_weights(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """For each output index: 4 source taps (clamped) + kernel weights.
    Half-pixel centers: src_x = (dst_x + 0.5) * scale - 0.5."""
    scale = src / dst
    centers = (np.arange(dst) + 0.5) * scale - 0.5
    base = np.floor(centers).astype(np.int64)
    frac = centers - base
    taps = base[:, None] + np.arange(-1, 3)[None, :]  # (dst, 4)
    weights = _cubic_kernel(taps - centers[:, None])
    weights /= weights.sum(axis=1, keepdims=True)  # exact partition of unity
    return np.clip(taps, 0, src - 1), weights


def cubic_resize(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W[, C]) uint8 -> (out_h, out_w[, C]) uint8, separable bicubic."""
    squeeze = frame.ndim == 2
    if squeeze:
        frame = frame[:, :, None]
    h, w, c = frame.shape
    ty, wy = _axis_weights(h, out_h)
    tx, wx = _axis_weights(w, out_w)
    f = frame.astype(np.float64)
    # rows: gather 4 taps per output row -> weighted sum. (out_h, 4, W, C)
    rows = (f[ty] * wy[:, :, None, None]).sum(axis=1)  # (out_h, W, C)
    cols = (rows[:, tx] * wx[None, :, :, None]).sum(axis=2)  # (out_h, out_w, C)
    out = np.clip(np.rint(cols), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def resize_payload(
    pixels: bytes, rows: int, cols: int, out_h: int = 480, out_w: int = 640
) -> bytes | None:
    """Wire-format step: raw BGR payload at (rows, cols) -> payload at
    (out_h, out_w). None on a length-mismatched payload."""
    if pixels is None or len(pixels) != rows * cols * 3:
        return None
    frame = np.frombuffer(pixels, dtype=np.uint8).reshape(rows, cols, 3)
    return cubic_resize(frame, out_h, out_w).tobytes()
