"""Motion-detection kernel: the reference's per-frame CV chain
(``MotionDetector.java:28-131``) re-implemented in pure numpy so it runs
vectorized inside Arrow-batched pandas UDFs (no JNI, no OpenCV dependency —
cv2 is not in this container; if present it could drop in for the blur /
contour steps with identical constants).

Reference algorithm constants (MotionDetector.java):
- grayscale BGR -> gray (cvtColor BGR2GRAY weights, :35,51)
- GaussianBlur 3x3 sigma=0 (:36,52) — OpenCV's fixed 3-tap kernel
  [0.25, 0.5, 0.25]
- absdiff(prev_gray, cur_gray) (:56)
- threshold(delta, 20, 255, THRESH_BINARY) (:59)
- findContours(RETR_EXTERNAL) + contourArea > 300 -> boundingRect (:111-131)

Deviation (documented): contour area is approximated by connected-component
pixel count (8-connectivity), which equals or exceeds OpenCV's polygon
contourArea for filled blobs; golden tests pin this implementation's exact
outputs (tests/test_motion_golden.py).
"""

from __future__ import annotations

import numpy as np

GRAY_WEIGHTS_BGR = np.array([0.114, 0.587, 0.299])  # OpenCV BGR2GRAY
BLUR_KERNEL_3 = np.array([0.25, 0.5, 0.25])  # OpenCV small_gaussian ksize=3, sigma<=0
DIFF_THRESHOLD = 20  # MotionDetector.java:59
MIN_AREA = 300  # MotionDetector.java:117


def bgr_to_gray(frame: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 BGR -> (H, W) uint8 gray (OpenCV weights, rounded)."""
    if frame.ndim == 2:
        return frame.astype(np.uint8)
    g = frame.astype(np.float64) @ GRAY_WEIGHTS_BGR
    return np.clip(np.rint(g), 0, 255).astype(np.uint8)


def gaussian_blur3(gray: np.ndarray) -> np.ndarray:
    """Separable 3x3 blur with replicated borders (OpenCV BORDER_DEFAULT is
    reflect-101; replicate differs only on the 1px border — pinned by the
    golden tests)."""
    padded = np.pad(gray.astype(np.float64), 1, mode="edge")
    h = (
        padded[:, :-2] * BLUR_KERNEL_3[0]
        + padded[:, 1:-1] * BLUR_KERNEL_3[1]
        + padded[:, 2:] * BLUR_KERNEL_3[2]
    )
    v = (
        h[:-2, :] * BLUR_KERNEL_3[0]
        + h[1:-1, :] * BLUR_KERNEL_3[1]
        + h[2:, :] * BLUR_KERNEL_3[2]
    )
    return np.clip(np.rint(v), 0, 255).astype(np.uint8)


def _connected_components_bboxes(mask: np.ndarray) -> list[tuple[int, int, int, int, int]]:
    """8-connected components of a boolean mask -> [(x, y, w, h, area)].
    Two-pass row-run union-find — O(pixels), no scipy/cv2 needed."""
    h, w = mask.shape
    parent: list[int] = []

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    # runs[row] = list of (start_col, end_col_exclusive, label)
    prev_runs: list[tuple[int, int, int]] = []
    all_runs: list[tuple[int, int, int, int]] = []  # (row, start, end, label)
    for y in range(h):
        row = mask[y]
        runs: list[tuple[int, int, int]] = []
        x = 0
        while x < w:
            if row[x]:
                start = x
                while x < w and row[x]:
                    x += 1
                label = len(parent)
                parent.append(label)
                # 8-connectivity: prev-row run [ps, pe) touches the current
                # run [start, x) if their column spans overlap within +/-1
                for ps, pe, pl in prev_runs:
                    if ps <= x and pe >= start:
                        union(label, pl)
                runs.append((start, x, label))
            else:
                x += 1
        prev_runs = runs
        for s, e, l in runs:
            all_runs.append((y, s, e, l))

    boxes: dict[int, list[int]] = {}
    for y, s, e, l in all_runs:
        root = find(l)
        if root not in boxes:
            boxes[root] = [s, y, e - 1, y, e - s]  # x0, y0, x1, y1, area
        else:
            bx = boxes[root]
            bx[0] = min(bx[0], s)
            bx[1] = min(bx[1], y)
            bx[2] = max(bx[2], e - 1)
            bx[3] = max(bx[3], y)
            bx[4] += e - s
    return [
        (x0, y0, x1 - x0 + 1, y1 - y0 + 1, area)
        for x0, y0, x1, y1, area in boxes.values()
    ]


def detect_motion_boxes(
    prev_pixels: bytes | None,
    cur_pixels: bytes,
    rows: int,
    cols: int,
    channels: int = 3,
) -> list[tuple[int, int, int, int]]:
    """The reference's full chain on a (prev, cur) frame pair:
    gray -> blur -> absdiff -> threshold(20) -> components(area > 300)
    -> bounding boxes, sorted by (x, y) for determinism.

    Returns [] when prev is missing (first frame per camera — the reference
    also skips detection then, VideoProcessor.java:182-187) or on a
    length-mismatched payload (MotionDetector.java:97-103 validation).
    """
    expected = rows * cols * channels
    if prev_pixels is None or len(prev_pixels) != expected or len(cur_pixels) != expected:
        return []
    shape = (rows, cols, channels) if channels > 1 else (rows, cols)
    prev = np.frombuffer(prev_pixels, dtype=np.uint8).reshape(shape)
    cur = np.frombuffer(cur_pixels, dtype=np.uint8).reshape(shape)
    pg = gaussian_blur3(bgr_to_gray(prev))
    cg = gaussian_blur3(bgr_to_gray(cur))
    delta = np.abs(pg.astype(np.int16) - cg.astype(np.int16))
    fg = delta > DIFF_THRESHOLD
    boxes = [
        (x, y, w, h)
        for x, y, w, h, area in _connected_components_bboxes(fg)
        if area > MIN_AREA
    ]
    return sorted(boxes)
