"""S4: video-file ingestion (SURVEY.md §2.1) — the batch analog of the
producer's OpenCV ``VideoCapture`` scan (VideoEventCreator.java:54-96: open
file or device, read frames, resize to 640x480, pace at ~30 fps).

Spark shape: ``spark.read.format("binaryFile")`` scans the files (one
partition per file up to maxPartitionBytes — embarrassingly parallel across
a 100 TB video corpus), then a ``mapInPandas`` extractor turns each file's
bytes into wire-format frame rows (FRAME_SCHEMA: camId from the file stem,
timestamps paced 33 ms apart, base64 BGR payloads).

Decode is REAL for FIVE containers — Y4M (YUV4MPEG2: pure byte-slicing
header/frame parse + integer-exact YUV->BGR, sources/y4m.py), AVI (RIFF
chunk walk, sources/avi.py: raw-DIB BGR rows AND per-chunk baseline-JPEG
MJPEG via sources/jpeg.py), MP4 when the video track carries
Motion-JPEG samples (ISO BMFF sample-table walk + the same JPEG codec,
sources/mp4.py), animated GIF (LZW + palette + INTER-FRAME canvas
compositing with disposal/transparency, sources/gif.py — the first
genuinely inter-frame format decoded for real), and animated PNG
(fcTL/fdAT chains through the engine's own PNG unfilter with
dispose/blend compositing incl. exact-integer alpha OVER,
sources/apng.py) — plus PNG stills, each
through the engine's own bicubic resize to the target dims
(functions/resize.py, the analog of VideoEventCreator.java:75's
cv2.resize) — so genuine video bytes flow end-to-end through the motion
pipeline with zero codec dependency.

MOTION-COMPENSATED codecs (avc1/H.264 etc.) remain a STUB: this container ships
no cv2/ffmpeg, so such files fall to ``_decode_frames_stub``, which
synthesizes deterministic frames from the file bytes (content-seeded,
reproducible). The binaryFile scan, partitioning, Arrow batching, schema,
and pacing are the production path — swap the stub for a
``cv2.VideoCapture`` loop when codecs exist.
"""

from __future__ import annotations

import base64
import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA
from distributed_video_analytics_flink_spark.sources.gif import is_gif
from distributed_video_analytics_flink_spark.sources.avi import (
    AviError,
    decode_avi,
    is_avi,
)
from distributed_video_analytics_flink_spark.sources.y4m import (
    Y4M_MAGIC,
    Y4MError,
    decode_y4m,
)

FRAME_INTERVAL_MS = 33  # ~30 fps pacing (VideoEventCreator.java:78)
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z; deterministic base


def _decode_frames_stub(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """STUB decoder: yields deterministic (rows, cols, 3) uint8 frames
    seeded from the file bytes. A real build replaces this generator with
    cv2.VideoCapture frame reads + resize; nothing else changes."""
    n = min(max_frames, max(1, len(content) // 4096))
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    # dark noise base + saturated moving block: the 16px step leaves
    # 16x32 = 512px edge strips, comfortably over the 300px area gate, and
    # the >=127 contrast survives the 3x3 blur everywhere in the strip
    base = rng.integers(0, 128, size=(rows, cols, 3), dtype=np.uint8)
    side = min(32, rows - 8, cols)
    for i in range(n):
        frame = base.copy()
        x0 = (16 * i) % max(1, cols - side)
        frame[8 : 8 + side, x0 : x0 + side, :] = 255
        yield frame


def _decode_frame_png(content: bytes, rows: int, cols: int) -> Iterator[np.ndarray]:
    """REAL decoder for PNG images (single frame per file): the general
    stdlib decoder (functions/png.py::decode_png — all five scanline
    filters, gray/RGB/RGBA) + the engine's bicubic resize to the pipeline
    dims. Closes the multimodal loop: the engine's own annotated
    side-output PNGs (CV7) and externally produced 8-bit images ingest as
    pixel rows. Unsupported subsets (16-bit, palette, interlaced) yield
    no rows, not failures (PERMISSIVE)."""
    import zlib

    from distributed_video_analytics_flink_spark.functions.png import decode_png
    from distributed_video_analytics_flink_spark.functions.resize import cubic_resize

    try:
        bgr = decode_png(content)
    except (ValueError, zlib.error):
        return
    if bgr.shape[:2] != (rows, cols):
        bgr = cubic_resize(bgr, rows, cols)
    yield bgr


def _resized(frames: Iterator[np.ndarray], rows: int, cols: int) -> Iterator[np.ndarray]:
    from distributed_video_analytics_flink_spark.functions.resize import cubic_resize

    for bgr in frames:
        if bgr.shape[:2] != (rows, cols):
            bgr = cubic_resize(bgr, rows, cols)
        yield bgr


def _decode_frames_y4m(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """REAL decoder for uncompressed Y4M bytes: frame slices -> BGR ->
    bicubic resize to the pipeline dims when the container dims differ
    (VideoEventCreator.java:75's resize step). Malformed tails end the
    stream (PERMISSIVE). NOT a generator function: the header parse (and
    its Y4MError on corrupt input) runs HERE, so the caller's try/except
    actually sees it — a lazy generator would defer the raise into the
    iteration loop, past the guard (ADVICE-grade bug found in r6 review)."""
    _, frames = decode_y4m(content, max_frames=max_frames)  # eager header parse
    return _resized(frames, rows, cols)


def _decode_frames_avi(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """REAL decoder for raw-DIB AVI bytes (sources/avi.py): movi chunks
    are already literal BGR rows, so this is slicing + the same resize
    step as the Y4M path. Same eager-header contract as the Y4M twin:
    AviError (corrupt header, compressed stream) raises here, inside the
    caller's guard, not lazily at first iteration."""
    _, frames = decode_avi(content, max_frames=max_frames)  # eager header parse
    return _resized(frames, rows, cols)


def _decode_frames_mp4(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """REAL decoder for MJPEG-carrying MP4s (sources/mp4.py): sample-table
    walk + baseline-JPEG decode per sample, then the shared resize. Same
    eager-header contract: Mp4Error (no video track, avc1/H.264, missing
    sample tables) raises here so the caller can fall back to the
    compressed-codec stub — exactly the behavior such files had before."""
    from distributed_video_analytics_flink_spark.sources.mp4 import decode_mp4

    _, frames = decode_mp4(content, max_frames=max_frames)  # eager trak parse
    return _resized(frames, rows, cols)


def _decode_frames_gif(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """REAL decoder for animated GIF (sources/gif.py): LZW + palette +
    inter-frame compositing (disposal/transparency) to full-canvas BGR,
    then the shared resize. The strict-header/permissive-tail stance
    (corrupt header -> zero rows, corrupt tail -> stream ends after the
    good prefix, the task never dies) lives in ONE place —
    gif.decode_gif_permissive — shared with the ``format("gif")`` Data
    Source so the two ingest paths cannot drift."""
    from distributed_video_analytics_flink_spark.sources.gif import (
        decode_gif_permissive,
    )

    _, frames = decode_gif_permissive(content, max_frames=max_frames)
    return _resized(frames, rows, cols)


def _decode_frames_apng(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """REAL decoder for animated PNG (sources/apng.py): fdAT chains
    through the engine's own PNG unfilter, composited per fcTL
    dispose/blend ops, then the shared resize. Strict-header/
    permissive-tail stance lives in decode_apng_permissive (the
    gif-decoder contract)."""
    from distributed_video_analytics_flink_spark.sources.apng import (
        decode_apng_permissive,
    )

    _, frames = decode_apng_permissive(content, max_frames=max_frames)
    return _resized(frames, rows, cols)


def _decode_frames_png_or_apng(
    content: bytes, rows: int, cols: int, max_frames: int
) -> Iterator[np.ndarray]:
    """ONE dispatch site for PNG-signature bytes (r10 review: the
    animated-vs-still branch was copy-pasted into read_video_files and
    iter_chunk_rows — a stance change landing in one and not the other
    would silently diverge the binaryFile and chunk-passthrough paths):
    acTL before IDAT means animated (inter-frame compositing decode,
    source-side), else a single still frame."""
    from distributed_video_analytics_flink_spark.sources.apng import is_apng

    if is_apng(content):
        return _decode_frames_apng(content, rows, cols, max_frames)
    return _decode_frame_png(content, rows, cols)


def read_video_files(
    spark: SparkSession,
    path: str,
    glob: str = "*.{mp4,y4m,avi,gif,apng}",
    rows: int = 480,
    cols: int = 640,
    max_frames_per_file: int = 64,
) -> DataFrame:
    """Scan video files into wire-format frame rows. camId = file stem (the
    producer keys messages by camera id the same way), timestamps are paced
    FRAME_INTERVAL_MS apart from a fixed deterministic epoch. Dispatch is
    by content magic, not extension: Y4M, AVI (raw-DIB + MJPEG), PNG, GIF
    (inter-frame compositing), and MJPEG-MP4 get the real decode;
    remaining inter-frame codecs (avc1 etc.) fall to the compressed-codec
    stub."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                cam = os.path.splitext(os.path.basename(p))[0]
                raw = bytes(content)
                if raw.startswith(Y4M_MAGIC):
                    try:
                        decoded = _decode_frames_y4m(raw, rows, cols, max_frames_per_file)
                    except Y4MError:
                        decoded = iter(())  # corrupt header: no rows, no failure
                elif is_avi(raw):
                    try:
                        decoded = _decode_frames_avi(raw, rows, cols, max_frames_per_file)
                    except AviError:
                        decoded = iter(())  # corrupt/compressed: no rows, no failure
                elif raw.startswith(b"\x89PNG"):
                    decoded = _decode_frames_png_or_apng(
                        raw, rows, cols, max_frames_per_file
                    )
                elif is_gif(raw):
                    # corrupt header/tail handled inside (shared stance)
                    decoded = _decode_frames_gif(raw, rows, cols, max_frames_per_file)
                elif len(raw) >= 12 and raw[4:8] == b"ftyp":
                    from distributed_video_analytics_flink_spark.sources.mp4 import Mp4Error

                    try:
                        decoded = _decode_frames_mp4(raw, rows, cols, max_frames_per_file)
                    except Mp4Error:
                        # inter-frame codec (avc1 etc.) or corrupt: the
                        # stub keeps these files' pre-MJPEG behavior
                        decoded = _decode_frames_stub(
                            raw, rows, cols, max_frames_per_file
                        )
                else:
                    decoded = _decode_frames_stub(raw, rows, cols, max_frames_per_file)
                for i, frame in enumerate(decoded):
                    out.append(
                        (
                            cam,
                            np.datetime64(
                                _EPOCH_US + i * FRAME_INTERVAL_MS * 1000, "us"
                            ),
                            rows,
                            cols,
                            16,  # CV_8UC3
                            base64.b64encode(frame.tobytes()).decode("ascii"),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["camId", "timestamp", "rows", "cols", "type", "data"]
            )

    return files.mapInPandas(_extract, FRAME_SCHEMA)


# Compressed-passthrough frame rows: `chunk` is the still-encoded payload
# (JPEG bytes for MJPEG containers, raw BGR for everything else), so a
# keyBy(camId) exchange carries ~30-60 KB per compressed frame instead of
# the ~921 KB of decoded 640x480 BGR — the reference's only shuffle is the
# same keyBy (VideoProcessor.java:86-87), and at 100 TB the exchange, not
# the decode, is the bottleneck (SCALE.md; r8 VERDICT #1).
# src_rows/src_cols are the container-declared dims (0 = unknown, fixed by
# the first good frame, matching decode_mp4's stance); rows/cols are the
# pipeline target dims the post-shuffle decode resizes to.
CHUNK_SCHEMA = (
    "camId string, timestamp timestamp, src_rows int, src_cols int, "
    "rows int, cols int, codec string, chunk binary"
)

# the all-null metadata row for a container whose probe fails — ONE
# definition (r14 review: four copy-pasted fromkeys tuples meant a new
# metadata column could miss a corrupt-file branch and KeyError at
# row-build time, the branch hardest to hit in tests)
_META_KEYS = ("duration_s", "width", "height", "n_frames", "codec", "fps")


def _null_meta() -> dict:
    return dict.fromkeys(_META_KEYS)


def iter_chunk_rows(
    raw: bytes, cam: str, rows: int, cols: int, max_frames: int
) -> Iterator[tuple]:
    """One file's compressed-passthrough rows:
    ``(camId, ts_us, src_rows, src_cols, rows, cols, codec, chunk_bytes)``.
    MJPEG AVI/MP4 demux by pure offset math (codec='mjpeg', chunk = the
    still-encoded JPEG); everything else decodes source-side exactly like
    ``read_video_files`` and emits codec='raw-bgr' pixels at the target
    dims. The single copy shared by the binaryFile scan
    (:func:`read_video_chunks`) and the ``videochunks`` Data Source
    (batch + streaming), so skip semantics cannot drift between them."""
    from distributed_video_analytics_flink_spark.sources.avi import (
        _chunks as _avi_chunks,
    )
    from distributed_video_analytics_flink_spark.sources.avi import parse_avi_header
    from distributed_video_analytics_flink_spark.sources.jpeg import is_jpeg
    from distributed_video_analytics_flink_spark.sources.mp4 import Mp4Error

    def _mjpeg_avi(hdr) -> Iterator[tuple[int, int, bytes]]:
        want = (b"%02ddb" % hdr.stream_id, b"%02ddc" % hdr.stream_id)
        n = 0
        for cid, body, size, declared in _avi_chunks(raw, hdr.movi_start, hdr.movi_end):
            if n >= max_frames:
                return
            if cid not in want:
                continue
            if size < declared:
                return  # chopped final chunk ends the stream
            if not is_jpeg(raw[body : body + 3]):
                continue
            yield hdr.height, hdr.width, raw[body : body + size]
            n += 1

    def _mjpeg_mp4() -> Iterator[tuple[int, int, bytes]]:
        from distributed_video_analytics_flink_spark.sources.mp4 import (
            MJPEG_SAMPLE_ENTRIES,
            _find_video_trak,
            video_sample_ranges,
        )

        trak = _find_video_trak(raw)
        if trak.get("codec") not in MJPEG_SAMPLE_ENTRIES:
            raise Mp4Error(f"unsupported codec {trak.get('codec')!r}")
        ranges = list(video_sample_ranges(trak))
        sr = int(trak.get("height") or 0)
        sc = int(trak.get("width") or 0)

        def gen() -> Iterator[tuple[int, int, bytes]]:
            n = 0
            for off, size in ranges:
                if n >= max_frames:
                    return
                if off + size > len(raw):
                    return  # truncated mdat ends the stream
                if not is_jpeg(raw[off : off + 3]):
                    continue
                yield sr, sc, raw[off : off + size]
                n += 1

        return gen()

    chunks: Iterator[tuple[int, int, bytes]] | None = None
    codec = "mjpeg"
    if is_avi(raw):
        try:
            hdr = parse_avi_header(raw)
        except AviError:
            return  # corrupt header: no rows, no failure
        if hdr.codec == "mjpeg":
            chunks = _mjpeg_avi(hdr)
    elif len(raw) >= 12 and raw[4:8] == b"ftyp":
        try:
            chunks = _mjpeg_mp4()
        except Mp4Error:
            chunks = None  # inter-frame codec: raw fallback below
    if chunks is None:
        # non-compressed (or non-MJPEG) container: decode at the source
        # like read_video_files — these bytes ARE pixels
        codec = "raw-bgr"
        if raw.startswith(Y4M_MAGIC):
            try:
                decoded = _decode_frames_y4m(raw, rows, cols, max_frames)
            except Y4MError:
                decoded = iter(())
        elif is_avi(raw):
            try:
                decoded = _decode_frames_avi(raw, rows, cols, max_frames)
            except AviError:
                decoded = iter(())
        elif raw.startswith(b"\x89PNG"):
            # APNG is inter-frame like GIF: decode source-side (shared
            # animated-vs-still dispatch)
            decoded = _decode_frames_png_or_apng(raw, rows, cols, max_frames)
        elif is_gif(raw):
            # GIF frames are inter-frame (palette + canvas compositing
            # state), so a chunk is NOT independently decodable — GIF
            # decodes source-side and ships raw-bgr, the same stance as
            # every non-MJPEG container; corrupt files handled inside
            decoded = _decode_frames_gif(raw, rows, cols, max_frames)
        else:
            decoded = _decode_frames_stub(raw, rows, cols, max_frames)
        chunks = ((rows, cols, f.tobytes()) for f in decoded)
    for i, (sr, sc, body) in enumerate(chunks):
        yield (
            cam,
            _EPOCH_US + i * FRAME_INTERVAL_MS * 1000,
            sr,
            sc,
            rows,
            cols,
            codec,
            body,
        )


def decode_chunk_to_pixels(
    expect: dict, cam: str, sr: int, sc: int, r: int, c: int, codec: str, chunk
):
    """Post-shuffle decode for ONE chunk row — the consumer-side half of
    the compressed passthrough, shared by the batch motion fold
    (operators/video.py) and the streaming fold (streaming/motion.py).
    Returns pixel bytes at the target dims, None (null payload ->
    PERMISSIVE empty frame), or Ellipsis meaning SKIP (drop the row, keep
    the previous-frame carry) — the exact stance the source-side decoders
    take per bad chunk. ``expect`` carries each camera's fixed frame dims
    (header-declared when known, else the first good frame fixes them —
    decode_mp4's rule).

    Dims may arrive as pandas-nullable values (a PERMISSIVE parse nulls
    them, and Arrow hands nullable ints to pandas as NaN floats);
    normalization to 0 lives HERE — the one shared site — so the batch
    and streaming folds' skip semantics cannot drift (r10 review: both
    callers previously carried copy-pasted isna guards)."""
    sr = 0 if pd.isna(sr) else int(sr)
    sc = 0 if pd.isna(sc) else int(sc)
    r = 0 if pd.isna(r) else int(r)
    c = 0 if pd.isna(c) else int(c)
    if chunk is None:
        return None
    if codec != "mjpeg":
        return bytes(chunk)  # raw-bgr: already target-dim pixels
    if r <= 0 or c <= 0:
        # PERMISSIVE-nulled target dims (null -> 0 via the callers'
        # isna guards): degrade to the empty frame — same observable row
        # as the pixel path's nulled-dims stance (0 boxes, state
        # advances) — rather than resize to 0x0 (ZeroDivisionError would
        # kill the task; r9 ADVICE)
        return None
    from distributed_video_analytics_flink_spark.functions.resize import cubic_resize
    from distributed_video_analytics_flink_spark.sources.jpeg import (
        JpegError,
        decode_jpeg,
    )

    try:
        img = decode_jpeg(bytes(chunk))
    except JpegError:
        return Ellipsis
    exp = expect.get(cam)
    if exp is None:
        exp = (sr, sc) if sr > 0 and sc > 0 else img.shape[:2]
        expect[cam] = exp
    if img.shape[:2] != exp:
        return Ellipsis
    if img.shape[:2] != (r, c):
        img = cubic_resize(img, r, c)
    return img.tobytes()


def read_video_chunks(
    spark: SparkSession,
    path: str,
    glob: str = "*.{mp4,y4m,avi,gif,apng}",
    rows: int = 480,
    cols: int = 640,
    max_frames_per_file: int = 64,
) -> DataFrame:
    """S4 compressed-passthrough scan: like ``read_video_files`` but MJPEG
    containers (AVI + MP4) are demuxed WITHOUT decoding — pure chunk/sample
    offset math (sources/avi.py::_chunks, sources/mp4.py::
    video_sample_ranges) yields the per-frame JPEG bytes as ``chunk`` rows
    (codec='mjpeg'), deferring the expensive entropy decode until AFTER the
    motion pipeline's keyBy shuffle, where the pixels are consumed exactly
    once (operators/video.py::detect_motion_batch's chunk branch).

    Non-passthrough containers (Y4M, raw-DIB AVI, PNG, GIF — whose frames
    depend on palette + composited-canvas state, so a chunk is not
    independently decodable — and the motion-compensated stub) genuinely
    must ship pixels, so they decode source-side exactly as
    ``read_video_files`` does and emit codec='raw-bgr' chunks already at
    the target dims — one API covers a mixed corpus.

    Divergence from the decode-first path, by design and only on CORRUPT
    files: timestamps pace by extracted-chunk index, so a mid-file chunk
    that passes the cheap container checks here but later fails full JPEG
    decode (skipped post-shuffle) leaves a 33 ms gap where the decode-first
    path would compact the timeline; clean files are frame-identical
    (pinned by tests/test_chunk_passthrough.py)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                cam = os.path.splitext(os.path.basename(p))[0]
                for row in iter_chunk_rows(
                    bytes(content), cam, rows, cols, max_frames_per_file
                ):
                    out.append((row[0], np.datetime64(row[1], "us")) + row[2:])
            yield pd.DataFrame(
                out,
                columns=[
                    "camId", "timestamp", "src_rows", "src_cols",
                    "rows", "cols", "codec", "chunk",
                ],
            )

    return files.mapInPandas(_extract, CHUNK_SCHEMA)


VIDEO_META_SCHEMA = (
    "camId string, path string, size_bytes long, duration_s double, "
    "width double, height double, n_frames long, codec string, fps double"
)


def video_container_metadata(
    spark: SparkSession, path: str, glob: str = "*.{mp4,y4m,avi,gif,apng}"
) -> DataFrame:
    """REAL (no stub) container-metadata scan over video files: binaryFile
    scan + pure-stdlib ISO BMFF probe (sources/mp4.py) -> one row per file
    with duration, dimensions, frame count, codec fourcc, and fps —
    including fragmented MP4s and Y4M streams. This is the planning pass
    the reference gets from OpenCV stream properties
    (VideoEventCreator.java:54-96), with no codec dependency; tests drive
    it against the reference's own sample videos. Corrupt/unknown files
    yield null metadata columns, not task failures (PERMISSIVE, like the
    JSON source)."""
    from distributed_video_analytics_flink_spark.sources.mp4 import probe_mp4
    from distributed_video_analytics_flink_spark.sources.y4m import probe_y4m

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                if b.startswith(Y4M_MAGIC):
                    try:
                        meta = probe_y4m(b)
                    except Y4MError:
                        meta = _null_meta()
                elif is_avi(b):
                    from distributed_video_analytics_flink_spark.sources.avi import probe_avi

                    try:
                        meta = probe_avi(b)
                    except AviError:
                        meta = _null_meta()
                elif is_gif(b):
                    from distributed_video_analytics_flink_spark.sources.gif import (
                        GifError,
                        probe_gif,
                    )

                    try:
                        meta = probe_gif(b)
                    except GifError:
                        meta = _null_meta()
                elif b.startswith(b"\x89PNG") and len(b) >= 24:
                    from distributed_video_analytics_flink_spark.sources.apng import (
                        ApngError,
                        is_apng,
                        probe_apng,
                    )

                    if is_apng(b):
                        try:
                            meta = probe_apng(b)
                        except ApngError:
                            meta = _null_meta()
                    else:
                        # still PNG: IHDR is always the first chunk
                        import struct as _struct

                        w, h = _struct.unpack(">II", b[16:24])
                        meta = {
                            "duration_s": None,
                            "width": float(w),
                            "height": float(h),
                            "n_frames": 1,
                            "codec": "png",
                            "fps": None,
                        }
                else:
                    meta = probe_mp4(b)
                rows.append(
                    (
                        os.path.splitext(os.path.basename(p))[0],
                        p,
                        len(b),
                        meta["duration_s"],
                        meta["width"],
                        meta["height"],
                        meta["n_frames"],
                        meta["codec"],
                        meta["fps"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "camId", "path", "size_bytes", "duration_s",
                    "width", "height", "n_frames", "codec", "fps",
                ],
            )

    return files.mapInPandas(_probe, VIDEO_META_SCHEMA)
