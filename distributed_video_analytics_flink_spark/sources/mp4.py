"""Pure-stdlib ISO BMFF (MP4) container probe — makes the video-file
source's metadata path REAL with zero codec dependencies.

The reference opens each video with OpenCV and reads stream properties
before decoding (VideoEventCreator.java:54-96). This container ships no
cv2/ffmpeg, so pixel decode stays stubbed (video_files.py), but the
container layer — what ffprobe reports without touching a codec — is
plain box arithmetic: [size:4][fourcc:4] headers, containers recursed,
leaf boxes decoded per ISO/IEC 14496-12:

- ``mvhd``  movie timescale + duration            -> duration seconds
- ``tkhd``  track header                          -> width/height (16.16 fixed)
- ``hdlr``  handler type                          -> find the 'vide' track
- ``mdhd``  media timescale + duration            -> per-track timebase
- ``stsz``  sample table sizes                    -> video sample (frame) count
- ``stsd``  sample description                    -> codec fourcc (avc1, ...)
- ``moof``/``traf``/``tfhd``/``trun``            -> fragmented-MP4 samples
  (fMP4 keeps an empty sample table in moov; frames arrive per fragment,
  so the probe sums trun sample counts/durations for the video track,
  falling back to tfhd then trex default sample durations)

Frame rate falls out as n_samples * media_timescale / media_duration.
At 100 TB this probe is the cheap planning pass a video corpus pipeline
runs first (partition by duration/codec, route to decode clusters); it
reads only the bytes Spark's binaryFile scan already holds in memory.
"""

from __future__ import annotations

import struct
from typing import Any

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        fourcc = buf[off + 4 : off + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < header or off + size > end:
            return  # corrupt/truncated: stop rather than throw
        yield fourcc, off + header, off + size
        off += size


def _fullbox(buf: bytes, start: int) -> tuple[int, int]:
    """(version, payload offset past version+flags)."""
    return buf[start], start + 4


def _parse_mvhd(buf: bytes, start: int, out: dict[str, Any]) -> None:
    v, p = _fullbox(buf, start)
    if v == 1:
        timescale = struct.unpack_from(">I", buf, p + 16)[0]
        duration = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        timescale = struct.unpack_from(">I", buf, p + 8)[0]
        duration = struct.unpack_from(">I", buf, p + 12)[0]
    out["movie_timescale"] = timescale
    out["movie_duration"] = duration


def _parse_tkhd(buf: bytes, start: int, trak: dict[str, Any]) -> None:
    v, p = _fullbox(buf, start)
    trak["track_id"] = struct.unpack_from(">I", buf, p + (16 if v == 1 else 8))[0]
    # width/height are the last 8 bytes of the box body in both versions:
    # v0 body is 80 bytes, v1 is 92 (creation/mod/duration widen to 64-bit)
    base = p + (92 if v == 1 else 80) - 8
    trak["width"] = struct.unpack_from(">I", buf, base)[0] / 65536.0
    trak["height"] = struct.unpack_from(">I", buf, base + 4)[0] / 65536.0


def _parse_mdhd(buf: bytes, start: int, trak: dict[str, Any]) -> None:
    v, p = _fullbox(buf, start)
    if v == 1:
        trak["media_timescale"] = struct.unpack_from(">I", buf, p + 16)[0]
        trak["media_duration"] = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        trak["media_timescale"] = struct.unpack_from(">I", buf, p + 8)[0]
        trak["media_duration"] = struct.unpack_from(">I", buf, p + 12)[0]


def _parse_trak(buf: bytes, start: int, end: int) -> dict[str, Any]:
    trak: dict[str, Any] = {}

    def walk(s: int, e: int) -> None:
        for fourcc, ps, pe in _iter_boxes(buf, s, e):
            if fourcc in _CONTAINERS:
                walk(ps, pe)
            elif fourcc == b"tkhd":
                _parse_tkhd(buf, ps, trak)
            elif fourcc == b"mdhd":
                _parse_mdhd(buf, ps, trak)
            elif fourcc == b"hdlr":
                trak["handler"] = buf[ps + 8 : ps + 12].decode("ascii", "replace")
            elif fourcc == b"stsz":
                trak["n_samples"] = struct.unpack_from(">I", buf, ps + 8)[0]
            elif fourcc == b"stsd":
                n = struct.unpack_from(">I", buf, ps + 4)[0]
                if n >= 1 and pe - ps >= 16:
                    trak["codec"] = buf[ps + 12 : ps + 16].decode("ascii", "replace")

    walk(start, end)
    return trak


def _parse_trex(buf: bytes, start: int) -> tuple[int, int]:
    """(track_id, default_sample_duration) from the mvex/trex box."""
    _, p = _fullbox(buf, start)
    track_id = struct.unpack_from(">I", buf, p)[0]
    default_dur = struct.unpack_from(">I", buf, p + 8)[0]
    return track_id, default_dur


def _parse_moof(
    buf: bytes, start: int, end: int, video_track: int, trex_dur: int
) -> tuple[int, int]:
    """(samples, summed sample durations) for the video track's traf(s)."""
    n, dur = 0, 0
    for fourcc, ps, pe in _iter_boxes(buf, start, end):
        if fourcc != b"traf":
            continue
        track_id, tfhd_dur = None, 0
        for f2, p2, e2 in _iter_boxes(buf, ps, pe):
            if f2 == b"tfhd":
                flags = int.from_bytes(buf[p2 + 1 : p2 + 4], "big")
                q = p2 + 4
                track_id = struct.unpack_from(">I", buf, q)[0]
                q += 4
                q += 8 if flags & 0x01 else 0  # base-data-offset
                q += 4 if flags & 0x02 else 0  # sample-description-index
                if flags & 0x08:
                    tfhd_dur = struct.unpack_from(">I", buf, q)[0]
            elif f2 == b"trun" and track_id == video_track:
                flags = int.from_bytes(buf[p2 + 1 : p2 + 4], "big")
                count = struct.unpack_from(">I", buf, p2 + 4)[0]
                n += count
                q = p2 + 8
                q += 4 if flags & 0x001 else 0  # data-offset
                q += 4 if flags & 0x004 else 0  # first-sample-flags
                per = (
                    (4 if flags & 0x100 else 0)
                    + (4 if flags & 0x200 else 0)
                    + (4 if flags & 0x400 else 0)
                    + (4 if flags & 0x800 else 0)
                )
                if flags & 0x100:  # per-sample durations present
                    for i in range(count):
                        dur += struct.unpack_from(">I", buf, q + i * per)[0]
                else:
                    dur += count * (tfhd_dur or trex_dur)
    return n, dur


def probe_mp4(content: bytes) -> dict[str, Any]:
    """Parse MP4 container metadata from raw bytes. Returns a dict with
    ``duration_s``, ``width``, ``height``, ``n_frames``, ``codec``,
    ``fps`` (None for fields the file doesn't carry — the probe never
    raises on truncated or non-MP4 input, it returns what it found)."""
    out: dict[str, Any] = {}
    video: dict[str, Any] = {}
    trex_durs: dict[int, int] = {}
    moofs: list[tuple[int, int]] = []
    for fourcc, ps, pe in _iter_boxes(content, 0, len(content)):
        if fourcc == b"moov":
            for f2, p2, e2 in _iter_boxes(content, ps, pe):
                if f2 == b"mvhd":
                    _parse_mvhd(content, p2, out)
                elif f2 == b"trak":
                    trak = _parse_trak(content, p2, e2)
                    if trak.get("handler") == "vide" and not video:
                        video = trak
                elif f2 == b"mvex":
                    for f3, p3, _e3 in _iter_boxes(content, p2, e2):
                        if f3 == b"trex":
                            tid, d = _parse_trex(content, p3)
                            trex_durs[tid] = d
        elif fourcc == b"moof":
            moofs.append((ps, pe))
    n_samples = video.get("n_samples") or 0
    media_dur = video.get("media_duration") or 0
    if moofs and video.get("track_id") is not None:
        trex_dur = trex_durs.get(video["track_id"], 0)
        for ps, pe in moofs:
            n, d = _parse_moof(content, ps, pe, video["track_id"], trex_dur)
            n_samples += n
            media_dur += d
    duration_s = None
    if out.get("movie_timescale") and out.get("movie_duration"):
        duration_s = out["movie_duration"] / out["movie_timescale"]
    elif video.get("media_timescale") and media_dur:
        duration_s = media_dur / video["media_timescale"]  # fMP4: mvhd says 0
    fps = None
    if media_dur and n_samples and video.get("media_timescale"):
        fps = n_samples * video["media_timescale"] / media_dur
    return {
        "duration_s": duration_s,
        "width": video.get("width"),
        "height": video.get("height"),
        "n_frames": n_samples or None,
        "codec": video.get("codec"),
        "fps": fps,
    }
