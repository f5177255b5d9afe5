"""WAV (RIFF PCM) audio: the codec-free REAL decode for the audio modality.

The multimodal contract (COVERAGE.md S4) treats media as opaque binary
columns with typed metadata and decodes where possible with the stdlib:
Y4M for video, PNG for images — this module is the audio leg. Canonical
16-bit PCM WAV parses with pure offset math (RIFF chunk walk + numpy
frombuffer view; the file is never copied); compressed audio (MP3/AAC/OGG)
remains honestly stubbed like compressed video.

Feature extraction returns exact integers (sample counts, sum of squared
samples, zero crossings, peak) so downstream aggregates are
order-independent and oracle-hashable if audio testdata ever exists.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class WavError(ValueError):
    pass


@dataclass(frozen=True)
class WavHeader:
    n_channels: int
    sample_rate: int
    bits_per_sample: int
    n_frames: int  # per-channel sample count
    data_offset: int
    data_bytes: int

    @property
    def duration_ms(self) -> int:
        return (self.n_frames * 1000) // self.sample_rate if self.sample_rate else 0


def parse_wav_header(data: bytes) -> WavHeader:
    """Walk the RIFF chunks; accept only PCM (format 1), 16-bit."""
    if len(data) < 44 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos, fmt, datachunk = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(data):
                # a fmt chunk whose DECLARED size runs past the buffer:
                # struct.unpack_from would leak struct.error through every
                # except WavError guard and kill the scan task (r14 review)
                raise WavError("truncated fmt chunk")
            audio_format, n_ch, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            fmt = (audio_format, n_ch, rate, bits)
        elif cid == b"data":
            datachunk = (body, min(size, len(data) - body))  # tolerate truncation
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or datachunk is None:
        raise WavError("missing fmt or data chunk")
    audio_format, n_ch, rate, bits = fmt
    if audio_format != 1 or bits != 16:
        raise WavError(f"unsupported format {audio_format}/{bits}-bit (PCM 16 only)")
    if n_ch == 0:
        # declared zero channels: the frame-size division below would be
        # ZeroDivisionError — outside the WavError contract (r14 review)
        raise WavError("fmt declares zero channels")
    off, nbytes = datachunk
    frame_bytes = 2 * n_ch
    n_frames = nbytes // frame_bytes
    return WavHeader(n_ch, rate, bits, n_frames, off, n_frames * frame_bytes)


def decode_wav(data: bytes) -> tuple[WavHeader, np.ndarray]:
    """(header, (n_frames, n_channels) int16 array) — zero-copy view."""
    hdr = parse_wav_header(data)
    pcm = np.frombuffer(data, np.int16, hdr.n_frames * hdr.n_channels, hdr.data_offset)
    return hdr, pcm.reshape(hdr.n_frames, hdr.n_channels)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical PCM-16 writer (tests and fixtures)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_frames, n_ch = s.shape
    body = s.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body


# Quality-gate thresholds (exact-integer contract, see wav_quality):
# a sample is SILENT when |s| <= ~1% of int16 full scale, CLIPPED when it
# sits on either rail. Both are defined on raw sample values so the
# counts are engine- and partitioning-independent.
SILENCE_ABS = 327
CLIP_HI, CLIP_LO = 32767, -32768


def wav_quality(data: bytes) -> dict:
    """Exact-integer clip-level quality signals of the first channel —
    the audio twin of the text quality gates (operators/text_analysis):
    clipped-sample count (samples on the int16 rails: recording chain
    overdrive), silent-sample count (|s| <= SILENCE_ABS: dead air), and
    their basis-point ratios (integer floor division — no floats, so the
    oracle can pin them as literals). A training-data pipeline drops or
    down-weights clips by exactly these gates."""
    hdr, pcm = decode_wav(data)
    ch0 = pcm[:, 0].astype(np.int64)
    n = int(ch0.size)
    n_clipped = int(((ch0 >= CLIP_HI) | (ch0 <= CLIP_LO)).sum())
    n_silent = int((np.abs(ch0) <= SILENCE_ABS).sum())
    return {
        "n_frames": n,
        "n_clipped": n_clipped,
        "n_silent": n_silent,
        "clipping_bp": (n_clipped * 10_000) // n if n else 0,
        "silence_bp": (n_silent * 10_000) // n if n else 0,
    }


def wav_features(data: bytes) -> dict:
    """Exact-integer waveform features of the first channel: frame count,
    duration, energy (sum of squared samples), zero-crossing count, peak
    magnitude. All integers — deterministic on any engine/partitioning."""
    hdr, pcm = decode_wav(data)
    ch0 = pcm[:, 0].astype(np.int64)
    energy = int((ch0 * ch0).sum())
    signs = np.sign(ch0)
    nz = signs[signs != 0]
    zcr = int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0
    return {
        "sample_rate": hdr.sample_rate,
        "n_channels": hdr.n_channels,
        "n_frames": hdr.n_frames,
        "duration_ms": hdr.duration_ms,
        "energy_q": energy,
        "zero_crossings": zcr,
        "peak": int(np.abs(ch0).max()) if ch0.size else 0,
    }
