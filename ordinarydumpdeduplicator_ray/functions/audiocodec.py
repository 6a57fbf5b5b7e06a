"""Pure-stdlib WAV (RIFF PCM) codec + audio feature kernel.

The real-decode integration point for AUDIO payloads in
``stages/multimodal.py`` — the audio analogue of
``functions/imagecodec.py``'s PNG/BMP/GIF decoders. No reference
counterpart (the reference hashes file bytes without interpreting
them, ``Common/FsUtils.cs:39-54``); a 100 TB multimodal corpus needs
the decode to happen inside the actor pool, on actual bytes.

Supports the formats a stdlib-only container can honestly decode:
RIFF/WAVE with PCM (format tag 1) 8-bit unsigned or 16/32-bit signed
samples, any channel count. Compressed codecs (mp3/flac/ogg) raise
``UnsupportedAudioError`` — the torchaudio/ffmpeg integration point.

``encode_wav`` exists so tests and synthetic corpora can generate
real payloads deterministically.
"""

from __future__ import annotations

import struct

import numpy as np

FEATURE_DIM = 8


class UnsupportedAudioError(ValueError):
    """Payload is not a WAV this stdlib decoder can read."""


def sniff_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, samples).

    ``samples`` is float32 in [-1, 1], shape (n_frames, n_channels).
    Walks the RIFF chunk list manually (``wave`` chokes on some chunk
    orders and never yields numpy) — fmt then data, other chunks
    (LIST/fact/cue) skipped per spec.
    """
    if not sniff_wav(payload):
        raise UnsupportedAudioError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos : pos + csize]
        if cid == b"fmt " and fmt is None:
            if csize < 16 or len(body) < 16:  # declared-vs-actual: truncation
                raise UnsupportedAudioError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data" and data is None:
            data = body
        pos += csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedAudioError("missing fmt or data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise UnsupportedAudioError(f"non-PCM format tag {tag}")
    if n_ch < 1 or rate < 1:
        raise UnsupportedAudioError("degenerate fmt chunk")
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        x = (raw.astype(np.float32) - 128.0) / 128.0
    elif bits == 16:
        raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        x = raw.astype(np.float32) / 32768.0
    elif bits == 32:
        raw = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
        x = raw.astype(np.float32) / 2147483648.0
    else:
        raise UnsupportedAudioError(f"{bits}-bit PCM not supported")
    n_frames = len(x) // n_ch
    return rate, n_ch, x[: n_frames * n_ch].reshape(n_frames, n_ch)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """(n_frames, n_channels) float32 in [-1, 1] -> canonical PCM WAV
    bytes (test-fixture / synthetic-corpus generator)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 8:
        data = (clipped * 127.0 + 128.0).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (clipped * 32767.0).astype("<i2").tobytes()
    else:
        raise ValueError("encode_wav supports 8- or 16-bit PCM")
    block = n_ch * bits // 8
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, n_ch, sample_rate, sample_rate * block, block, bits,
        b"data", len(data),
    )
    return hdr + data


def sample_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """Decoded samples -> unit-norm float32 feature vector of length 8:
    global RMS, zero-crossing rate, 4-band segment RMS profile, peak
    amplitude, log-duration. Content-determined: identical audio embeds
    identically (the audio analogue of ``imagecodec.pixel_features``)."""
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    seg = np.array_split(mono, 4)
    seg_rms = [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in seg]
    peak = float(np.max(np.abs(mono)))
    logdur = float(np.log1p(n / max(rate, 1)))
    v = np.array([rms, zc, *seg_rms, peak, logdur], dtype=np.float32)
    nv = np.linalg.norm(v)
    return v / nv if nv > 0 else v


def audio_fingerprint(samples: np.ndarray, n_windows: int = 32) -> int:
    """Amplitude-scale-invariant audio fingerprint: the RMS contour
    over ``n_windows`` equal windows, delta-coded one bit per adjacent
    comparison (rms[i+1] > rms[i]). Uniform gain scales every window's
    RMS by the same factor (power-of-two gains exactly, by IEEE sqrt),
    so re-levelled copies of a clip fingerprint identically while
    different material diverges. Deterministic float64 arithmetic."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        return 0
    bounds = (np.arange(n_windows + 1) * n) // n_windows
    sq = np.concatenate([[0.0], np.cumsum(x * x)])
    sums = sq[bounds[1:]] - sq[bounds[:-1]]
    cnt = np.maximum(bounds[1:] - bounds[:-1], 1)
    rms = np.sqrt(sums / cnt)
    bits = rms[1:] > rms[:-1]
    return int.from_bytes(np.packbits(bits).tobytes(), "big")
