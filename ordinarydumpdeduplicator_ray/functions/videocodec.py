"""Pure-stdlib AVI (RIFF) video codec + frame feature kernel.

The real-decode integration point for VIDEO payloads in
``stages/multimodal.py`` — the video analogue of
``functions/audiocodec.py``'s WAV chunk walk. No reference counterpart
(the reference hashes file bytes without interpreting them,
``Common/FsUtils.cs:39-54``); a 100 TB multimodal corpus needs the
decode to happen inside the actor pool, on actual bytes.

Supports what a stdlib-only container can honestly decode:

- **Uncompressed 24-bit BGR AVI** (``biCompression == 0``, ``00db``
  DIB frame chunks): full pixel decode — every sampled frame's pixels
  feed ``imagecodec.pixel_features``.
- **Any other RIFF/AVI** (MJPG/DIVX/...): header-only decode —
  real width/height/frame-count from ``avih``/``strh``/``strf``
  (the ``decode_gif_header`` analogue); pixel expansion would need
  pyav/ffmpeg, which is the documented integration point
  (``UnsupportedVideoError``).

``encode_avi`` exists so tests and synthetic corpora can generate
real payloads deterministically.
"""

from __future__ import annotations

import struct

import numpy as np

FEATURE_DIM = 8


class UnsupportedVideoError(ValueError):
    """Payload is not an AVI this stdlib decoder can fully read."""


def sniff_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, list_type|None) for each
    chunk in [pos, end); LIST/RIFF chunks report their list type and
    their BODY range so callers can recurse."""
    while pos + 8 <= end:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid in (b"LIST", b"RIFF") and body + 4 <= end:
            yield cid, body + 4, max(csize - 4, 0), payload[body : body + 4]
        else:
            yield cid, body, csize, None
        pos = body + csize + (csize & 1)  # word alignment


def decode_avi_header(payload: bytes) -> tuple[int, int, int]:
    """AVI bytes -> (width, height, n_frames) from the ``avih`` main
    header, falling back to the video ``strh``/``strf`` when avih is
    absent/zeroed. Works for ANY codec (MJPG included) — the
    ``decode_gif_header`` analogue: real metadata, no pixel expansion."""
    if not sniff_avi(payload):
        raise UnsupportedVideoError("not a RIFF/AVI payload")
    w = h = nf = 0

    def scan(pos: int, end: int, depth: int = 0) -> None:
        nonlocal w, h, nf
        if depth > 6:
            return
        for cid, body, size, ltype in _walk_chunks(payload, pos, end):
            if ltype is not None:
                scan(body, min(body + size, len(payload)), depth + 1)
            elif cid == b"avih" and size >= 40:
                # MainAVIHeader: dwTotalFrames at +16, dwWidth/dwHeight
                # at +32/+36 (all little-endian u32)
                tf, = struct.unpack_from("<I", payload, body + 16)
                aw, ah = struct.unpack_from("<II", payload, body + 32)
                nf = nf or tf
                w = w or aw
                h = h or ah
            elif cid == b"strh" and size >= 40:
                if payload[body : body + 4] == b"vids":
                    ln, = struct.unpack_from("<I", payload, body + 32)
                    nf = nf or ln
            elif cid == b"strf" and size >= 24 and (w == 0 or h == 0):
                # BITMAPINFOHEADER: biWidth/biHeight at +4/+8 (i32)
                bw, bh = struct.unpack_from("<ii", payload, body + 4)
                w = w or abs(bw)
                h = h or abs(bh)

    scan(12, len(payload))
    if w <= 0 or h <= 0:
        raise UnsupportedVideoError("no video stream dimensions found")
    return int(w), int(h), int(nf)


def decode_avi(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit AVI bytes -> (width, height, frames).

    ``frames`` is uint8 of shape (n_frames, height, width, 3) in RGB
    order. Walks the RIFF tree manually: ``hdrl`` for dimensions and
    the compression tag, ``movi`` for the ``..db``/``..dc`` frame
    chunks (rows are bottom-up, BGR, 4-byte aligned per the DIB spec).
    Compressed codecs raise ``UnsupportedVideoError`` — the
    pyav/ffmpeg integration point."""
    w, h, _ = decode_avi_header(payload)
    compression = None
    frame_bodies: list[tuple[int, int]] = []

    def scan(pos: int, end: int, depth: int = 0) -> None:
        nonlocal compression
        if depth > 6:
            return
        for cid, body, size, ltype in _walk_chunks(payload, pos, end):
            if ltype is not None:
                scan(body, min(body + size, len(payload)), depth + 1)
            elif cid == b"strf" and size >= 20 and compression is None:
                compression, = struct.unpack_from("<I", payload, body + 16)
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc") and size > 0:
                frame_bodies.append((body, size))

    scan(12, len(payload))
    if compression not in (0, None):
        tag = struct.pack("<I", compression)
        raise UnsupportedVideoError(
            f"compressed AVI (biCompression={tag!r}) needs pyav/ffmpeg"
        )
    if not frame_bodies:
        raise UnsupportedVideoError("no frame chunks in movi list")
    stride = (w * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    need = stride * h
    frames = np.empty((len(frame_bodies), h, w, 3), dtype=np.uint8)
    for i, (body, size) in enumerate(frame_bodies):
        if size < need:
            raise UnsupportedVideoError("truncated frame chunk")
        rows = np.frombuffer(payload, dtype=np.uint8, count=need, offset=body)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        frames[i] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    return w, h, frames


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> canonical uncompressed 24-bit
    AVI bytes (test-fixture / synthetic-corpus generator)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8 RGB")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),          # dwMicroSecPerFrame
        frame_size * fps,                  # dwMaxBytesPerSec
        0, 0x10,                           # padding, AVIF_HASINDEX off
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"\0\0\0\0", 0, 0, 0, 0, 1, fps, 0, n,
        frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    pad = np.zeros((h, stride - w * 3), dtype=np.uint8)
    for i in range(n):
        dib = np.concatenate([frames[i, ::-1, :, ::-1].reshape(h, w * 3), pad],
                             axis=1).tobytes()
        movi_body += chunk(b"00db", dib)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def video_features(frames: np.ndarray, max_samples: int = 8) -> np.ndarray:
    """Decoded frames -> unit-norm float32 feature vector of length 8:
    the mean of ``imagecodec.pixel_features`` over evenly-sampled
    frames (``frame_sample_offsets`` plan), renormalized.
    Content-determined: identical video embeds identically."""
    from ordinarydumpdeduplicator_ray.functions.imagecodec import pixel_features
    from ordinarydumpdeduplicator_ray.stages.multimodal import (
        frame_sample_offsets,
    )

    if len(frames) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    offs = frame_sample_offsets(len(frames), max_samples)
    v = np.mean([pixel_features(frames[int(i)]) for i in offs], axis=0) \
        .astype(np.float32)
    nv = np.linalg.norm(v)
    return v / nv if nv > 0 else v
