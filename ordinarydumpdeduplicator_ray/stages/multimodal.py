"""Multimodal (image/audio/video) plumbing over opaque ``binary``
payload columns.

No reference counterpart (the reference hashes file bytes without
interpreting them — ``Common/FsUtils.cs:39-54``); these are the
training-data-pipeline operators a 100 TB multimodal corpus needs.

Decode kernels: ``real=True`` decodes IMAGE payloads with the
pure-stdlib codecs in ``functions/imagecodec.py`` — PNG pixels (zlib
inflate + filter reversal), BMP pixels, GIF header dims + frame count —
and derives the embedding from the ACTUAL pixels; AUDIO payloads with
the pure-stdlib WAV decoder in ``functions/audiocodec.py`` (RIFF PCM
chunk walk + segment-RMS/zero-crossing features from the actual
samples); VIDEO payloads with the pure-stdlib AVI decoder in
``functions/videocodec.py`` (RIFF tree walk: uncompressed 24-bit AVI
gets full frame decode + sampled-frame pixel features; compressed AVI
gets real header dims/frame-count with a digest-derived embedding —
the pyav/ffmpeg integration point). Payloads the stdlib codecs can't
read (exotic images, compressed audio codecs, non-AVI video
containers) fall back to the deterministic digest-derived stub
(per-row error tolerance, never failing the job). ``real=False`` runs
the deterministic fake decoder for every row.

Scale notes: payloads are large, so batches must be SMALL
(``media_batch_size`` rows, not the text default) to keep
batch x concurrency within worker heap; the payload column rides
zero-copy through the object store and is dropped as soon as features
are extracted (project-early discipline).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA = pa.schema(
    [
        ("url", pa.string()),
        ("media_type", pa.string()),      # image | audio | video
        ("payload", pa.binary()),         # opaque encoded bytes
    ]
)

FEATURE_DIM = 8

MEDIA_FEATURES = pa.schema(
    [
        ("url", pa.string()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("payload_sha256", pa.string()),
        ("width", pa.int64()),            # decoded dims (fake: derived)
        ("height", pa.int64()),
        ("n_frames", pa.int64()),         # 1 for image; sampled for video
        ("embedding", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic (width, height, n_frames) derived from the payload
    digest — stands in for a real codec so downstream plumbing has real
    shapes to carry."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    n_frames = 1 if media_type == "image" else 1 + d[2] % 32
    return width, height, n_frames


def _fake_embedding(digest: bytes) -> np.ndarray:
    """Unit-norm FEATURE_DIM float32 vector from the content digest —
    content-determined, so exact-duplicate payloads embed identically."""
    v = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float32)
    v = (v / np.float32(2**32)) - np.float32(0.5)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def frame_sample_offsets(n_frames: int, max_samples: int = 8) -> np.ndarray:
    """Deterministic frame-sampling plan: evenly spaced frame indices,
    at most ``max_samples`` — the video analogue of batched decode."""
    k = min(n_frames, max_samples)
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    return np.linspace(0, n_frames - 1, k).astype(np.int64)


class MediaFeatureActor:
    """Actor-pool stage: (url, media_type, payload) -> MEDIA_FEATURES.

    ``real=True`` decodes image payloads with the stdlib codecs
    (``functions/imagecodec.py``) and WAV audio payloads with
    ``functions/audiocodec.py``: width/height/n_frames and the
    embedding come from the actual bytes — the reference's
    byte-interpreting hash pass (``Common/FsUtils.cs:39-54``) extended
    to sample decode. For audio rows the dimension columns carry
    (width=sample_rate, height=n_channels, n_frames=PCM frame count);
    for video rows (width, height, n_frames=sampled frame count) from
    the AVI headers/frames (``functions/videocodec.py``). Undecodable
    payloads fall back to the deterministic stub. Rows with null
    payloads are dropped (broken-row tolerance, same policy as the
    text pipeline's ``status`` column).
    """

    def __init__(self, real: bool = False) -> None:
        self.real = real

    def _decode(self, payload: bytes, mt: str, digest: bytes):
        """-> (width, height, n_frames, embedding) per the mode."""
        if self.real:
            from ordinarydumpdeduplicator_ray.functions import imagecodec as ic

            import struct as _struct
            import zlib as _zlib

            # per-row broken-payload tolerance: the codecs raise their
            # Unsupported* errors on everything they detect, but a
            # malformed payload can still escape as struct.error /
            # zlib.error / ValueError from a parse the header checks
            # didn't cover — degrade those to the stub too, never the job
            _codec_errors = (ValueError, _struct.error, _zlib.error)
            if mt == "video":
                from ordinarydumpdeduplicator_ray.functions import (
                    videocodec as vc,
                )

                try:
                    w, h, frames = vc.decode_avi(payload)
                    offs = frame_sample_offsets(len(frames))
                    return w, h, len(offs), vc.video_features(frames)
                except _codec_errors:
                    pass
                try:
                    # compressed AVI (MJPG/...): real header dims +
                    # frame count, digest-derived embedding — the
                    # decode_gif_header policy for video
                    w, h, nf = vc.decode_avi_header(payload)
                    return (w, h, len(frame_sample_offsets(max(nf, 1))),
                            _fake_embedding(digest))
                except _codec_errors:
                    pass  # non-AVI container / corrupt -> stub below
                w, h, nf = _fake_decode(payload, mt)
                return w, h, len(frame_sample_offsets(nf)), _fake_embedding(digest)
            if mt == "audio":
                from ordinarydumpdeduplicator_ray.functions import audiocodec as ac

                try:
                    rate, n_ch, samples = ac.decode_wav(payload)
                    return rate, n_ch, len(samples), ac.sample_features(rate, samples)
                except _codec_errors:
                    pass  # compressed codec / corrupt -> stub below
                w, h, nf = _fake_decode(payload, mt)
                return w, h, len(frame_sample_offsets(nf)), _fake_embedding(digest)
            try:
                fmt = ic.sniff_format(payload)
                if fmt == "png":
                    px = ic.decode_png(payload)
                    return px.shape[1], px.shape[0], 1, ic.pixel_features(px)
                if fmt == "bmp":
                    px = ic.decode_bmp(payload)
                    return px.shape[1], px.shape[0], 1, ic.pixel_features(px)
                if fmt == "gif":
                    w, h, nf = ic.decode_gif_header(payload)
                    # dims/frames are real; no pixel expansion -> the
                    # embedding stays digest-derived (documented)
                    return w, h, len(frame_sample_offsets(nf)), _fake_embedding(digest)
            except _codec_errors:
                pass  # undecodable / corrupt image -> deterministic stub below
        w, h, nf = _fake_decode(payload, mt)
        return w, h, len(frame_sample_offsets(nf)), _fake_embedding(digest)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, mtypes, nbytes, shas = [], [], [], []
        widths, heights, frames, embs = [], [], [], []
        for url, mt, payload in zip(
            batch["url"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if payload is None:
                continue
            digest = hashlib.sha256(payload).digest()
            w, h, nf, emb = self._decode(payload, mt or "image", digest)
            urls.append(url)
            mtypes.append(mt or "image")
            nbytes.append(len(payload))
            shas.append(digest.hex())
            widths.append(w)
            heights.append(h)
            frames.append(nf)
            embs.append(emb)
        emb_arr = (
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(embs) if embs else
                         np.empty(0, dtype=np.float32), type=pa.float32()),
                FEATURE_DIM,
            )
        )
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "media_type": pa.array(mtypes, type=pa.string()),
                "n_bytes": pa.array(nbytes, type=pa.int64()),
                "payload_sha256": pa.array(shas, type=pa.string()),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
                "n_frames": pa.array(frames, type=pa.int64()),
                "embedding": emb_arr,
            }
        )


def extract_media_features(
    media: ray.data.Dataset,
    concurrency: int | tuple = 4,
    media_batch_size: int = 64,
    real: bool = False,
) -> ray.data.Dataset:
    """Media table -> features table via the actor pool. Small batches:
    payload bytes x batch x concurrency must fit the worker heap."""
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"real": real},
        batch_format="pyarrow",
        batch_size=media_batch_size,
        concurrency=concurrency,
    )
