"""Content hashing + vectorized shingle hashing.

Content identity follows the reference's ``BlobInfo`` semantics
(``Common/BlobInfo.cs:143-164``): identity = (length, digest), with the
empty input mapping to a well-known sentinel digest
(``Common/BlobInfo.cs:44-51``) and broken rows carrying no digest at all
(``Common/BlobInfo.cs:52-55``). Digest algorithm is SHA-256 per the north
rule (the reference used SHA-1).

Shingle hashing is the vectorized hot path: per-token 64-bit hashes
(cached blake2b) are combined into w-gram shingle hashes with a
multiply-xor polynomial over numpy uint64 slices — O(w) vectorized passes
per batch, no Python loop over shingles.
"""

from __future__ import annotations

import hashlib

import numpy as np

# multiply-xor mixing constants (odd, fixed — part of the config contract)
_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)   # 2^64 / golden ratio
_FINAL_MULT = np.uint64(0xC2B2AE3D27D4EB4F)

_U64 = np.uint64

# numpy >= 1.24 warns on uint64 overflow in some paths; overflow is the
# *intended* semantics (mod 2^64 arithmetic), silence locally.
_err = np.errstate(over="ignore")


def sha256_digest(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def token_hash(token: str) -> int:
    """Stable 64-bit token hash (blake2b-8). Deterministic across
    processes (unlike Python's salted ``hash``)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


class TokenHasher:
    """Caching token hasher — web-text vocabulary is Zipfian, so the dict
    cache turns per-token blake2b into a lookup for the vast majority of
    tokens. One instance per signature actor (state in ``__init__``)."""

    __slots__ = ("_cache",)

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = cache.get(t)
            if h is None:
                h = token_hash(t)
                if len(cache) < 4_000_000:  # bound actor memory
                    cache[t] = h
            out[i] = h
        return out


def shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """64-bit hashes of all w-gram shingles of one token-hash sequence.

    If the document has fewer than ``w`` tokens but at least one, the whole
    sequence forms a single shingle (so short texts still participate in
    near-dup detection). Returns unique shingle hashes, sorted.
    """
    n = len(token_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    w = min(w, n)
    m = n - w + 1
    with _err:
        acc = token_hashes[:m].copy()
        for j in range(1, w):
            acc = (acc * _MIX_MULT) ^ token_hashes[j : m + j]
        acc = acc * _FINAL_MULT
        acc ^= acc >> _U64(29)
    return np.unique(acc)


def url_uids(col, salt: int = 0) -> np.ndarray:
    """Vectorized 64-bit uids for a url column (pa.Array / ChunkedArray):
    SipHash via ``pandas.util.hash_array`` keyed by ``salt``. uids let the
    hot candidate path (explode -> sort -> pairs) move 8-byte ints instead
    of ~50-byte url strings; the pipeline verifies global uniqueness per
    run (``stages.signatures.assign_uids``) and bumps the salt on the
    astronomically rare collision, so uids are an exact per-run key."""
    import pandas.util as pdu

    arr = np.asarray(col.to_pylist(), dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    return pdu.hash_array(arr, hash_key=f"{salt:016d}").view(np.int64)


def sha_prefix_int64(col) -> tuple[np.ndarray, np.ndarray]:
    """First 8 bytes of each binary value as little-endian int64, plus a
    validity mask. Zero-copy-ish buffer reinterpretation when the column
    is null-free with uniform widths (the sha256 case); per-row fallback
    otherwise."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    if col.null_count == 0:
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=n + 1, offset=col.offset * 4
        )
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and widths[0] >= 8:
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            w = int(widths[0])
            mat = np.ascontiguousarray(data[offs[0] : offs[-1]].reshape(n, w)[:, :8])
            return mat.view("<i8").ravel(), np.ones(n, dtype=bool)
    vals = col.to_pylist()
    out = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    for i, v in enumerate(vals):
        if v is not None and len(v) >= 8:
            out[i] = int.from_bytes(v[:8], "little", signed=True)
            ok[i] = True
    return out, ok


def combine_hash_rows(matrix: np.ndarray, salt: np.ndarray | int = 0) -> np.ndarray:
    """Mix each row of a (n, r) uint64 matrix into one uint64 key.

    Used for LSH band keys: matrix = signature slice for one band,
    salt = band index (so identical row values in different bands never
    collide into one bucket).
    """
    with _err:
        acc = np.full(matrix.shape[0], _U64(0x51_7C_C1_B7_27_22_0A_95), dtype=np.uint64)
        acc = (acc * _MIX_MULT) ^ np.asarray(salt, dtype=np.uint64)
        for j in range(matrix.shape[1]):
            acc = (acc * _MIX_MULT) ^ matrix[:, j]
        acc = acc * _FINAL_MULT
        acc ^= acc >> _U64(32)
    return acc
