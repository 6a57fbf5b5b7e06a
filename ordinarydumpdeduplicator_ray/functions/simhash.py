"""Vectorized 64-bit SimHash over shingle-hash sets.

Classic Charikar simhash: each shingle hash votes +1/-1 per bit position;
the fingerprint's bit i is 1 iff the positive votes win (strict majority;
ties -> 0, deterministic). Candidate generation uses block banding: split
the 64 bits into ``blocks`` equal blocks — any pair within Hamming
distance < blocks agrees exactly on at least one block (pigeonhole), so
grouping on (block_idx, block_value) catches all pairs with
hamming <= blocks - 1.
"""

from __future__ import annotations

import numpy as np

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = (np.uint64(1) << _BIT_SHIFTS).astype(np.uint64)


def simhash_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash fingerprints for a batch (same flat/offsets layout as
    ``minhash_flat``). Rows with zero shingles get fingerprint 0 —
    callers null those out. Returns (n_rows,) uint64."""
    n_rows = len(offsets)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(flat) == 0:
        return out
    # (total, 64) 0/1 matrix -> per-row bit counts; reduceat over the
    # starts of non-empty rows only (see minhash_flat for why).
    bits = ((flat[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int32)
    ends = np.append(offsets[1:], len(flat))
    nonempty = offsets < ends
    counts = np.add.reduceat(bits, offsets[nonempty], axis=0)  # (n_nonempty, 64)
    n_shingles = (ends - offsets)[nonempty].astype(np.int64)
    majority = (2 * counts) > n_shingles[:, None]   # strict majority
    out[nonempty] = (majority.astype(np.uint64) * _BIT_WEIGHTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def simhash_block_keys(simhash: np.ndarray, blocks: int = 4) -> np.ndarray:
    """(n,) uint64 fingerprints -> (n, blocks) uint64 block keys
    ``(block_idx << block_width) | block_value`` for the banding groupby."""
    width = 64 // blocks
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(simhash), blocks), dtype=np.uint64)
    for i in range(blocks):
        val = (simhash >> np.uint64(i * width)) & mask
        out[:, i] = (np.uint64(i) << np.uint64(width)) | val
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (vectorized
    popcount via bit-twiddling — no Python loop)."""
    x = a ^ b
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
