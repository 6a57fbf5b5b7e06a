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
    ends = np.append(offsets[1:], len(flat))
    nonempty = offsets < ends
    starts = offsets[nonempty]
    n_shingles = (ends - offsets)[nonempty].astype(np.int64)
    acc = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    # 8 bits per pass keeps the (total, 8) temp cache-resident — a full
    # (total, 64) matrix spills to DRAM and is bandwidth-bound under
    # actor-pool concurrency (same lesson as minhash_flat's perm_chunk).
    for b0 in range(0, 64, 8):
        shifts = _BIT_SHIFTS[b0 : b0 + 8]
        bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        counts = np.add.reduceat(bits, starts, axis=0)      # (n_nonempty, 8)
        majority = (2 * counts) > n_shingles[:, None]        # strict majority
        acc |= (majority.astype(np.uint64) * _BIT_WEIGHTS[None, b0 : b0 + 8]).sum(
            axis=1, dtype=np.uint64
        )
    out[nonempty] = acc
    return out


def _block_layout(bits: int, blocks: int) -> list[tuple[int, int]]:
    """(offset, width) per block, widths as even as possible."""
    base, extra = divmod(bits, blocks)
    layout = []
    off = 0
    for i in range(blocks):
        w = base + (1 if i < extra else 0)
        layout.append((off, w))
        off += w
    return layout


def simhash_block_keys(
    simhash: np.ndarray,
    blocks: int = 6,
    clean: int = 3,
    bits: int = 64,
) -> np.ndarray:
    """(n,) uint64 fingerprints -> (n, C(blocks, clean)) uint64 table
    keys, Manku-style (Manku, Jain & Sarma, "Detecting Near-Duplicates
    for Web Crawling", WWW'07): split the fingerprint into ``blocks``
    blocks and key each table on the concatenation of a ``clean``-sized
    block combination. Any pair within Hamming distance
    ``blocks - clean`` leaves at least ``clean`` blocks untouched
    (pigeonhole), so it collides in at least one table.

    Scale rationale: keys are ~``clean * bits/blocks`` bits wide (~32 for
    6/3 over 64), so chance collisions grow as n^2 / 2^32 — the naive
    4x16-bit banding saturates its 16-bit key space and its candidate
    count grows as n^2 / 2^17, which already dominates the pipeline at
    half a million documents."""
    from itertools import combinations

    layout = _block_layout(bits, blocks)
    vals = np.empty((len(simhash), blocks), dtype=np.uint64)
    for i, (off, w) in enumerate(layout):
        vals[:, i] = (simhash >> np.uint64(off)) & np.uint64((1 << w) - 1)
    combos = list(combinations(range(blocks), clean))
    out = np.empty((len(simhash), len(combos)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for t, combo in enumerate(combos):
            acc = np.full(len(simhash), np.uint64(0xCBF29CE484222325))
            acc = (acc * np.uint64(0x100000001B3)) ^ np.uint64(t + 1)
            for i in combo:
                acc = (acc * np.uint64(0x100000001B3)) ^ vals[:, i]
            out[:, t] = acc
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
