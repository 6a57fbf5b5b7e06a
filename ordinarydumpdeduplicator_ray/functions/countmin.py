"""Count-Min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
token frequencies.

The no-shuffle scale path for "how often do the top tokens occur in
this 100-TB corpus": exact counts (``top_tokens``) shuffle
distinct-tokens-per-block to a groupby, while the CMS is one streaming
pass emitting a fixed (depth x width) uint64 counter grid per block,
merged on the driver with an elementwise ADD — commutative, so the
estimate is independent of partitioning and block order (lockable).
CMS never underestimates; the overestimate is bounded by
eps = e/width of the total token mass per row with probability
1 - (1/e)^depth.

No reference counterpart; north-rule sketch operator.
"""

from __future__ import annotations

import numpy as np

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1 << 16  # 64k counters/row * 4 rows * 8 B = 2 MiB/block


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.copy()
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def cms_new(depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.uint64)


def _row_buckets(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices: row d uses mix64(h + d + 1)."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        rows = [
            (_mix64(h + np.uint64(d + 1)) % np.uint64(width)).astype(np.int64)
            for d in range(depth)
        ]
    return np.stack(rows)


def cms_update(sketch: np.ndarray, hashes: np.ndarray) -> None:
    """Fold a uint64 token-hash array into the sketch in place
    (count 1 per occurrence)."""
    if len(hashes) == 0:
        return
    depth, width = sketch.shape
    buckets = _row_buckets(hashes, depth, width)
    for d in range(depth):
        sketch[d] += np.bincount(
            buckets[d], minlength=width
        ).astype(np.uint64)


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        with np.errstate(over="ignore"):
            out += p
    return out


def cms_query(sketch: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Estimated count per query hash: min over the depth rows."""
    depth, width = sketch.shape
    if len(hashes) == 0:
        return np.empty(0, dtype=np.uint64)
    buckets = _row_buckets(hashes, depth, width)
    est = sketch[0, buckets[0]]
    for d in range(1, depth):
        est = np.minimum(est, sketch[d, buckets[d]])
    return est
