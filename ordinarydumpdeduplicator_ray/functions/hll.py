"""HyperLogLog distinct-count sketch (Flajolet et al. 2007).

The scale-path answer to "how many unique documents/texts are in this
100-TB corpus": an exact COUNT(DISTINCT) is a full all-to-all shuffle
of every key, while HLL is one streaming pass emitting a 2^p-byte
register block per input block, merged on the driver with an
elementwise max — O(blocks) driver work, no shuffle at all. Register
merge is commutative and idempotent, so the estimate is independent of
partitioning, block order and parallelism (asserted in tests), which
also makes it hash-lockable.

p = 14 (16 KiB registers, ~0.8% standard error) by default.

No reference counterpart (the reference counts exact duplicates only);
north-rule sketch operator.
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 14


def hll_new(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_update(registers: np.ndarray, hashes: np.ndarray, p: int = DEFAULT_P) -> None:
    """Fold a uint64 hash array into the registers in place.

    rho = 1 + (number of leading zeros of the hash bits after the
    bucket prefix), capped at 64-p+1. floor(log2) comes from
    ``np.frexp`` — exact for every uint64 except values whose top 54
    bits are all ones (float rounding carries the exponent; measure-zero
    for hashed input and still deterministic)."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if len(h) == 0:
        return
    shift = np.uint64(64 - p)
    bucket = (h >> shift).astype(np.int64)
    w = h << np.uint64(p)  # remaining bits, left-aligned (wrapping shift)
    _, e = np.frexp(w.astype(np.float64))
    clz = 64 - e  # leading zeros of w for w > 0
    rho = np.where(
        w == 0, 64 - p + 1, np.minimum(clz + 1, 64 - p + 1)
    ).astype(np.uint8)
    np.maximum.at(registers, bucket, rho)


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise max of register blocks (commutative, idempotent)."""
    out = parts[0].copy()
    for p_ in parts[1:]:
        np.maximum(out, p_, out=out)
    return out


def hll_estimate(registers: np.ndarray) -> float:
    """Standard 64-bit HLL estimator with the small-range
    linear-counting correction (no large-range correction needed at
    64 bits)."""
    m = float(len(registers))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -registers.astype(np.int64))  # exact 2^-M_j
    e = alpha * m * m / float(np.sum(inv))
    if e <= 2.5 * m:
        zeros = float(np.count_nonzero(registers == 0))
        if zeros > 0:
            return m * np.log(m / zeros)
    return e
