"""Vectorized MinHash over shingle-hash sets.

Hash family: h_k(x) = a_k * x + b_k (mod 2^64) with a_k odd — the
multiply-shift family, fully vectorizable in numpy uint64 (no Mersenne
modulus, no Python bigints). Permutation matrix is seeded and built once
per actor (SURVEY.md §2.3 stateful stage).

The batch kernel operates on the *flattened* shingle arrays of all rows
in a batch plus row offsets, using ``np.minimum.reduceat`` — one pass per
permutation chunk, zero Python per-row work.
"""

from __future__ import annotations

import numpy as np

_err = np.errstate(over="ignore")


def make_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors, a odd. Deterministic in seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_flat(
    flat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    perm_chunk: int = 4,
) -> np.ndarray:
    """MinHash signatures for a batch.

    Parameters
    ----------
    flat : concatenated shingle hashes of all rows, shape (total,)
    offsets : row start offsets into ``flat``, shape (n_rows,); row i owns
        ``flat[offsets[i]:offsets[i+1]]`` (implicit end = len(flat)).
        Rows with zero shingles get an all-max signature — callers null
        those out.
    a, b : permutation coefficients, shape (K,)
    perm_chunk : permutations processed per pass, bounding the temp
        (chunk, total) matrix to ~chunk * total * 8 bytes. MUST stay
        small enough that the temp is cache-resident: chunk=16 on a
        100k-shingle batch spills to DRAM and measures ~30x slower per
        doc (and worse under actor-pool concurrency — memory bandwidth
        is shared) than chunk=4.

    Returns (n_rows, K) uint64.
    """
    n_rows = len(offsets)
    num_perm = len(a)
    out = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return out

    # reduceat over the starts of NON-empty rows only: those starts are
    # strictly increasing and < len(flat), and skipping empty rows does not
    # shift any segment boundary (an empty row contributes no elements).
    ends = np.append(offsets[1:], len(flat))
    nonempty = offsets < ends
    starts = offsets[nonempty]

    with _err:
        for k0 in range(0, num_perm, perm_chunk):
            k1 = min(k0 + perm_chunk, num_perm)
            # (chunk, total) = a[:,None]*flat + b[:,None]  (mod 2^64)
            hashed = a[k0:k1, None] * flat[None, :] + b[k0:k1, None]
            out[nonempty, k0:k1] = np.minimum.reduceat(hashed, starts, axis=1).T
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing permutations — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))


def estimate_jaccard_matrix(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
    """Row-wise estimate for (n, K) signature pairs -> (n,) float64."""
    return (sigs_a == sigs_b).mean(axis=1)


def packed_minhash(col, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Binary minhash column -> ((n, k) uint64 matrix, validity mask).
    Zero-copy reinterpretation of the Arrow data buffer when the column
    is null-free and uniformly 8k bytes (the normal case); per-row
    fallback otherwise (nulls = docs with no shingles)."""
    import pyarrow as pa

    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    zero = b"\x00" * (8 * k)
    valid = None
    if n and col.null_count:
        # vectorized null handling: record validity, fill with the zero
        # sketch, and fall through to the zero-copy reinterpretation —
        # the old per-row b"".join fallback measured ~1.2 s per 150k
        # rows on the driver
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        col = pc.fill_null(col, zero)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    if n:
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=n + 1, offset=col.offset * 4
        )
        if (np.diff(offs) == 8 * k).all():
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            mat = data[offs[0]:offs[-1]].view("<u8").reshape(n, k)
            return mat, (valid if valid is not None else np.ones(n, dtype=bool))
    vals = col.to_pylist()
    mat = np.frombuffer(b"".join(x or zero for x in vals), dtype="<u8").reshape(-1, k)
    va = np.fromiter((x is not None for x in vals), dtype=bool, count=n)
    return mat, (valid if valid is not None else va)
