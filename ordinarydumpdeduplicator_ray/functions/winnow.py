"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).

Selects, from the positional k-shingle hash stream of a document, the
minimum hash of every sliding window of ``w`` consecutive shingles
(rightmost minimum on ties), deduplicated by position. The guarantee:
any match of at least ``w + k - 1`` consecutive tokens between two
documents shares at least one selected fingerprint — a density-bounded
alternative to keeping every shingle (expected density 2/(w+1)).

No reference counterpart (the reference compares whole-file hashes);
this is the local-copy-detection primitive between full-content
sha256 and the suffix-array spans (``functions/suffix.py``): cheap
enough to run corpus-wide, precise enough to localize matches.

Kernel shape: per-document numpy (sliding_window_view + argmin), no
per-token Python; documents are processed per row inside a flat Arrow
batch like the other textstats kernels. Uses the SAME tokenizer and
shingle mix as MinHash (``functions/text.py`` / ``hashing.py``) but a
POSITIONAL shingle stream — ``shingle_hashes`` dedups and sorts, which
winnowing cannot use.
"""

from __future__ import annotations

import numpy as np

from ordinarydumpdeduplicator_ray.functions.hashing import (
    _FINAL_MULT,
    _MIX_MULT,
    _U64,
    _err,
    TokenHasher,
)
from ordinarydumpdeduplicator_ray.functions.text import tokenize


def positional_shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """64-bit hashes of the k-gram shingle at EVERY position, in
    document order (the positional sibling of
    ``hashing.shingle_hashes``, same mix so values are comparable).
    Shorter-than-k documents form a single whole-sequence shingle."""
    n = len(token_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    k = min(k, n)
    m = n - k + 1
    with _err:
        acc = token_hashes[:m].copy()
        for j in range(1, k):
            acc = (acc * _MIX_MULT) ^ token_hashes[j : m + j]
        acc = acc * _FINAL_MULT
        acc ^= acc >> _U64(29)
    return acc


def winnow_positions(hashes: np.ndarray, w: int) -> np.ndarray:
    """Positional shingle-hash stream -> sorted positions of the
    selected fingerprints. Rightmost minimum per window; consecutive
    windows selecting the same position collapse to one fingerprint."""
    n = len(hashes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= w:
        return np.array([n - 1 - int(np.argmin(hashes[::-1]))], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost min: argmin over the reversed window, mapped back
    rpos = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win), dtype=np.int64) + rpos
    keep = np.empty(len(pos), dtype=bool)
    keep[0] = True
    np.not_equal(pos[1:], pos[:-1], out=keep[1:])
    return pos[keep]


def winnow_fingerprints(
    text: str, hasher: TokenHasher, k: int = 5, w: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Document text -> (positions, uint64 fingerprints) selected by
    winnowing over the positional k-shingle stream."""
    th = hasher.hash_tokens(tokenize(text))
    sh = positional_shingle_hashes(th, k)
    if len(sh) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    pos = winnow_positions(sh, w)
    return pos, sh[pos]
