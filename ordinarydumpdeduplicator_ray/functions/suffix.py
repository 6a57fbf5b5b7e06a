"""Suffix-array-based exact common-substring spans between two documents.

North-rule operator with no reference counterpart (the reference only
groups whole-content hashes); semantics defined here: report the
**maximal common token runs** of length >= ``min_words`` between two
token sequences, as word-offset spans. Detection is exact (token-level,
via the shared deterministic tokenizer in ``functions.text``).

Method: suffix array over the concatenated sequences (unique sentinel
between docs) built by prefix doubling with ``np.lexsort`` (O(n log^2 n)),
LCP via Kasai, seeds from adjacent cross-document suffix pairs with
lcp >= min_words, then per-diagonal interval merge to maximal runs.
Every common substring *content* of length >= min_words yields at least
one span (between SA-adjacent occurrences); positional duplicates of the
same content may collapse onto one representative pair of occurrences.
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (prefix doubling)."""
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    _, rank = np.unique(seq, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        # new ranks: increase where (rank, key2) tuple differs from predecessor
        r_o, k_o = rank[order], key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r_o[1:] != r_o[:-1]) | (k_o[1:] != k_o[:-1])
        new_rank = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        if new_rank[-1] == n - 1:
            return order
        k *= 2
        # suffixes of different lengths always become distinguishable via
        # the -1 padding, so the loop terminates before k exceeds 2n.


def lcp_array(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]."""
    n = len(seq)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    s = seq
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def common_spans(
    tokens_a: np.ndarray, tokens_b: np.ndarray, min_words: int
) -> list[tuple[int, int, int, int, int]]:
    """Maximal common token runs >= min_words between two token-id arrays.

    Returns [(a_start, a_end, b_start, b_end, n_words)], word offsets,
    end-exclusive, sorted deterministically.
    """
    na, nb = len(tokens_a), len(tokens_b)
    if na < min_words or nb < min_words or min_words <= 0:
        return []
    # remap to compact ranks so a sentinel value is available
    both = np.concatenate([tokens_a, tokens_b])
    _, inv = np.unique(both, return_inverse=True)
    sentinel = inv.max() + 1 if len(inv) else 0
    seq = np.concatenate(
        [inv[:na], np.array([sentinel], dtype=inv.dtype), inv[na:]]
    ).astype(np.int64)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)

    # seeds: adjacent suffixes from different docs with lcp >= min_words
    pos_prev, pos_cur = sa[:-1], sa[1:]
    l = lcp[1:]
    doc_prev, doc_cur = pos_prev > na, pos_cur > na  # position na is the sentinel
    cross = (doc_prev != doc_cur) & (l >= min_words) & (pos_prev != na) & (pos_cur != na)
    if not cross.any():
        return []
    p1, p2, ln = pos_prev[cross], pos_cur[cross], l[cross]
    a_pos = np.where(p1 <= na, p1, p2)
    b_pos = np.where(p1 > na, p1, p2) - (na + 1)

    # merge seeds per diagonal into maximal runs
    spans: dict[int, list[tuple[int, int]]] = {}
    for ap, bp, length in zip(a_pos.tolist(), b_pos.tolist(), ln.tolist()):
        spans.setdefault(ap - bp, []).append((ap, ap + length))
    out: list[tuple[int, int, int, int, int]] = []
    for diag, ivals in spans.items():
        ivals.sort()
        cs, ce = ivals[0]
        merged = []
        for s, e in ivals[1:]:
            if s <= ce:
                ce = max(ce, e)
            else:
                merged.append((cs, ce))
                cs, ce = s, e
        merged.append((cs, ce))
        for s, e in merged:
            if e - s >= min_words:
                out.append((s, e, s - diag, e - diag, e - s))
    out.sort()
    return out
