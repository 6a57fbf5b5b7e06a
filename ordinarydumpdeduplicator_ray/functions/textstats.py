"""Text-analysis kernels for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

No reference counterpart (the reference treats content as opaque bytes);
these are the standard large-corpus curation operators, each deterministic
and vectorizable per batch. Heuristics only — no models, no network.
"""

from __future__ import annotations

import re

import numpy as np

from ordinarydumpdeduplicator_ray.functions.hashing import _FINAL_MULT, _MIX_MULT

# --- language ID (n-gram/stopword heuristic over en/de/ru) -----------------

_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on", "are"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu", "auf", "für"},
}
_WORD_RE = re.compile(r"\w+", re.UNICODE)


def detect_lang(text: str) -> str:
    """``ru`` if Cyrillic dominates, else the higher stopword-hit language
    of en/de; ties and no-signal -> ``und`` (undetermined)."""
    if not text:
        return "und"
    sample = text[:2000]
    n_cyr = len(_CYRILLIC_RE.findall(sample))
    if n_cyr * 3 > len(sample):
        return "ru"
    words = _WORD_RE.findall(sample.lower())
    if not words:
        return "und"
    en = sum(1 for w in words if w in _STOPWORDS["en"])
    de = sum(1 for w in words if w in _STOPWORDS["de"])
    if en == de == 0 or en == de:
        return "und"
    return "en" if en > de else "de"


# --- quality scoring --------------------------------------------------------

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_TERMINAL_RE = re.compile(r"[.!?]")


def quality_features(text: str) -> tuple[int, int, float, float, float]:
    """(n_chars, n_tokens, mean_token_len, punct_ratio, stop_ratio[en]).

    The downstream quality *score* is a fixed linear rule over these; the
    features themselves are what tests/oracles pin down.
    """
    n_chars = len(text)
    words = _WORD_RE.findall(text.lower())
    n_tokens = len(words)
    mean_len = (sum(len(w) for w in words) / n_tokens) if n_tokens else 0.0
    n_punct = len(_PUNCT_RE.findall(text))
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    stop = _STOPWORDS["en"]
    stop_ratio = (sum(1 for w in words if w in stop) / n_tokens) if n_tokens else 0.0
    return n_chars, n_tokens, mean_len, punct_ratio, stop_ratio


def quality_score(n_chars: int, n_tokens: int, mean_len: float,
                  punct_ratio: float, stop_ratio: float) -> float:
    """Fixed [0,1] heuristic: rewards mid-length docs with natural
    punctuation/stopword rates; penalizes degenerate content."""
    s = 0.0
    if 200 <= n_chars <= 50_000:
        s += 0.35
    elif n_chars > 0:
        s += 0.1
    if 2.5 <= mean_len <= 9.0:
        s += 0.25
    if 0.0 < punct_ratio <= 0.12:
        s += 0.2
    if stop_ratio >= 0.05:
        s += 0.2
    return round(s, 4)


# --- token counting ---------------------------------------------------------

_BPE_RE = re.compile(
    r"\w+|[^\w\s]", re.UNICODE
)  # BPE-ish pre-tokenization: word runs + single punctuation marks


def count_ws_tokens(text: str) -> int:
    """Whitespace-delimited token count."""
    return len(text.split())


def count_bpe_tokens(text: str) -> int:
    """BPE-ish count: word runs plus individual punctuation symbols —
    a deterministic proxy for subword token counts."""
    return len(_BPE_RE.findall(text))


# --- document fingerprint (rolling hash) ------------------------------------


_FP_SEED = np.uint64(0x243F6A8885A308D3)


def doc_fingerprint(token_hashes: np.ndarray) -> int:
    """64-bit rolling polynomial hash over the token-hash stream
    (mod 2^64): ``seed*M^n + sum(h_i * M^(n-1-i))``, finalized. An
    order- and length-sensitive whole-document fingerprint: two docs share
    it iff their token sequences match (up to 64-bit collisions)."""
    n = len(token_hashes)
    with np.errstate(over="ignore"):
        powers = np.empty(n + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        np.cumprod(np.full(n, _MIX_MULT, dtype=np.uint64), out=powers[1:])
        weights = powers[n - 1 :: -1] if n else powers[:0]
        acc = _FP_SEED * powers[n] + np.dot(
            np.asarray(token_hashes, dtype=np.uint64), weights
        ).astype(np.uint64)
        acc = acc * _FINAL_MULT
        acc ^= acc >> np.uint64(31)
    return int(acc)


def doc_fingerprints_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Batch fingerprints over flattened token hashes — per-row numpy dot
    against a shared power table (no per-token Python)."""
    ends = np.append(offsets[1:], len(flat))
    lengths = ends - offsets
    max_n = int(lengths.max()) if len(lengths) else 0
    with np.errstate(over="ignore"):
        powers = np.empty(max_n + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if max_n:
            np.cumprod(np.full(max_n, _MIX_MULT, dtype=np.uint64), out=powers[1:])
        out = np.empty(len(offsets), dtype=np.uint64)
        for i, (s, e) in enumerate(zip(offsets.tolist(), ends.tolist())):
            n = e - s
            acc = _FP_SEED * powers[n] + np.dot(flat[s:e], powers[n - 1 :: -1] if n else powers[:0]).astype(np.uint64)
            acc = acc * _FINAL_MULT
            acc ^= acc >> np.uint64(31)
            out[i] = acc
    return out
