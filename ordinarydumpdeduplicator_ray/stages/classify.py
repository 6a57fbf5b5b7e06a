"""Batched linear-classifier inference over hashed bag-of-words.

The model-scoring stage a training-data pipeline runs at scale
(fastText-style quality/domain classifiers): featurize each document
into a hashed bag-of-words vector and score it against a dense weight
matrix with one matmul per batch. The Ray-side plumbing is the real
deliverable — weights are built ONCE per actor in ``__init__`` (the
"model load"), the per-batch path is fully vectorized (flat token-hash
array + ``np.add.at`` scatter into the count matrix + one GEMM), and
batch size × concurrency bound the working set.

Since no model artifact ships in this environment, the weights are
hash-DERIVED (splitmix64 over the flat weight index), which makes every
score a pure deterministic function of (text, seed): reorder-,
partition- and parallelism-independent, so the output can be
hash-locked. Swapping in real weights means replacing ``_hash_weights``
with an ``np.load`` — nothing else changes.

No reference counterpart (north-rule LLM-pipeline operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher
from ordinarydumpdeduplicator_ray.functions.text import tokenize

_LABELS = ("high", "medium", "low", "boilerplate")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer over uint64 (vectorized, wrapping)."""
    with np.errstate(over="ignore"):
        x = x.copy()
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def _hash_weights(n_features: int, n_classes: int, seed: int) -> np.ndarray:
    """Dense float64 weight matrix in [-1, 1), every entry a pure
    function of its flat index and the seed."""
    idx = np.arange(n_features * n_classes, dtype=np.uint64) + np.uint64(seed)
    u = _mix64(idx).astype(np.float64) / float(2**64)
    return (u * 2.0 - 1.0).reshape(n_features, n_classes)


class LinearClassifierActor:
    """Actor-pool batch map: hashed-BoW featurize + one GEMM per batch.

    ``__init__`` is the once-per-actor model load (weights + token-hash
    cache); ``__call__`` is per batch. Output: (url?, doc_id?, passthrough
    id columns) + label, margin, n_tokens."""

    def __init__(
        self,
        id_cols: tuple[str, ...] = ("doc_id",),
        text_col: str = "text",
        n_features: int = 2048,
        n_classes: int = 4,
        seed: int = 0x5EED_C1A5,
    ) -> None:
        self.id_cols = id_cols
        self.text_col = text_col
        self.n_features = n_features
        self.W = _hash_weights(n_features, n_classes, seed)
        self.hasher = TokenHasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        n = len(texts)
        # flat featurization: one concatenated hash array + row offsets
        flats: list[np.ndarray] = []
        counts = np.zeros(n, dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = tokenize(txt or "", True)
            counts[i] = len(toks)
            if toks:
                flats.append(self.hasher.hash_tokens(toks))
        if flats:
            flat = np.concatenate(flats)
            feat = (flat % np.uint64(self.n_features)).astype(np.int64)
            row = np.repeat(np.arange(n, dtype=np.int64), counts)
            m = np.zeros((n, self.n_features), dtype=np.float64)
            np.add.at(m, (row, feat), 1.0)
            # L1-normalize so score scale is length-free
            denom = np.maximum(counts, 1).astype(np.float64)[:, None]
            scores = (m / denom) @ self.W
        else:
            scores = np.zeros((n, self.W.shape[1]), dtype=np.float64)
        order = np.argsort(scores, axis=1)
        top = order[:, -1]
        margin = (
            scores[np.arange(n), top]
            - scores[np.arange(n), order[:, -2]]
        )
        # empty docs get a fixed label, not an argmax over zeros
        top = np.where(counts == 0, len(_LABELS) - 1, top)
        margin = np.where(counts == 0, 0.0, margin)
        cols = {c: t[c] for c in self.id_cols if c in t.column_names}
        cols["label"] = pa.array(
            [_LABELS[i] for i in top], type=pa.string()
        )
        cols["margin"] = pa.array(margin, type=pa.float64())
        cols["n_tokens"] = pa.array(counts, type=pa.int64())
        return pa.table(cols)


def classify_documents(
    docs,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
    concurrency: int = 4,
    batch_size: int = 512,
):
    """documents -> (id cols, label, margin, n_tokens) via the
    actor-pool inference stage."""
    return docs.map_batches(
        LinearClassifierActor,
        fn_constructor_kwargs={"id_cols": id_cols, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
