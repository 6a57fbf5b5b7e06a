"""Batched linear inference (stages/classify.py): brute-force score
oracle, partition independence, empty-doc handling, and the hash-locked
label counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher
from ordinarydumpdeduplicator_ray.functions.text import tokenize
from ordinarydumpdeduplicator_ray.stages.classify import (
    _LABELS,
    _hash_weights,
    classify_documents,
)


def _brute_score(text: str, W: np.ndarray) -> np.ndarray:
    toks = tokenize(text or "", True)
    if not toks:
        return np.zeros(W.shape[1])
    h = TokenHasher().hash_tokens(toks)
    feat = (h % np.uint64(W.shape[0])).astype(np.int64)
    v = np.zeros(W.shape[0])
    np.add.at(v, feat, 1.0)
    return (v / len(toks)) @ W


def test_classifier_matches_brute_force(ray_session):
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "click here to subscribe to our newsletter today",
        "",
        "data pipelines deduplicate web corpora at scale with ray",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in classify_documents(
            ray.data.from_arrow(docs).repartition(3), concurrency=2
        ).take_all()
    }
    W = _hash_weights(2048, 4, 0x5EED_C1A5)
    for i, txt in enumerate(texts):
        s = _brute_score(txt, W)
        toks = tokenize(txt or "", True)
        if not toks:
            assert out[i]["label"] == _LABELS[-1]
            assert out[i]["margin"] == 0.0
            continue
        order = np.argsort(s)
        assert out[i]["label"] == _LABELS[order[-1]]
        assert abs(out[i]["margin"] - (s[order[-1]] - s[order[-2]])) < 1e-12
        assert out[i]["n_tokens"] == len(toks)


def test_classifier_partition_independent(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    a = sorted(
        (r["doc_id"], r["label"]) for r in q.classifier_labels(
            "/root/testdata/sf0.001"
        ).take_all()
    )
    b = sorted(
        (r["doc_id"], r["label"]) for r in q.classifier_labels(
            "/root/testdata/sf0.001"
        ).take_all()
    )
    assert a == b
    assert len(a) == 500
    assert len({lbl for _, lbl in a}) > 1


def test_classifier_label_counts_locked(ray_session):
    """The committed sf0.01 lock values (oracle literals) reproduce."""
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = sorted(
        (r["label"], r["n_docs"])
        for r in q.classifier_label_counts("/root/testdata/sf0.01").take_all()
    )
    assert rows == [
        ("boilerplate", 7), ("high", 375), ("low", 20), ("medium", 98)
    ]
