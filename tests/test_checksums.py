"""Hash-locked digests for the deterministic rows-only operators
(VERDICT r2 #5).

``doc_fingerprint_checksum`` / ``media_embedding_checksum`` reduce the
operator's actual output to an order- and blocking-independent 1-row
digest.  The driver oracle pins the sf0.01 constant; here we pin the
sf0.001 constant AND verify blocking-independence by recomputing the
digest brute-force from the collected output rows on the driver (one
table, no partials) — if the distributed per-batch partial summation
depended on block boundaries or row order, the two would diverge.
"""
from __future__ import annotations

import numpy as np

from ordinarydumpdeduplicator_ray.pipelines import queries as q
from ordinarydumpdeduplicator_ray.pipelines.queries import _mix64

SF = "/root/testdata/sf0.001"

# Stored constants computed once from the deterministic seed-42 testdata.
DOC_FP_SF0001 = ("a56d5dcf734c8bc1", 500)
MEDIA_EMB_SF0001 = ("948a3f6689364217", 500)


def _brute_sum(vals: np.ndarray) -> str:
    with np.errstate(over="ignore"):
        return f"{int(np.sum(vals, dtype=np.uint64)):016x}"


def test_doc_fingerprint_checksum_locked(ray_session):
    t = q.doc_fingerprint_checksum(SF)
    assert t["checksum"][0].as_py() == DOC_FP_SF0001[0]
    assert t["n_docs"][0].as_py() == DOC_FP_SF0001[1]


def test_doc_fingerprint_checksum_matches_bruteforce(ray_session):
    """Distributed per-batch partials == single-table driver recompute."""
    out = q.doc_fingerprints(SF).take_all()
    v = np.array([int(r["fingerprint"], 16) for r in out], dtype=np.uint64)
    ids = np.array([r["doc_id"] for r in out], dtype=np.uint64)
    # shuffle driver-side: the sum must be order-independent
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(v))
    brute = _brute_sum(_mix64(v[perm] ^ _mix64(ids[perm])))
    t = q.doc_fingerprint_checksum(SF)
    assert t["checksum"][0].as_py() == brute
    assert t["n_docs"][0].as_py() == len(out)


def test_media_embedding_checksum_locked(ray_session):
    t = q.media_embedding_checksum(SF)
    assert t["checksum"][0].as_py() == MEDIA_EMB_SF0001[0]
    assert t["n_rows"][0].as_py() == MEDIA_EMB_SF0001[1]


def test_media_embedding_checksum_matches_bruteforce(ray_session):
    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
    import pyarrow as pa

    out = q.media_embeddings(SF).take_all()
    emb = np.array([r["embedding"] for r in out], dtype=np.float32)
    mat = emb.view(np.uint32).astype(np.uint64)
    with np.errstate(over="ignore"):
        fold = np.zeros(len(out), dtype=np.uint64)
        for j in range(mat.shape[1]):
            fold = _mix64(fold ^ mat[:, j])
        u = url_uids(pa.array([r["url"] for r in out])).view(np.uint64)
        brute = _brute_sum(_mix64(u ^ _mix64(fold)))
    t = q.media_embedding_checksum(SF)
    assert t["checksum"][0].as_py() == brute
    assert t["n_rows"][0].as_py() == len(out)
