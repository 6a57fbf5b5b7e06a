"""Winnowing fingerprints (functions/winnow.py) and containment pairs
(stages/winnowpairs.py) — kernel properties, the SIGMOD'03 guarantee,
and a brute-force pair oracle."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher
from ordinarydumpdeduplicator_ray.functions.winnow import (
    positional_shingle_hashes,
    winnow_fingerprints,
    winnow_positions,
)
from ordinarydumpdeduplicator_ray.stages.winnowpairs import (
    winnow_containment_pairs,
)

K, W = 5, 4


def _brute_fps(text: str, k=K, w=W) -> set:
    return set(winnow_fingerprints(text, TokenHasher(), k, w)[1].tolist())


def test_winnow_positions_basic():
    # every window of w must contain a selected position (coverage)
    rng = np.random.default_rng(2)
    h = rng.integers(0, 1 << 60, size=200).astype(np.uint64)
    pos = winnow_positions(h, W)
    assert (np.diff(pos) > 0).all()
    for start in range(len(h) - W + 1):
        assert ((pos >= start) & (pos < start + W)).any()
    # selected values are window minima
    win = np.lib.stride_tricks.sliding_window_view(h, W)
    assert set(h[pos]) <= set(win.min(axis=1))


def test_winnow_density():
    """Expected density 2/(w+1) — allow a generous band."""
    rng = np.random.default_rng(9)
    h = rng.integers(0, 1 << 60, size=20000).astype(np.uint64)
    d = len(winnow_positions(h, 7)) / len(h)
    assert 0.15 < d < 0.35  # 2/(7+1) = 0.25


def test_winnow_guarantee_shared_run_shares_fingerprint():
    """Any shared run of >= w + k - 1 tokens shares >= 1 fingerprint."""
    rng = np.random.default_rng(4)
    run = " ".join(f"shared{i}" for i in range(W + K - 1))
    for trial in range(10):
        pre = " ".join(f"a{rng.integers(1 << 30)}" for _ in range(30))
        post = " ".join(f"b{rng.integers(1 << 30)}" for _ in range(30))
        doc_a = f"{pre} {run}"
        doc_b = f"{run} {post}"
        assert _brute_fps(doc_a) & _brute_fps(doc_b), f"trial {trial}"


def test_positional_shingles_match_minhash_mix():
    """Positional stream contains exactly the values shingle_hashes
    dedups+sorts — same mix, comparable spaces."""
    from ordinarydumpdeduplicator_ray.functions.hashing import shingle_hashes
    from ordinarydumpdeduplicator_ray.functions.text import tokenize

    text = "the quick brown fox jumps over the lazy dog " * 3
    th = TokenHasher().hash_tokens(tokenize(text))
    pos_stream = positional_shingle_hashes(th, K)
    assert np.array_equal(np.unique(pos_stream), shingle_hashes(th, K))


def test_containment_pairs_vs_bruteforce(ray_session):
    """Distributed pipeline == brute-force all-pairs containment on a
    corpus with full copies, embedded chunks, and noise."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = {}
    for i in range(30):
        docs[f"u://{i:03d}"] = " ".join(rng.choice(vocab, size=120))
    # full copy
    docs["u://copy"] = docs["u://000"]
    # big doc embedding a chunk of another (containment high one way)
    chunk = " ".join(docs["u://001"].split()[:60])
    docs["u://embed"] = docs["u://002"] + " " + chunk
    urls = sorted(docs)
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls), "text": pa.array([docs[u] for u in urls]),
    }))
    got = {(r["url_a"], r["url_b"]): (r["n_shared"], r["containment"])
           for r in winnow_containment_pairs(pages, threshold=0.4).take_all()}

    fps = {u: _brute_fps(docs[u]) for u in urls}
    expect = {}
    for i, ua in enumerate(urls):
        for ub in urls[i + 1:]:
            inter = len(fps[ua] & fps[ub])
            if inter == 0 or not fps[ua] or not fps[ub]:
                continue
            c = inter / min(len(fps[ua]), len(fps[ub]))
            if round(c, 6) >= 0.4:
                expect[(ua, ub)] = (inter, round(c, 6))
    assert got == expect
    assert ("u://000", "u://copy") in got
    assert got[("u://000", "u://copy")][1] == 1.0
    assert any(ub == "u://embed" or ua == "u://embed" for ua, ub in got)


def test_containment_pairs_empty_and_degenerate(ray_session):
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["u://a", "u://b"]),
        "text": pa.array(["", "one two"]),
    }))
    assert winnow_containment_pairs(pages).take_all() == []


def test_containment_join_fallback_parity(ray_session, monkeypatch):
    """Forcing the shuffle-join verify (cap=0 semantics) must reproduce
    the broadcast path's output exactly."""
    import ordinarydumpdeduplicator_ray.stages.winnowpairs as wp

    rng = np.random.default_rng(23)
    vocab = [f"v{i}" for i in range(300)]
    docs = {f"u://{i:03d}": " ".join(rng.choice(vocab, size=80)) for i in range(20)}
    docs["u://dup"] = docs["u://000"]
    chunk = " ".join(docs["u://001"].split()[:40])
    docs["u://emb"] = docs["u://002"] + " " + chunk
    urls = sorted(docs)
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls), "text": pa.array([docs[u] for u in urls]),
    }))

    broadcast = sorted(
        (r["url_a"], r["url_b"], r["n_shared"], r["containment"])
        for r in winnow_containment_pairs(pages, threshold=0.3).take_all()
    )
    monkeypatch.setattr(wp, "_BROADCAST_UID_CAP", 1)
    joined = sorted(
        (r["url_a"], r["url_b"], r["n_shared"], r["containment"])
        for r in wp.winnow_containment_pairs(pages, threshold=0.3).take_all()
    )
    assert joined == broadcast
    assert len(broadcast) >= 2
