"""Bloom-gated streaming ingest dedup (stages/bloom.py)."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.stages.bloom import (
    _h1_h2_from_digests,
    _positions,
    _probe_bits,
    _sha_digests,
    bloom_new_docs,
    build_text_bloom,
    fold_bits,
    target_bits,
)


def _h1_h2(texts):
    return _h1_h2_from_digests(_sha_digests(pa.array(texts)))


def _pages(texts, prefix="u"):
    return ray.data.from_arrow(pa.table({
        "url": pa.array([f"{prefix}://{i}" for i in range(len(texts))]),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_bloom_no_false_negatives_and_fpp_bound(ray_session):
    rng = np.random.default_rng(3)
    keys = [f"doc {i} {rng.integers(1 << 30)}" for i in range(2000)]
    bloom = build_text_bloom(_pages(keys), fpp=0.01)
    bits, k, mask = bloom["bits"], bloom["k"], bloom["m"] - 1

    h1, h2 = _h1_h2(keys)
    assert _probe_bits(bits, _positions(h1, h2, k, mask)).all()  # no FN

    fresh = [f"other {i} {rng.integers(1 << 30)}" for i in range(5000)]
    h1, h2 = _h1_h2(fresh)
    fp = _probe_bits(bits, _positions(h1, h2, k, mask)).mean()
    assert fp <= 0.03  # 3x the 1% target


def test_bloom_new_docs_exact_vs_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    prior = [f"prior {i}" for i in range(300)]
    # new mix: 100 fresh, 80 dups of prior, plus 20 dups WITHIN new
    new = ([f"fresh {i}" for i in range(100)]
           + [prior[int(i)] for i in rng.integers(0, 300, size=80)]
           + ["fresh 0"] * 20)
    out = bloom_new_docs(_pages(new, "n"), _pages(prior, "p"), fpp=0.02)
    rows = out.take_all()
    prior_shas = {hashlib.sha256(t.encode()).hexdigest() for t in prior}
    expect = {(f"n://{i}", hashlib.sha256(t.encode()).hexdigest())
              for i, t in enumerate(new)
              if hashlib.sha256(t.encode()).hexdigest() not in prior_shas}
    assert {(r["url"], r["text_sha256"]) for r in rows} == expect
    assert len(rows) == len(expect)  # within-new dups all kept (row-level)


def test_bloom_empty_prior_passes_everything(ray_session):
    new = _pages(["a", "b", "c"])
    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string()),
    }))
    out = bloom_new_docs(new, empty)
    assert sorted(r["url"] for r in out.take_all()) == ["u://0", "u://1", "u://2"]


def test_bloom_target_bits_sane():
    m = target_bits(1000, fpp=0.01)
    assert m >= 8 * 1000  # >= ~8 bits/key at 1% with k=8
    assert target_bits(8000, fpp=0.001) > m  # more keys + tighter fpp
    assert target_bits(0, fpp=0.01) == 64    # empty corpus -> floor


def test_bloom_fold_preserves_membership():
    rng = np.random.default_rng(21)
    m_big, m_small = 1 << 14, 1 << 11
    words = np.zeros(m_big // 64, dtype=np.uint64)
    pos = rng.integers(0, m_big, size=300).astype(np.uint64)
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    folded = fold_bits(words, m_big, m_small)
    fpos = pos & np.uint64(m_small - 1)
    got = (folded[(fpos >> np.uint64(6)).astype(np.int64)]
           >> (fpos & np.uint64(63))) & np.uint64(1)
    assert got.all()


def test_bloom_partials_blocking_independent(ray_session):
    """Dense and sparse partial paths OR to the same bitmap regardless
    of block boundaries."""
    texts = [f"t{i}" for i in range(500)]
    one = build_text_bloom(_pages(texts), fpp=0.01, n_expected=500)
    many = build_text_bloom(
        _pages(texts).repartition(13), fpp=0.01, n_expected=500
    )
    assert np.array_equal(one["bits"], many["bits"])
    assert (one["m"], one["k"]) == (many["m"], many["k"])


def test_bloom_save_load_roundtrip(ray_session, tmp_path):
    from ordinarydumpdeduplicator_ray.stages.bloom import load_bloom, save_bloom

    bloom = build_text_bloom(_pages([f"k{i}" for i in range(800)]), fpp=0.01)
    p = str(tmp_path / "bloom.parquet")
    save_bloom(bloom, p)
    back = load_bloom(p)
    assert back["m"] == bloom["m"] and back["k"] == bloom["k"]
    assert np.array_equal(back["bits"], bloom["bits"])
    # loaded filter still has no false negatives
    h1, h2 = _h1_h2([f"k{i}" for i in range(800)])
    assert _probe_bits(back["bits"],
                       _positions(h1, h2, back["k"], back["m"] - 1)).all()
