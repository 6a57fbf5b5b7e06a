"""Hypothesis property tests for the round-3b pure kernels (no Ray):
interval merge, prefix sums over arbitrary ints, HLL/CMS merge
algebra, aHash/audio-fingerprint invariances, cut-text conservation."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def interval_rows(draw):
    n_urls = draw(st.integers(1, 8))
    rows = []
    for u in range(n_urls):
        for _ in range(draw(st.integers(1, 6))):
            s = draw(st.integers(0, 50))
            e = s + draw(st.integers(1, 20))
            rows.append((f"u{u}", s, e))
    rows.sort()
    return rows


@given(interval_rows())
@settings(max_examples=200, deadline=None)
def test_merge_sorted_runs_property(rows):
    from ordinarydumpdeduplicator_ray.stages.spanremoval import (
        _merge_sorted_runs,
    )

    urls = np.array([r[0] for r in rows], dtype=object)
    starts = np.array([r[1] for r in rows], dtype=np.int64)
    ends = np.array([r[2] for r in rows], dtype=np.int64)
    mu, ms, me = _merge_sorted_runs(urls, starts, ends)
    # disjoint + sorted per url, and coverage-equivalent to the input
    by_url: dict[str, list[tuple[int, int]]] = {}
    for u, s, e in zip(mu, ms, me):
        by_url.setdefault(u, []).append((s, e))
    for u, iv in by_url.items():
        for (s1, e1), (s2, e2) in zip(iv, iv[1:]):
            assert e1 < s2  # disjoint, non-adjacent (adjacency merged)
    def cover(pairs):
        out = set()
        for s, e in pairs:
            out.update(range(s, e))
        return out
    for u in {r[0] for r in rows}:
        assert cover(by_url.get(u, [])) == cover(
            [(s, e) for uu, s, e in rows if uu == u]
        )


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=200),
       st.integers(2, 12))
@settings(max_examples=100, deadline=None)
def test_cms_hll_merge_associativity(values, n_chunks):
    from ordinarydumpdeduplicator_ray.functions.countmin import (
        cms_merge, cms_new, cms_update,
    )
    from ordinarydumpdeduplicator_ray.functions.hll import (
        hll_merge, hll_new, hll_update,
    )

    h = (np.array(values, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    cms_single, hll_single = cms_new(), hll_new()
    cms_update(cms_single, h)
    hll_update(hll_single, h)
    cms_parts, hll_parts = [], []
    for chunk in np.array_split(h, min(n_chunks, len(h))):
        c, l = cms_new(), hll_new()
        cms_update(c, chunk)
        hll_update(l, chunk)
        cms_parts.append(c)
        hll_parts.append(l)
    assert np.array_equal(cms_merge(cms_parts), cms_single)
    assert np.array_equal(hll_merge(hll_parts), hll_single)


@given(st.integers(0, 2**32), st.integers(2, 60))
@settings(max_examples=100, deadline=None)
def test_audio_fingerprint_gain_invariance(seed, n_windows):
    from ordinarydumpdeduplicator_ray.functions.audiocodec import (
        audio_fingerprint,
    )

    x = np.random.default_rng(seed).normal(size=500)
    f = audio_fingerprint(x, n_windows)
    assert audio_fingerprint(x * 0.25, n_windows) == f
    assert audio_fingerprint(x * 4.0, n_windows) == f


@given(st.integers(0, 2**32))
@settings(max_examples=50, deadline=None)
def test_average_hash_brightness_invariance(seed):
    from ordinarydumpdeduplicator_ray.functions.imagecodec import average_hash

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    assert average_hash(px + np.uint8(8)) == average_hash(px)


@st.composite
def text_and_intervals(draw):
    n = draw(st.integers(1, 30))
    toks = [f"t{i}" for i in range(n)]
    text = " ".join(toks)
    n_iv = draw(st.integers(0, 4))
    ivs = []
    for _ in range(n_iv):
        s = draw(st.integers(0, n - 1))
        e = draw(st.integers(s + 1, n))
        ivs.append((s, e))
    # merge to disjoint (the contract of _cut_text's caller)
    ivs.sort()
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return text, merged, n


@given(text_and_intervals())
@settings(max_examples=200, deadline=None)
def test_cut_text_token_conservation(case):
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.stages.spanremoval import _cut_text

    text, ivs, n = case
    cleaned, removed, norm = _cut_text(text, ivs)
    assert not norm
    keep = np.ones(n, dtype=bool)
    for s, e in ivs:
        keep[s:e] = False
    expect_tokens = [t for t, k in zip(tokenize(text, True), keep) if k]
    assert tokenize(cleaned, True) == expect_tokens
    assert removed == int((~keep).sum())
