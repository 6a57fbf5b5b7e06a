"""Hypothesis property tests for the round-3c pure kernels (no Ray):
segmented sums, DuckDB-tie rounding, trigram construction, integer
PageRank conservation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(0, 7), min_size=0, max_size=20),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_segment_sums_matches_loop(seg_lens, data):
    from ordinarydumpdeduplicator_ray.pipelines.queries import _segment_sums

    lens = np.asarray(seg_lens, dtype=np.int64)
    total = int(lens.sum())
    vals = np.asarray(
        data.draw(st.lists(
            st.floats(-1e6, 1e6, allow_nan=False), min_size=total,
            max_size=total,
        )),
        dtype=np.float64,
    )
    got = _segment_sums(vals, lens)
    off = 0
    for i, ln in enumerate(lens):
        want = float(np.sum(vals[off:off + ln])) if ln else 0.0
        assert abs(got[i] - want) <= 1e-6 * max(1.0, abs(want))
        off += ln


@given(st.integers(-10**8, 10**8), st.integers(1, 10**4))
@settings(max_examples=300, deadline=None)
def test_round4_half_away_matches_decimal(num, den):
    from decimal import ROUND_HALF_UP, Decimal

    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        _round4_half_away,
    )

    x = num / den
    got = float(_round4_half_away(np.asarray([x]))[0])
    want = float(
        Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    ) if x >= 0 else -float(
        Decimal(-x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )
    # binary representation of x may sit an ulp off an exact tie; both
    # rules then agree with each other but may differ from the Decimal
    # of the IDEAL rational. Compare against Decimal of the FLOAT.
    assert got == want


@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=0, max_size=8),
                min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_doc_trigrams_matches_bruteforce(docs):
    from ordinarydumpdeduplicator_ray.pipelines.queries import _doc_trigrams

    texts = [" ".join(toks) for toks in docs]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    tri, n_tri = _doc_trigrams(t)
    tri = tri.to_pylist()
    want = []
    want_counts = []
    for toks in docs:
        ts = [" ".join(toks[i:i + 3]) for i in range(max(0, len(toks) - 2))]
        want.extend(ts)
        want_counts.append(len(ts))
    assert tri == want
    assert list(n_tri) == want_counts


@given(st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda ab: ab[0] != ab[1]
    ),
    min_size=1, max_size=25,
))
@settings(max_examples=50, deadline=None)
def test_pagerank_mass_conservation_bound(ray_session, pairs):
    """Integer PageRank: total rank stays within rounding slack of 1
    and every node's rank is positive (teleport floor)."""
    import ray
    import ray.data

    edges = pa.table({
        "url_a": pa.array([f"n{a}" for a, _ in pairs]),
        "url_b": pa.array([f"n{b}" for _, b in pairs]),
    })
    from ordinarydumpdeduplicator_ray.state.pagerank import pagerank

    tbl = pagerank(ray.data.from_arrow(edges), iters=5)
    ranks = tbl["rank"].to_pylist()
    n = len(ranks)
    assert all(r > 0 for r in ranks)
    # integer floor-division leaks at most ~1 nano-unit per edge-node
    # per iteration; at this size the total stays within 2%
    assert 0.9 <= sum(ranks) <= 1.0 + 1e-9, (n, sum(ranks))
