"""Count-Min sketch (functions/countmin.py): never-underestimate
invariant, eps overestimate bound, merge==single-pass bit equality,
and the locked heavy-hitter query digest."""

from __future__ import annotations

import numpy as np

from ordinarydumpdeduplicator_ray.functions.countmin import (
    cms_merge,
    cms_new,
    cms_query,
    cms_update,
)


def _zipf_stream(n: int, seed: int) -> np.ndarray:
    """Zipfian stream of token hashes (the web-text shape)."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n).astype(np.uint64)
    with np.errstate(over="ignore"):
        return ranks * np.uint64(0x9E3779B97F4A7C15)


def test_cms_never_underestimates_and_eps_bound():
    h = _zipf_stream(200_000, 3)
    sk = cms_new()
    cms_update(sk, h)
    uniq, true = np.unique(h, return_counts=True)
    est = cms_query(sk, uniq).astype(np.int64)
    assert (est >= true).all()
    # eps = e/width of the total mass, with prob 1-(1/e)^depth per key;
    # assert the 99.9th percentile of overshoot stays under eps*N
    eps_n = np.e / sk.shape[1] * len(h)
    overshoot = est - true
    assert np.quantile(overshoot, 0.999) <= eps_n


def test_cms_merge_equals_single_pass():
    h = _zipf_stream(100_000, 7)
    single = cms_new()
    cms_update(single, h)
    parts = []
    for chunk in np.array_split(h, 13):
        s = cms_new()
        cms_update(s, chunk)
        parts.append(s)
    assert np.array_equal(cms_merge(parts), single)


def test_cms_empty_and_absent_keys():
    sk = cms_new()
    cms_update(sk, np.empty(0, dtype=np.uint64))
    assert sk.sum() == 0
    cms_update(sk, np.array([42], dtype=np.uint64))
    # an absent key can only read a collision (>= 0), never negative
    est = cms_query(sk, np.array([43, 42], dtype=np.uint64))
    assert est[1] >= 1


def test_heavy_hitter_counts_locked(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    t = q.heavy_hitter_counts("/root/testdata/sf0.01").to_pydict()
    assert t["token"][0] == "join" and t["exact_n"][0] == 964
    assert len(t["token"]) == 20
    # the sketch never underestimates; at this scale it is exact
    assert all(e >= x for e, x in zip(t["est_n"], t["exact_n"]))
    assert t["est_n"] == t["exact_n"]


def test_approx_top_tokens_equals_exact(ray_session):
    """At test scale the sketch top-k equals the exact top-k exactly
    (collision-free CMS + every global heavy hitter surfacing in some
    block's local candidates)."""
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    a = q.approx_top_tokens("/root/testdata/sf0.001", k=15).to_pydict()
    e = q.top_tokens("/root/testdata/sf0.001", 15).to_pydict()
    assert a["token"] == e["token"]
    assert a["est_n"] == e["n"]
