"""ExactSubstr removal (stages/spanremoval.py): interval merge vs a
brute-force oracle across block borders, and byte-exact cut semantics
end to end on a planted-boilerplate corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ordinarydumpdeduplicator_ray.stages.spanremoval import (
    _cut_text,
    _merge_sorted_runs,
)


def _brute_merge(rows):
    """rows: (url, s, e) -> merged disjoint intervals per url,
    overlap OR adjacency merges."""
    out = {}
    for u, s, e in sorted(rows):
        iv = out.setdefault(u, [])
        if iv and s <= iv[-1][1]:
            iv[-1] = (iv[-1][0], max(iv[-1][1], e))
        else:
            iv.append((s, e))
    return sorted((u, s, e) for u, iv in out.items() for s, e in iv)


def test_merge_sorted_runs_brute_force():
    rng = np.random.default_rng(17)
    rows = []
    for u in [f"u{i}" for i in range(40)]:
        for _ in range(int(rng.integers(1, 8))):
            s = int(rng.integers(0, 200))
            e = s + int(rng.integers(1, 60))
            rows.append((u, s, e))
    rows.sort()
    urls = np.array([r[0] for r in rows], dtype=object)
    starts = np.array([r[1] for r in rows], dtype=np.int64)
    ends = np.array([r[2] for r in rows], dtype=np.int64)
    mu, ms, me = _merge_sorted_runs(urls, starts, ends)
    assert sorted(zip(mu, ms, me)) == _brute_merge(rows)


def test_merge_intervals_border_stress(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.spanremoval import merge_intervals

    rng = np.random.default_rng(23)
    rows = []
    for u in [f"doc{i:03d}" for i in range(60)]:
        for _ in range(int(rng.integers(1, 10))):
            s = int(rng.integers(0, 300))
            rows.append((u, s, s + int(rng.integers(1, 80))))
    rng.shuffle(rows)
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "tok_start": pa.array([r[1] for r in rows], type=pa.int64()),
            "tok_end": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    # many tiny blocks so url runs straddle block borders
    got = merge_intervals(ray.data.from_arrow(t).repartition(37)).take_all()
    assert sorted(
        (r["url"], r["tok_start"], r["tok_end"]) for r in got
    ) == _brute_merge(rows)


def test_cut_text_exact():
    # "p0 p1 | b0..b4 | s0 s1": cut tokens [2, 7) mid-doc removes the
    # run plus its trailing separator
    text = "p0 p1 b0 b1 b2 b3 b4 s0 s1"
    cleaned, removed, norm = _cut_text(text, [(2, 7)])
    assert cleaned == "p0 p1 s0 s1"
    assert removed == 5 and not norm
    # tail cut swallows the LEADING separator
    cleaned, removed, _ = _cut_text("p0 p1 b0 b1", [(2, 4)])
    assert cleaned == "p0 p1"
    assert removed == 2
    # head cut
    cleaned, removed, _ = _cut_text("b0 b1 s0 s1", [(0, 2)])
    assert cleaned == "s0 s1"
    # two disjoint cuts
    cleaned, removed, _ = _cut_text("a b X Y c d Z W e", [(2, 4), (6, 8)])
    assert cleaned == "a b c d e"
    assert removed == 4
    # whole-doc cut
    cleaned, removed, _ = _cut_text("x y z", [(0, 3)])
    assert cleaned == ""


def test_remove_duplicate_spans_end_to_end(ray_session):
    """Three docs share a 35-word boilerplate run; the smallest url
    keeps it, the other two lose it byte-exactly (and the two pairs
    hitting u3 merge into ONE removed interval)."""
    import ray.data

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.stages.spanremoval import (
        remove_duplicate_spans,
    )

    boiler = " ".join(f"b{i:02d}" for i in range(35))
    docs = {
        "u1": f"alpha1 beta1 {boiler} gamma1 delta1",
        "u2": f"alpha2 beta2 {boiler} gamma2 delta2",
        "u3": f"alpha3 beta3 {boiler} gamma3 delta3",
        "u4": "quiet unique page with no shared runs at all",
    }
    pages = pa.table(
        {
            "url": pa.array(list(docs), type=pa.string()),
            "html": pa.nulls(len(docs), type=pa.binary()),
            "text": pa.array(list(docs.values()), type=pa.string()),
        }
    )
    cfg = DedupConfig(span_sample_mod=1, sig_concurrency=2)
    out = {
        r["url"]: r
        for r in remove_duplicate_spans(
            ray.data.from_arrow(pages).repartition(4), cfg, num_partitions=4
        ).take_all()
    }
    assert out["u1"]["text"] == docs["u1"]
    assert out["u1"]["n_spans"] == 0
    assert out["u4"]["text"] == docs["u4"]
    for u in ("u2", "u3"):
        assert out[u]["text"] == f"alpha{u[1]} beta{u[1]} gamma{u[1]} delta{u[1]}"
        assert out[u]["n_removed_words"] == 35
        assert out[u]["n_spans"] == 1  # pairs vs u1 AND u2 merged
        assert not out[u]["normalized"]


def test_exact_substring_removal_query(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = q.exact_substring_removal("/root/testdata/sf0.001").take_all()
    assert len(rows) > 0
    for r in rows:
        assert r["n_spans"] >= 1
        assert r["n_removed_words"] > 0
        assert len(r["clean_sha"]) == 64
    # deterministic across runs (partitioning/pair-order independent)
    rows2 = q.exact_substring_removal("/root/testdata/sf0.001").take_all()
    key = lambda rs: sorted((r["url"], r["clean_sha"]) for r in rs)
    assert key(rows) == key(rows2)


def test_apply_removals_join_route_parity(ray_session):
    """The join route (above-cap fallback) must produce the exact same
    cut corpus as the broadcast route — byte-identical text and stats
    per url, under many tiny blocks so url runs straddle block borders
    in _interval_lists."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages import spanremoval as sr

    rng = np.random.default_rng(41)
    docs = {}
    intervals = []
    for i in range(80):
        u = f"doc{i:03d}"
        n_tok = int(rng.integers(8, 60))
        docs[u] = " ".join(f"w{i}_{j}" for j in range(n_tok))
        # half the docs get 1-4 random cut intervals
        if i % 2 == 0:
            for _ in range(int(rng.integers(1, 5))):
                s = int(rng.integers(0, n_tok))
                e = min(n_tok, s + int(rng.integers(1, 12)))
                if e > s:
                    intervals.append((u, s, e))
    # materialized, as remove_duplicate_spans does: a LAZY repartition
    # feeding the broadcast route's actor pool deadlocks on a small
    # session (the pool reserves every CPU, starving the split tasks)
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(list(docs), type=pa.string()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    ).repartition(7).materialize()
    merged = sr.merge_intervals(
        ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r[0] for r in intervals], type=pa.string()),
                    "tok_start": pa.array(
                        [r[1] for r in intervals], type=pa.int64()
                    ),
                    "tok_end": pa.array([r[2] for r in intervals], type=pa.int64()),
                }
            )
        ).repartition(11)
    ).materialize()

    def snap(route):
        rows = sr.apply_removals(corpus, merged, route=route).take_all()
        return sorted(
            (
                r["url"],
                r["text"],
                r["n_removed_words"],
                r["n_spans"],
                r["normalized"],
            )
            for r in rows
        )

    a = snap("broadcast")
    b = snap("join")
    assert a == b
    assert sum(1 for r in a if r[3] > 0) > 0  # some docs actually cut


def test_apply_removals_auto_switches_to_join(ray_session, monkeypatch):
    """Force a tiny cap: auto must take the join route (no take_all of
    the interval table) and still match the broadcast output."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages import spanremoval as sr

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c"], type=pa.string()),
                "text": pa.array(
                    ["t0 t1 t2 t3 t4", "s0 s1 s2 s3", "keep me whole"],
                    type=pa.string(),
                ),
            }
        )
    )
    merged = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b"], type=pa.string()),
                "tok_start": pa.array([1, 0], type=pa.int64()),
                "tok_end": pa.array([3, 2], type=pa.int64()),
            }
        )
    )
    want = sorted(
        (r["url"], r["text"])
        for r in sr.apply_removals(corpus, merged, route="broadcast").take_all()
    )
    monkeypatch.setattr(sr, "_BROADCAST_CAP", 1)
    got_rows = sr.apply_removals(corpus, merged, route="auto").take_all()
    got = sorted((r["url"], r["text"]) for r in got_rows)
    assert got == want
    assert dict(got)["a"] == "t0 t3 t4"
    assert dict(got)["c"] == "keep me whole"
