"""Streaming near-dup ingest (stages/neardupingest.py): injected
re-crawls and near-copies resolve against the persisted prior index;
determinism; empty-new path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_ingest_flags_injected_copies(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = q.near_dup_ingest_verdicts("/root/testdata/sf0.001").take_all()
    inj = [r for r in rows if r["url"].endswith(("-recrawl", "-near"))]
    assert inj
    exact_original = 0
    for r in inj:
        assert r["is_dup"], r
        assert r["dup_of"].startswith("testdata://prior/")
        assert r["est"] >= 0.8
        expect = "testdata://prior/" + r["url"].split("/")[-1].split("-")[0]
        if r["dup_of"] == expect:
            exact_original += 1
    # the canonical-min rule may pick a SMALLER prior when the corpus
    # itself contains near-identical texts; the vast majority still
    # resolve to their own original
    assert exact_original / len(inj) > 0.9
    # fresh odd docs mostly pass through
    fresh = [r for r in rows if not r["url"].endswith(("-recrawl", "-near"))]
    assert sum(not r["is_dup"] for r in fresh) > 0.9 * len(fresh)


def test_ingest_deterministic(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    key = lambda rs: sorted(
        (r["url"], r["is_dup"], r["dup_of"]) for r in rs
    )
    a = key(q.near_dup_ingest_verdicts("/root/testdata/sf0.001").take_all())
    b = key(q.near_dup_ingest_verdicts("/root/testdata/sf0.001").take_all())
    assert a == b


def test_ingest_fresh_only_new_snapshot(ray_session, tmp_path):
    """A new snapshot with no relation to the prior index: nothing
    flagged, every row emitted."""
    import ray.data

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.stages.neardupingest import (
        ingest_near_dup,
        persist_near_dup_index,
    )

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(5000)]

    def pages(prefix: str, n: int) -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([f"{prefix}{i:04d}" for i in range(n)]),
            "html": pa.nulls(n, type=pa.binary()),
            "text": pa.array([
                " ".join(rng.choice(vocab, size=40)) for _ in range(n)
            ]),
        }))

    cfg = DedupConfig(sig_concurrency=2)
    idx = str(tmp_path / "index")
    persist_near_dup_index(pages("prior", 80), idx, cfg)
    out = ingest_near_dup(pages("new", 40), idx, cfg, num_partitions=4).take_all()
    assert len(out) == 40
    assert not any(r["is_dup"] for r in out)
