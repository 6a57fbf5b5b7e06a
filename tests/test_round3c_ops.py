"""Round-3c operators: domain blocklist, balanced shards, components
carry, dedup recall eval."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_block_verdicts_semantics(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.blocklist import block_verdicts

    urls = [
        "https://tracker.example/x",            # exact depth-2 match
        "https://ads.tracker.example/y",        # subdomain of depth-2
        "https://ads.sub.tracker.example/z",    # deep subdomain of depth-2
        "https://BAD.Tracker.EXAMPLE/case",     # case-folded host
        "https://other.example/ok",             # no match
        "https://cdn.safe.example/a",           # depth-3 exact
        "https://x.cdn.safe.example/b",         # subdomain of depth-3
        "https://safe.example/c",               # parent of a listed depth-3:
                                                # NOT blocked (no upward match)
        "https://notracker.example/d",          # suffix of label, not of
                                                # domain: NOT blocked
        "no-scheme-at-all",                     # unparseable: NOT blocked
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    out = block_verdicts(
        ds, ["tracker.example", "cdn.safe.example"]
    ).take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url["https://tracker.example/x"]["matched_domain"] == "tracker.example"
    assert by_url["https://ads.tracker.example/y"]["blocked"]
    assert by_url["https://ads.sub.tracker.example/z"]["blocked"]
    assert by_url["https://BAD.Tracker.EXAMPLE/case"]["blocked"]
    assert not by_url["https://other.example/ok"]["blocked"]
    assert by_url["https://cdn.safe.example/a"]["matched_domain"] == "cdn.safe.example"
    assert by_url["https://x.cdn.safe.example/b"]["blocked"]
    assert not by_url["https://safe.example/c"]["blocked"]
    assert not by_url["https://notracker.example/d"]["blocked"]
    assert not by_url["no-scheme-at-all"]["blocked"]
    assert by_url["no-scheme-at-all"]["matched_domain"] is None


def test_block_verdicts_deepest_match_wins(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.blocklist import block_verdicts

    ds = ray.data.from_arrow(
        pa.table({"url": pa.array([
            "https://a.b.example/1",   # matches both b.example and a.b.example
            "https://c.b.example/2",   # matches only b.example
        ])})
    )
    out = {r["url"]: r for r in block_verdicts(
        ds, ["b.example", "a.b.example"]
    ).take_all()}
    assert out["https://a.b.example/1"]["matched_domain"] == "a.b.example"
    assert out["https://c.b.example/2"]["matched_domain"] == "b.example"


def test_blocklist_filter_query(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = q.blocklist_filter("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    blocked = [r for r in rows if r["blocked"]]
    # src3 + src11 wholly blocked (25 docs each), src0 wholly blocked
    # (25: 3 via the deeper s1.src0.example, 22 via src0.example),
    # s4.src17.example picks the src17 docs with doc_id % 7 == 4
    assert len(blocked) == 78
    assert all(r["matched_domain"] for r in blocked)
    deep = [r for r in blocked if r["matched_domain"] == "s1.src0.example"]
    assert deep and all(r["host"] == "s1.src0.example" for r in deep)
    assert all(not r["blocked"] or "." in r["host"] for r in rows)
