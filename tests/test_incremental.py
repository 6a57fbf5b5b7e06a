"""Incremental re-crawl scan (stages/incremental.py): reusing the prior
run's sketch rows must be invisible in the OUTPUT — bit-identical
signatures and identical downstream dedup results — and visible only in
the work split (n_reused / n_recomputed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sig_rows(ds):
    cols = ["url", "status", "content_sha256", "text_sha256", "n_bytes",
            "n_tokens", "minhash", "simhash"]
    rows = [tuple(r[c] for c in cols) for r in ds.take_all()]
    return sorted(rows)


def _two_snapshots(n=220, seed=7):
    """prev: original texts; cur: every 5th url's text edited, every
    9th url new (absent from prev), every 11th prev url removed."""
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.synth import generate_pages

    pages, _ = generate_pages(n, seed=seed)
    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()
    htmls = pages["html"].to_pylist()

    prev_rows = {"url": [], "html": [], "text": []}
    cur_rows = {"url": [], "html": [], "text": []}
    for i, (u, h, t) in enumerate(zip(urls, htmls, texts)):
        if i % 9 != 0:
            prev_rows["url"].append(u)
            prev_rows["html"].append(h)
            prev_rows["text"].append(t)
        if i % 11 != 0:
            cur_rows["url"].append(u)
            cur_rows["html"].append(h)
            cur_rows["text"].append(
                (t + " edited") if (t is not None and i % 5 == 0) else t
            )
    mk = lambda d: ray.data.from_arrow(pa.table({
        "url": pa.array(d["url"], type=pa.string()),
        "html": pa.array(d["html"], type=pa.binary()),
        "text": pa.array(d["text"], type=pa.string()),
    }))
    return mk(prev_rows), mk(cur_rows)


class TestIncrementalSignatures:
    def test_bit_identical_to_full_recompute(self, ray_session):
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.incremental import (
            incremental_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots()
        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev, cfg).materialize()
        full = compute_signatures(cur, cfg)
        inc, info = incremental_signatures(cur, prior, cfg, num_partitions=4)

        assert _sig_rows(inc) == _sig_rows(full)
        assert info["n_reused"] > 0 and info["n_recomputed"] > 0
        assert info["n_reused"] + info["n_recomputed"] == cur.count()
        # every edited-url and every url absent from prev must recompute
        reused_allowed = {
            r["url"] for r in prev.select_columns(["url"]).take_all()
        }
        # count expectation straight from the construction
        cur_urls = [r["url"] for r in cur.select_columns(["url"]).take_all()]
        assert info["n_recomputed"] >= len(
            [u for u in cur_urls if u not in reused_allowed]
        )

    def test_pipeline_with_prior_matches_fresh_run(self, ray_session):
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots()
        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev, cfg).materialize()

        fresh = DedupPipeline(cfg, num_partitions=4)
        out_fresh = fresh.run(cur)

        inc = DedupPipeline(cfg, num_partitions=4)
        inc.register_prior_signatures(prior)
        out_inc = inc.run(cur)

        assert inc.metrics["signatures_reuse"]["n_reused"] > 0
        for key in ("groups_exact", "components", "groups_near", "actions"):
            a = sorted(
                tuple(sorted(r.items())) for r in out_fresh[key].take_all()
            )
            b = sorted(
                tuple(sorted(r.items())) for r in out_inc[key].take_all()
            )
            assert a == b, key

    def test_join_fallback_matches_broadcast_path(self, ray_session, monkeypatch):
        """Above the broadcast cap the shuffle-join fallback must
        produce the same bit-identical signature set."""
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages import incremental as I
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots(n=120, seed=3)
        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev, cfg).materialize()

        via_broadcast, info_b = I.incremental_signatures(
            cur, prior, cfg, num_partitions=4
        )
        monkeypatch.setattr(I, "_INCR_BROADCAST_CAP", 0)
        via_join, info_j = I.incremental_signatures(
            cur, prior, cfg, num_partitions=4
        )
        assert info_b == info_j
        assert _sig_rows(via_broadcast) == _sig_rows(via_join)

    def test_trust_ts_skips_extraction_and_stays_identical(self, ray_session):
        """With warc_ts on both sides, ts-matched urls reuse prior rows
        without extraction; under the ts-implies-unchanged guarantee the
        output equals a full recompute (including the warc_ts column)."""
        import ray.data

        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.incremental import (
            incremental_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots(n=200, seed=13)
        ts_prev, ts_cur = 1_700_000_000_000_000, 1_700_086_400_000_000

        def with_ts(ds, changed_urls, base, bumped):
            t = pa.concat_tables(
                ds.iter_batches(batch_size=None, batch_format="pyarrow")
            )
            ts = [
                bumped if u in changed_urls else base
                for u in t["url"].to_pylist()
            ]
            return ray.data.from_arrow(
                t.append_column(
                    "warc_ts", pa.array(ts, type=pa.timestamp("us"))
                )
            )

        # changed-in-cur = edited texts (i % 5 == 0) or urls new in cur;
        # recompute the set from the raw tables
        prev_rows = {
            r["url"]: r["text"]
            for r in prev.select_columns(["url", "text"]).take_all()
        }
        changed = {
            r["url"]
            for r in cur.select_columns(["url", "text"]).take_all()
            if prev_rows.get(r["url"]) != r["text"]
        }
        prev_ts = with_ts(prev, set(), ts_prev, ts_prev)
        cur_ts = with_ts(cur, changed, ts_prev, ts_cur)

        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev_ts, cfg).materialize()
        assert "warc_ts" in prior.schema().names

        full = compute_signatures(cur_ts, cfg)
        inc, info = incremental_signatures(
            cur_ts, prior, cfg, num_partitions=4, trust_ts=True
        )
        cols = ["url", "status", "content_sha256", "text_sha256",
                "n_bytes", "n_tokens", "minhash", "simhash", "warc_ts"]
        rows = lambda ds: sorted(
            tuple(r[c] for c in cols) for r in ds.take_all()
        )
        assert rows(inc) == rows(full)
        assert info["n_reused_ts"] > 0
        n_cur = cur_ts.count()
        assert (
            info["n_reused_ts"] + info["n_reused"] + info["n_recomputed"]
            == n_cur
        )
        # every ts-unchanged url reused via the metadata gate alone
        assert info["n_reused_ts"] == n_cur - len(changed)


class TestAdviceR2Fixes:
    def test_match_urls_scans_full_uid_collision_run(self):
        """A SipHash uid collision between two INDEX urls must not hide
        the later url (ADVICE r2 medium): the equal-uid run is scanned in
        full, so the probe still finds its exact string match."""
        import numpy as np

        from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
        from ordinarydumpdeduplicator_ray.stages.incremental import _match_urls

        lut = pa.table({"url": pa.array(["a", "b"]), "v": pa.array([1, 2])})
        h = url_uids(pa.array(["b"]))[0]
        # forged index: both rows collide on url 'b''s uid, 'a' first
        idx = {"tbl": lut, "uids": np.array([h, h], dtype=np.int64),
               "order": np.array([0, 1])}
        probe = pa.table({"url": pa.array(["b", "zzz-absent"])})
        mask, taken = _match_urls(probe, idx)
        assert mask.tolist() == [True, False]
        assert taken["url"].to_pylist() == ["b"]
        assert taken["v"].to_pylist() == [2]

    def test_incremental_output_carries_salt0_uid(self, ray_session):
        """Both branches emit the salt-0 uid column (ADVICE r2 low), so
        downstream assign_uids skips its extra full pass."""
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.incremental import (
            incremental_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots(n=60, seed=5)
        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev, cfg).materialize()
        inc, info = incremental_signatures(cur, prior, cfg, num_partitions=4)
        full = compute_signatures(cur, cfg)
        assert list(inc.schema().names) == list(full.schema().names)
        got = {r["url"]: r["uid"] for r in inc.take_all()}
        want = {r["url"]: r["uid"] for r in full.take_all()}
        assert got == want

    def test_trust_ts_gate_skip_is_reported(self, ray_session):
        """trust_ts without warc_ts must surface the skip in stats
        instead of silently omitting the key (ADVICE r2 low)."""
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.incremental import (
            incremental_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            compute_signatures,
        )

        prev, cur = _two_snapshots(n=40, seed=9)  # no warc_ts column
        cfg = DedupConfig(sig_concurrency=2)
        prior = compute_signatures(prev, cfg).materialize()
        _, info = incremental_signatures(
            cur, prior, cfg, num_partitions=4, trust_ts=True
        )
        assert info["n_reused_ts"] == 0
        assert info["ts_gate"].startswith("skipped:")
