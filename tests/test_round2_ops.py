"""Round-2 operators: sorted-run windows, snapshot versioning, bucketed
embedding near-dup, quarantine round trip, label-propagation doubling."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest


def _events_table(seed: int = 3, n_users: int = 40, max_ev: int = 30) -> pa.Table:
    rng = np.random.default_rng(seed)
    uid, ts, eid, etype = [], [], [], []
    t0 = 1_700_000_000_000_000
    next_eid = 0
    for u in range(n_users):
        n = int(rng.integers(1, max_ev))
        # gaps mix minutes and hours so sessions split nontrivially
        gaps = rng.choice([60, 600, 1_900, 7_200], size=n) * 1_000_000
        cur = t0 + int(rng.integers(0, 1000)) * 1_000_000
        for g in gaps:
            cur += int(g)
            uid.append(u)
            ts.append(cur)
            eid.append(next_eid)
            etype.append(["view", "click", "buy"][next_eid % 3])
            next_eid += 1
    return pa.table(
        {
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "event_id": pa.array(eid, type=pa.int64()),
            "event_type": pa.array(etype, type=pa.string()),
        }
    )


class TestWindows:
    def test_last_event_per_user_matches_naive(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.windows import last_event_per_user

        tbl = _events_table()
        # many small blocks so user runs straddle sorted-block borders
        got = last_event_per_user(
            ray.data.from_arrow(tbl).repartition(7)
        ).take_all()
        want = {}
        for r in tbl.to_pylist():
            cur = want.get(r["user_id"])
            key = (r["ts"], r["event_id"])
            if cur is None or key > (cur["ts"], cur["event_id"]):
                want[r["user_id"]] = r
        assert len(got) == len(want)
        for g in got:
            w = want[g["user_id"]]
            assert g["last_ts"] == w["ts"]
            assert g["last_event_id"] == w["event_id"]
            assert g["last_event_type"] == w["event_type"]

    def test_sessionize_matches_naive(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.windows import sessionize_events

        gap_us = 30 * 60 * 1_000_000
        tbl = _events_table(seed=11)
        got = {
            r["user_id"]: r
            for r in sessionize_events(
                ray.data.from_arrow(tbl).repartition(9), gap_minutes=30
            ).take_all()
        }
        by_user = defaultdict(list)
        for r in tbl.to_pylist():
            by_user[r["user_id"]].append(r["ts"].timestamp() * 1e6)
        assert set(got) == set(by_user)
        for u, tss in by_user.items():
            tss.sort()
            sizes, cur = [], 1
            for a, b in zip(tss, tss[1:]):
                if b - a > gap_us:
                    sizes.append(cur)
                    cur = 1
                else:
                    cur += 1
            sizes.append(cur)
            assert got[u]["n_events"] == len(tss), u
            assert got[u]["n_sessions"] == len(sizes), u
            assert got[u]["max_session_events"] == max(sizes), u


class TestSnapshotDiff:
    def _pages(self, rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], type=pa.string()),
                "warc_ts": pa.array([1] * len(rows), type=pa.timestamp("us")),
                "html": pa.nulls(len(rows), type=pa.binary()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )

    def test_statuses(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.snapshot import snapshot_diff

        prev = self._pages([("u1", "alpha"), ("u2", "beta"), ("u3", "gamma")])
        cur = self._pages([("u1", "alpha"), ("u2", "beta CHANGED"), ("u4", "delta")])
        got = {
            r["url"]: r["change_status"]
            for r in snapshot_diff(
                ray.data.from_arrow(cur), ray.data.from_arrow(prev), 4
            ).take_all()
        }
        assert got == {
            "u1": "unchanged",
            "u2": "modified",
            "u3": "removed",
            "u4": "new",
        }

    def test_latest_pages_multi_location(self, ray_session, tmp_path):
        """read_pages_multi tags each root with a location column and
        latest_pages(key_cols=("location","url")) keeps one latest row
        per (location, url) — the same url in two roots survives twice."""
        import ray.data
        from ordinarydumpdeduplicator_ray.sources.pages import read_pages_multi
        from ordinarydumpdeduplicator_ray.stages.snapshot import latest_pages

        def root(rows):
            return pa.table(
                {
                    "url": pa.array([r[0] for r in rows], type=pa.string()),
                    "warc_ts": pa.array(
                        [r[1] for r in rows], type=pa.timestamp("us")
                    ),
                    "html": pa.nulls(len(rows), type=pa.binary()),
                    "text": pa.array([r[2] for r in rows], type=pa.string()),
                }
            )

        a = root([("u1", 100, "a-old"), ("u1", 200, "a-new"), ("u2", 100, "a-u2")])
        b = root([("u1", 150, "b-mid"), ("u3", 100, "b-u3")])
        pa_dir, pb_dir = str(tmp_path / "locA"), str(tmp_path / "locB")
        import pyarrow.parquet as pq

        import os
        os.makedirs(pa_dir), os.makedirs(pb_dir)
        pq.write_table(a, pa_dir + "/part.parquet")
        pq.write_table(b, pb_dir + "/part.parquet")

        ds = read_pages_multi(
            {"locA": pa_dir, "locB": pb_dir},
            columns=["url", "warc_ts", "html", "text"],
        )
        got = {
            (r["location"], r["url"]): r["text"]
            for r in latest_pages(
                ds.repartition(4), key_cols=("location", "url")
            ).take_all()
        }
        assert got == {
            ("locA", "u1"): "a-new",
            ("locA", "u2"): "a-u2",
            ("locB", "u1"): "b-mid",
            ("locB", "u3"): "b-u3",
        }

    def test_latest_pages(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.snapshot import latest_pages

        rows = []
        for u in range(30):
            for v in range(1 + u % 3):
                rows.append((f"u{u:03d}", 100 + v, f"text {u} v{v}"))
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], type=pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "html": pa.nulls(len(rows), type=pa.binary()),
                "text": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
        got = {
            r["url"]: r["text"]
            for r in latest_pages(ray.data.from_arrow(tbl).repartition(5)).take_all()
        }
        assert len(got) == 30
        for u in range(30):
            assert got[f"u{u:03d}"] == f"text {u} v{u % 3}"


class TestEmbeddingNearDup:
    def test_finds_exact_scaled_pairs_only(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.embeddings import (
            embedding_near_dup_pairs,
        )

        rng = np.random.default_rng(5)
        base = rng.standard_normal((60, 16))
        ids = list(range(60))
        vecs = [base[i] for i in range(60)]
        # scaled copies: cosine exactly 1.0
        for i in range(0, 60, 5):
            ids.append(1000 + i)
            vecs.append(base[i] * 3.0)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          type=pa.list_(pa.float64())),
                }
            )
        )
        got = {(r["vec_a"], r["vec_b"]) for r in
               embedding_near_dup_pairs(ds, threshold=0.99, num_partitions=4,
                                        concurrency=2).take_all()}
        # brute-force oracle
        mat = np.asarray(vecs)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = np.round(mat @ mat.T, 6)
        want = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= 0.99:
                    a, b = sorted((ids[i], ids[j]))
                    want.add((a, b))
        assert got == want
        assert len(want) >= 12


class TestQuarantineRoundTrip:
    def test_report_survives_isolation(self, ray_session, tiny_corpus, tmp_path):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
        from ordinarydumpdeduplicator_ray.stages.actions import quarantine_report

        pages, _ = tiny_corpus
        pipe = DedupPipeline(DedupConfig(sig_concurrency=2, batch_size=256),
                             num_partitions=4)
        pipe.run(ray.data.from_arrow(pages))
        before = {
            (r["group_key"], r["n_copies"])
            for r in pipe.results["groups_exact"].take_all()
        }
        kept, quarantined = pipe.apply_actions()
        kdir, qdir = str(tmp_path / "kept"), str(tmp_path / "quarantine")
        kept.write_parquet(kdir)
        quarantined.write_parquet(qdir)
        # second run: re-read both tables from disk, re-derive the report
        report = quarantine_report(
            ray.data.read_parquet(kdir), ray.data.read_parquet(qdir)
        )
        after = {(r["group_key"], r["n_copies"]) for r in report.take_all()}
        assert after == before
        assert before, "fixture must contain duplicate groups"


class TestLabelPropagationDoubling:
    def test_long_chain_converges_logarithmically(self, ray_session):
        """A 128-url chain has diameter 127 — plain min-label propagation
        needs ~127 rounds; with pointer doubling every round the reach
        doubles per round, so it must converge within ~2*log2(128) + 4
        rounds (O(log d)). num_partitions=2 keeps the per-round
        aggregator-actor spin-up cheap at test scale."""
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import label_propagation

        n = 128
        urls = [f"u{i:06d}" for i in range(n)]
        edges = pa.table(
            {
                "url_a": pa.array(urls[:-1], type=pa.string()),
                "url_b": pa.array(urls[1:], type=pa.string()),
            }
        )
        labels = {
            r["url"]: r["component_id"]
            for r in label_propagation(
                ray.data.from_arrow(edges), max_iters=2 * 7 + 4,
                num_partitions=2, doubling_every=1,
            ).take_all()
        }
        assert len(labels) == n
        assert set(labels.values()) == {urls[0]}

    def test_long_chain_star_mix_converges_logarithmically(self, ray_session):
        """Scale stress: one 10,000-url chain (diameter 9,999 — 78x the
        basic test) plus star fragments hanging off every 100th chain
        node — the shape hot-bucket star+chain emission actually
        produces, in emission order (sorted-run pair emission writes
        each bucket's star+chain contiguously, so blocks hold contiguous
        runs). Split across 16 blocks, per-block LOCAL CONTRACTION
        (exact vectorized components inside each block) collapses every
        block to O(1) fragments; the iterated global rounds only stitch
        the ~16+ fragments — budget 2*log2(16) + 5 = 13 rounds, NOT the
        ~2*log2(10k) + 4 = 31 a contraction-free propagation would
        need. Every url (chain + satellites) must land on the global
        minimum name."""
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import label_propagation

        n = 10_000
        urls = [f"u{i:06d}" for i in range(n)]
        a = list(urls[:-1])
        b = list(urls[1:])
        sats = []
        for i in range(0, n, 100):
            for j in range(3):
                sat = f"sat{i:06d}_{j}"
                a.append(urls[i])
                b.append(sat)
                sats.append(sat)
        edges = pa.table(
            {
                "url_a": pa.array(a, type=pa.string()),
                "url_b": pa.array(b, type=pa.string()),
            }
        )
        labels = {
            r["url"]: r["component_id"]
            for r in label_propagation(
                ray.data.from_arrow(edges).repartition(16), max_iters=2 * 4 + 5,
                num_partitions=2, doubling_every=1,
            ).take_all()
        }
        assert len(labels) == n + len(sats)
        assert set(labels.values()) == {min(urls + sats)}

    def test_nonconvergence_raises(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import label_propagation

        n = 64
        urls = [f"u{i:06d}" for i in range(n)]
        edges = pa.table(
            {
                "url_a": pa.array(urls[:-1], type=pa.string()),
                "url_b": pa.array(urls[1:], type=pa.string()),
            }
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            # doubling disabled + tiny budget: 16 contraction fragments
            # of the 63-diameter chain cannot stitch in 2 plain rounds
            # (the root chain contracts ~1 fragment/round without
            # doubling) — must raise, never return wrong labels silently
            label_propagation(
                ray.data.from_arrow(edges).repartition(16), max_iters=2,
                num_partitions=4, doubling_every=0,
            )


class TestTsCanonicalDedup:
    """dedup_actions_by_ts keeps the EARLIEST copy by (warc_ts, url);
    lang_dup_stats groups on (lang, content) so cross-language identical
    texts never merge. Both recomputed naively from the same corpus."""

    SF = "/root/testdata/sf0.001"

    def test_earliest_ts_wins_and_flips_vs_min_url(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        pages = q._meta_pages(self.SF).to_pandas()
        actions = {r["url"]: (r["action"], r["group_key"])
                   for r in q.dedup_actions_by_ts(self.SF).take_all()}

        by_text = defaultdict(list)
        for r in pages.itertuples():
            by_text[r.text].append((r.warc_ts, r.url))
        flipped = 0
        for members in by_text.values():
            if len(members) < 2:
                for _, u in members:
                    assert u not in actions  # singletons never acted on
                continue
            canon = min(members)[1]
            min_url = min(u for _, u in members)
            if canon != min_url:
                flipped += 1
            for _, u in members:
                act, gk = actions.pop(u)
                assert gk == canon
                assert act == ("keep" if u == canon else "isolate")
        assert not actions  # no extra rows
        # doc_id % 6 == 0 copies predate the original, so ts-canonical
        # selection must actually disagree with min-url selection
        assert flipped > 0

    def test_lang_scoped_rollup_matches_naive(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        pages = q._meta_pages(self.SF).to_pandas()
        got = {r["lang"]: (r["n_groups"], r["n_dup_pages"], r["dup_bytes"])
               for r in q.lang_dup_stats(self.SF).take_all()}

        exp = defaultdict(lambda: [0, 0, 0])
        for (lang, text), sub in pages.groupby(["lang", "text"]):
            n = len(sub)
            if n <= 1:
                continue
            exp[lang][0] += 1
            exp[lang][1] += n - 1
            exp[lang][2] += len(text.encode()) * (n - 1)
        assert got == {k: tuple(v) for k, v in exp.items()}


class TestDecontaminate:
    """Benchmark n-gram decontamination vs a naive recompute: blocklist
    = first-8-token snippets of doc_id%17==0 docs; a doc is contaminated
    iff some token 8-gram equals a snippet; n_hits counts DISTINCT
    snippets present."""

    SF = "/root/testdata/sf0.001"

    def test_matches_naive(self, ray_session):
        import pyarrow.parquet as pq
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        docs = pq.read_table(self.SF + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        snippets = {
            " ".join(r["text"].split(" ")[:8])
            for r in docs
            if r["doc_id"] % 17 == 0 and len(r["text"].split(" ")) >= 8
        }
        got = {r["doc_id"]: (r["contaminated"], r["n_hits"])
               for r in q.decontaminate(self.SF).take_all()}
        assert len(got) == len(docs)
        any_hit = False
        for r in docs:
            toks = r["text"].split(" ")
            grams = {" ".join(toks[i:i + 8]) for i in range(len(toks) - 7)}
            hits = len(grams & snippets)
            assert got[r["doc_id"]] == (hits > 0, hits), r["doc_id"]
            any_hit = any_hit or hits > 0
        assert any_hit  # the blocklist docs at least flag themselves

    def test_empty_blocklist_flags_nothing(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.decontaminate import (
            collect_benchmark_hashes, flag_contaminated)
        import numpy as np
        import pyarrow as pa

        docs = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([1, 2], type=pa.int64()),
             "text": pa.array(["a b c d e f g h i", ""])}))
        empty = collect_benchmark_hashes(
            ray.data.from_arrow(pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "text": pa.array([], type=pa.string())})))
        assert empty.dtype == np.uint64 and len(empty) == 0
        out = flag_contaminated(docs, empty).take_all()
        assert all(not r["contaminated"] and r["n_hits"] == 0 for r in out)


class TestTopTokens:
    def test_matches_naive(self, ray_session):
        import re
        from collections import Counter

        import pyarrow.parquet as pq
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        sf = "/root/testdata/sf0.001"
        texts = pq.read_table(sf + "/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        c = Counter()
        for t in texts:
            c.update(re.findall(r"\w+", t.lower()))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        got = [(r["token"], r["n"]) for r in q.top_tokens(sf).to_pylist()]
        assert got == want


class TestExactPercentiles:
    def test_matches_numpy_on_shuffled_blocks(self, ray_session):
        import math

        import ray.data
        from ordinarydumpdeduplicator_ray.stages.quantiles import exact_percentiles

        rng = np.random.default_rng(7)
        vals = rng.integers(0, 10_000, size=5_003).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals)})
        ).repartition(13)
        qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        got = exact_percentiles(ds, "v", qs)
        srt = np.sort(vals)
        for q in qs:
            want = int(srt[max(1, math.ceil(q * len(vals))) - 1])
            assert got[q] == want, q

    def test_empty(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.quantiles import exact_percentiles

        ds = ray.data.from_arrow(pa.table({"v": pa.array([], type=pa.int64())}))
        assert exact_percentiles(ds, "v", [0.5]) == {0.5: None}


class TestCurateCorpus:
    def test_verdicts_match_naive(self, ray_session):
        from ordinarydumpdeduplicator_ray.functions.textstats import (
            quality_features, quality_score)
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        sf = "/root/testdata/sf0.001"
        pages = q._meta_pages(sf).to_pandas()
        import pyarrow.parquet as pq
        docs = pq.read_table(sf + "/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        snippets = {
            " ".join(r["text"].split(" ")[:8])
            for r in docs
            if r["doc_id"] % 17 == 0 and len(r["text"].split(" ")) >= 8
        }

        def naive(row):
            if row.lang not in {"en", "de", "fr"}:
                return "lang"
            if quality_score(*quality_features(row.text)) < 0.5:
                return "quality"
            toks = row.text.split(" ")
            grams = {" ".join(toks[i:i + 8]) for i in range(len(toks) - 7)}
            if grams & snippets:
                return "contaminated"
            return None  # survivor, dedup decides

        pre = {r.url: naive(r) for r in pages.itertuples()}
        surv = defaultdict(list)
        for r in pages.itertuples():
            if pre[r.url] is None:
                surv[r.text].append(r.url)
        want = {}
        for r in pages.itertuples():
            v = pre[r.url]
            if v is None:
                v = "kept" if r.url == min(surv[r.text]) else "duplicate"
            want[r.url] = v

        got = {r["url"]: r["verdict"] for r in q.curate_corpus(sf).take_all()}
        assert got == want
        # every verdict class occurs in the synthetic corpus
        assert set(got.values()) == {"lang", "quality", "contaminated",
                                     "duplicate", "kept"}


class TestCorpusSplit:
    def test_deterministic_and_complete(self, ray_session):
        import hashlib
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        sf = "/root/testdata/sf0.001"
        got = {r["url"]: r["split"] for r in q.corpus_split(sf).take_all()}
        assert len(got) == len(q._meta_pages(sf).to_pandas())
        for u, s in got.items():
            b = int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 100
            assert s == ("train" if b < 90 else "val" if b < 95 else "test")
        # all three splits are populated and roughly proportioned
        from collections import Counter
        c = Counter(got.values())
        assert set(c) == {"train", "val", "test"}
        assert c["train"] > c["val"] and c["train"] > c["test"]


def test_snapshot_diff_broken_rows_presence_semantics(ray_session):
    """A BROKEN page (text & html null -> null sha) present in both
    snapshots must classify by PRESENCE, not by sha nullness:
    broken-in-both = unchanged, broken-vs-ok = modified, and a broken
    page that truly disappears = removed (the pre-fix code reported
    every broken current row as 'removed')."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.snapshot import snapshot_diff

    def pages(rows):
        return ray.data.from_arrow(pa.table({
            "url": pa.array([u for u, _ in rows], type=pa.string()),
            "html": pa.nulls(len(rows), type=pa.binary()),
            "text": pa.array([t for _, t in rows], type=pa.string()),
        }))

    prev = pages([
        ("u-both-broken", None),
        ("u-breaks", "was fine"),
        ("u-heals", None),
        ("u-gone-broken", None),
        ("u-stays", "same text"),
    ])
    cur = pages([
        ("u-both-broken", None),
        ("u-breaks", None),
        ("u-heals", "now fine"),
        ("u-new-broken", None),
        ("u-stays", "same text"),
    ])
    got = {
        r["url"]: r["change_status"]
        for r in snapshot_diff(cur, prev, num_partitions=4).take_all()
    }
    assert got == {
        "u-both-broken": "unchanged",
        "u-breaks": "modified",
        "u-heals": "modified",
        "u-gone-broken": "removed",
        "u-new-broken": "new",
        "u-stays": "unchanged",
    }


def test_plan_deletion_duplicate_request_rejected_or_deduped(ray_session):
    """A delete request listing the same url twice must neither defeat
    the isolation guard nor duplicate the url's action row."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.actions import plan_deletion

    actions = ray.data.from_arrow(pa.table({
        "url": pa.array(["a", "b", "c"], type=pa.string()),
        "action": pa.array(["keep", "isolate", "isolate"], type=pa.string()),
        "group_key": pa.array(["a", "a", "a"], type=pa.string()),
    }))
    req = ray.data.from_arrow(pa.table({
        "url": pa.array(["b", "b"], type=pa.string()),
    }))
    out = sorted(
        (r["url"], r["action"])
        for r in plan_deletion(actions, req, num_partitions=4).take_all()
    )
    assert out == [("a", "keep"), ("b", "delete"), ("c", "isolate")]

    # duplicated NON-isolated url must still trip the guard
    bad = ray.data.from_arrow(pa.table({
        "url": pa.array(["a", "a"], type=pa.string()),
    }))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not currently isolated"):
        plan_deletion(actions, bad, num_partitions=4)
