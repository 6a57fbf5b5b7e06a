"""Round-2 scaling machinery: singleton-bucket pre-filter, broadcast
pair verification vs the shuffle-join fallback, and the explode modes.

These guard the paths profiling showed matter at scale — the broadcast
attach must stay value-identical to the join attach (it replaces it
below the url cap), and the pre-filter must never drop a pairable row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _sorted_rows(ds, cols):
    rows = [tuple(r[c] for c in cols) for r in ds.take_all()]
    return sorted(rows)


class TestSingletonPrefilter:
    def test_duplicate_bucket_keys_exact(self, ray_session):
        """Dup-key detection must be exact under many sorted blocks:
        keys adjacent in key space land near range-partition borders."""
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            duplicate_bucket_keys,
        )
        import ray

        rng = np.random.default_rng(7)
        uniq = rng.choice(2**40, size=20_000, replace=False).astype(np.int64)
        dup_keys = uniq[:1_500]
        cells = np.concatenate([uniq, dup_keys, dup_keys[:300]])
        rng.shuffle(cells)
        ds = ray.data.from_arrow(
            pa.table({"bucket": pa.array(cells, type=pa.int64())})
        )
        keep = ray.get(duplicate_bucket_keys(ds, num_partitions=8))
        assert sorted(keep.tolist()) == sorted(np.unique(dup_keys).tolist())
        # returned array is sorted (filter relies on searchsorted)
        assert (np.diff(keep) > 0).all()

    def test_prefilter_preserves_all_pairs(self, ray_session):
        """candidate_pairs output over data with singletons must equal
        the output with singletons already absent."""
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

        rng = np.random.default_rng(3)
        # 40 dup buckets of size 2-5 + 2000 singleton buckets
        buckets, urls = [], []
        for g in range(40):
            n = int(rng.integers(2, 6))
            for i in range(n):
                buckets.append(1000 + g)
                urls.append(f"u://dup/{g}/{i}")
        for s in range(2000):
            buckets.append(10_000 + s)
            urls.append(f"u://single/{s}")
        t = pa.table({"bucket": pa.array(buckets, type=pa.int64()),
                      "url": pa.array(urls, type=pa.string())})
        cfg = DedupConfig(max_group_pairs=64)
        with_singletons = candidate_pairs(
            ray.data.from_arrow(t), cfg, num_partitions=4
        )
        dup_only = t.filter(pa.compute.less(t["bucket"], 10_000))
        without = candidate_pairs(
            ray.data.from_arrow(dup_only), cfg, num_partitions=4
        )
        assert _sorted_rows(with_singletons, ("url_a", "url_b")) == \
            _sorted_rows(without, ("url_a", "url_b"))

    def test_all_singletons_yield_no_pairs(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

        t = pa.table({"bucket": pa.array(range(500), type=pa.int64()),
                      "url": pa.array([f"u://{i}" for i in range(500)],
                                      type=pa.string())})
        pairs = candidate_pairs(
            ray.data.from_arrow(t), DedupConfig(), num_partitions=4
        )
        assert pairs.count() == 0


class TestExplodeModes:
    def _sigs(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.stages.signatures import compute_signatures

        pages, _ = generate_pages(60, seed=11)
        cfg = DedupConfig(sig_concurrency=2)
        return cfg, compute_signatures(
            ray.data.from_arrow(pages), cfg
        ).materialize()

    def test_keys_only_matches_full_explode_keys(self, ray_session):
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            explode_minhash_bands,
        )

        cfg, sigs = self._sigs(ray_session)
        full = explode_minhash_bands(sigs, cfg)
        keys = explode_minhash_bands(sigs, cfg, keys_only=True)
        assert keys.schema().names == ["bucket"]
        assert sorted(r["bucket"] for r in full.take_all()) == \
            sorted(r["bucket"] for r in keys.take_all())

    def test_keep_ref_filters_inline(self, ray_session):
        import ray
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            explode_sha_buckets,
        )

        cfg, sigs = self._sigs(ray_session)
        full = explode_sha_buckets(sigs).take_all()
        all_keys = np.array(sorted({r["bucket"] for r in full}), dtype=np.int64)
        keep = all_keys[: len(all_keys) // 2]
        filtered = explode_sha_buckets(
            sigs, keep_ref=ray.put(keep)
        ).take_all()
        expect = sorted(
            (r["bucket"], r["url"]) for r in full if r["bucket"] in set(keep.tolist())
        )
        assert sorted((r["bucket"], r["url"]) for r in filtered) == expect


class TestVerifyAttachParity:
    """The broadcast attach (default) and the shuffle-join fallback must
    produce identical edges on the same pairs + signatures."""

    @pytest.fixture()
    def built(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            assign_uids,
            compute_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.grouped import (
            exact_group_index,
            representative_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            candidate_pairs,
            explode_minhash_bands,
            explode_sha_buckets,
            explode_simhash_blocks,
        )

        pages, _ = generate_pages(150, seed=5)
        cfg = DedupConfig(sig_concurrency=2)
        sigs = compute_signatures(ray.data.from_arrow(pages), cfg).materialize()
        sigs, _salt = assign_uids(sigs, 4)
        index = exact_group_index(
            sigs.filter(expr=f"status != '{STATUS_BROKEN}'"), sort_partitions=4
        ).materialize()
        reps = representative_signatures(index, sigs)
        buckets = explode_minhash_bands(reps, cfg, member="uid") \
            .union(explode_simhash_blocks(reps, cfg, member="uid")) \
            .union(explode_sha_buckets(sigs, member="uid"))
        pairs = candidate_pairs(buckets, cfg, num_partitions=4).materialize()
        return cfg, sigs, pairs

    EDGE_COLS = ("url_a", "url_b", "nb_a", "nb_b", "source")

    def test_broadcast_equals_join_fallback(self, ray_session, built):
        from ordinarydumpdeduplicator_ray.stages import verify as V

        cfg, sigs, pairs = built
        assert pairs.count() > 0
        broadcast = V.verify_pairs(pairs, sigs, cfg, num_partitions=4)
        joined = V._verify_join(pairs, sigs, cfg, num_partitions=4, recheck=False)
        b_rows = _sorted_rows(broadcast, self.EDGE_COLS)
        j_rows = _sorted_rows(joined, self.EDGE_COLS)
        assert b_rows == j_rows

    def test_url_cap_falls_back_to_join(self, ray_session, built, monkeypatch):
        from ordinarydumpdeduplicator_ray.stages import verify as V

        cfg, sigs, pairs = built
        expected = _sorted_rows(
            V.verify_pairs(pairs, sigs, cfg, num_partitions=4), self.EDGE_COLS
        )
        monkeypatch.setattr(V, "_BROADCAST_VERIFY_URL_CAP", 1)
        capped = V.verify_pairs(pairs, sigs, cfg, num_partitions=4)
        assert _sorted_rows(capped, self.EDGE_COLS) == expected


class TestShingleLookupRecheck:
    """The broadcast margin recheck (precomputed shingle lookup) must
    keep exactly the pairs whose TRUE unique-shingle Jaccard clears the
    threshold — brute-force oracle, and parity with the join path."""

    @staticmethod
    def _true_jaccard(a_text, b_text, cfg):
        from ordinarydumpdeduplicator_ray.functions.hashing import (
            TokenHasher,
            shingle_hashes,
        )
        from ordinarydumpdeduplicator_ray.functions.text import tokenize

        h = TokenHasher()

        def sh(x):
            toks = tokenize(x, cfg.lowercase)
            return (
                shingle_hashes(h.hash_tokens(toks), cfg.shingle_size)
                if toks else np.empty(0, dtype=np.uint64)
            )

        a, b = sh(a_text), sh(b_text)
        if not len(a) or not len(b):
            return 0.0
        inter = np.intersect1d(a, b, assume_unique=True).size
        return inter / (a.size + b.size - inter)

    def test_matches_bruteforce_and_join_path(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages import verify as V

        cfg = DedupConfig(jaccard_threshold=0.8)
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(400)]
        texts, urls = [], []
        for i in range(60):
            base = list(rng.choice(vocab, size=80))
            urls.append(f"u{i:03d}")
            texts.append(" ".join(base))
            # a perturbed twin per doc: drop k words, k sweeps the
            # threshold region so keeps/rejects both occur
            k = 1 + (i % 15) * 3
            urls.append(f"u{i:03d}-tw")
            texts.append(" ".join(base[: len(base) - k]))
        pages = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "html": pa.nulls(len(urls), type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        by_url = dict(zip(urls, texts))
        pend_rows = [(f"u{i:03d}", f"u{i:03d}-tw") for i in range(60)]
        # plus a pair whose url is MISSING from pages: must be skipped
        pend_rows.append(("u000", "zz-missing"))
        pending = pa.table(
            {
                "url_a": pa.array([r[0] for r in pend_rows], type=pa.string()),
                "url_b": pa.array([r[1] for r in pend_rows], type=pa.string()),
                "nb_a": pa.array([0] * len(pend_rows), type=pa.int64()),
                "nb_b": pa.array([0] * len(pend_rows), type=pa.int64()),
                "source": pa.array(
                    ["minhash_margin"] * len(pend_rows), type=pa.string()
                ),
                "jaccard": pa.array([0.0] * len(pend_rows), type=pa.float64()),
            }
        )
        pages_ds = ray.data.from_arrow(pages).repartition(5)
        got = V._recheck_broadcast_tbl(pending, pages_ds, cfg)
        got_rows = {
            (r["url_a"], r["url_b"]): r["jaccard"] for r in got.take_all()
        }
        want = {}
        for a, b in pend_rows:
            if b not in by_url:
                continue
            j = self._true_jaccard(by_url[a], by_url[b], cfg)
            if j >= cfg.jaccard_threshold:
                want[(a, b)] = j
        assert set(got_rows) == set(want)
        assert want, "fixture degenerate: no pair above threshold"
        assert len(want) < len(pend_rows) - 1, "fixture degenerate: all kept"
        for k_, v in want.items():
            assert abs(got_rows[k_] - v) < 1e-12
        # parity with the shuffle-join fallback
        joined = V._recheck_join(
            ray.data.from_arrow(pending), pages_ds, cfg, num_partitions=4
        )
        j_rows = {
            (r["url_a"], r["url_b"]): r["jaccard"] for r in joined.take_all()
        }
        assert j_rows == got_rows


class TestVectorizedComponents:
    def test_matches_dict_union_find(self, ray_session):
        """components_from_edges (vectorized min-rank label prop) must
        match the dict UnionFind on a random graph, including the
        lexicographic-min component ids and per-url sizes."""
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import (
            UnionFind,
            components_from_edges,
        )

        rng = np.random.default_rng(1)
        n = 8000
        urls = [f"u://{i:06d}" for i in range(n)]
        ea = rng.integers(0, n, 12000)
        eb = rng.integers(0, n, 12000)
        mask = ea != eb
        ea, eb = ea[mask], eb[mask]
        per_url = rng.integers(1, 10000, n)
        t = pa.table(
            {"url_a": pa.array([urls[i] for i in ea]),
             "url_b": pa.array([urls[i] for i in eb]),
             "nb_a": pa.array(per_url[ea], type=pa.int64()),
             "nb_b": pa.array(per_url[eb], type=pa.int64())}
        )
        out = components_from_edges(ray.data.from_arrow(t)).to_pylist()

        uf = UnionFind()
        for a, b in zip(t["url_a"].to_pylist(), t["url_b"].to_pylist()):
            uf.union(a, b)
        minu: dict = {}
        for u in uf.parent:
            r = uf.find(u)
            if r not in minu or u < minu[r]:
                minu[r] = u
        assert {r["url"]: r["component_id"] for r in out} == \
            {u: minu[uf.find(u)] for u in uf.parent}
        assert {r["url"]: r["n_bytes"] for r in out} == \
            {urls[i]: int(per_url[i]) for i in np.concatenate([ea, eb])}

    def test_long_chain_and_empty(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import (
            components_from_edges,
        )

        m = 3000
        urls = [f"c://{i:05d}" for i in range(m)]
        t = pa.table({"url_a": pa.array(urls[:-1]), "url_b": pa.array(urls[1:])})
        out = components_from_edges(ray.data.from_arrow(t)).to_pylist()
        assert {r["component_id"] for r in out} == {urls[0]}
        empty = pa.table({"url_a": pa.array([], type=pa.string()),
                          "url_b": pa.array([], type=pa.string())})
        assert len(components_from_edges(ray.data.from_arrow(empty))) == 0


class TestNgramJaccard:
    def test_matches_brute_force(self, ray_session, tmp_path):
        """ngram_jaccard_pairs must equal per-pair brute-force Jaccard
        on distinct 5-shingle sets (same tokenizer + hash kernels)."""
        import itertools

        import pyarrow.parquet as pq
        from ordinarydumpdeduplicator_ray.functions.hashing import (
            TokenHasher,
            shingle_hashes,
        )
        from ordinarydumpdeduplicator_ray.functions.text import tokenize
        from ordinarydumpdeduplicator_ray.pipelines.queries import (
            ngram_jaccard_pairs,
        )

        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        base = " ".join(rng.choice(vocab, 60))
        for k in range(30):
            if k % 3 == 0 and k:
                words = base.split()
                # light mutation -> true near-dups at various jaccards
                for _ in range(k % 5):
                    words[int(rng.integers(0, len(words)))] = str(
                        rng.choice(vocab)
                    )
                texts.append(" ".join(words))
            else:
                texts.append(" ".join(rng.choice(vocab, 60)))
        texts.append("too short")  # <5 tokens -> excluded
        tbl = pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts, type=pa.string())}
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")

        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(str(tmp_path), threshold=0.5).take_all()
        )

        hasher = TokenHasher()
        sets = {}
        for did, x in zip(tbl["doc_id"].to_pylist(), texts):
            toks = tokenize(x)
            if len(toks) >= 5:
                sets[did] = shingle_hashes(hasher.hash_tokens(toks), 5)
        expect = []
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = np.intersect1d(sets[a], sets[b], assume_unique=True).size
            union = sets[a].size + sets[b].size - inter
            j = round(inter / union, 6)
            if j >= 0.5:
                expect.append((a, b, j))
        assert got == sorted(expect)
        assert len(got) > 0


class TestDriverFastPaths:
    """The 2M-row driver fast paths must be value-identical to the
    distributed paths they replace (they are selected by row count, so
    only a parity test keeps them honest)."""

    def test_duplicate_bucket_keys_driver_vs_distributed(self, ray_session):
        import ray
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            duplicate_bucket_keys,
        )

        rng = np.random.default_rng(11)
        uniq = rng.choice(2**40, size=5_000, replace=False).astype(np.int64)
        cells = np.concatenate([uniq, uniq[:700], uniq[:50]])
        rng.shuffle(cells)
        ds = ray.data.from_arrow(
            pa.table({"bucket": pa.array(cells, type=pa.int64())})
        ).materialize()
        drv = ray.get(duplicate_bucket_keys(ds, 4, approx_rows=ds.count()))
        dist = ray.get(duplicate_bucket_keys(ds, 4, approx_rows=None))
        assert drv.tolist() == dist.tolist()
        assert (np.diff(drv) > 0).all()

    def test_pair_distinct_driver_vs_distributed(self, ray_session, monkeypatch):
        """candidate_pairs with int64 members below/above the driver cap
        must emit the same distinct pair set."""
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages import candidates as C

        rng = np.random.default_rng(13)
        buckets, members = [], []
        for g in range(60):
            n = int(rng.integers(2, 7))
            mem = rng.choice(10_000, size=n, replace=False).astype(np.int64)
            for band in range(3):  # same group under 3 bucket families
                for m in mem:
                    buckets.append(g * 10 + band)
                    members.append(int(m))
        t = pa.table(
            {"bucket": pa.array(buckets, type=pa.int64()),
             "uid": pa.array(members, type=pa.int64())}
        )
        ds = ray.data.from_arrow(t)
        cfg = DedupConfig()
        drv = _sorted_rows(
            C.candidate_pairs(ds, cfg, num_partitions=4), ["uid_a", "uid_b"]
        )
        monkeypatch.setattr(C, "_DRIVER_KEYS_CAP", 0)
        dist = _sorted_rows(
            C.candidate_pairs(ds, cfg, num_partitions=4), ["uid_a", "uid_b"]
        )
        # the distributed distinct may keep one duplicate per block border
        # (documented); dedup both before comparing set equality
        assert sorted(set(drv)) == sorted(set(dist))
        # driver path itself must be exactly distinct
        assert len(drv) == len(set(drv))


class TestBlockopsScatter:
    def test_scatter_order_and_payload_refs(self, ray_session):
        """map_blocks_scatter: small parts come back in block order;
        payload refs stay in the object store and resolve to the
        per-block payloads a downstream task can consume."""
        import ray
        import ray.data

        from ordinarydumpdeduplicator_ray.stages.blockops import (
            map_blocks_scatter,
        )

        t = pa.table({"x": pa.array(list(range(100)), type=pa.int64())})
        ds = ray.data.from_arrow(t).repartition(7).materialize()

        def fn(tbl: pa.Table):
            s = int(pa.compute.sum(tbl["x"]).as_py() or 0)
            return len(tbl), {"sum": s}

        smalls, refs = map_blocks_scatter(ds, fn)
        assert sum(smalls) == 100
        assert len(smalls) == len(refs)
        payloads = ray.get(list(refs))
        assert sum(p["sum"] for p in payloads) == sum(range(100))

        @ray.remote
        def assemble(*rows):
            return sum(r["sum"] for r in rows)

        assert ray.get(assemble.remote(*refs)) == sum(range(100))

    def test_scatter_empty_dataset(self, ray_session):
        import ray.data

        from ordinarydumpdeduplicator_ray.stages.blockops import (
            map_blocks_scatter,
        )

        empty = ray.data.from_arrow(
            pa.table({"x": pa.array([], type=pa.int64())})
        ).materialize()
        smalls, refs = map_blocks_scatter(empty, lambda t: (len(t), None))
        assert smalls == [] and refs == []


class TestFusedExplode:
    def test_fused_equals_union_of_unfused(self, ray_session):
        """explode_band_and_block_buckets must emit exactly the same
        (bucket, uid) multiset as the union of the two unfused
        explodes — the flagship swaps one for the other purely to cut
        a second pass over the sketch columns."""
        import ray.data

        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.stages.candidates import (
            explode_band_and_block_buckets,
            explode_minhash_bands,
            explode_simhash_blocks,
        )
        from ordinarydumpdeduplicator_ray.stages.grouped import (
            exact_group_index,
            representative_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            assign_uids,
            compute_signatures,
        )

        pages, _ = generate_pages(120, seed=11)
        cfg = DedupConfig(sig_concurrency=2)
        sigs = compute_signatures(ray.data.from_arrow(pages), cfg).materialize()
        sigs, _salt = assign_uids(sigs, 4)
        index = exact_group_index(
            sigs.filter(expr=f"status != '{STATUS_BROKEN}'"), sort_partitions=4
        ).materialize()
        reps = representative_signatures(index, sigs).materialize()

        fused = _sorted_rows(
            explode_band_and_block_buckets(reps, cfg, member="uid"),
            ["bucket", "uid"],
        )
        unfused = _sorted_rows(
            explode_minhash_bands(reps, cfg, member="uid").union(
                explode_simhash_blocks(reps, cfg, member="uid")
            ),
            ["bucket", "uid"],
        )
        assert len(fused) > 0
        assert fused == unfused


def test_ngram_jaccard_components_brute_force(ray_session, tmp_path):
    """Components of the exact-Jaccard graph must equal brute-force
    union-find over brute-force pairs (planted two clusters + noise)."""
    import itertools

    import pyarrow.parquet as pq
    from ordinarydumpdeduplicator_ray.functions.hashing import (
        TokenHasher,
        shingle_hashes,
    )
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        ngram_jaccard_components,
    )

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for base_seed in (1, 2):  # two independent template clusters
        base = list(rng.choice(vocab, 50))
        for k in range(6):
            words = list(base)
            for _ in range(k):  # increasing mutation -> chain topology
                words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
            texts.append(" ".join(words))
    for _ in range(10):  # noise docs
        texts.append(" ".join(rng.choice(vocab, 50)))
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = sorted(
        (r["doc_id"], r["component_id"])
        for r in ngram_jaccard_components(str(tmp_path), threshold=0.5).to_pylist()
    )

    hasher = TokenHasher()
    sets = {}
    for did, x in zip(tbl["doc_id"].to_pylist(), texts):
        toks = tokenize(x)
        if len(toks) >= 5:
            sets[did] = shingle_hashes(hasher.hash_tokens(toks), 5)
    parent = {d: d for d in sets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edge_docs = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = np.intersect1d(sets[a], sets[b], assume_unique=True).size
        union = len(sets[a]) + len(sets[b]) - inter
        if union and round(inter / union, 6) >= 0.5:
            edge_docs.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expect = sorted((d, find(d)) for d in sorted(edge_docs))
    assert got == expect
    assert len({c for _, c in got}) >= 2  # both planted clusters present


def test_candidate_pairs_exactly_distinct_string_members(ray_session):
    """String-member pairs take the distributed pk-sort dedup path;
    a pair emitted by MANY bands must come out exactly once even when
    its copies straddle sorted-block borders (multiplicity check, not
    just set equality — the pre-fix seam left one duplicate per
    border)."""
    import collections

    import ray.data
    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

    # 40 urls, every url pair sharing 30 buckets -> each pair emitted
    # 30x before dedup; many partitions -> many narrow sorted blocks
    urls = [f"u{i:03d}" for i in range(40)]
    rows_b, rows_u = [], []
    for b in range(30):
        for u in urls[: 2 + (b % 17)]:  # varying bucket membership
            rows_b.append(b)
            rows_u.append(u)
    buckets = ray.data.from_arrow(pa.table({
        "bucket": pa.array(rows_b, type=pa.int64()),
        "url": pa.array(rows_u, type=pa.string()),
    })).repartition(23)
    out = candidate_pairs(
        buckets.materialize(), DedupConfig(), num_partitions=8
    ).take_all()
    counts = collections.Counter((r["url_a"], r["url_b"]) for r in out)
    dupes = {k: c for k, c in counts.items() if c > 1}
    assert not dupes, dupes
    # sanity: the expected pair set is present
    expect = set()
    for b in range(30):
        mem = urls[: 2 + (b % 17)]
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                expect.add((min(mem[i], mem[j]), max(mem[i], mem[j])))
    assert set(counts) == expect
