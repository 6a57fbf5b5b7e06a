"""The int64-uid hot path: uid hashing, the collision-checked
assignment, the sha-prefix kernel and member-dtype genericity of
candidate_pairs (int64 members must yield the same pair STRUCTURE as
string members over the same buckets)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


class TestUidHashing:
    def test_deterministic_and_salted(self):
        from ordinarydumpdeduplicator_ray.functions.hashing import url_uids

        urls = pa.array([f"https://ex.com/{i}" for i in range(1000)])
        a = url_uids(urls, 0)
        b = url_uids(urls, 0)
        c = url_uids(urls, 1)
        assert (a == b).all()
        assert (a != c).any()
        assert a.dtype == np.int64
        assert len(np.unique(a)) == 1000

    def test_empty(self):
        from ordinarydumpdeduplicator_ray.functions.hashing import url_uids

        assert len(url_uids(pa.array([], type=pa.string()), 0)) == 0


class TestShaPrefix:
    def test_uniform_fast_path_matches_fallback(self):
        from ordinarydumpdeduplicator_ray.functions.hashing import sha_prefix_int64

        import hashlib

        shas = [hashlib.sha256(str(i).encode()).digest() for i in range(257)]
        col = pa.array(shas, type=pa.binary())
        keys, ok = sha_prefix_int64(col)
        assert ok.all()
        expect = [int.from_bytes(s[:8], "little", signed=True) for s in shas]
        assert keys.tolist() == expect

    def test_nulls_fall_back(self):
        from ordinarydumpdeduplicator_ray.functions.hashing import sha_prefix_int64

        col = pa.array([b"\x01" * 32, None, b"\x02" * 32], type=pa.binary())
        keys, ok = sha_prefix_int64(col)
        assert ok.tolist() == [True, False, True]
        assert keys[0] == int.from_bytes(b"\x01" * 8, "little", signed=True)

    def test_sliced_offset(self):
        from ordinarydumpdeduplicator_ray.functions.hashing import sha_prefix_int64

        col = pa.array([bytes([i]) * 32 for i in range(10)], type=pa.binary())
        keys, ok = sha_prefix_int64(col.slice(3, 4))
        assert ok.all()
        assert keys[0] == int.from_bytes(bytes([3]) * 8, "little", signed=True)


class TestAssignUids:
    def test_unique_urls_salt0(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.signatures import assign_uids

        t = pa.table({"url": pa.array([f"u://{i}" for i in range(500)])})
        with_uid, salt = assign_uids(ray.data.from_arrow(t), 4)
        assert salt == 0
        uids = [r["uid"] for r in with_uid.take_all()]
        assert len(set(uids)) == 500

    def test_duplicate_urls_raise(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.signatures import assign_uids

        t = pa.table({"url": pa.array(["u://a", "u://b", "u://a"])})
        with pytest.raises(RuntimeError, match="duplicate urls"):
            assign_uids(ray.data.from_arrow(t), 2, max_salt=2)


class TestIntMemberPairs:
    """candidate_pairs over int64 members must produce exactly the pairs
    the string path produces under a member-order-preserving mapping."""

    def _bucket_tables(self):
        rng = np.random.default_rng(9)
        buckets, members = [], []
        # mix of cold buckets, one hot bucket (> cap) and singletons
        for g in range(30):
            n = int(rng.integers(2, 6))
            for i in range(n):
                buckets.append(100 + g)
                members.append(g * 1000 + i)
        for i in range(300):           # hot bucket, cap below forces chain
            buckets.append(7)
            members.append(500_000 + i)
        for s in range(500):
            buckets.append(10_000 + s)
            members.append(900_000 + s)
        ints = pa.table(
            {"bucket": pa.array(buckets, type=pa.int64()),
             "uid": pa.array(members, type=pa.int64())}
        )
        # order-preserving string mapping (zero-padded)
        strs = pa.table(
            {"bucket": pa.array(buckets, type=pa.int64()),
             "url": pa.array([f"{m:09d}" for m in members], type=pa.string())}
        )
        return ints, strs

    def test_int_matches_string_pairs(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

        ints, strs = self._bucket_tables()
        cfg = DedupConfig(max_group_pairs=20)
        ip = candidate_pairs(ray.data.from_arrow(ints), cfg, num_partitions=4)
        sp = candidate_pairs(ray.data.from_arrow(strs), cfg, num_partitions=4)
        int_pairs = set((r["uid_a"], r["uid_b"]) for r in ip.take_all())
        str_pairs = set(
            (int(r["url_a"]), int(r["url_b"])) for r in sp.take_all()
        )
        assert all(a < b for a, b in int_pairs)
        # cold buckets (< cap members) emit IDENTICAL all-pairs sets;
        # the hot bucket's O(n) chain+star emission is block-boundary-
        # dependent (boundaries differ between 8-byte and string rows),
        # so there the invariant is component equivalence, not equality
        hot = set(range(500_000, 500_300))
        cold_i = {p for p in int_pairs if p[0] not in hot}
        cold_s = {p for p in str_pairs if p[0] not in hot}
        assert cold_i == cold_s
        for pairs in (int_pairs, str_pairs):
            hot_pairs = [p for p in pairs if p[0] in hot]
            parent = {m: m for m in hot}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in hot_pairs:
                parent[find(a)] = find(b)
            assert len({find(m) for m in hot}) == 1

    def test_pair_schema_named_after_member(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

        ints, _ = self._bucket_tables()
        pairs = candidate_pairs(
            ray.data.from_arrow(ints), DedupConfig(), num_partitions=2
        )
        assert set(pairs.schema().names) == {"uid_a", "uid_b"}


class TestLightIndexRepresentatives:
    def test_reps_are_min_url_members(self, ray_session):
        """representative_signatures must pick exactly the min-url member
        of each distinct text (the sketches never enter a shuffle)."""
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.stages.grouped import (
            exact_group_index,
            representative_signatures,
        )
        from ordinarydumpdeduplicator_ray.stages.signatures import (
            assign_uids,
            compute_signatures,
        )

        pages, _ = generate_pages(120, seed=3)
        cfg = DedupConfig(sig_concurrency=2)
        sigs = compute_signatures(ray.data.from_arrow(pages), cfg).materialize()
        sigs, _ = assign_uids(sigs, 2)
        valid = sigs.filter(expr=f"status != '{STATUS_BROKEN}'")
        index = exact_group_index(valid, sort_partitions=4).materialize()
        reps = representative_signatures(index, sigs)

        rows = valid.take_all()
        by_sha: dict = {}
        for r in rows:
            cur = by_sha.get(r["text_sha256"])
            if cur is None or r["url"] < cur["url"]:
                by_sha[r["text_sha256"]] = r
        expect_uids = sorted(v["uid"] for v in by_sha.values())
        got_uids = sorted(r["uid"] for r in reps.take_all())
        assert got_uids == expect_uids
        # index itself carries the same canonical uids
        idx_uids = sorted(r["canonical_uid"] for r in index.take_all())
        assert idx_uids == expect_uids
