"""Unit tests for the pure kernels (no Ray needed).

Anchors (SURVEY.md §5): hash sentinels (Common/BlobInfo.cs:44-60),
deterministic extraction (north-rule per-row invariant), signature
stability, suffix-array span semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from ordinarydumpdeduplicator_ray.functions.hashing import (
    TokenHasher,
    combine_hash_rows,
    shingle_hashes,
    token_hash,
)
from ordinarydumpdeduplicator_ray.functions.minhash import (
    estimate_jaccard,
    make_permutations,
    minhash_flat,
)
from ordinarydumpdeduplicator_ray.functions.simhash import (
    hamming_distance,
    simhash_block_keys,
    simhash_flat,
)
from ordinarydumpdeduplicator_ray.functions.suffix import common_spans, lcp_array, suffix_array
from ordinarydumpdeduplicator_ray.functions.text import extract_text, tokenize
from ordinarydumpdeduplicator_ray.functions.textstats import (
    count_bpe_tokens,
    count_ws_tokens,
    detect_lang,
    doc_fingerprint,
    doc_fingerprints_flat,
    quality_features,
)


class TestExtraction:
    def test_deterministic(self):
        html = b"<html><body><p>Hello <b>world</b></p><script>1<2</script></body></html>"
        assert extract_text(html) == extract_text(html) == "Hello world"

    def test_none_input(self):
        assert extract_text(None) is None

    def test_entities_and_comments(self):
        assert extract_text(b"<p>a &amp; b <!-- c --> &lt;d&gt;</p>") == "a & b <d>"

    def test_undecodable_bytes_still_deterministic(self):
        junk = b"\xff\xfe<p>ok</p>\x80"
        assert extract_text(junk) == extract_text(junk)

    def test_roundtrip_with_generator_wrapper(self):
        from ordinarydumpdeduplicator_ray.sources.synth import render_html

        text = "some plain words joined by spaces"
        assert extract_text(render_html(text)) == text

    def test_tokenize(self):
        assert tokenize("Foo, bar-baz! 42") == ["foo", "bar", "baz", "42"]
        assert tokenize("Foo", lowercase=False) == ["Foo"]
        assert tokenize("") == []


class TestShingles:
    def test_short_doc_single_shingle(self):
        th = TokenHasher()
        h = th.hash_tokens(["a", "b"])
        s = shingle_hashes(h, 5)
        assert len(s) == 1

    def test_empty(self):
        assert len(shingle_hashes(np.empty(0, dtype=np.uint64), 5)) == 0

    def test_order_sensitive(self):
        th = TokenHasher()
        h1 = th.hash_tokens(list("abcdefgh"))
        h2 = th.hash_tokens(list("abcdefhg"))
        assert set(shingle_hashes(h1, 3)) != set(shingle_hashes(h2, 3))

    def test_token_hash_stable(self):
        assert token_hash("hello") == token_hash("hello")
        assert token_hash("hello") != token_hash("hellp")

    def test_cache_consistency(self):
        th = TokenHasher()
        a = th.hash_tokens(["x", "y", "x"])
        assert a[0] == a[2] == token_hash("x")


class TestMinHash:
    def _sigs(self, sets):
        a, b = make_permutations(128, 42)
        flat = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
        lengths = [len(s) for s in sets]
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        return minhash_flat(flat, offsets, a, b)

    def test_identical_sets_identical_sigs(self):
        s = np.array([1, 5, 9, 123456], dtype=np.uint64)
        sigs = self._sigs([s, s.copy()])
        assert (sigs[0] == sigs[1]).all()

    def test_estimate_tracks_true_jaccard(self):
        rng = np.random.default_rng(3)
        base = rng.integers(0, 2**63, 400).astype(np.uint64)
        other = base.copy()
        other[:40] = rng.integers(0, 2**63, 40).astype(np.uint64)  # ~0.82 true J
        sa, sb = np.unique(base), np.unique(other)
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        sigs = self._sigs([sa, sb])
        est = estimate_jaccard(sigs[0], sigs[1])
        assert abs(est - true_j) < 0.12

    def test_empty_row_all_max(self):
        sigs = self._sigs([np.array([1, 2], dtype=np.uint64), np.empty(0, dtype=np.uint64)])
        assert (sigs[1] == np.iinfo(np.uint64).max).all()

    def test_trailing_and_leading_empty_rows(self):
        s = np.array([3, 4, 5], dtype=np.uint64)
        e = np.empty(0, dtype=np.uint64)
        sigs = self._sigs([e, s, e, s.copy(), e])
        assert (sigs[1] == sigs[3]).all()
        assert (sigs[0] == np.iinfo(np.uint64).max).all()
        assert (sigs[4] == np.iinfo(np.uint64).max).all()

    def test_permutations_seeded(self):
        a1, b1 = make_permutations(16, 1)
        a2, b2 = make_permutations(16, 1)
        a3, _ = make_permutations(16, 2)
        assert (a1 == a2).all() and (b1 == b2).all()
        assert (a1 != a3).any()
        assert (a1 % 2 == 1).all()  # odd multipliers


class TestSimHash:
    def test_identical_and_near(self):
        rng = np.random.default_rng(5)
        base = rng.integers(0, 2**63, 300).astype(np.uint64)
        near = base.copy()
        near[:15] = rng.integers(0, 2**63, 15).astype(np.uint64)
        far = rng.integers(0, 2**63, 300).astype(np.uint64)
        flat = np.concatenate([base, base, near, far])
        offsets = np.array([0, 300, 600, 900], dtype=np.int64)
        sh = simhash_flat(flat, offsets)
        assert sh[0] == sh[1]
        assert hamming_distance(sh[0:1], sh[2:3])[0] < hamming_distance(sh[0:1], sh[3:4])[0]

    def test_block_keys_cover_hamming_ball(self):
        # Manku guarantee: any <=3 bit flips leave >=3 of 6 blocks clean,
        # so at least one 3-block table key must match. Exhaustive-ish
        # check over seeded random flip triples.
        rng = np.random.default_rng(7)
        for _ in range(200):
            a = np.uint64(rng.integers(0, 2**63, dtype=np.uint64))
            flips = rng.choice(64, size=rng.integers(1, 4), replace=False)
            b = a
            for f in flips:
                b = b ^ np.uint64(1 << int(f))
            ka = simhash_block_keys(np.array([a]), 6, 3)[0]
            kb = simhash_block_keys(np.array([b]), 6, 3)[0]
            assert (ka == kb).any(), f"missed pair at flips {flips}"
        # and distance 4 pairs are NOT guaranteed (but may collide)

    def test_empty_zero(self):
        sh = simhash_flat(np.empty(0, dtype=np.uint64), np.array([0, 0], dtype=np.int64))
        assert (sh == 0).all()


class TestSuffixSpans:
    def test_suffix_array_banana(self):
        seq = np.array([ord(c) for c in "banana"], dtype=np.int64)
        sa = suffix_array(seq)
        suffixes = ["".join(chr(c) for c in seq[i:]) for i in sa]
        assert suffixes == sorted(suffixes)
        lcp = lcp_array(seq, sa)
        assert lcp[1] == 1  # 'a' vs 'ana'
        assert lcp[2] == 3  # 'ana' vs 'anana'

    def test_common_run_detected_exactly(self):
        rng = np.random.default_rng(11)
        run = np.arange(10_000, 10_050, dtype=np.uint64)
        a = np.concatenate([rng.integers(0, 2**40, 70).astype(np.uint64), run,
                            rng.integers(0, 2**40, 30).astype(np.uint64)])
        b = np.concatenate([rng.integers(0, 2**40, 20).astype(np.uint64), run,
                            rng.integers(0, 2**40, 55).astype(np.uint64)])
        spans = common_spans(a, b, 30)
        assert spans == [(70, 120, 20, 70, 50)]

    def test_no_common_run(self):
        a = np.arange(0, 100, dtype=np.uint64)
        b = np.arange(1000, 1100, dtype=np.uint64)
        assert common_spans(a, b, 10) == []

    def test_below_threshold_ignored(self):
        run = np.arange(500, 520, dtype=np.uint64)  # 20-token run
        a = np.concatenate([np.arange(0, 50, dtype=np.uint64), run])
        b = np.concatenate([run, np.arange(2000, 2060, dtype=np.uint64)])
        assert common_spans(a, b, 30) == []
        assert common_spans(a, b, 20) == [(50, 70, 0, 20, 20)]


class TestTextStats:
    def test_lang(self):
        assert detect_lang("the cat and the dog is in the house for it") == "en"
        assert detect_lang("der hund und die katze ist nicht von den haus") == "de"
        assert detect_lang("привет мир это русский текст который длинный") == "ru"
        assert detect_lang("") == "und"

    def test_counts(self):
        assert count_ws_tokens("a b  c") == 3
        assert count_bpe_tokens("a b, c!") == 5
        assert count_ws_tokens("") == 0

    def test_quality_features(self):
        n_chars, n_tokens, mean_len, punct, stop = quality_features("The cat sat.")
        assert n_chars == 12 and n_tokens == 3
        assert punct == pytest.approx(1 / 12)

    def test_fingerprint_order_sensitive(self):
        th = TokenHasher()
        a = th.hash_tokens(["x", "y", "z"])
        b = th.hash_tokens(["z", "y", "x"])
        assert doc_fingerprint(a) != doc_fingerprint(b)
        assert doc_fingerprint(a) == doc_fingerprint(a.copy())

    def test_fingerprints_flat_matches_scalar(self):
        th = TokenHasher()
        docs = [th.hash_tokens(list(w)) for w in ["hello", "ab", ""]]
        flat = np.concatenate([d for d in docs if len(d)] + [np.empty(0, dtype=np.uint64)])
        offsets = np.array([0, 5, 7], dtype=np.int64)
        out = doc_fingerprints_flat(flat, offsets)
        assert out[0] == doc_fingerprint(docs[0])
        assert out[1] == doc_fingerprint(docs[1])
        assert out[2] == doc_fingerprint(docs[2])


class TestCombine:
    def test_band_salt_separates(self):
        m = np.array([[1, 2], [1, 2]], dtype=np.uint64)
        k0 = combine_hash_rows(m, salt=0)
        k1 = combine_hash_rows(m, salt=1)
        assert k0[0] == k0[1]
        assert (k0 != k1).all()


class TestFormat:
    def test_human_size(self):
        from ordinarydumpdeduplicator_ray.functions.format import human_size

        assert human_size(0) == "0 B"
        assert human_size(1023) == "1023 B"
        assert human_size(1024) == "1.0 KiB"
        assert human_size(1536) == "1.5 KiB"
        assert human_size(1024 ** 2 * 3 // 2) == "1.5 MiB"
        assert human_size(1024 ** 4) == "1.0 TiB"

    def test_human_duration(self):
        from ordinarydumpdeduplicator_ray.functions.format import human_duration

        assert human_duration(0) == "00:00:00.00"
        assert human_duration(3723.5) == "01:02:03.50"


class TestMinhashProperties:
    def test_flat_matches_per_row_reference(self):
        """minhash_flat must equal the obvious per-row implementation
        for random shingle sets (hypothesis-style seeded sweep)."""
        from ordinarydumpdeduplicator_ray.functions.minhash import (
            make_permutations,
            minhash_flat,
        )

        rng = np.random.default_rng(11)
        a, b = make_permutations(32, 42)
        for trial in range(25):
            sizes = rng.integers(0, 40, size=rng.integers(1, 8))
            rows = [
                rng.integers(0, 2**63, size=s, dtype=np.uint64) for s in sizes
            ]
            flat = (
                np.concatenate(rows) if any(len(r) for r in rows)
                else np.empty(0, dtype=np.uint64)
            )
            offsets = np.cumsum([0] + [len(r) for r in rows])[:-1].astype(np.int64)
            got = minhash_flat(flat, offsets, a, b)
            for i, row in enumerate(rows):
                if len(row) == 0:
                    assert (got[i] == np.iinfo(np.uint64).max).all()
                    continue
                with np.errstate(over="ignore"):
                    expect = np.min(
                        a[:, None] * row[None, :] + b[:, None], axis=1
                    )
                assert (got[i] == expect).all(), f"trial {trial} row {i}"

    def test_chunk_size_does_not_change_result(self):
        from ordinarydumpdeduplicator_ray.functions.minhash import (
            make_permutations,
            minhash_flat,
        )

        rng = np.random.default_rng(5)
        flat = rng.integers(0, 2**63, size=300, dtype=np.uint64)
        offsets = np.array([0, 100, 120, 120, 290], dtype=np.int64)
        a, b = make_permutations(128, 42)
        ref = minhash_flat(flat, offsets, a, b, perm_chunk=128)
        for chunk in (1, 4, 16, 50):
            assert (minhash_flat(flat, offsets, a, b, perm_chunk=chunk) == ref).all()


class TestSimhashProperties:
    def test_bitpass_matches_naive(self):
        """The 8-bits-per-pass simhash must equal the naive full-matrix
        computation."""
        from ordinarydumpdeduplicator_ray.functions.simhash import simhash_flat

        rng = np.random.default_rng(3)
        rows = [rng.integers(0, 2**63, size=s, dtype=np.uint64)
                for s in (0, 1, 7, 33)]
        flat = np.concatenate([r for r in rows if len(r)])
        offsets = np.cumsum([0] + [len(r) for r in rows])[:-1].astype(np.int64)
        got = simhash_flat(flat, offsets)
        shifts = np.arange(64, dtype=np.uint64)
        for i, row in enumerate(rows):
            if len(row) == 0:
                assert got[i] == 0
                continue
            bits = ((row[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            expect = np.uint64(0)
            for k in range(64):
                if 2 * int(bits[k]) > len(row):
                    expect |= np.uint64(1) << np.uint64(k)
            assert got[i] == expect, f"row {i}"


class TestUrlNormalize:
    def test_normal_forms(self):
        from ordinarydumpdeduplicator_ray.functions.urlnorm import normalize_url

        cases = {
            "https://EXAMPLE.com/a/b?utm_source=x&b=2&a=1#frag":
                "https://example.com/a/b?a=1&b=2",
            "https://example.com/a/b?a=1&b=2":
                "https://example.com/a/b?a=1&b=2",
            "http://Example.Com/a/b/": "http://example.com/a/b",
            "https://example.com/a/b?utm_campaign=z": "https://example.com/a/b",
            "https://example.com/x?q=1&utm_medium=m&p=2":
                "https://example.com/x?p=2&q=1",
            "https://example.com/": "https://example.com",
            "https://example.com": "https://example.com",
            "not a url": "not a url",
        }
        for raw, want in cases.items():
            assert normalize_url(raw) == want, raw

    def test_idempotent(self):
        from ordinarydumpdeduplicator_ray.functions.urlnorm import normalize_url

        for raw in ["https://A.b/c/?z=1&utm_x=2&y=3#f", "http://h/p?b=1&a=2"]:
            once = normalize_url(raw)
            assert normalize_url(once) == once
