"""Operator-level tests: multimodal plumbing, LSH-bucketed ANN,
substring spans end-to-end, checkpoint resume (SURVEY.md §5 items 5-6)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


class TestMultimodal:
    def _media(self):
        return pa.table(
            {
                "url": pa.array(["m://a", "m://b", "m://c", "m://d"], type=pa.string()),
                "media_type": pa.array(["image", "video", "audio", "image"], type=pa.string()),
                "payload": pa.array([b"aaaa", b"bbbb", b"cccc", None], type=pa.binary()),
            }
        )

    def test_features_deterministic_and_null_dropped(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.multimodal import extract_media_features

        out1 = extract_media_features(
            ray.data.from_arrow(self._media()), concurrency=1, media_batch_size=2
        ).take_all()
        out2 = extract_media_features(
            ray.data.from_arrow(self._media()), concurrency=1, media_batch_size=4
        ).take_all()
        assert len(out1) == 3  # null payload dropped
        k = lambda rows: sorted((r["url"], r["payload_sha256"], r["width"], r["height"], r["n_frames"]) for r in rows)
        assert k(out1) == k(out2)  # batch-size independent

    def test_image_single_frame_video_sampled(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.multimodal import extract_media_features

        rows = extract_media_features(
            ray.data.from_arrow(self._media()), concurrency=1
        ).take_all()
        by_url = {r["url"]: r for r in rows}
        assert by_url["m://a"]["n_frames"] == 1
        assert 1 <= by_url["m://b"]["n_frames"] <= 8

    def test_embedding_unit_norm_and_content_determined(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.multimodal import extract_media_features

        media = pa.table(
            {
                "url": pa.array(["m://x", "m://y"], type=pa.string()),
                "media_type": pa.array(["image", "image"], type=pa.string()),
                "payload": pa.array([b"same-bytes", b"same-bytes"], type=pa.binary()),
            }
        )
        rows = extract_media_features(ray.data.from_arrow(media), concurrency=1).take_all()
        e0, e1 = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
        assert np.allclose(e0, e1)  # same content -> same embedding
        assert abs(np.linalg.norm(e0) - 1.0) < 1e-5

    def test_avi_codec_roundtrip(self):
        from ordinarydumpdeduplicator_ray.functions.videocodec import (
            decode_avi,
            decode_avi_header,
            encode_avi,
        )

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 200, size=(5, 12, 17, 3), dtype=np.uint8)
        payload = encode_avi(frames, fps=8)
        w, h, nf = decode_avi_header(payload)
        assert (w, h, nf) == (17, 12, 5)
        dw, dh, out = decode_avi(payload)
        assert (dw, dh) == (17, 12)
        assert np.array_equal(out, frames)  # exact pixel round-trip

    def test_real_video_decode_from_actual_frames(self):
        """real=True decodes uncompressed AVI: dims/frame-count and the
        embedding come from the actual frames; non-AVI video payloads
        fall back to the stub (same policy as undecodable images)."""
        from ordinarydumpdeduplicator_ray.functions.videocodec import (
            encode_avi,
            video_features,
        )
        from ordinarydumpdeduplicator_ray.stages.multimodal import (
            MediaFeatureActor,
        )

        rng = np.random.default_rng(11)
        frames = rng.integers(0, 200, size=(3, 16, 16, 3), dtype=np.uint8)
        actor = MediaFeatureActor(real=True)
        batch = pa.table(
            {
                "url": pa.array(["m://v", "m://junk"], type=pa.string()),
                "media_type": pa.array(["video", "video"], type=pa.string()),
                "payload": pa.array(
                    [encode_avi(frames), b"not-a-codec"], type=pa.binary()
                ),
            }
        )
        rows = actor(batch).to_pylist()
        real = rows[0]
        assert (real["width"], real["height"], real["n_frames"]) == (16, 16, 3)
        assert np.allclose(real["embedding"], video_features(frames), atol=1e-6)
        # the junk payload degrades to the digest stub, never raises
        assert rows[1]["width"] > 0 and rows[1]["n_frames"] >= 1

    def test_wav_codec_roundtrip(self):
        from ordinarydumpdeduplicator_ray.functions.audiocodec import (
            decode_wav,
            encode_wav,
        )

        rng = np.random.default_rng(5)
        mono = rng.uniform(-1, 1, size=1000).astype(np.float32)
        rate, n_ch, out = decode_wav(encode_wav(mono, sample_rate=8000, bits=16))
        assert (rate, n_ch, len(out)) == (8000, 1, 1000)
        assert np.allclose(out[:, 0], mono, atol=1 / 32767 * 2)
        stereo = rng.uniform(-1, 1, size=(300, 2)).astype(np.float32)
        rate, n_ch, out = decode_wav(encode_wav(stereo, sample_rate=44100, bits=8))
        assert (rate, n_ch, len(out)) == (44100, 2, 300)
        assert np.allclose(out, stereo, atol=1 / 127 * 2)

    def test_real_audio_decode_from_actual_samples(self):
        """real=True decodes WAV fixtures: rate/channels/frames and the
        embedding come from the PCM samples; compressed-codec payloads
        fall back to the stub (same policy as undecodable images)."""
        from ordinarydumpdeduplicator_ray.functions.audiocodec import (
            decode_wav,
            encode_wav,
            sample_features,
        )
        from ordinarydumpdeduplicator_ray.stages.multimodal import MediaFeatureActor

        rng = np.random.default_rng(13)
        wav = encode_wav(
            rng.uniform(-1, 1, size=(512, 2)).astype(np.float32),
            sample_rate=16000, bits=16,
        )
        batch = pa.table(
            {
                "url": pa.array(["m://a", "m://mp3"]),
                "media_type": pa.array(["audio", "audio"], type=pa.string()),
                "payload": pa.array([wav, b"ID3\x04not-really-mp3"],
                                    type=pa.binary()),
            }
        )
        rows = {r["url"]: r for r in MediaFeatureActor(real=True)(batch).to_pylist()}
        a = rows["m://a"]
        assert (a["width"], a["height"], a["n_frames"]) == (16000, 2, 512)
        rate, _, samples = decode_wav(wav)
        assert np.allclose(a["embedding"], sample_features(rate, samples), atol=1e-6)
        assert rows["m://mp3"]["width"] > 0  # stub fallback, never raises

    def test_real_image_decode_from_actual_pixels(self):
        """real=True decodes generated PNG/BMP fixtures: dims and the
        embedding come from the pixels, not the payload digest."""
        from ordinarydumpdeduplicator_ray.functions.imagecodec import (
            encode_bmp,
            encode_gif_header,
            encode_png,
            pixel_features,
        )
        from ordinarydumpdeduplicator_ray.stages.multimodal import MediaFeatureActor

        rng = np.random.default_rng(11)
        px_png = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        px_bmp = rng.integers(0, 256, size=(9, 21, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "url": pa.array(["m://p", "m://b", "m://g", "m://junk"]),
                "media_type": pa.array(["image"] * 4, type=pa.string()),
                "payload": pa.array(
                    [encode_png(px_png), encode_bmp(px_bmp),
                     encode_gif_header(33, 44, n_frames=5), b"\x00not-an-image"],
                    type=pa.binary(),
                ),
            }
        )
        rows = {r["url"]: r for b in [MediaFeatureActor(real=True)(batch)]
                for r in b.to_pylist()}
        assert (rows["m://p"]["width"], rows["m://p"]["height"]) == (17, 13)
        assert (rows["m://b"]["width"], rows["m://b"]["height"]) == (21, 9)
        assert (rows["m://g"]["width"], rows["m://g"]["height"]) == (33, 44)
        assert rows["m://g"]["n_frames"] == 5
        assert np.allclose(rows["m://p"]["embedding"],
                           pixel_features(px_png), atol=1e-6)
        assert np.allclose(rows["m://b"]["embedding"],
                           pixel_features(px_bmp), atol=1e-6)
        # undecodable image payload falls back to the stub, never raises
        assert rows["m://junk"]["width"] > 0

    def test_png_filter_types_roundtrip(self):
        """The decoder reverses every PNG filter type (0-4): re-filter a
        known image with each type and check pixel equality."""
        import struct
        import zlib

        from ordinarydumpdeduplicator_ray.functions.imagecodec import (
            PNG_MAGIC,
            decode_png,
        )

        rng = np.random.default_rng(3)
        h, w, ch = 6, 5, 3
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)

        for ftype in range(5):
            raw = bytearray()
            flat = px.reshape(h, w * ch).astype(np.int32)
            prev = np.zeros(w * ch, dtype=np.int32)
            for y in range(h):
                raw.append(ftype)
                for x in range(w * ch):
                    a = int(flat[y, x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                            4: paeth(a, b, c)}[ftype]
                    raw.append((int(flat[y, x]) - pred) & 0xFF)
                prev = flat[y]

            def chunk(ctype, body):
                return (struct.pack(">I", len(body)) + ctype + body
                        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

            payload = (PNG_MAGIC
                       + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                       + chunk(b"IDAT", zlib.compress(bytes(raw)))
                       + chunk(b"IEND", b""))
            got = decode_png(payload)
            assert np.array_equal(got, px), f"filter {ftype}"

    def test_png_grayscale_and_rgba(self):
        from ordinarydumpdeduplicator_ray.functions.imagecodec import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(7)
        for ch in (1, 2, 3, 4):
            px = rng.integers(0, 256, size=(4, 3, ch), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(px)), px)

    def test_frame_sample_offsets(self):
        from ordinarydumpdeduplicator_ray.stages.multimodal import frame_sample_offsets

        assert frame_sample_offsets(1).tolist() == [0]
        offs = frame_sample_offsets(100, max_samples=8)
        assert len(offs) == 8 and offs[0] == 0 and offs[-1] == 99
        assert (np.diff(offs) > 0).all()


class TestLshKnn:
    def test_lsh_recall_vs_brute_force(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        exact = q.knn_cosine_vec0(SF, k=10)
        approx = q.knn_cosine_lsh_vec0(SF, k=10)
        exact_ids = set(exact["vec_id"].to_pylist())
        approx_ids = set(approx["vec_id"].to_pylist())
        # multi-probe hamming<=6 of 16 bits: high recall expected
        assert len(exact_ids & approx_ids) >= 7
        # approx scores must be exact cosines for the ids it returns
        exact_by_id = dict(zip(exact["vec_id"].to_pylist(), exact["cos_sim"].to_pylist()))
        for vid, cs in zip(approx["vec_id"].to_pylist(), approx["cos_sim"].to_pylist()):
            if vid in exact_by_id:
                assert abs(cs - exact_by_id[vid]) < 1e-9

    def test_ivf_recall_vs_brute_force(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        exact = q.knn_cosine_vec0(SF, k=10)
        approx = q.knn_cosine_ivf_vec0(SF, k=10)
        exact_ids = set(exact["vec_id"].to_pylist())
        approx_ids = set(approx["vec_id"].to_pylist())
        # nprobe=4 of 16 centroid lists: the true neighbors concentrate
        # in the query's own probe lists — high recall expected
        assert len(exact_ids & approx_ids) >= 7
        # scores for returned ids are exact cosines
        exact_by_id = dict(zip(exact["vec_id"].to_pylist(), exact["cos_sim"].to_pylist()))
        for vid, cs in zip(approx["vec_id"].to_pylist(), approx["cos_sim"].to_pylist()):
            if vid in exact_by_id:
                assert abs(cs - exact_by_id[vid]) < 1e-9

    def test_ivf_deterministic(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        a = q.knn_cosine_ivf_vec0(SF, k=10)
        b = q.knn_cosine_ivf_vec0(SF, k=10)
        assert a.equals(b)


class TestSpans:
    def test_shared_run_found_with_exact_offsets(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.spans import find_substring_spans

        shared = " ".join(f"shared{i}" for i in range(60))
        a_prefix = " ".join(f"alpha{i}" for i in range(40))
        b_suffix = " ".join(f"beta{i}" for i in range(40))
        pages = pa.table(
            {
                "url": pa.array(["u://a", "u://b", "u://c"], type=pa.string()),
                "html": pa.nulls(3, type=pa.binary()),
                "text": pa.array(
                    [f"{a_prefix} {shared}", f"{shared} {b_suffix}",
                     "unrelated " * 80],
                    type=pa.string(),
                ),
            }
        )
        cfg = DedupConfig(sig_concurrency=1, batch_size=64)
        spans = find_substring_spans(ray.data.from_arrow(pages), cfg, 4).take_all()
        assert len(spans) == 1
        s = spans[0]
        assert (s["url_a"], s["url_b"]) == ("u://a", "u://b")
        assert s["n_words"] == 60
        assert (s["a_start"], s["a_end"]) == (40, 100)
        assert (s["b_start"], s["b_end"]) == (0, 60)

    def test_exact_dups_excluded(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.spans import find_substring_spans

        text = " ".join(f"w{i}" for i in range(80))
        pages = pa.table(
            {
                "url": pa.array(["u://a", "u://b"], type=pa.string()),
                "html": pa.nulls(2, type=pa.binary()),
                "text": pa.array([text, text], type=pa.string()),
            }
        )
        cfg = DedupConfig(sig_concurrency=1, batch_size=64)
        spans = find_substring_spans(ray.data.from_arrow(pages), cfg, 4).take_all()
        assert spans == []


class TestCheckpointResume:
    def test_resume_identical_and_skips_stages(self, ray_session, tmp_path):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.state import checkpoint as ckpt

        import pyarrow.parquet as pq

        pages, _ = generate_pages(120, seed=3)
        pages_dir = str(tmp_path / "pages")
        import os
        os.makedirs(pages_dir)
        pq.write_table(pages, os.path.join(pages_dir, "part-0.parquet"))
        cfg = DedupConfig(sig_concurrency=1, batch_size=64)
        ck = str(tmp_path / "ck")

        p1 = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        o1 = p1.run(pages_dir)
        c1 = sorted((r["url"], r["component_id"]) for r in o1["components"].take_all())

        mtimes = {
            s: os.path.getmtime(ckpt.manifest_path(ck, s))
            for s in ("signatures", "edges", "components")
        }

        p2 = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        p2.register_input(pages_dir)
        o2 = p2.find_duplicates()
        c2 = sorted((r["url"], r["component_id"]) for r in o2["components"].take_all())
        assert c1 == c2
        for s, mt in mtimes.items():  # stages were skipped, not rewritten
            assert os.path.getmtime(ckpt.manifest_path(ck, s)) == mt

    def test_config_change_invalidates(self, ray_session, tmp_path):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
        from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
        from ordinarydumpdeduplicator_ray.state import checkpoint as ckpt

        import os
        import pyarrow.parquet as pq

        pages, _ = generate_pages(60, seed=3)
        pages_dir = str(tmp_path / "pages2")
        os.makedirs(pages_dir)
        pq.write_table(pages, os.path.join(pages_dir, "part-0.parquet"))
        ck = str(tmp_path / "ck2")
        cfg1 = DedupConfig(sig_concurrency=1, batch_size=64)
        p1 = DedupPipeline(cfg1, checkpoint_dir=ck, num_partitions=4)
        p1.register_input(pages_dir)
        p1.run_scan()
        fp = ckpt.input_fingerprint(pages_dir)
        assert ckpt.stage_is_complete(ck, "signatures", cfg1.config_hash(), fp)
        # different semantic config -> stage must NOT be treated complete
        cfg2 = DedupConfig(sig_concurrency=1, batch_size=64, shingle_size=7)
        assert not ckpt.stage_is_complete(ck, "signatures", cfg2.config_hash(), fp)


class TestSaltedHotBuckets:
    def test_hot_bucket_stays_connected_across_salts(self, ray_session):
        """A bucket far above max_group_pairs must still yield ONE
        connected component over its emitted pairs (salting splits the
        reducer load but the minima chain preserves connectivity)."""
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs
        from ordinarydumpdeduplicator_ray.state.unionfind import UnionFind

        n = 300
        urls = [f"u://hot/{i:05d}" for i in range(n)]
        bucket_rows = pa.table(
            {
                "bucket": pa.array([7] * n, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )
        cfg = DedupConfig(max_group_pairs=64)
        pairs = candidate_pairs(
            ray.data.from_arrow(bucket_rows), cfg, num_partitions=4
        ).take_all()
        # O(n) emission, not C(n,2)
        assert len(pairs) < 3 * n
        uf = UnionFind()
        for p in pairs:
            uf.union(p["url_a"], p["url_b"])
        roots = {uf.find(u) for u in urls}
        assert len(roots) == 1

    def test_cold_buckets_emit_all_pairs(self, ray_session):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

        bucket_rows = pa.table(
            {
                "bucket": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
                "url": pa.array(["a", "b", "c", "d", "e", "f"], type=pa.string()),
            }
        )
        cfg = DedupConfig(max_group_pairs=64)
        pairs = candidate_pairs(
            ray.data.from_arrow(bucket_rows), cfg, num_partitions=4
        ).take_all()
        got = sorted((p["url_a"], p["url_b"]) for p in pairs)
        assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")]


class TestLabelPropagation:
    def test_matches_driver_union_find(self, ray_session):
        """The distributed components path must agree with the
        driver-side union-find on the same edges."""
        import ray.data
        from ordinarydumpdeduplicator_ray.state.unionfind import (
            components_from_edges,
            label_propagation,
        )

        edges = pa.table(
            {
                "url_a": pa.array(
                    ["a", "b", "x", "m", "m", "p"], type=pa.string()
                ),
                "url_b": pa.array(
                    ["b", "c", "y", "n", "o", "q"], type=pa.string()
                ),
            }
        )
        ds = ray.data.from_arrow(edges)
        uf = sorted(
            (r["url"], r["component_id"])
            for r in components_from_edges(ds).to_pylist()
        )
        lp = sorted(
            (r["url"], r["component_id"])
            for r in label_propagation(ds).take_all()
        )
        assert uf == lp
        # components: {a,b,c}, {x,y}, {m,n,o}, {p,q}
        comp = dict(uf)
        assert comp["a"] == comp["b"] == comp["c"] == "a"
        assert comp["x"] == comp["y"] == "x"
        assert comp["m"] == comp["n"] == comp["o"] == "m"


class TestBroadcastJoins:
    def _mk(self, ray):
        import pyarrow as pa
        left = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 2, 3, 4, 2], type=pa.int64()),
             "x": pa.array(list("abcde"))}))
        small = ray.data.from_arrow(pa.table(
            {"k": pa.array([2, 3], type=pa.int64()),
             "v": pa.array(["two", "three"])}))
        return left, small

    def test_broadcast_matches_shuffle_inner(self, ray_session):
        import ray
        from ordinarydumpdeduplicator_ray.stages.join import (
            broadcast_inner_join, inner_join)

        left, small = self._mk(ray)
        fast = sorted((r["k"], r["x"], r["v"])
                      for r in broadcast_inner_join(left, small, on="k").take_all())
        slow = sorted((r["k"], r["x"], r["v"])
                      for r in inner_join(left, small, on=("k",)).take_all())
        assert fast == slow == [(2, "b", "two"), (2, "e", "two"), (3, "c", "three")]
        # cap=0 forces the shuffle fallback through the same entry point
        left, small = self._mk(ray)
        fb = sorted((r["k"], r["x"], r["v"])
                    for r in broadcast_inner_join(left, small, on="k", cap=0).take_all())
        assert fb == slow

    def test_broadcast_inner_rejects_dup_keys(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray
        from ordinarydumpdeduplicator_ray.stages.join import broadcast_inner_join

        left, _ = self._mk(ray)
        dup = ray.data.from_arrow(pa.table(
            {"k": pa.array([2, 2], type=pa.int64()), "v": pa.array(["x", "y"])}))
        with pytest.raises(ValueError, match="not unique"):
            broadcast_inner_join(left, dup, on="k")

    def test_broadcast_anti(self, ray_session):
        import pyarrow as pa
        import ray
        from ordinarydumpdeduplicator_ray.stages.join import broadcast_anti_join

        left, small = self._mk(ray)
        keys = small.map_batches(lambda t: t.select(["k"]), batch_format="pyarrow")
        got = sorted((r["k"], r["x"]) for r in
                     broadcast_anti_join(left, keys, on="k").take_all())
        assert got == [(1, "a"), (4, "d")]
        left, small = self._mk(ray)
        keys = small.map_batches(lambda t: t.select(["k"]), batch_format="pyarrow")
        fb = sorted((r["k"], r["x"]) for r in
                    broadcast_anti_join(left, keys, on="k", cap=0).take_all())
        assert fb == got
        # empty key set passes everything through
        left, _ = self._mk(ray)
        empty = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
        assert broadcast_anti_join(left, empty, on="k").count() == 5


class TestMalformedPayloads:
    def test_corrupt_payloads_degrade_to_stub_never_raise(self):
        """struct.error / zlib.error / ValueError from parses the header
        checks miss must fall back to the stub (per-row tolerance), and
        a zlib-bomb PNG must be rejected by the bounded inflate."""
        import struct
        import zlib

        from ordinarydumpdeduplicator_ray.functions import imagecodec as ic
        from ordinarydumpdeduplicator_ray.stages.multimodal import MediaFeatureActor

        bad_wav = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                   + b"fmt " + struct.pack("<I", 16) + b"\x01\x00")
        bad_png = (ic.PNG_MAGIC + struct.pack(">I4s", 8, b"IHDR")
                   + b"\x00" * 8 + b"\x00" * 4)
        px = np.zeros((2, 2, 3), np.uint8)
        bmp = bytearray(ic.encode_bmp(px))
        bmp[18:22] = struct.pack("<i", -2)  # negative width

        def chunk(t, b):
            return (struct.pack(">I", len(b)) + t + b
                    + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

        bomb = (ic.PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000))
                + chunk(b"IEND", b""))

        batch = pa.table({
            "url": pa.array(["m://w", "m://p", "m://b", "m://z"]),
            "media_type": pa.array(["audio", "image", "image", "image"]),
            "payload": pa.array([bad_wav, bad_png, bytes(bmp), bomb],
                                type=pa.binary()),
        })
        out = MediaFeatureActor(real=True)(batch)
        assert len(out) == 4  # every row decoded (stub), none raised
        assert all(w > 0 for w in out["width"].to_pylist())


class TestImagePhash:
    def test_average_hash_properties(self):
        """Brightness-shift invariance (no clipping), re-encode
        invariance, and discrimination between unrelated images."""
        import numpy as np

        from ordinarydumpdeduplicator_ray.functions.imagecodec import (
            average_hash,
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(41)
        px = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        h = average_hash(px)
        assert average_hash(px + np.uint8(8)) == h
        assert average_hash(decode_png(encode_png(px))) == h
        other = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        assert average_hash(other) != h
        # odd dims exercise the integral-image block split
        assert isinstance(average_hash(rng.integers(
            0, 200, size=(13, 17, 3), dtype=np.uint8)), int)

    def test_image_phash_dups_query(self, ray_session):
        """Every injected brightness copy groups with its original;
        no group mixes unrelated images (pair distance 3_000_000)."""
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        groups = q.image_phash_dups("/root/testdata/sf0.001").take_all()
        assert groups
        for g in groups:
            assert g["n"] == 2
            assert g["max_id"] - g["min_id"] == 3_000_000

    def test_image_phash_checksum_locked(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        t = q.image_phash_checksum("/root/testdata/sf0.01").to_pydict()
        assert t == {"n_images": [600], "checksum": ["022925fa5aec92d6"]}


class TestAudioFingerprint:
    def test_gain_invariance_and_discrimination(self):
        import numpy as np

        from ordinarydumpdeduplicator_ray.functions.audiocodec import (
            audio_fingerprint,
        )

        rng = np.random.default_rng(43)
        x = rng.normal(size=4000)
        f = audio_fingerprint(x)
        # power-of-two gain is exact under IEEE sqrt
        assert audio_fingerprint(x * 0.5) == f
        assert audio_fingerprint(x * 2.0) == f
        assert audio_fingerprint(rng.normal(size=4000)) != f
        # stereo mixdown path + empty clip
        assert audio_fingerprint(np.stack([x, x], axis=1)) == f
        assert audio_fingerprint(np.empty(0)) == 0

    def test_audio_fp_dups_query(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        groups = q.audio_fp_dups("/root/testdata/sf0.001").take_all()
        assert groups
        for g in groups:
            assert g["n"] == 2
            assert g["max_id"] - g["min_id"] == 4_000_000

    def test_audio_fp_checksum_locked(self, ray_session):
        from ordinarydumpdeduplicator_ray.pipelines import queries as q

        t = q.audio_fp_checksum("/root/testdata/sf0.01").to_pydict()
        assert t == {"n_clips": [572], "checksum": ["f7b31f702d5ce220"]}


def test_image_phash_near_dups_brute_force(ray_session):
    """Banded near-dup output == the exact set of pairs within
    hamming <= 3 (pigeonhole: 4 bands over 64 bits guarantee every
    such pair shares an intact band — zero misses by construction)."""
    from ordinarydumpdeduplicator_ray.functions.imagecodec import (
        average_hash,
    )
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["img_a"], r["img_b"], r["hamming"])
        for r in q.image_phash_near_dups(sf).take_all()
    )
    # brute-force oracle over the same deterministic corpus
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT vec_id FROM '{sf}/embeddings.parquet'").fetchall()]
    hashes = {}
    for v in ids:
        px = q._png_pixels(int(v))
        hashes[int(v)] = average_hash(px)
        if v % 11 == 0:
            noisy = px.copy()
            noisy[0:2, 0:2, :] = 0
            noisy[14:16, 14:16, :] = 199
            hashes[int(v) + 5_000_000] = average_hash(noisy)
    keys = sorted(hashes)
    expect = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for i, a in enumerate(keys) for b in keys[i + 1:]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    )
    assert got == expect
    assert any(h > 0 for _, _, h in got)


def test_multimodal_curate(ray_session):
    """Every injected brightness/half-gain copy drops against its
    original in ALL THREE modalities (round 4: video decodes for real
    — the +8-brightness AVI copies perceptually dedup too); base
    assets are all kept."""
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = q.multimodal_curate("/root/testdata/sf0.001").take_all()
    types = {r["media_type"] for r in rows}
    assert types == {"image", "audio", "video"}
    copies = [r for r in rows if r["asset_id"] >= 6_000_000]
    assert copies
    dropped_types = set()
    for r in copies:
        assert not r["kept"]
        assert r["dup_of"] == r["asset_id"] - 6_000_000
        dropped_types.add(r["media_type"])
    assert "video" in dropped_types  # real AVI perceptual dedup fired
    base = [r for r in rows if r["asset_id"] < 6_000_000]
    assert all(r["kept"] for r in base)


def test_multimodal_curate_checksum_locked(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    t = q.multimodal_curate_checksum("/root/testdata/sf0.01").to_pydict()
    assert t == {"n_assets": [574], "checksum": ["2da72d8e1a3d3b49"]}
