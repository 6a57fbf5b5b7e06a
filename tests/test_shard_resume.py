"""Shard-level scan checkpointing: a killed scan resumes mid-stage,
re-hashing only missing shards (state/checkpoint.write_scan_sharded)."""

from __future__ import annotations

import json
import os

import pytest


def _sig_rows(ds):
    return sorted(
        (r["url"], r["text_sha256"], r["n_bytes"]) for r in ds.take_all()
    )


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory):
    from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

    d = tmp_path_factory.mktemp("shard_corpus")
    return write_pages_corpus(str(d), 360, seed=9, shards=6)


class TestShardResume:
    def test_full_scan_then_resume_skips_all(self, ray_session, sharded_corpus, tmp_path):
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

        cfg = DedupConfig(sig_concurrency=2)
        ck = str(tmp_path / "ck")
        pipe = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        pipe.register_input(sharded_corpus)
        sigs = pipe.run_scan()
        assert sigs.count() == 360
        data_dir = os.path.join(ck, "signatures", "data")
        shard_dirs = [n for n in os.listdir(data_dir) if n.startswith("shard-")]
        assert len(shard_dirs) == 6
        man = json.load(open(os.path.join(ck, "signatures", "MANIFEST.json")))
        assert man["complete"] and man["sharded"] and man["rows"] == 360

        # stage-complete resume: nothing recomputed
        pipe2 = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        pipe2.register_input(sharded_corpus)
        sigs2 = pipe2.run_scan()
        assert pipe2.metrics["signatures"]["resumed"] is True
        assert _sig_rows(sigs2) == _sig_rows(sigs)

    def test_partial_kill_recomputes_only_missing_shards(
        self, ray_session, sharded_corpus, tmp_path
    ):
        import shutil

        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

        cfg = DedupConfig(sig_concurrency=2)
        ck = str(tmp_path / "ck")
        pipe = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        pipe.register_input(sharded_corpus)
        baseline = _sig_rows(pipe.run_scan())

        # simulate a kill: manifest gone, half the shard outputs gone
        data_dir = os.path.join(ck, "signatures", "data")
        os.remove(os.path.join(ck, "signatures", "MANIFEST.json"))
        shard_dirs = sorted(
            n for n in os.listdir(data_dir) if n.startswith("shard-")
        )
        for n in shard_dirs[:3]:
            shutil.rmtree(os.path.join(data_dir, n))
        kept_mtimes = {
            n: os.stat(os.path.join(data_dir, n)).st_mtime_ns
            for n in shard_dirs[3:]
        }

        pipe2 = DedupPipeline(cfg, checkpoint_dir=ck, num_partitions=4)
        pipe2.register_input(sharded_corpus)
        sigs2 = pipe2.run_scan()
        assert pipe2.metrics["signatures"]["resumed"] is False
        assert _sig_rows(sigs2) == baseline
        # surviving shards were NOT rewritten
        for n, m in kept_mtimes.items():
            assert os.stat(os.path.join(data_dir, n)).st_mtime_ns == m

    def test_config_change_invalidates_shards(self, ray_session, sharded_corpus, tmp_path):
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

        ck = str(tmp_path / "ck")
        pipe = DedupPipeline(DedupConfig(sig_concurrency=2), checkpoint_dir=ck,
                             num_partitions=4)
        pipe.register_input(sharded_corpus)
        pipe.run_scan()
        data_dir = os.path.join(ck, "signatures", "data")
        old = {n for n in os.listdir(data_dir) if n.startswith("shard-")}

        # different semantic config -> different shard keys, stale dirs
        # dropped, stage recomputed (not resumed)
        pipe2 = DedupPipeline(
            DedupConfig(sig_concurrency=2, shingle_size=7), checkpoint_dir=ck,
            num_partitions=4,
        )
        pipe2.register_input(sharded_corpus)
        sigs2 = pipe2.run_scan()
        assert pipe2.metrics["signatures"]["resumed"] is False
        assert sigs2.count() == 360
        new = {n for n in os.listdir(data_dir) if n.startswith("shard-")}
        assert new.isdisjoint(old) and len(new) == 6
