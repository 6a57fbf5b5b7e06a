"""CLI (`python -m ordinarydumpdeduplicator_ray`) — the ray-job-submit
launch surface: arg parsing, table writing, metrics JSON."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest


class TestCli:
    def test_end_to_end_writes_tables(self, ray_session, tmp_path, capsys):
        from ordinarydumpdeduplicator_ray.__main__ import main
        from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

        pages_dir = write_pages_corpus(str(tmp_path / "corpus"), 120, seed=3, shards=2)
        out = tmp_path / "out"
        rc = main([
            "--pages", pages_dir, "--out", str(out),
            "--num-partitions", "4",
            "--tables", "groups_exact,edges,actions",
        ])
        assert rc == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(report["written"]) == {"groups_exact", "edges", "actions"}
        for name in report["written"]:
            t = pq.read_table(str(out / name))
            assert len(t) == report["stages"][name if name != "actions" else "actions"]["rows"] or len(t) >= 0
        # actions table row count must match the metrics line exactly
        assert len(pq.read_table(str(out / "actions"))) == report["stages"]["actions"]["rows"]

    def test_unknown_table_is_skipped(self, ray_session, tmp_path, capsys):
        from ordinarydumpdeduplicator_ray.__main__ import main
        from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

        pages_dir = write_pages_corpus(str(tmp_path / "corpus"), 60, seed=5, shards=1)
        rc = main([
            "--pages", pages_dir, "--out", str(tmp_path / "out"),
            "--num-partitions", "4", "--tables", "actions,not_a_table",
        ])
        assert rc == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(report["written"]) == {"actions"}

    def test_missing_required_args_exits(self):
        from ordinarydumpdeduplicator_ray.__main__ import main

        with pytest.raises(SystemExit):
            main(["--pages", "/tmp/x"])  # no --out

    def test_report_flag_writes_rollup(self, ray_session, tmp_path, capsys):
        from ordinarydumpdeduplicator_ray.__main__ import main
        from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

        pages_dir = write_pages_corpus(str(tmp_path / "corpus"), 80, seed=2, shards=1)
        out = tmp_path / "out"
        rc = main([
            "--pages", pages_dir, "--out", str(out),
            "--num-partitions", "4", "--tables", "actions", "--report",
        ])
        assert rc == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "report" in report["written"]
        t = pq.read_table(str(out / "report"))
        assert {"n_dup_pages", "dup_bytes"} <= set(t.column_names)

    def test_warc_format_input(self, ray_session, tmp_path, capsys):
        """--format warc: a WARC shard directory drives the full
        pipeline and produces the same actions count as the Parquet
        original."""
        import ray.data

        from ordinarydumpdeduplicator_ray.__main__ import main
        from ordinarydumpdeduplicator_ray.sources.pages import read_pages
        from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus
        from ordinarydumpdeduplicator_ray.sources.warc import write_pages_warc

        pages_dir = write_pages_corpus(str(tmp_path / "corpus"), 120, seed=3, shards=2)
        warc_dir = str(tmp_path / "warc")
        n = write_pages_warc(read_pages(pages_dir), warc_dir)
        # broken rows (html and text both null) have no payload to wrap
        # and are skipped by the writer (documented) — they also cannot
        # appear in actions, so the comparison below stays exact
        with_payload = read_pages(pages_dir).map_batches(
            lambda t: t.filter(
                __import__("pyarrow.compute", fromlist=["compute"]).or_(
                    t["html"].combine_chunks().is_valid(),
                    t["text"].combine_chunks().is_valid(),
                )
            ),
            batch_format="pyarrow",
        ).count()
        assert n == with_payload

        out_p = tmp_path / "out_parquet"
        out_w = tmp_path / "out_warc"
        assert main(["--pages", pages_dir, "--out", str(out_p),
                     "--num-partitions", "4", "--tables", "actions"]) == 0
        assert main(["--pages", warc_dir, "--format", "warc",
                     "--out", str(out_w),
                     "--num-partitions", "4", "--tables", "actions"]) == 0
        import pyarrow.parquet as _pq
        ta = _pq.read_table(str(out_p / "actions"))
        tb = _pq.read_table(str(out_w / "actions"))
        assert sorted(ta["url"].to_pylist()) == sorted(tb["url"].to_pylist())

    def test_stats_flag_prints_execution_stats(self, ray_session, tmp_path, capsys):
        from ordinarydumpdeduplicator_ray.__main__ import main
        from ordinarydumpdeduplicator_ray.sources.synth import write_pages_corpus

        pages_dir = write_pages_corpus(str(tmp_path / "corpus"), 60, seed=5, shards=1)
        rc = main([
            "--pages", pages_dir, "--out", str(tmp_path / "out"),
            "--num-partitions", "4", "--tables", "actions", "--stats",
        ])
        assert rc == 0
        captured = capsys.readouterr()
        assert "--- stats: actions ---" in captured.err
        json.loads(captured.out.strip().splitlines()[-1])  # stdout still clean JSON
