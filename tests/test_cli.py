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
