"""Parquet shard compaction — the small-files pass every long-running
ingest needs.

A 100-TB corpus accumulated over many incremental crawls ends up as
millions of kilobyte-scale shards (per-snapshot appends, per-bucket
index partitions, checkpoint fragments); reading them costs one
metadata round-trip per file and starves readers. Compaction rewrites
a directory to approximately ``target_mb``-sized files: file count is
derived from the REAL on-disk byte size (file metadata, no data read),
then one ``repartition`` + ``write_parquet`` streams the rows through
— no driver materialization, rows preserved exactly.

The write goes to a sibling ``.compacting`` directory and atomically
renames over (the ``_converted_documents`` idiom), so a crashed
compaction never leaves a half-written directory where readers look.
"""

from __future__ import annotations

import math
import os
import shutil

import ray.data


def compact_parquet_dir(
    in_dir: str, out_dir: str, target_mb: int = 256
) -> dict:
    """Rewrite the parquet shards under ``in_dir`` into
    ~``target_mb``-sized files at ``out_dir`` (atomic rename).
    Returns {n_files_before, n_files_after, n_rows, bytes_before}."""
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    bytes_before = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_before / (target_mb * (1 << 20))))

    ds = ray.data.read_parquet(in_dir)
    n_rows = ds.count()
    tmp = out_dir + ".compacting"
    old = out_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    ds.repartition(n_out).write_parquet(tmp)
    # publish without an ENOENT window: rename the live dir aside, swap
    # the fully-written tmp into place, then drop the old copy — a crash
    # or concurrent reader never observes the output missing, and a
    # leftover ``.old``/``.compacting`` is cleaned on the next run
    # (ADVICE round 4: rmtree-then-rename left a gap and could collide)
    if os.path.isdir(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    n_after = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    return {
        "n_files_before": len(files),
        "n_files_after": n_after,
        "n_rows": n_rows,
        "bytes_before": bytes_before,
    }
