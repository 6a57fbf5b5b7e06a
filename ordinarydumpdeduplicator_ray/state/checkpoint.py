"""Per-stage Parquet checkpoints with lineage manifests.

The reference's persistent entity store is its implicit checkpoint
(``AddFileState``/``AddBlobInfo`` during the scan,
``DataControllerSimple.cs:210-213,238-244``); here every stage writes its
output table to ``<ckpt>/<stage>/data/*.parquet`` atomically (temp dir +
rename) plus a ``MANIFEST.json`` recording run id, config hash, input
fingerprint, row count and wall time. A rerun with the same config hash
and input fingerprint skips every completed stage — that is what
"resumes mid-shuffle" means for a staged batch pipeline: the shuffle
whose output is checkpointed never re-runs; the first incomplete stage
restarts from its checkpointed inputs. The Inspection run-record
(``Common/Inspection.cs:7-18``) maps to the manifest's run metadata.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow.parquet as pq
import ray.data

MANIFEST = "MANIFEST.json"


def _stage_dir(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, stage)


def manifest_path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(_stage_dir(ckpt_dir, stage), MANIFEST)


def load_manifest(ckpt_dir: str, stage: str) -> dict | None:
    p = manifest_path(ckpt_dir, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_is_complete(
    ckpt_dir: str, stage: str, config_hash: str, input_fingerprint: str
) -> bool:
    m = load_manifest(ckpt_dir, stage)
    return bool(
        m
        and m.get("complete")
        and m.get("config_hash") == config_hash
        and m.get("input_fingerprint") == input_fingerprint
    )


def write_stage(
    ds: ray.data.Dataset,
    ckpt_dir: str,
    stage: str,
    config_hash: str,
    input_fingerprint: str,
    run_id: str | None = None,
) -> ray.data.Dataset:
    """Execute ``ds``, persist it as the stage checkpoint, return a fresh
    Dataset reading the checkpoint (so downstream branches re-read Parquet
    instead of recomputing the lineage)."""
    sdir = _stage_dir(ckpt_dir, stage)
    data_dir = os.path.join(sdir, "data")
    tmp_dir = os.path.join(sdir, f".tmp-{uuid.uuid4().hex[:8]}")
    if os.path.exists(sdir):
        shutil.rmtree(sdir)
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.perf_counter()
    ds.write_parquet(tmp_dir)
    wall = time.perf_counter() - t0
    if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
        # empty stage output: persist an explicit 0-row file so the
        # checkpoint stays readable (a legitimate outcome, e.g. a corpus
        # with no duplicates at all)
        import pyarrow as pa

        schema = ds.schema()
        table = schema.base_schema.empty_table() if schema is not None else pa.table({})
        pq.write_table(table, os.path.join(tmp_dir, "empty.parquet"))
    os.rename(tmp_dir, data_dir)  # atomic completion marker for the data

    n_rows = 0
    partitions = []
    for f in sorted(os.listdir(data_dir)):
        if f.endswith(".parquet"):
            rows = pq.read_metadata(os.path.join(data_dir, f)).num_rows
            n_rows += rows
            partitions.append(
                {"file": f, "rows": rows,
                 "bytes": os.path.getsize(os.path.join(data_dir, f))}
            )
    man = {
        "stage": stage,
        "run_id": run_id or uuid.uuid4().hex,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "rows": n_rows,
        "wall_sec": round(wall, 3),
        "complete": True,
        "finished_at": time.time(),
        # per-partition lineage: which files constitute this stage's
        # output, so a resume (or an auditor) can verify the checkpoint
        # partition-by-partition rather than trusting the flag
        "partitions": partitions,
    }
    with open(manifest_path(ckpt_dir, stage), "w") as f:
        json.dump(man, f, indent=1)
    return ray.data.read_parquet(data_dir)


def read_stage(ckpt_dir: str, stage: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(_stage_dir(ckpt_dir, stage), "data"))


def input_fingerprint(path_or_ds) -> str:
    """Cheap input identity: for a path, the sorted (name, size, mtime)
    listing hashed; for an in-memory Dataset, a uuid (no resume)."""
    import hashlib

    if not isinstance(path_or_ds, str):
        return f"ephemeral-{uuid.uuid4().hex}"
    h = hashlib.sha256()
    if os.path.isdir(path_or_ds):
        # full recursive walk: a sharded layout (pages/ subdirs) must
        # change the fingerprint when any nested file changes, or a
        # resume would silently reuse stale checkpoints
        for root, dirs, files in sorted(os.walk(path_or_ds)):
            dirs.sort()
            rel_root = os.path.relpath(root, path_or_ds)
            for n in sorted(files):
                st = os.stat(os.path.join(root, n))
                h.update(f"{rel_root}/{n}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path_or_ds):
        st = os.stat(path_or_ds)
        h.update(f"{os.path.basename(path_or_ds)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
