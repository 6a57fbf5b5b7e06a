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


# --- shard-level scan checkpointing -----------------------------------------
#
# The scan (extract + sha256 + minhash + simhash) is the longest stage at
# corpus scale, so stage-granularity resume is not enough for it: a job
# killed at 90% of a 100-TB scan must not re-hash the first 90%. The scan
# therefore checkpoints PER INPUT SHARD: each input Parquet file maps to
# one output directory `data/shard-<key>/` (key = content identity of the
# shard + the semantic config hash), written atomically (tmp + rename).
# A resume lists the shard dirs, skips every finished one, and processes
# only the missing shards; the stage MANIFEST is written only when every
# shard is present, so the stage-level resume logic is unchanged on top.


def _scan_shards(pages_path: str) -> list[tuple[str, str]]:
    """(absolute shard path, relpath) for every .parquet under the input."""
    if os.path.isfile(pages_path):
        return [(pages_path, os.path.basename(pages_path))]
    out = []
    for root, dirs, files in sorted(os.walk(pages_path)):
        dirs.sort()
        for n in sorted(files):
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out.append((p, os.path.relpath(p, pages_path)))
    return out


def _shard_key(rel: str, path: str, config_hash: str,
               keep_text: bool = False) -> str:
    """keep_text is part of the identity: it changes the shard OUTPUT
    schema (signatures with/without the text column) while living
    outside DedupConfig, so omitting it would let a resume silently
    reuse shards of the wrong shape."""
    import hashlib

    st = os.stat(path)
    payload = (f"{rel}:{st.st_size}:{st.st_mtime_ns}:{config_hash}"
               f":text={int(keep_text)}")
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _process_scan_shard(batch, config, keep_text: bool):
    """One task per input shard: stream the shard's row groups through
    extract + signature kernels (per-process state via _signature_batch)
    and write the shard's signature Parquet atomically. Memory-bounded:
    at most one row-group batch of pages + its signatures in flight."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from ordinarydumpdeduplicator_ray.sources.pages import PIPELINE_COLUMNS
    from ordinarydumpdeduplicator_ray.stages.signatures import (
        _signature_batch,
        extract_batch,
    )

    for src, dst in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
        tmp = f"{dst}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        pf = _pq.ParquetFile(src)
        cols = [c for c in PIPELINE_COLUMNS if c in pf.schema_arrow.names]
        writer = None
        out_path = os.path.join(tmp, "part-0.parquet")
        n_rows = 0
        for rb in pf.iter_batches(batch_size=config.batch_size, columns=cols):
            t = pa.Table.from_batches([rb])
            sig = _signature_batch(extract_batch(t), config, keep_text)
            if writer is None:
                writer = _pq.ParquetWriter(out_path, sig.schema)
            writer.write_table(sig)
            n_rows += len(sig)
        if writer is None:
            # empty shard: a schema-stable 0-row file keeps the stage dir
            # uniformly readable
            empty_pages = pa.table(
                {"url": pa.array([], type=pa.string()),
                 "html": pa.array([], type=pa.binary()),
                 "text": pa.array([], type=pa.string())}
            )
            sig = _signature_batch(extract_batch(empty_pages), config, keep_text)
            _pq.write_table(sig, out_path)
        else:
            writer.close()
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(tmp, dst)
        yield pa.table({"shard": pa.array([dst]), "rows": pa.array([n_rows])})


def write_scan_sharded(
    pages_path: str,
    ckpt_dir: str,
    stage: str,
    config,
    config_hash: str,
    input_fingerprint: str,
    keep_text: bool = False,
    run_id: str | None = None,
) -> ray.data.Dataset:
    """Scan ``pages_path`` into per-shard signature checkpoints (see
    module comment), resuming shard-by-shard; writes the stage MANIFEST
    once every shard is present and returns a Dataset over the stage
    data. One Ray Data task per missing shard — parallelism = shards."""
    import functools

    import pyarrow as pa

    sdir = _stage_dir(ckpt_dir, stage)
    data_dir = os.path.join(sdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    # clear stale tmp dirs from a killed run
    for n in os.listdir(data_dir):
        if ".tmp-" in n:
            shutil.rmtree(os.path.join(data_dir, n), ignore_errors=True)

    shards = _scan_shards(pages_path)
    plan = [
        (src, os.path.join(
            data_dir,
            f"shard-{_shard_key(rel, src, config_hash, keep_text)}"))
        for src, rel in shards
    ]
    missing = [(s, d) for s, d in plan if not os.path.isdir(d)]
    t0 = time.perf_counter()
    if missing:
        work = ray.data.from_arrow(
            pa.table({"src": pa.array([s for s, _ in missing]),
                      "dst": pa.array([d for _, d in missing])})
        )
        fn = functools.partial(
            _process_scan_shard, config=config, keep_text=keep_text
        )
        # batch_size=1: one shard per task — the resume granularity
        work.map_batches(fn, batch_format="pyarrow", batch_size=1).materialize()
    wall = time.perf_counter() - t0

    # drop shard dirs no longer in the plan (input or config changed)
    planned = {os.path.basename(d) for _, d in plan}
    for n in os.listdir(data_dir):
        if n.startswith("shard-") and n not in planned:
            shutil.rmtree(os.path.join(data_dir, n), ignore_errors=True)

    partitions = []
    n_rows = 0
    for _, d in plan:
        rows = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
        n_rows += rows
        partitions.append({"file": os.path.basename(d), "rows": rows})
    man = {
        "stage": stage,
        "run_id": run_id or uuid.uuid4().hex,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "rows": n_rows,
        "wall_sec": round(wall, 3),
        "complete": True,
        "finished_at": time.time(),
        "sharded": True,
        "partitions": partitions,
    }
    with open(manifest_path(ckpt_dir, stage), "w") as f:
        json.dump(man, f, indent=1)
    return ray.data.read_parquet(data_dir)


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
