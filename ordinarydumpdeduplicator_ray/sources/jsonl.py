"""JSONL pages source/sink.

Web-scale text corpora commonly interchange as JSON Lines (Dolma,
RedPajama, Common-Crawl-derived dumps), so the engine reads and writes
it natively alongside Parquet. Parquet stays the scale format — it
prunes columns and row groups AT the read, which JSONL structurally
cannot (every byte of every line is parsed before a column can be
dropped); the readers below prune immediately after parse so nothing
extra enters the object store, and pipelines that loop over the same
corpus should convert to Parquet once.

JSON has no binary type: binary columns (html payloads) are base64-
encoded strings on the wire. The encode/decode pair is symmetric and
None-safe; it runs only in these conversion stages, never in the hot
path.

The reference ingests only a filesystem walk (``Common/FsUtils.cs:8-27``);
alternate serialization formats are north-rule surface.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import ray.data

_DEFAULT_BINARY_COLS = ("html",)


def _encode_binary(t: pa.Table, binary_cols: tuple[str, ...]) -> pa.Table:
    for c in binary_cols:
        if c not in t.column_names:
            continue
        vals = [
            base64.b64encode(v).decode("ascii") if v is not None else None
            for v in t[c].to_pylist()
        ]
        t = t.set_column(
            t.column_names.index(c), c, pa.array(vals, type=pa.string())
        )
    return t


def _decode_binary(t: pa.Table, binary_cols: tuple[str, ...]) -> pa.Table:
    for c in binary_cols:
        if c not in t.column_names:
            continue
        vals = [
            base64.b64decode(v) if v is not None else None
            for v in t[c].to_pylist()
        ]
        t = t.set_column(
            t.column_names.index(c), c, pa.array(vals, type=pa.binary())
        )
    return t


def write_pages_jsonl(
    ds: ray.data.Dataset,
    path: str,
    binary_cols: tuple[str, ...] = _DEFAULT_BINARY_COLS,
) -> None:
    """Write a pages Dataset as sharded JSONL (one file per block —
    the resumable-output shape, never one giant file). Binary columns
    are base64 strings on disk; read them back with
    ``read_pages_jsonl`` and the same ``binary_cols``."""
    ds.map_batches(
        lambda t: _encode_binary(t, binary_cols), batch_format="pyarrow"
    ).write_json(path)


def read_pages_jsonl(
    path: str,
    columns: list[str] | None = None,
    binary_cols: tuple[str, ...] = _DEFAULT_BINARY_COLS,
) -> ray.data.Dataset:
    """Read a JSONL pages corpus (file or directory of shards).
    ``columns`` prunes immediately after parse (JSONL cannot prune at
    the read itself); ``binary_cols`` are base64-decoded back to Arrow
    binary."""
    ds = ray.data.read_json(path)

    def post(t: pa.Table) -> pa.Table:
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        return _decode_binary(t, binary_cols)

    return ds.map_batches(post, batch_format="pyarrow")
