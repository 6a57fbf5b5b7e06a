"""Pages-table readers.

The reference's source is a recursive filesystem walk
(``Common/FsUtils.cs:8-27``) with per-subtree error tolerance
(``FsUtils.cs:77-109``); here the source is ``ray.data.read_parquet`` over
a pages table (file listing/splitting is Ray Data's job), with per-row
errors carried in a ``status`` column instead of exceptions.

"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

# Columns the dedup pipeline actually needs — read-side pruning: `lang`
# and any extra columns never leave storage unless requested.
PIPELINE_COLUMNS = ["url", "html", "text"]


def _clean_schema(path: str, columns: list[str] | None) -> pa.Schema | None:
    """Schema of ``path`` (file or shard directory) with key-value
    metadata stripped, pruned to ``columns``. Pandas-written Parquet
    carries a ``pandas`` metadata blob that makes ``hash(pa.Schema)``
    raise, which triggers Ray Data's 'Failed to hash the schemas'
    warning on every block-schema dedup — reading with an explicit
    metadata-free schema keeps every downstream block schema hashable.
    Returns None when no shard is found (lets read_parquet raise its own
    error)."""
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            pf = sorted(f for f in files if f.endswith(".parquet"))
            if pf:
                probe = os.path.join(root, pf[0])
                break
        else:
            return None
    try:
        schema = pq.read_schema(probe).remove_metadata()
    except Exception:
        return None
    if columns is None:
        return schema
    fields = [schema.field(c) for c in columns if c in schema.names]
    return pa.schema(fields) if len(fields) == len(columns) else None


def read_parquet_clean(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped (see
    ``_clean_schema``) and optional column pruning at the read."""
    schema = _clean_schema(path, columns)
    if schema is not None:
        return ray.data.read_parquet(path, columns=columns, schema=schema)
    return ray.data.read_parquet(path, columns=columns)


def read_pages(path: str, columns: list[str] | None = PIPELINE_COLUMNS) -> ray.data.Dataset:
    """Read a pages Parquet table (file or directory of shards), pruning
    to the pipeline columns by default."""
    return read_parquet_clean(path, columns=columns)
