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


def read_pages(
    path: "str | list[str] | dict[str, str]",
    columns: list[str] | None = PIPELINE_COLUMNS,
) -> ray.data.Dataset:
    """Read a pages Parquet table (file or directory of shards), pruning
    to the pipeline columns by default. A list/dict of roots reads EVERY
    root and unions them with a ``location`` column — the reference's
    multiple registered ``DataLocation`` roots
    (``Common/DataLocation.cs:10-22``, ``DataControllerSimple.cs:105-159``);
    see ``read_pages_multi``."""
    if isinstance(path, (list, dict)):
        return read_pages_multi(path, columns=columns)
    return read_parquet_clean(path, columns=columns)


def read_pages_multi(
    roots: "list[str] | dict[str, str]",
    columns: list[str] | None = PIPELINE_COLUMNS,
    location_col: str = "location",
) -> ray.data.Dataset:
    """Union of several pages roots, each row tagged with its root's
    location name — the reference registers many scan roots and scopes
    every query to them (``DataControllerSimple.cs:105-159``,
    ``Common/DataLocation.cs:10-22``). ``roots`` is
    ``{location_name: path}`` or a list of paths (location = the path).
    The tag is a constant per root, appended lazily per batch (a
    dictionary-encodable column, ~0 bytes at rest); downstream stages
    scope per location by including ``location_col`` in their keys
    (e.g. ``latest_pages(ds, key_cols=("location", "url"))``)."""
    items = (
        list(roots.items()) if isinstance(roots, dict) else [(p, p) for p in roots]
    )
    if not items:
        raise ValueError("read_pages_multi needs at least one root")

    def tag(loc: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                location_col, pa.array([loc] * len(t), type=pa.string())
            )

        return fn

    parts = []
    for loc, p in items:
        parts.append(
            read_parquet_clean(p, columns=columns).map_batches(
                tag(loc), batch_format="pyarrow"
            )
        )
    ds = parts[0]
    return ds.union(*parts[1:]) if len(parts) > 1 else ds
