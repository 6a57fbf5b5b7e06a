"""CSV pages source/sink.

The third interchange format next to Parquet and JSONL (metadata
exports, spreadsheet-born blocklists and label tables arrive as CSV).
Same shape as sources/jsonl.py: sharded write, post-parse pruning,
base64 for binary columns (CSV is text-only). CSV cannot carry nested
types; reading restores binary columns, everything else keeps the
parsed scalar types.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

import base64

from ordinarydumpdeduplicator_ray.sources.jsonl import _DEFAULT_BINARY_COLS

# CSV cannot distinguish an empty field from a null — binary values
# carry a "b64:" prefix so b"" round-trips as "b64:" while null stays
# the empty field
_B64_PREFIX = "b64:"


def _encode_binary_csv(t: pa.Table, binary_cols: tuple[str, ...]) -> pa.Table:
    for c in binary_cols:
        if c not in t.column_names:
            continue
        vals = [
            _B64_PREFIX + base64.b64encode(v).decode("ascii")
            if v is not None else None
            for v in t[c].to_pylist()
        ]
        t = t.set_column(
            t.column_names.index(c), c, pa.array(vals, type=pa.string())
        )
    return t


def _decode_binary_csv(t: pa.Table, binary_cols: tuple[str, ...]) -> pa.Table:
    for c in binary_cols:
        if c not in t.column_names:
            continue
        vals = []
        for v in t[c].to_pylist():
            if v is None or v == "":
                vals.append(None)
            elif isinstance(v, str) and v.startswith(_B64_PREFIX):
                vals.append(base64.b64decode(v[len(_B64_PREFIX):]))
            else:
                # loud, not silent: an externally produced CSV whose
                # binary column isn't in this round-trip encoding would
                # otherwise null every value with no warning
                raise ValueError(
                    f"csv column {c!r} value lacks the {_B64_PREFIX!r} "
                    "binary encoding prefix; this reader only consumes "
                    "CSVs written by write_pages_csv"
                )
        t = t.set_column(
            t.column_names.index(c), c, pa.array(vals, type=pa.binary())
        )
    return t


def write_pages_csv(
    ds: ray.data.Dataset,
    path: str,
    binary_cols: tuple[str, ...] = _DEFAULT_BINARY_COLS,
) -> None:
    """Write a pages Dataset as sharded CSV (one file per block).
    Binary columns are base64 strings on disk."""
    ds.map_batches(
        lambda t: _encode_binary_csv(t, binary_cols), batch_format="pyarrow"
    ).write_csv(path)


def read_pages_csv(
    path: str,
    columns: list[str] | None = None,
    binary_cols: tuple[str, ...] = _DEFAULT_BINARY_COLS,
) -> ray.data.Dataset:
    """Read a CSV pages corpus (file or directory of shards)."""
    ds = ray.data.read_csv(path)

    def post(t: pa.Table) -> pa.Table:
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        return _decode_binary_csv(t, binary_cols)

    return ds.map_batches(post, batch_format="pyarrow")
