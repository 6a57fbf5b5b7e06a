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


def read_pages(path: str, columns: list[str] | None = PIPELINE_COLUMNS) -> ray.data.Dataset:
    """Read a pages Parquet table (file or directory of shards), pruning
    to the pipeline columns by default."""
    return ray.data.read_parquet(path, columns=columns)
