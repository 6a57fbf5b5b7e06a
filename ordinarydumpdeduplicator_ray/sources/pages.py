"""Pages-table readers.

The reference's source is a recursive filesystem walk
(``Common/FsUtils.cs:8-27``) with per-subtree error tolerance
(``FsUtils.cs:77-109``); here the source is ``ray.data.read_parquet`` over
a pages table (file listing/splitting is Ray Data's job), with per-row
errors carried in a ``status`` column instead of exceptions.

Also provides the documents->pages adapter (FIXTURES.md F5) so the driver
testdata `documents` table can flow through every pages pipeline.
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


def documents_as_pages(sf_dir: str) -> ray.data.Dataset:
    """Adapt the testdata ``documents`` table to the pages shape:
    ``url = testdata://documents/{doc_id}``, no html (text-only rows)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"]
        urls = pa.array(
            [f"testdata://documents/{d}" for d in doc_id.to_pylist()], type=pa.string()
        )
        return pa.table(
            {
                "url": urls,
                "html": pa.nulls(len(batch), type=pa.binary()),
                "text": batch["text"],
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")
