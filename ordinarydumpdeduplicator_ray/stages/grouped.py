"""Sorted-run grouped aggregation — the single-shuffle replacement for
``groupby().aggregate()`` on high-cardinality keys.

Ray's sort-based aggregate pays per-group Python overhead; with ~one
group per row (content hashes, candidate pairs) that dominates wall
time. The pattern here (shared with ``stages/candidates.py``): one
global ``sort(key)``, then a map-only pass over whole sorted blocks that
finalizes interior runs vectorized (``np.add.reduceat`` /
``np.minimum.reduceat``) and defers the at-most-two edge runs per block
to a tiny driver-side merge.

Used for the reference's core grouping (group FileStates by BlobInfo,
``DataControllerSimple.cs:247-304``) over ``text_sha256``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_PARTIAL_FIELDS = [
    ("key", pa.binary()),
    ("n", pa.int64()),
    ("min_url", pa.string()),
    ("min_nb", pa.int64()),
    ("is_edge", pa.bool_()),
]
_PARTIAL_SCHEMA = pa.schema(_PARTIAL_FIELDS)


def _block_partials(t: pa.Table) -> pa.Table:
    """One sorted block of (text_sha256, url, n_bytes) -> one partial row
    per run. Rows are sorted by (key, url), so min url = run head."""
    n = len(t)
    if n == 0:
        return _PARTIAL_SCHEMA.empty_table()
    keys = t["text_sha256"].to_pylist()
    urls = t["url"].to_pylist()
    nbs = np.asarray(t["n_bytes"].combine_chunks().to_numpy(zero_copy_only=False))
    change = np.fromiter(
        (keys[i] != keys[i - 1] for i in range(1, n)), dtype=bool, count=n - 1
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    counts = ends - starts
    min_nb = np.minimum.reduceat(nbs, starts)
    is_edge = np.zeros(len(starts), dtype=bool)
    is_edge[0] = True
    is_edge[-1] = True
    return pa.table(
        {
            "key": pa.array([keys[s] for s in starts], type=pa.binary()),
            "n": pa.array(counts, type=pa.int64()),
            "min_url": pa.array([urls[s] for s in starts], type=pa.string()),
            "min_nb": pa.array(min_nb, type=pa.int64()),
            "is_edge": pa.array(is_edge),
        }
    )


def exact_group_aggregates(valid_signatures: ray.data.Dataset) -> ray.data.Dataset:
    """(url, text_sha256, n_bytes) rows -> one row per content group:
    (text_sha256, n_copies, canonical_url, n_bytes). ONE sort + map +
    driver merge of <= 2 partials per sorted block."""
    proj = valid_signatures.map_batches(
        lambda t: t.select(["text_sha256", "url", "n_bytes"]),
        batch_format="pyarrow",
    )
    srt = proj.sort(["text_sha256", "url"]).materialize()
    partials = srt.map_batches(
        _block_partials, batch_format="pyarrow", batch_size=None
    ).materialize()

    interior = partials.map_batches(
        lambda t: t.filter(pc.invert(t["is_edge"])).drop_columns(["is_edge"]),
        batch_format="pyarrow",
    )
    edge_rows = partials.map_batches(
        lambda t: t.filter(t["is_edge"]).drop_columns(["is_edge"]),
        batch_format="pyarrow",
    ).take_all()

    merged: dict[bytes, list] = {}
    for r in edge_rows:
        cur = merged.get(r["key"])
        if cur is None:
            merged[r["key"]] = [r["n"], r["min_url"], r["min_nb"]]
        else:
            cur[0] += r["n"]
            cur[1] = min(cur[1], r["min_url"])
            cur[2] = min(cur[2], r["min_nb"])
    edge_tbl = pa.table(
        {
            "key": pa.array(list(merged.keys()), type=pa.binary()),
            "n": pa.array([v[0] for v in merged.values()], type=pa.int64()),
            "min_url": pa.array([v[1] for v in merged.values()], type=pa.string()),
            "min_nb": pa.array([v[2] for v in merged.values()], type=pa.int64()),
        }
    )
    out = interior
    if edge_tbl.num_rows:
        out = out.union(ray.data.from_arrow(edge_tbl))
    return out.map_batches(
        lambda t: pa.table(
            {
                "text_sha256": t["key"],
                "n_copies": t["n"],
                "canonical_url": t["min_url"],
                "n_bytes": t["min_nb"],
            }
        ),
        batch_format="pyarrow",
    )
