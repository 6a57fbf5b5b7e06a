"""Host-prefix rollups — the reference's directory tree of duplicates
(``DuplicateReport.GroupDuplicatesByDirectories``,
``DuplicateReport.cs:74-142``) re-expressed relationally: urls roll up to
their host (the "directory"), aggregates per host, driver assembles any
tree from the (small) aggregated result."""

from __future__ import annotations

from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ordinarydumpdeduplicator_ray.schemas import ACTION_KEEP
from ordinarydumpdeduplicator_ray.stages.join import inner_join


def explode_url_prefix_levels(urls: pa.ChunkedArray | pa.Array) -> tuple:
    """Vectorized url -> every path-segment prefix (the hierarchical
    rollup explode, ``DuplicateReport.cs:114-203``): for
    ``scheme://host/a/b`` emits level 1 ``scheme://host``, level 2
    ``scheme://host/a``, level 3 the full url. No per-row Python — the
    emission is numpy byte-gather over the Arrow string buffers: every
    prefix ends at a ``/`` after the scheme (or at end-of-url), so the
    output strings are slices of the input data buffer located with two
    searchsorted/arange passes.

    Returns ``(row_index, level, prefix_array)`` — the caller repeats its
    payload columns with ``row_index``."""
    arr = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    n = len(arr)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                pa.array([], type=pa.string()))
    if arr.null_count:
        raise ValueError("null urls in prefix explode")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    # every '/' in the data buffer, assigned to its row
    slash = np.flatnonzero(buf[offs[0] : offs[-1]] == ord("/")) + offs[0]
    row_of = np.searchsorted(ends, slash, side="right")
    # drop the two scheme slashes ('://') — the first two per row.
    # A batch with NO slash at all (slash-free/malformed urls) must
    # short-circuit: len(slash)-1 == -1 would otherwise index the empty
    # row_of from the end and crash
    first_two = np.zeros(len(slash), dtype=bool)
    if len(slash):
        seen_start = np.searchsorted(row_of, np.arange(n), side="left")
        for k in (0, 1):
            pos = seen_start + k
            valid = (pos < len(slash)) & (
                row_of[np.minimum(pos, len(slash) - 1)] == np.arange(n)
            )
            first_two[pos[valid]] = True
    path_slash = slash[~first_two]
    path_row = row_of[~first_two]
    # cuts per emission: each path slash ends one prefix; the full url
    # ends the deepest level. Emissions stay grouped by row and ordered
    # shallow->deep because slash positions are ascending within a row.
    cut_ends = np.concatenate([path_slash, ends])
    cut_rows = np.concatenate([path_row, np.arange(n, dtype=np.int64)])
    order = np.lexsort((cut_ends, cut_rows))
    cut_ends, cut_rows = cut_ends[order], cut_rows[order]
    per_row = np.bincount(cut_rows, minlength=n)
    lvl_end = np.cumsum(per_row)
    level = np.arange(len(cut_rows), dtype=np.int64) - np.repeat(
        lvl_end - per_row, per_row
    ) + 1
    # gather the prefix bytes: emission i spans [starts[row], cut_ends[i])
    abs_start = starts[cut_rows]
    lens = cut_ends - abs_start
    out_ends = np.cumsum(lens)
    out_starts = out_ends - lens
    idx = (np.arange(int(out_ends[-1]) if len(out_ends) else 0, dtype=np.int64)
           - np.repeat(out_starts, lens) + np.repeat(abs_start, lens))
    data = buf[idx]
    if len(out_ends) and int(out_ends[-1]) >= 2**31:
        # int32 StringArray offsets would silently wrap: refuse loud.
        # ~2 GiB of exploded prefixes in ONE block means the upstream
        # block size is mis-tuned — repartition finer rather than emit
        # corrupt offsets
        raise ValueError(
            "explode_url_prefix_levels: block explodes past 2 GiB of "
            "prefix bytes; repartition the input into smaller blocks"
        )
    new_offs = np.concatenate([[0], out_ends]).astype(np.int32)
    prefix = pa.StringArray.from_buffers(
        len(cut_rows), pa.py_buffer(new_offs.tobytes()), pa.py_buffer(data.tobytes())
    )
    return cut_rows, level, prefix


def add_host(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Append a ``host`` column parsed from the url (M7 path-algebra
    analogue, FileSystemHelper.cs:19-68)."""

    def parse(t: pa.Table) -> pa.Table:
        hosts = [urlparse(u).netloc or "(none)" for u in t[url_col].to_pylist()]
        return t.append_column("host", pa.array(hosts, type=pa.string()))

    return ds.map_batches(parse, batch_format="pyarrow")


def host_dup_rollup(
    actions: ray.data.Dataset,
    signatures: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-host duplicate footprint: n_dup_pages (isolate/delete rows) and
    dup_bytes. Sorted descending by dup_bytes — the report-table ordering
    of the reference (DuplicatesViewController.cs:31-59)."""
    dups = actions.filter(expr=f"action != '{ACTION_KEEP}'")
    sizes = signatures.map_batches(
        lambda t: t.select(["url", "n_bytes"]), batch_format="pyarrow"
    )
    joined = inner_join(
        dups, sizes, on=("url",), num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("url", pa.string()), ("action", pa.string()),
             ("group_key", pa.string()), ("n_bytes", pa.int64())]
        ),
    )
    rolled = (
        add_host(joined)
        .groupby("host")
        .aggregate(Count(alias_name="n_dup_pages"), Sum("n_bytes", alias_name="dup_bytes"))
    )
    return rolled.sort("dup_bytes", descending=True)
