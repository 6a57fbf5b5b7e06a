"""Multi-snapshot file-state versioning — the reference's SCD chain.

The reference keeps per-location FileState chains
(``Common/FileState.cs:7-28,67-70``) with status transitions
New/Unchanged/Modified/Removed (``Common/FileStatus.cs:5-14``), scoped to
the latest inspection per location
(``DataControllerSimple.cs:190-208,250-258``). Re-expressed Ray-Data-
first:

- ``snapshot_diff``: two pages snapshots -> per-url change status via a
  full-outer hash join on url over narrow (url, text_sha256) projections
  — CASE on sha equality, fully vectorized. The content identity is the
  extracted-text sha256 (the BlobInfo analogue), so a crawl whose html
  boilerplate changed but whose extracted text didn't is ``unchanged``,
  exactly like the reference's blob comparison.
- ``latest_pages``: a combined multi-snapshot pages table (``warc_ts``
  carries the snapshot time) -> the latest version per url, via the
  sorted-run top-1 pattern (one sort + vectorized block pass + O(blocks)
  driver merge) — the "scope to latest inspection" step that precedes
  dedup on a re-crawled corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

STATUS_NEW = "new"
STATUS_UNCHANGED = "unchanged"
STATUS_MODIFIED = "modified"
STATUS_REMOVED = "removed"


def _url_sha(pages: ray.data.Dataset, side: str) -> ray.data.Dataset:
    """pages -> (url, sha_<side> hex string). Broken rows (no text, no
    html) keep a null sha — they join and classify like any other row."""

    def project(t: pa.Table) -> pa.Table:
        e = extract_batch(t)
        shas = [
            s.hex() if s is not None else None
            for s in e["text_sha256"].to_pylist()
        ]
        return pa.table(
            {"url": e["url"], f"sha_{side}": pa.array(shas, type=pa.string())}
        )

    return pages.map_batches(project, batch_format="pyarrow")


def snapshot_diff(
    current: ray.data.Dataset,
    previous: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(current pages, previous pages) -> (url, change_status, sha_prev,
    sha_cur) with change_status in {new, unchanged, modified, removed}.

    Full-outer join on url over (url, sha) projections: a url only in
    current is ``new``, only in previous is ``removed``, in both with
    equal shas ``unchanged`` else ``modified``
    (``Common/FileStatus.cs:5-14`` transition semantics)."""
    cur = _url_sha(current, "cur").materialize()
    prev = _url_sha(previous, "prev").materialize()

    schema = pa.schema(
        [("url", pa.string()), ("sha_cur", pa.string()), ("sha_prev", pa.string())]
    )
    if cur.count() == 0 and prev.count() == 0:
        joined = ray.data.from_arrow(schema.empty_table())
    elif prev.count() == 0:
        joined = cur.map_batches(
            lambda t: t.append_column("sha_prev", pa.nulls(len(t), pa.string())),
            batch_format="pyarrow",
        )
    elif cur.count() == 0:
        joined = prev.map_batches(
            lambda t: pa.table({"url": t["url"],
                                "sha_cur": pa.nulls(len(t), pa.string()),
                                "sha_prev": t["sha_prev"]}),
            batch_format="pyarrow",
        )
    else:
        from ordinarydumpdeduplicator_ray.stages.join import _drop_empty_blocks

        joined = _drop_empty_blocks(cur).join(
            _drop_empty_blocks(prev), "full_outer",
            num_partitions=num_partitions, on=("url",),
        )

    def classify(t: pa.Table) -> pa.Table:
        has_cur = pc.is_valid(t["sha_cur"])
        has_prev = pc.is_valid(t["sha_prev"])
        same = pc.fill_null(pc.equal(t["sha_cur"], t["sha_prev"]), False)
        status = pc.if_else(
            pc.and_(has_cur, pc.invert(has_prev)), pa.scalar(STATUS_NEW),
            pc.if_else(
                pc.and_(has_prev, pc.invert(has_cur)), pa.scalar(STATUS_REMOVED),
                pc.if_else(same, pa.scalar(STATUS_UNCHANGED), pa.scalar(STATUS_MODIFIED)),
            ),
        )
        return pa.table(
            {
                "url": t["url"],
                "change_status": status,
                "sha_prev": t["sha_prev"],
                "sha_cur": t["sha_cur"],
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# latest version per url (scope-to-latest-inspection)
# ---------------------------------------------------------------------------


def _latest_block(t: pa.Table, key_cols: tuple) -> pa.Table:
    """One block sorted by (*key_cols asc, warc_ts desc) -> first row per
    key run + is_edge flags on the border runs."""
    n = len(t)
    if n == 0:
        return t.append_column("is_edge", pa.array([], type=pa.bool_()))
    diff = np.zeros(n - 1, dtype=bool)
    for c in key_cols:
        arr = np.asarray(t[c].to_pylist(), dtype=object)
        diff |= arr[1:] != arr[:-1]
    starts = np.concatenate([[0], np.flatnonzero(diff) + 1])
    top = t.take(starts)
    is_edge = np.zeros(len(starts), dtype=bool)
    is_edge[0] = True
    is_edge[-1] = True
    return top.append_column("is_edge", pa.array(is_edge))


def latest_pages(
    pages: ray.data.Dataset,
    ts_col: str = "warc_ts",
    key_cols: tuple = ("url",),
) -> ray.data.Dataset:
    """Multi-snapshot pages (key may repeat across snapshot times) ->
    the latest row per key. Sorted-run top-1: one sort on
    (*key_cols, ts desc), vectorized block pass, O(blocks) driver merge
    of block-border runs (``DataControllerSimple.cs:190-208`` — actual
    FileStates = those of the latest inspection per location).
    ``key_cols=("location", "url")`` gives the reference's per-
    DataLocation scoping over a multi-root union (``read_pages_multi``)."""
    import functools

    key_cols = tuple(key_cols)
    srt = pages.sort(
        [*key_cols, ts_col], descending=[False] * len(key_cols) + [True]
    )
    marked = srt.map_batches(
        functools.partial(_latest_block, key_cols=key_cols),
        batch_format="pyarrow", batch_size=None,
    ).materialize()
    interior = marked.filter(expr="is_edge == False").drop_columns(["is_edge"])
    edge = marked.filter(expr="is_edge == True").drop_columns(["is_edge"])
    edge_tbl = pa.concat_tables(
        list(edge.iter_batches(batch_size=1 << 20, batch_format="pyarrow")),
        promote_options="default",
    ) if edge.count() else None
    if edge_tbl is None or edge_tbl.num_rows == 0:
        return interior
    keys = [
        np.asarray(edge_tbl[c].to_pylist(), dtype=object) for c in key_cols
    ]
    ts = np.asarray(edge_tbl[ts_col].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False))
    order = np.lexsort((-ts, *reversed(keys)))
    diff = np.zeros(len(order) - 1, dtype=bool) if len(order) else np.empty(0, bool)
    for k in keys:
        diff |= k[order][1:] != k[order][:-1]
    keep = np.concatenate([[True], diff]) if len(order) else np.empty(0, bool)
    return interior.union(ray.data.from_arrow(edge_tbl.take(order[keep])))
