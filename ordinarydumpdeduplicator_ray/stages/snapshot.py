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
            {
                "url": e["url"],
                f"sha_{side}": pa.array(shas, type=pa.string()),
                # presence marker: a BROKEN row (null sha) is still
                # PRESENT — classification must not read absence off
                # the sha's nullness after the outer join
                f"present_{side}": pa.array([True] * len(e), type=pa.bool_()),
            }
        )

    return pages.map_batches(project, batch_format="pyarrow")


def snapshot_diff(
    current: ray.data.Dataset,
    previous: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(current pages, previous pages) -> (url, change_status, sha_prev,
    sha_cur) with change_status in {new, unchanged, modified, removed}.

    Full-outer join on url over (url, sha, present) projections: a url
    only in current is ``new``, only in previous is ``removed``, in
    both with equal shas ``unchanged`` else ``modified``
    (``Common/FileStatus.cs:5-14`` transition semantics). Presence is
    read off the explicit marker, NOT the sha's nullness — a BROKEN
    page (null sha) present in both snapshots is ``unchanged``
    (broken-vs-ok is ``modified``), matching ``file_state_chain``'s
    null-safe comparison."""
    cur = _url_sha(current, "cur").materialize()
    prev = _url_sha(previous, "prev").materialize()

    schema = pa.schema(
        [("url", pa.string()),
         ("sha_cur", pa.string()), ("present_cur", pa.bool_()),
         ("sha_prev", pa.string()), ("present_prev", pa.bool_())]
    )
    if cur.count() == 0 and prev.count() == 0:
        joined = ray.data.from_arrow(schema.empty_table())
    elif prev.count() == 0:
        def pad_prev(t: pa.Table) -> pa.Table:
            t = t.append_column("sha_prev", pa.nulls(len(t), pa.string()))
            return t.append_column("present_prev", pa.nulls(len(t), pa.bool_()))

        joined = cur.map_batches(pad_prev, batch_format="pyarrow")
    elif cur.count() == 0:
        joined = prev.map_batches(
            lambda t: pa.table({"url": t["url"],
                                "sha_cur": pa.nulls(len(t), pa.string()),
                                "present_cur": pa.nulls(len(t), pa.bool_()),
                                "sha_prev": t["sha_prev"],
                                "present_prev": t["present_prev"]}),
            batch_format="pyarrow",
        )
    else:
        from ordinarydumpdeduplicator_ray.stages.join import _drop_empty_blocks

        joined = _drop_empty_blocks(cur).join(
            _drop_empty_blocks(prev), "full_outer",
            num_partitions=num_partitions, on=("url",),
        )

    def classify(t: pa.Table) -> pa.Table:
        has_cur = pc.fill_null(t["present_cur"], False)
        has_prev = pc.fill_null(t["present_prev"], False)
        # null-safe sha equality: both-broken (null == null) is SAME
        same = pc.or_(
            pc.fill_null(pc.equal(t["sha_cur"], t["sha_prev"]), False),
            pc.and_(pc.is_null(t["sha_cur"]), pc.is_null(t["sha_prev"])),
        )
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


# ---------------------------------------------------------------------------
# N-snapshot FileState history chain
# ---------------------------------------------------------------------------

CHAIN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("snap_id", pa.int32()),
        ("status", pa.string()),      # new | unchanged | modified | removed
        ("sha", pa.string()),         # content sha at snap_id (null: removed)
        ("sha_prev", pa.string()),    # previous version's sha (null: new)
    ]
)


def _chain_kernel(t: pa.Table, n_snaps: int) -> pa.Table:
    """(url, snap_id, sha) rows sorted by (url, snap_id), COMPLETE url
    runs only -> FileState chain rows. Vectorized: one shifted-compare
    pass derives per-row status; synthesized ``removed`` rows come from
    gap positions (present at s-1-ish, absent at s) and run ends.

    Semantics per url (mirrors chaining ``snapshot_diff`` over every
    consecutive snapshot pair, ``Common/FileState.cs:14,67-70`` /
    ``Common/FileStatus.cs:5-14``):

    - first presence -> ``new``
    - present at k and k-1 -> ``unchanged``/``modified`` by sha equality
      (null shas — broken rows — compare equal to each other)
    - absent at k after presence at k-1 -> one ``removed`` row at k
    - reappearance after a gap -> ``new`` again
    """
    n = len(t)
    if n == 0:
        return CHAIN_SCHEMA.empty_table()
    urls = np.asarray(t["url"].to_pylist(), dtype=object)
    snaps = np.asarray(t["snap_id"].to_pylist(), dtype=np.int64)
    shas = np.asarray(t["sha"].to_pylist(), dtype=object)

    same = np.concatenate([[False], urls[1:] == urls[:-1]])
    prev_snap = np.concatenate([[-10], snaps[:-1]])
    prev_sha = np.concatenate([[None], shas[:-1]])
    contig = same & (snaps == prev_snap + 1)
    eq = np.concatenate([[False], shas[1:] == shas[:-1]]) & contig

    status = np.where(
        contig, np.where(eq, STATUS_UNCHANGED, STATUS_MODIFIED), STATUS_NEW
    )
    base = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "snap_id": pa.array(snaps.astype(np.int32), type=pa.int32()),
        "status": pa.array(status.astype(object), type=pa.string()),
        "sha": pa.array(shas, type=pa.string()),
        "sha_prev": pa.array(np.where(contig, prev_sha, None), type=pa.string()),
    })

    # synthesized removed rows: after a gap, and after the final
    # presence when the timeline continues past it
    gap = np.flatnonzero(same & (snaps > prev_snap + 1))
    run_last = np.concatenate([~same[1:], [True]])
    tail = np.flatnonzero(run_last & (snaps < n_snaps - 1))
    rem_urls = np.concatenate([urls[gap], urls[tail]])
    rem_snaps = np.concatenate([prev_snap[gap] + 1, snaps[tail] + 1])
    rem_prev = np.concatenate([prev_sha[gap], shas[tail]])
    if len(rem_urls) == 0:
        return base
    removed = pa.table({
        "url": pa.array(rem_urls, type=pa.string()),
        "snap_id": pa.array(rem_snaps.astype(np.int32), type=pa.int32()),
        "status": pa.array([STATUS_REMOVED] * len(rem_urls), type=pa.string()),
        "sha": pa.nulls(len(rem_urls), type=pa.string()),
        "sha_prev": pa.array(rem_prev, type=pa.string()),
    })
    return pa.concat_tables([base, removed])


def file_state_chain(
    snapshots: list[ray.data.Dataset],
) -> ray.data.Dataset:
    """N chronological pages snapshots -> the full per-url FileState
    history chain — the reference's arbitrary-length per-file version
    chain (``Common/FileState.cs:14,67-70``), not just the prev→cur
    pair ``snapshot_diff`` covers.

    Ray-Data-first: each snapshot projects to (url, snap_id, sha) via
    the shared extract kernel, the union sorts ONCE on (url, snap_id),
    and each sorted block emits chain rows for its interior url runs
    vectorized; only the ≤2 border runs per block (a url run may span
    blocks) are reconciled driver-side — O(blocks x N) driver rows,
    never the corpus. Scales as one narrow-column sort of
    sum(|snapshots|) rows."""
    n_snaps = len(snapshots)
    if n_snaps == 0:
        return ray.data.from_arrow(CHAIN_SCHEMA.empty_table())

    def project(i: int):
        def fn(t: pa.Table) -> pa.Table:
            e = extract_batch(t)
            shas = [
                s.hex() if s is not None else None
                for s in e["text_sha256"].to_pylist()
            ]
            return pa.table({
                "url": e["url"],
                "snap_id": pa.array([i] * len(e), type=pa.int32()),
                "sha": pa.array(shas, type=pa.string()),
            })
        return fn

    unioned = snapshots[0].map_batches(project(0), batch_format="pyarrow")
    for i in range(1, n_snaps):
        unioned = unioned.union(
            snapshots[i].map_batches(project(i), batch_format="pyarrow")
        )
    return file_state_chain_projected(unioned, n_snaps)


def file_state_chain_projected(
    rows: ray.data.Dataset, n_snaps: int
) -> ray.data.Dataset:
    """Chain over pre-projected (url, snap_id:int32, sha) rows — the
    entry point for callers that derive every snapshot from ONE read
    of a base table (a fused projection saves N-1 source scans)."""
    srt = rows.sort(["url", "snap_id"])

    def block(t: pa.Table) -> pa.Table:
        n = len(t)
        out_schema = pa.schema(
            list(CHAIN_SCHEMA) + [pa.field("is_edge", pa.bool_())]
        )
        if n == 0:
            return out_schema.empty_table()
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        bounds = np.concatenate([[0], np.flatnonzero(urls[1:] != urls[:-1]) + 1, [n]])
        # interior = complete runs strictly inside the block; the first
        # and last run may continue into neighboring blocks
        if len(bounds) <= 3:  # 0, 1 or 2 runs: everything is border
            interior = CHAIN_SCHEMA.empty_table()
            edge_raw = t
        else:
            lo, hi = int(bounds[1]), int(bounds[-2])
            interior = _chain_kernel(t.slice(lo, hi - lo), n_snaps)
            edge_raw = pa.concat_tables([t.slice(0, lo), t.slice(hi)])
        interior = interior.append_column(
            "is_edge", pa.array([False] * len(interior), type=pa.bool_()))
        # border rows ride through RAW (url, snap_id, sha) in the chain
        # schema: sha_prev carries the raw sha, status is a marker
        edge = pa.table({
            "url": edge_raw["url"],
            "snap_id": edge_raw["snap_id"],
            "status": pa.array(["__raw__"] * len(edge_raw), type=pa.string()),
            "sha": edge_raw["sha"],
            "sha_prev": pa.nulls(len(edge_raw), type=pa.string()),
            "is_edge": pa.array([True] * len(edge_raw), type=pa.bool_()),
        })
        return pa.concat_tables([interior, edge])

    marked = srt.map_batches(
        block, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = marked.filter(expr="is_edge == False").drop_columns(["is_edge"])
    edge_batches = list(
        marked.filter(expr="is_edge == True")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    edge_tbl = pa.concat_tables(
        edge_batches, promote_options="default"
    ) if edge_batches else None
    if edge_tbl is None or edge_tbl.num_rows == 0:
        return interior
    raw = pa.table({
        "url": edge_tbl["url"],
        "snap_id": edge_tbl["snap_id"],
        "sha": edge_tbl["sha"],
    })
    order = pc.sort_indices(
        raw, sort_keys=[("url", "ascending"), ("snap_id", "ascending")]
    )
    merged = _chain_kernel(raw.take(order), n_snaps)
    return interior.union(ray.data.from_arrow(merged))
