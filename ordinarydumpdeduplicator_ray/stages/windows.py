"""Windowed / grouped-top-1 operators via the sorted-run pattern.

Both operators here previously ran as ``groupby().map_groups`` — one
Python call per user, which at ~1 group per few rows is the per-group
overhead the sorted-run machinery (``stages/grouped.py``,
``stages/candidates.py``) exists to avoid. The shared shape: ONE global
sort, a map-only pass that finalizes interior key-runs fully vectorized,
and a tiny driver-side merge of the at-most-two edge runs per sorted
block (O(blocks), independent of data size).

- ``last_event_per_user``: grouped top-1 — the reference's
  GetLastFileState / latest-inspection selection
  (``DataControllerSimple.cs:228-236,190-208``).
- ``sessionize_events``: 30-min-inactivity-gap sessionization, a
  streaming-window operator the Dataset API lacks; fragments of a user's
  run that straddle sorted-block borders carry (first/last ts,
  first/last session size) partials so border sessions merge exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _run_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Starts/ends of equal-key runs in a sorted key array (any dtype
    with != semantics — int64, string/object). The ONE run-bounds
    kernel: pack.py and asof.py's scans call this rather than clone
    it."""
    n = len(keys)
    starts = np.concatenate([[0], np.flatnonzero(keys[1:] != keys[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])
    return starts, ends


# ---------------------------------------------------------------------------
# grouped top-1
# ---------------------------------------------------------------------------

_TOP1_OUT = ["user_id", "last_ts", "last_event_type", "last_event_id"]


def _top1_block(t: pa.Table) -> pa.Table:
    """One block sorted by (user_id asc, ts desc, event_id desc) ->
    the first row of every user run + an is_edge flag on the first and
    last run (they may continue in neighboring blocks)."""
    n = len(t)
    empty = pa.schema(
        [(c, f.type) for c, f in zip(
            _TOP1_OUT,
            [t.schema.field("user_id"), t.schema.field("ts"),
             t.schema.field("event_type"), t.schema.field("event_id")],
        )] + [("is_edge", pa.bool_())]
    ).empty_table()
    if n == 0:
        return empty
    users = np.asarray(t["user_id"].combine_chunks().to_numpy(zero_copy_only=False))
    starts, _ = _run_bounds(users)
    top = t.take(starts)
    is_edge = np.zeros(len(starts), dtype=bool)
    is_edge[0] = True
    is_edge[-1] = True
    return pa.table(
        {
            "user_id": top["user_id"],
            "last_ts": top["ts"],
            "last_event_type": top["event_type"],
            "last_event_id": top["event_id"],
            "is_edge": pa.array(is_edge),
        }
    )


def last_event_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """events(user_id, ts, event_type, event_id) -> one row per user with
    the latest event (ties on ts broken by max event_id). ONE sort +
    vectorized per-block pass + O(blocks) driver merge."""
    srt = events.sort(
        ["user_id", "ts", "event_id"], descending=[False, True, True]
    )
    marked = srt.map_batches(
        _top1_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = marked.filter(expr="is_edge == False").drop_columns(["is_edge"])
    edge_rows = marked.filter(expr="is_edge == True").drop_columns(["is_edge"])
    edge_tbl = pa.concat_tables(
        list(edge_rows.iter_batches(batch_size=1 << 20, batch_format="pyarrow")),
        promote_options="default",
    ) if edge_rows.count() else None
    if edge_tbl is None or edge_tbl.num_rows == 0:
        return interior
    # per user keep max (ts, event_id) — tiny: <= 2 rows per sorted block
    uid = np.asarray(edge_tbl["user_id"].to_numpy(zero_copy_only=False))
    ts = np.asarray(edge_tbl["last_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
    eid = np.asarray(edge_tbl["last_event_id"].to_numpy(zero_copy_only=False))
    order = np.lexsort((-eid, -ts, uid))
    keep_first = np.concatenate([[True], uid[order][1:] != uid[order][:-1]])
    merged = edge_tbl.take(order[keep_first])
    return interior.union(ray.data.from_arrow(merged))


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

_SESS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_sessions", pa.int64()),
        ("max_session_events", pa.int64()),
        ("is_edge", pa.bool_()),
        ("first_ts", pa.int64()),
        ("last_ts", pa.int64()),
        ("first_sess", pa.int64()),
        ("last_sess", pa.int64()),
    ]
)


def _make_sess_block(gap_us: int):
    def block(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _SESS_SCHEMA.empty_table()
        users = np.asarray(t["user_id"].combine_chunks().to_numpy(zero_copy_only=False))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False))
        run_starts, run_ends = _run_bounds(users)
        # session boundary: user change OR inactivity gap
        new_user = users[1:] != users[:-1]
        big_gap = (ts[1:] - ts[:-1]) > gap_us
        sess_starts = np.concatenate([[0], np.flatnonzero(new_user | big_gap) + 1])
        sess_sizes = np.diff(np.concatenate([sess_starts, [n]]))
        # run index of each session (sessions never span runs)
        sess_run = np.searchsorted(run_starts, sess_starts, side="right") - 1
        n_runs = len(run_starts)
        n_sessions = np.bincount(sess_run, minlength=n_runs)
        # per-run max session size: sessions of one run are contiguous
        run_first_sess = np.searchsorted(sess_run, np.arange(n_runs), side="left")
        max_sess = np.maximum.reduceat(sess_sizes, run_first_sess)
        first_sess = sess_sizes[run_first_sess]
        last_sess_idx = np.concatenate([run_first_sess[1:], [len(sess_sizes)]]) - 1
        last_sess = sess_sizes[last_sess_idx]
        is_edge = np.zeros(n_runs, dtype=bool)
        is_edge[0] = True
        is_edge[-1] = True
        return pa.table(
            {
                "user_id": pa.array(users[run_starts], type=pa.int64()),
                "n_events": pa.array(run_ends - run_starts, type=pa.int64()),
                "n_sessions": pa.array(n_sessions, type=pa.int64()),
                "max_session_events": pa.array(max_sess, type=pa.int64()),
                "is_edge": pa.array(is_edge),
                "first_ts": pa.array(ts[run_starts], type=pa.int64()),
                "last_ts": pa.array(ts[run_ends - 1], type=pa.int64()),
                "first_sess": pa.array(first_sess, type=pa.int64()),
                "last_sess": pa.array(last_sess, type=pa.int64()),
            }
        )

    return block


def _merge_user_fragments(frags: list[dict], gap_us: int) -> tuple[int, int, int]:
    """Fragments of one user's sorted run (ordered by first_ts) ->
    (n_events, n_sessions, max_session_events). Border sessions merge
    when the inter-fragment gap is within the threshold."""
    f0 = frags[0]
    n_events = f0["n_events"]
    n_sessions = f0["n_sessions"]
    max_sess = f0["max_session_events"]
    trailing = f0["last_sess"]  # size of the current trailing session
    last_ts = f0["last_ts"]
    for f in frags[1:]:
        n_events += f["n_events"]
        if f["first_ts"] - last_ts <= gap_us:
            bridged = trailing + f["first_sess"]
            n_sessions += f["n_sessions"] - 1
            max_sess = max(max_sess, bridged, f["max_session_events"])
            trailing = bridged if f["n_sessions"] == 1 else f["last_sess"]
        else:
            n_sessions += f["n_sessions"]
            max_sess = max(max_sess, f["max_session_events"])
            trailing = f["last_sess"]
        last_ts = f["last_ts"]
    return n_events, n_sessions, max(max_sess, trailing)


def sessionize_events(
    events: ray.data.Dataset, gap_minutes: int = 30
) -> ray.data.Dataset:
    """events(user_id, ts) -> (user_id, n_events, n_sessions,
    max_session_events) with a ``gap_minutes``-inactivity session
    boundary. ONE sort + vectorized per-block session detection +
    O(blocks) driver merge of block-border fragments."""
    gap_us = gap_minutes * 60 * 1_000_000
    srt = events.sort(["user_id", "ts"])
    partials = srt.map_batches(
        _make_sess_block(gap_us), batch_format="pyarrow", batch_size=None
    ).materialize()
    out_cols = ["user_id", "n_events", "n_sessions", "max_session_events"]
    interior = partials.filter(expr="is_edge == False").map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow"
    )
    edge_rows = partials.filter(expr="is_edge == True").take_all()
    if not edge_rows:
        return interior
    by_user: dict[int, list[dict]] = {}
    for r in edge_rows:
        by_user.setdefault(r["user_id"], []).append(r)
    uids, nev, nse, mxs = [], [], [], []
    for uid, frags in by_user.items():
        frags.sort(key=lambda r: r["first_ts"])
        e, s, m = _merge_user_fragments(frags, gap_us)
        uids.append(uid)
        nev.append(e)
        nse.append(s)
        mxs.append(m)
    merged = pa.table(
        {
            "user_id": pa.array(uids, type=pa.int64()),
            "n_events": pa.array(nev, type=pa.int64()),
            "n_sessions": pa.array(nse, type=pa.int64()),
            "max_session_events": pa.array(mxs, type=pa.int64()),
        }
    )
    return interior.union(ray.data.from_arrow(merged))
