"""As-of join and per-key row caps via an ordered-block scan.

Ray Data has no as-of / inequality join and no windowed rank, and the
``groupby().map_groups`` route pays one Python call per key (the
per-group overhead ``stages/windows.py`` documents as pathological at
~1 group per few rows). Both operators here instead run the repo's
sorted-block shape taken one step further:

1. ONE global sort co-locates each key's rows contiguously in block
   order (the only shuffle).
2. A summary pass over the materialized sorted blocks extracts O(1)
   state per block (the block's first/last key plus the tiny fact the
   scan needs: last matched right row / row count of the last run).
3. The driver folds the summaries in block order into a per-block
   incoming carry — O(blocks) work on O(1)-sized records, independent
   of data size.
4. A process pass re-maps each block with its carry and emits output
   rows; all per-row work is vectorized numpy/Arrow.

Passes 2 and 4 are raw ``@ray.remote`` tasks over the sorted Dataset's
own block refs (zero-copy object-store reads, no extra shuffle) because
``map_batches`` cannot hand a block its position in the sorted order —
this is the documented "shared ordered state" escape hatch. Partitioning
assumption: a key's rows are contiguous across at most a handful of
blocks; a single key spanning many blocks degrades only the O(blocks)
driver fold, never ships row data to the driver.

Reference parity: the as-of shape generalizes the reference's
latest-state-per-location selection (``DataControllerSimple.cs:228-236``)
from "latest overall" to "latest at or before each probe timestamp".
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ordinarydumpdeduplicator_ray.stages.windows import _run_bounds


def _sorted_block_refs(ds: ray.data.Dataset) -> list:
    """Block refs of a materialized Dataset in dataset order, empty
    blocks skipped."""
    return [
        r
        for bundle in ds.iter_internal_ref_bundles()
        for r, m in bundle.blocks
        if m.num_rows is None or m.num_rows > 0
    ]


def _as_table(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_batches([block])


def _ordered_block_scan(
    sorted_ds: ray.data.Dataset,
    summarize: Callable[[pa.Table], dict],
    fold: Callable[[dict | None, dict], dict | None],
    process: Callable[[pa.Table, dict | None], pa.Table],
) -> ray.data.Dataset:
    """Run ``process(block, carry)`` over the blocks of an
    already-sorted, materialized Dataset, where ``carry`` for block k is
    ``fold`` applied over the summaries of blocks 0..k-1 in order
    (carry for block 0 is None). Returns the processed Dataset."""
    refs = _sorted_block_refs(sorted_ds)
    if not refs:
        return sorted_ds

    summarize_t = ray.remote(num_returns=1)(
        lambda blk: summarize(_as_table(blk))
    )
    process_t = ray.remote(num_returns=1)(
        lambda blk, carry: process(_as_table(blk), carry)
    )

    summaries = ray.get([summarize_t.remote(r) for r in refs])
    carries: list[dict | None] = []
    carry: dict | None = None
    for s in summaries:
        carries.append(carry)
        carry = fold(carry, s)
    out_refs = [process_t.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: tuple[str, str],
    on: tuple[str, str],
    left_cols: list[str],
    right_cols: list[str],
    tie: tuple[str, str],
) -> ray.data.Dataset:
    """Left as-of join: for every left row, attach the right row with
    the same ``by`` key and the greatest ``on`` value <= the left row's
    ``on`` value (ties on ``on`` broken by the greatest ``tie``).
    Unmatched left rows keep nulls in ``right_cols``.

    ONE sort over the tagged union of both sides, then the ordered-block
    scan carries "latest right row of the key straddling each block
    border" — O(1) per border — so matches crossing block boundaries
    (and key runs spanning 3+ blocks) resolve exactly without any
    driver-side row data.
    """
    lkey, rkey = by
    lon, ron = on
    ltie, rtie = tie

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    on_type = l_types[lon]

    def project_left(t: pa.Table) -> pa.Table:
        cols = {
            "k": t[lkey].cast(pa.int64()),
            "o": t[lon].cast(pa.int64()),
            "side": pa.array(np.ones(len(t), dtype=np.int8)),
            "tb": t[ltie].cast(pa.int64()),
        }
        for c in left_cols:
            cols[c] = t[c]
        for c in right_cols:
            cols[c] = pa.nulls(len(t), type=r_types[c])
        return pa.table(cols)

    def project_right(t: pa.Table) -> pa.Table:
        cols = {
            "k": t[rkey].cast(pa.int64()),
            "o": t[ron].cast(pa.int64()),
            "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            "tb": t[rtie].cast(pa.int64()),
        }
        for c in left_cols:
            cols[c] = pa.nulls(len(t), type=l_types[c])
        for c in right_cols:
            cols[c] = t[c]
        return pa.table(cols)

    union = (
        left.map_batches(project_left, batch_format="pyarrow")
        .union(right.map_batches(project_right, batch_format="pyarrow"))
        .sort(["k", "o", "side", "tb"])
        .materialize()
    )

    def summarize(t: pa.Table) -> dict:
        keys = t["k"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        last_key = int(keys[-1])
        last_run_start = int(np.flatnonzero(keys != last_key)[-1] + 1) if keys[0] != last_key else 0
        right_in_last = np.flatnonzero(side[last_run_start:] == 0)
        payload = None
        if len(right_in_last):
            idx = last_run_start + int(right_in_last[-1])
            payload = {c: t[c][idx].as_py() for c in right_cols}
        return {
            "first_key": int(keys[0]),
            "last_key": last_key,
            "single_key": int(keys[0]) == last_key,
            "last_right": payload,  # latest right row of the last run, if any
        }

    def fold(carry: dict | None, s: dict) -> dict | None:
        if s["last_right"] is not None:
            return {"key": s["last_key"], "row": s["last_right"]}
        # no right row for the block's last key inside the block: the
        # run continues from before only if the block is single-key
        if s["single_key"] and carry is not None and carry["key"] == s["first_key"]:
            return carry
        return None

    def process(t: pa.Table, carry: dict | None) -> pa.Table:
        n = len(t)
        keys = t["k"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(keys)
        row_run_start = np.repeat(starts, ends - starts)
        oi = np.where(side == 0, np.arange(n), -1)
        cm = np.maximum.accumulate(oi)
        is_left = side == 1
        valid = cm >= row_run_start
        left_idx = np.flatnonzero(is_left)
        match = cm[left_idx]
        ok = valid[left_idx]
        # left rows of the FIRST run with no in-block match may resolve
        # from the carried right row of the previous block(s)
        from_carry = (
            (~ok)
            & (left_idx < ends[0])
            & (carry is not None and carry["key"] == int(keys[0]))
        )
        out: dict[str, pa.Array] = {}
        lt = t.take(left_idx)
        for c in left_cols:
            out[c] = lt[c]
        # null-masked take: unmatched rows come back null; carry-resolved
        # rows are then patched in with one vectorized if_else per column
        idx = pa.array(np.where(ok, match, 0).astype(np.int64), mask=~ok)
        mt = t.select(right_cols).take(idx)
        any_carry = bool(from_carry.any()) if isinstance(from_carry, np.ndarray) else False
        fc_mask = pa.array(from_carry) if any_carry else None
        for c in right_cols:
            col = mt[c].combine_chunks()
            if any_carry:
                col = pc.if_else(
                    fc_mask, pa.scalar(carry["row"][c], type=col.type), col
                )
            out[c] = col
        return pa.table(out)

    return _ordered_block_scan(union, summarize, fold, process)


# ---------------------------------------------------------------------------
# per-key row cap
# ---------------------------------------------------------------------------


def cap_rows_per_key(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    cap: int | dict,
) -> ray.data.Dataset:
    """Keep at most ``cap`` rows per ``key``, preferring the smallest
    ``order_col`` values (webtext per-domain caps: keep the first K
    documents of every host). ONE sort by (key, order_col); the carry is
    just "how many rows of the border key precede this block" so ranks
    of runs straddling block borders stay exact.

    ``cap`` may be a dict of per-key caps (keys absent from the dict get
    cap 0) — the temperature-mixture-sampling shape, where each
    stratum's quota was computed from its size. The dict ships inside
    the per-block task closures, so it must be SMALL (strata-level
    cardinality: languages, sources — not per-document keys); callers
    with a large cap table should join it on as a column instead."""
    cap_map = cap if isinstance(cap, dict) else None
    srt = ds.sort([key, order_col]).materialize()

    def summarize(t: pa.Table) -> dict:
        keys = t[key].to_numpy(zero_copy_only=False)
        last_key = keys[-1]
        last_run_len = int(np.sum(keys == last_key)) if keys[0] == last_key else int(
            len(keys) - (np.flatnonzero(keys != last_key)[-1] + 1)
        )
        return {
            "first_key": keys[0],
            "last_key": last_key,
            "single_key": bool(keys[0] == last_key),
            "last_run_len": last_run_len,
        }

    def fold(carry: dict | None, s: dict) -> dict | None:
        prev = (
            carry["count"]
            if carry is not None
            and s["single_key"]
            and carry["key"] == s["first_key"]
            else 0
        )
        return {"key": s["last_key"], "count": prev + s["last_run_len"]}

    def process(t: pa.Table, carry: dict | None) -> pa.Table:
        keys_np = t[key].to_numpy(zero_copy_only=False)
        n = len(t)
        starts, ends = _run_bounds(keys_np)
        rank = np.arange(n) - np.repeat(starts, ends - starts)
        if carry is not None and carry["key"] == keys_np[0]:
            rank[: ends[0]] += carry["count"]
        if cap_map is None:
            return t.filter(pa.array(rank < cap))
        run_caps = np.fromiter(
            (cap_map.get(k, 0) for k in keys_np[starts]),
            dtype=np.int64,
            count=len(starts),
        )
        return t.filter(pa.array(rank < np.repeat(run_caps, ends - starts)))

    return _ordered_block_scan(srt, summarize, fold, process)


def budget_rows_per_key(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    weight_col: str,
    budget: int,
) -> ray.data.Dataset:
    """Keep each key's prefix (by ``order_col``) while the running sum
    of ``weight_col`` stays within ``budget`` — the weighted sibling of
    ``cap_rows_per_key`` (training-data mixing: "take documents per
    language until N chars/tokens"). Same ONE-sort border-carry scan;
    the carry is the border key's weight sum in preceding blocks, so
    running totals straddling block borders stay exact. A row is kept
    iff its INCLUSIVE running sum <= budget (the SQL window-SUM gate)."""
    srt = ds.sort([key, order_col]).materialize()

    def summarize(t: pa.Table) -> dict:
        keys = t[key].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        last_key = keys[-1]
        if keys[0] == last_key:
            last_run_w = int(w.sum())
        else:
            idx = int(np.flatnonzero(keys != last_key)[-1] + 1)
            last_run_w = int(w[idx:].sum())
        return {
            "first_key": keys[0],
            "last_key": last_key,
            "single_key": bool(keys[0] == last_key),
            "last_run_w": last_run_w,
        }

    def fold(carry: dict | None, s: dict) -> dict | None:
        prev = (
            carry["w"]
            if carry is not None
            and s["single_key"]
            and carry["key"] == s["first_key"]
            else 0
        )
        return {"key": s["last_key"], "w": prev + s["last_run_w"]}

    def process(t: pa.Table, carry: dict | None) -> pa.Table:
        keys_np = t[key].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = _run_bounds(keys_np)
        cum = np.cumsum(w)
        # inclusive running sum within each key run
        run_base = np.repeat(cum[starts] - w[starts], ends - starts)
        run_cum = cum - run_base
        if carry is not None and carry["key"] == keys_np[0]:
            run_cum[: ends[0]] += carry["w"]
        return t.filter(pa.array(run_cum <= budget))

    return _ordered_block_scan(srt, summarize, fold, process)


# ---------------------------------------------------------------------------
# global prefix sum (scan)
# ---------------------------------------------------------------------------


def global_running_sum(
    ds: ray.data.Dataset,
    order_col: str,
    weight_col: str,
    out_col: str = "start_off",
) -> ray.data.Dataset:
    """Append the EXCLUSIVE global running sum of ``weight_col`` in
    ``order_col`` order — the distributed prefix-sum / scan primitive
    (sequence packing for LLM training: each document's starting offset
    in the concatenated token/char stream). ONE sort; the driver fold
    carries just each block's total (O(blocks) integers), then every
    block computes its offsets with one vectorized cumsum — no data ever
    ships to the driver."""
    srt = ds.sort(order_col).materialize()

    def summarize(t: pa.Table) -> dict:
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return {"w": int(w.sum())}

    def fold(carry: dict | None, s: dict) -> dict:
        return {"w": (carry["w"] if carry is not None else 0) + s["w"]}

    def process(t: pa.Table, carry: dict | None) -> pa.Table:
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(w) - w + (carry["w"] if carry is not None else 0)
        return t.append_column(out_col, pa.array(cum, type=pa.int64()))

    return _ordered_block_scan(srt, summarize, fold, process)
