"""Ordered group-concat: pack whole documents into training sequences.

The writer half of sequence packing (``queries.sequence_pack_assignments``
computes each doc's seq_id from the global char-offset prefix sum; this
stage CONCATENATES each sequence's docs in doc order) — the distributed
ordered aggregation (SQL ``string_agg(text, ' ' ORDER BY doc_id)``)
the Dataset API lacks.

Shape: the input is already globally sorted by the order column (the
prefix-sum pass produced that order), and a sequence's docs are
CONTIGUOUS in it by construction. Interior seq runs of every block
finalize in-block with one vectorized Arrow ``binary_join``; the
first/last run of each block (possibly straddling borders) is emitted
as a fragment and reconciled driver-side — O(blocks) fragments, each
bounded by the chunk budget, the ``stages/grouped.py`` /
``spanremoval.merge_intervals`` edge pattern.

No reference counterpart (north-rule training-data operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from ordinarydumpdeduplicator_ray.stages.windows import _run_bounds

    return _run_bounds(keys)


def _join_runs(t: pa.Table, starts: np.ndarray, ends: np.ndarray,
               seq_col: str, text_col: str, sep: str) -> pa.Table:
    """One packed row per run via a vectorized Arrow list join. Runs
    need not be contiguous (the edge set is {first run, last run}):
    rows are gathered with an explicit take, then list offsets come
    from the run lengths."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    # flat row indices of all selected runs, vectorized
    flat = np.repeat(starts, lens) + (
        np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    )
    texts = t[text_col].combine_chunks().take(pa.array(flat.astype(np.int64)))
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    )
    lists = pa.ListArray.from_arrays(offsets, texts)
    packed = pc.binary_join(lists, sep)
    seqs = t[seq_col].combine_chunks().take(
        pa.array(starts.astype(np.int64))
    )
    return pa.table(
        {
            seq_col: seqs,
            "n_docs": pa.array((ends - starts).astype(np.int64), type=pa.int64()),
            "packed": packed,
        }
    )


def ordered_group_concat(
    sorted_ds: ray.data.Dataset,
    seq_col: str = "seq_id",
    order_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> ray.data.Dataset:
    """Input: a Dataset already globally sorted by ``order_col`` whose
    ``seq_col`` runs are contiguous in that order. Output: one
    (seq_col, n_docs, packed) row per sequence, ``packed`` = the run's
    texts joined by ``sep`` in order."""
    srt = sorted_ds.materialize()
    empty = pa.table({
        seq_col: pa.array([], type=pa.int64()),
        "n_docs": pa.array([], type=pa.int64()),
        "packed": pa.array([], type=pa.string()),
        "edge": pa.array([], type=pa.bool_()),
        "min_order": pa.array([], type=pa.int64()),
    })

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        keys = t[seq_col].to_numpy(zero_copy_only=False)
        starts, ends = _runs(keys)
        run_keys = keys[starts]
        run_is_edge = (run_keys == keys[0]) | (run_keys == keys[-1])
        parts = []
        for mask, is_edge in ((~run_is_edge, False), (run_is_edge, True)):
            if not mask.any():
                continue
            jt = _join_runs(t, starts[mask], ends[mask], seq_col, text_col, sep)
            jt = jt.append_column("edge", pa.array([is_edge] * len(jt)))
            jt = jt.append_column(
                "min_order",
                t[order_col].combine_chunks().take(
                    pa.array(starts[mask].astype(np.int64))
                ),
            )
            parts.append(jt)
        return pa.concat_tables(parts)

    marked = srt.map_batches(
        block, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = marked.filter(expr="edge == False").drop_columns(
        ["edge", "min_order"]
    )
    edge_rows = sorted(
        marked.filter(expr="edge == True").take_all(),
        key=lambda r: (r[seq_col], r["min_order"]),
    )
    if not edge_rows:
        return interior
    recon: dict[int, tuple[int, list[str]]] = {}
    for r in edge_rows:
        nd, frags = recon.get(r[seq_col], (0, []))
        recon[r[seq_col]] = (nd + r["n_docs"], frags + [r["packed"]])
    et = pa.table({
        seq_col: pa.array(list(recon), type=pa.int64()),
        "n_docs": pa.array([v[0] for v in recon.values()], type=pa.int64()),
        "packed": pa.array([sep.join(v[1]) for v in recon.values()],
                           type=pa.string()),
    })
    return interior.union(ray.data.from_arrow(et))
