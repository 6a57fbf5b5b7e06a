"""Exact distributed order statistics (percentile_disc semantics).

Approximate sketches (t-digest, GK) are the usual answer at scale, but
for a SINGLE int64 column the exact answer is cheap: the shuffle moves
8-byte rows only (the column is projected before the sort), and after
the sort the requested ranks are located from per-block row counts in
BLOCK METADATA — no data is pulled except the handful of blocks that
actually contain a picked rank (O(#percentiles) block fetches
regardless of corpus size).

Rank semantics match SQL ``percentile_disc(q) WITHIN GROUP``: the
element at 1-based rank ``max(1, ceil(q * n))`` of the sorted column —
verified against DuckDB.

No reference counterpart (the reference has no numeric aggregates
beyond sum/count); standard corpus-profiling operator for a training
-data pipeline (length/quality distribution cutoffs).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data


def _disc_rank(q: float, n: int) -> int:
    """1-based percentile_disc rank: the smallest k with k/n >= q,
    COMPARED IN DOUBLES (SQL cume_dist semantics). Plain
    ``ceil(q * n)`` is off by one whenever q*n picks up float error
    (0.55 * 100 = 55.000000000000007 -> rank 56, while DuckDB's
    cume_dist(55) = 0.55 >= 0.55 returns 55); nudging the ceil result
    against the k/n >= q predicate reproduces the SQL result exactly."""
    k = max(1, math.ceil(q * n))
    while k > 1 and (k - 1) / n >= q:
        k -= 1
    while k < n and k / n < q:
        k += 1
    return k


def exact_percentiles(
    ds: ray.data.Dataset, column: str, qs: list[float]
) -> dict[float, int | None]:
    """Exact percentile_disc values of ``column`` (numeric) for each
    q in ``qs``. One single-column sort + metadata rank location +
    O(len(qs)) block fetches. Returns {q: value}, None for empty input."""
    import ray

    def proj_valid(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select([column])
        return t.filter(pc.is_valid(t[column]))

    # value-nulls are dropped to match SQL percentile_disc (which
    # ignores nulls); Arrow's sort would otherwise interleave them
    # into the rank arithmetic (ADVICE round 4)
    proj = ds.map_batches(proj_valid, batch_format="pyarrow")
    srt = proj.sort(column).materialize()

    refs, counts = [], []
    for bundle in srt.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
                counts.append(meta.num_rows)
    n = int(sum(counts))
    if n == 0:
        return {q: None for q in qs}
    cum = np.concatenate([[0], np.cumsum(counts)])

    out: dict[float, int | None] = {}
    fetched: dict[int, pa.Table] = {}
    for q in qs:
        rank = _disc_rank(q, n) - 1  # 0-based global index
        bi = int(np.searchsorted(cum, rank, side="right") - 1)
        off = int(rank - cum[bi])
        blk = fetched.get(bi)
        if blk is None:
            blk = ray.get(refs[bi])
            if isinstance(blk, pa.RecordBatch):
                blk = pa.Table.from_batches([blk])
            fetched[bi] = blk
        out[q] = blk[column][off].as_py()
    return out


def grouped_exact_percentiles(
    ds: ray.data.Dataset, key: str, column: str, qs: list[float]
) -> pa.Table:
    """Per-group exact percentile_disc: one (key, column) projected
    sort + one strata-sized count groupby; each group's picked ranks
    are located from block-metadata row counts exactly like the global
    variant — O(#groups x #percentiles) block fetches total, no group
    ever materializes. Intended for LOW-cardinality strata (languages,
    sources, splits); a million-group profile belongs in a groupby
    aggregate instead.

    Returns one row per group: (key, n, q<q> columns..., max)."""
    import ray
    from ray.data.aggregate import Count

    # null keys are EXCLUDED (documented): Python's sorted() cannot
    # order None against values, and Ray's sort would place null rows
    # somewhere this offset arithmetic does not model. Null VALUES are
    # excluded too, matching SQL percentile_disc semantics (nulls are
    # ignored) — and because Arrow's sort would place them inside a
    # group's range where the rank offsets don't model them; the
    # per-group counts below are computed AFTER this filter, so ranks
    # stay consistent (ADVICE round 4). The driver-side sorted() of
    # group keys matches the distributed sort order for the supported
    # key types: int64 directly, and UTF-8 strings because Arrow's
    # binary comparison equals code-point order.
    import pyarrow.compute as pc

    def drop_nulls(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(pc.is_valid(t[key]), pc.is_valid(t[column]))
        )

    ds = ds.map_batches(drop_nulls, batch_format="pyarrow")
    counts = {
        r[key]: r["n"]
        for r in ds.groupby(key).aggregate(Count(alias_name="n")).take_all()
    }
    schema = ds.schema()
    key_t = schema.base_schema.field(key).type if schema is not None \
        else pa.string()
    val_t = schema.base_schema.field(column).type if schema is not None \
        else pa.int64()
    if not counts:
        cols = {key: pa.array([], type=key_t),
                "n": pa.array([], type=pa.int64())}
        for q in qs:
            cols[f"q{q}"] = pa.array([], type=val_t)
        cols["max"] = pa.array([], type=val_t)
        return pa.table(cols)

    proj = ds.map_batches(
        lambda t: t.select([key, column]), batch_format="pyarrow"
    )
    srt = proj.sort([key, column]).materialize()

    refs, ns = [], []
    for bundle in srt.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
                ns.append(meta.num_rows)
    cum = np.concatenate([[0], np.cumsum(ns)])

    fetched: dict[int, pa.Table] = {}

    def value_at(gidx: int):
        bi = int(np.searchsorted(cum, gidx, side="right") - 1)
        blk = fetched.get(bi)
        if blk is None:
            blk = ray.get(refs[bi])
            if isinstance(blk, pa.RecordBatch):
                blk = pa.Table.from_batches([blk])
            fetched[bi] = blk
        return blk[column][int(gidx - cum[bi])].as_py()

    # group start offsets: prefix sums of group sizes in sort-key order
    rows: dict[str, list] = {key: [], "n": []}
    for q in qs:
        rows[f"q{q}"] = []
    rows["max"] = []
    start = 0
    for k in sorted(counts):
        n_k = counts[k]
        rows[key].append(k)
        rows["n"].append(n_k)
        for q in qs:
            rows[f"q{q}"].append(value_at(start + _disc_rank(q, n_k) - 1))
        rows["max"].append(value_at(start + n_k - 1))
        start += n_k

    cols = {key: pa.array(rows[key]), "n": pa.array(rows["n"], type=pa.int64())}
    for q in qs:
        cols[f"q{q}"] = pa.array(rows[f"q{q}"])
    cols["max"] = pa.array(rows["max"])
    return pa.table(cols)
