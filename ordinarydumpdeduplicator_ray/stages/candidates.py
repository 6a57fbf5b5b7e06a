"""Candidate generation: LSH band explode, SimHash block explode, and
skew-aware sorted-run pair emission.

This generalizes the reference's exact-key grouping
(``DataControllerSimple.GetDuplicates``, ``DataControllerSimple.cs:247-304``)
to similarity bucket keys (SURVEY.md §2.4 "LSH candidate generation").

Pair-emission design (ONE shuffle, skew-safe):

1. ``sort(["bucket", member])`` — the only all-to-all move. After it,
   each bucket's rows are globally contiguous; a bucket either sits
   entirely inside one sorted block or spans a chain of adjacent blocks.
2. A map-only pass over whole sorted blocks emits, fully vectorized:
   - **interior cold runs** (2 <= n <= ``max_group_pairs``): all C(n,2)
     pairs (``np.triu_indices``);
   - **interior hot runs** (n > cap): O(n) star-to-min + sorted-chain
     pairs — the block boundary IS the salt: no reducer ever holds more
     than one block of a boilerplate bucket (north rule's explicit
     hot-key/skew handling, with range partitioning as the salt);
   - **edge runs** (touching a block border, so possibly continuing in
     the neighbor block): hot fragments emit their chain+star locally;
     cold fragments defer to reconciliation. Every edge run also emits
     one tiny summary row (first/last/count + the member list when
     small).
3. Driver-side reconciliation over the summary rows (at most two per
   sorted block — independent of data size): buckets whose total count
   is <= cap get their full C(n,2); larger ones get per-fragment chains
   plus the boundary links ``last(frag_k) -> first(frag_k+1)``, which
   reconstructs the bucket's full sorted chain exactly.
4. Distinct across bands: one sort on an int64 pair key + block-local
   vectorized de-duplication (a grouped aggregate here would pay
   per-group Python overhead for ~one group per pair).

**Member dtype.** The machinery is generic over the member column: the
flagship passes int64 ``uid`` rows (8 bytes/member — the hot explode ->
sort -> pair path never moves url strings; uids are collision-checked
per run, ``stages.signatures.assign_uids``), while callers keyed on
natural strings (spans, embeddings row ids, tests) pass ``url``.
Output pair columns are named ``{member}_a`` / ``{member}_b``.

No stage materializes all-pairs; hot-bucket emission is O(n).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import combine_hash_rows, sha_prefix_int64
from ordinarydumpdeduplicator_ray.functions.minhash import packed_minhash
from ordinarydumpdeduplicator_ray.functions.simhash import simhash_block_keys

_KEYS_ONLY_SCHEMA = pa.schema([("bucket", pa.int64())])


def _bucket_schema(member: str, mtype: pa.DataType) -> pa.Schema:
    return pa.schema([("bucket", pa.int64()), (member, mtype)])


def _emit_schema(member: str, mtype: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            (f"{member}_a", mtype),
            (f"{member}_b", mtype),
            ("fbucket", pa.int64()),
            ("f_first", mtype),
            ("f_last", mtype),
            ("f_n", pa.int64()),
            ("f_members", pa.binary()),
        ]
    )


def _pairs_schema(member: str, mtype: pa.DataType) -> pa.Schema:
    return pa.schema([(f"{member}_a", mtype), (f"{member}_b", mtype)])


def _member_np(col, is_int: bool) -> np.ndarray:
    """Member column -> numpy: int64 zero-copy-ish, strings as object."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if is_int:
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col.to_pylist(), dtype=object)


def _pack_members(run: np.ndarray, is_int: bool) -> bytes:
    """int members: raw little-endian int64s. String members:
    length-prefixed ([n:int32][len_i:int32 x n][utf-8 bytes...]) — a
    separator-join would corrupt on a member containing the separator
    byte (crawl urls are arbitrary bytes)."""
    if is_int:
        return run.astype("<i8").tobytes()
    bs = [s.encode("utf-8") for s in run]
    head = np.empty(len(bs) + 1, dtype="<i4")
    head[0] = len(bs)
    head[1:] = [len(b) for b in bs]
    return head.tobytes() + b"".join(bs)


def _unpack_members(b: bytes, is_int: bool) -> np.ndarray:
    if is_int:
        return np.frombuffer(b, dtype="<i8")
    n = int(np.frombuffer(b[:4], dtype="<i4")[0])
    lens = np.frombuffer(b[4:4 + 4 * n], dtype="<i4")
    offs = 4 + 4 * n + np.concatenate([[0], np.cumsum(lens)])
    return np.asarray(
        [b[offs[i]:offs[i + 1]].decode("utf-8") for i in range(n)],
        dtype=object,
    )


def _bucket_table(
    keys_i64: np.ndarray, members: np.ndarray | None, keep,
    member: str, mtype: pa.DataType,
) -> pa.Table:
    """(bucket[, member]) table from flat int64 keys; with ``keep`` (a
    sorted int64 numpy array of duplicate buckets, usually fetched from
    a broadcast ref) rows outside it are dropped vectorized BEFORE any
    member column is built."""
    if keep is not None and len(keys_i64):
        if len(keep) == 0:
            mask = np.zeros(len(keys_i64), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(keep, keys_i64), len(keep) - 1)
            mask = keep[pos] == keys_i64
        keys_i64 = keys_i64[mask]
        members = members[mask] if members is not None else None
    cols = {"bucket": pa.array(keys_i64, type=pa.int64())}
    if members is not None:
        cols[member] = pa.array(members, type=mtype)
    return pa.table(cols)


def explode_minhash_bands(
    signatures: ray.data.Dataset,
    config: DedupConfig,
    keys_only: bool = False,
    keep_ref=None,
    member: str = "url",
) -> ray.data.Dataset:
    """signatures -> (bucket, member) rows, one per (row, band). bucket
    is a 64-bit mix of (band index, the band's r signature values).
    ``keys_only`` emits just the bucket column (the singleton-filter key
    pass); ``keep_ref`` filters rows to the broadcast duplicate-bucket
    set inline, so singleton rows never materialize. ``member`` names
    the id column carried per row ('uid' int64 in the flagship)."""
    b, r = config.lsh_bands, config.lsh_rows
    k = config.num_perm

    def explode(batch: pa.Table) -> pa.Table:
        mtype = batch.schema.field(member).type if member in batch.column_names \
            else pa.string()
        is_int = pa.types.is_integer(mtype)
        if len(batch) == 0:
            return (_KEYS_ONLY_SCHEMA if keys_only
                    else _bucket_schema(member, mtype)).empty_table()
        mat, valid = packed_minhash(batch["minhash"], k)
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return (_KEYS_ONLY_SCHEMA if keys_only
                    else _bucket_schema(member, mtype)).empty_table()
        mat = mat[idx]
        keys = np.empty((len(idx), b), dtype=np.uint64)
        for band in range(b):
            keys[:, band] = combine_hash_rows(mat[:, band * r : (band + 1) * r], salt=band)
        # int64 bit-reinterpretation: groupby/aggregate round-trips through
        # pandas, where full-range uint64 degrades to pickled objects.
        flat = keys.reshape(-1).view(np.int64)
        members = None
        if not keys_only:
            members = np.repeat(_member_np(batch[member], is_int)[idx], b)
        keep = ray.get(keep_ref) if keep_ref is not None else None
        return _bucket_table(flat, members, keep, member, mtype)

    return signatures.map_batches(explode, batch_format="pyarrow")


def explode_simhash_blocks(
    signatures: ray.data.Dataset,
    config: DedupConfig,
    keys_only: bool = False,
    keep_ref=None,
    member: str = "url",
) -> ray.data.Dataset:
    """signatures -> (bucket, member) rows, one per (row, Manku table):
    keys are 3-block combinations of a 6-block split (functions.simhash),
    so every pair within the Hamming ball shares a table key and chance
    collisions stay ~n^2 / 2^32 instead of n^2 / 2^17.
    ``keys_only`` / ``keep_ref`` / ``member`` as in
    ``explode_minhash_bands``."""
    blocks = config.simhash_blocks
    clean = config.simhash_clean_blocks

    def explode(batch: pa.Table) -> pa.Table:
        mtype = batch.schema.field(member).type if member in batch.column_names \
            else pa.string()
        is_int = pa.types.is_integer(mtype)
        col = batch["simhash"].combine_chunks() if isinstance(batch["simhash"], pa.ChunkedArray) \
            else batch["simhash"]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return (_KEYS_ONLY_SCHEMA if keys_only
                    else _bucket_schema(member, mtype)).empty_table()
        sims = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.uint64)[idx]
        keys = simhash_block_keys(sims, blocks, clean)
        flat = keys.reshape(-1).view(np.int64)
        members = None
        if not keys_only:
            members = np.repeat(_member_np(batch[member], is_int)[idx], keys.shape[1])
        keep = ray.get(keep_ref) if keep_ref is not None else None
        return _bucket_table(flat, members, keep, member, mtype)

    return signatures.map_batches(explode, batch_format="pyarrow")


def explode_sha_buckets(
    signatures: ray.data.Dataset,
    keys_only: bool = False,
    keep_ref=None,
    member: str = "url",
) -> ray.data.Dataset:
    """signatures -> (bucket, member) rows keyed on the content hash
    (first 8 bytes of text_sha256, vectorized buffer reinterpretation),
    one per valid row. Feeds exact-duplicate pairs through the same
    sorted-run machinery as the similarity families — the merged
    verifier re-checks full-sha equality, so a 64-bit truncation
    collision can never produce a false exact edge.
    ``keys_only`` / ``keep_ref`` / ``member`` as in
    ``explode_minhash_bands``."""

    def explode(batch: pa.Table) -> pa.Table:
        mtype = batch.schema.field(member).type if member in batch.column_names \
            else pa.string()
        is_int = pa.types.is_integer(mtype)
        keys, ok = sha_prefix_int64(batch["text_sha256"])
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            return (_KEYS_ONLY_SCHEMA if keys_only
                    else _bucket_schema(member, mtype)).empty_table()
        keys = keys[idx]
        members = None
        if not keys_only:
            members = _member_np(batch[member], is_int)[idx]
        keep = ray.get(keep_ref) if keep_ref is not None else None
        return _bucket_table(keys, members, keep, member, mtype)

    return signatures.map_batches(explode, batch_format="pyarrow")


def explode_band_and_block_buckets(
    signatures: ray.data.Dataset,
    config: DedupConfig,
    member: str = "url",
) -> ray.data.Dataset:
    """Fused LSH-band + SimHash-table explode: one ``map_batches`` pass
    emits BOTH bucket families. Semantically identical to
    ``explode_minhash_bands(...).union(explode_simhash_blocks(...))``
    but consumes the (large — ~1 KiB/row of sketch bytes) signature
    lineage ONCE instead of twice: with a lazy upstream the union
    re-executes the representative filter and batch decode per family,
    a full extra pass over the sketch columns (~3.3 GB at 3.2M reps).
    Band keys are salted per band index and table keys per Manku
    combination exactly as in the unfused explodes, so bucket values
    are bit-identical."""
    b, r = config.lsh_bands, config.lsh_rows
    k = config.num_perm
    blocks = config.simhash_blocks
    clean = config.simhash_clean_blocks

    def explode(batch: pa.Table) -> pa.Table:
        mtype = batch.schema.field(member).type if member in batch.column_names \
            else pa.string()
        is_int = pa.types.is_integer(mtype)
        if len(batch) == 0:
            return _bucket_schema(member, mtype).empty_table()
        members_np = _member_np(batch[member], is_int)
        flats: list[np.ndarray] = []
        mems: list[np.ndarray] = []
        mat, valid = packed_minhash(batch["minhash"], k)
        idx = np.flatnonzero(valid)
        if len(idx):
            mat = mat[idx]
            keys = np.empty((len(idx), b), dtype=np.uint64)
            for band in range(b):
                keys[:, band] = combine_hash_rows(
                    mat[:, band * r : (band + 1) * r], salt=band
                )
            flats.append(keys.reshape(-1).view(np.int64))
            mems.append(np.repeat(members_np[idx], b))
        col = batch["simhash"].combine_chunks() \
            if isinstance(batch["simhash"], pa.ChunkedArray) else batch["simhash"]
        svalid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(svalid)
        if len(sidx):
            sims = pc.fill_null(col, 0).to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)[sidx]
            skeys = simhash_block_keys(sims, blocks, clean)
            flats.append(skeys.reshape(-1).view(np.int64))
            mems.append(np.repeat(members_np[sidx], skeys.shape[1]))
        if not flats:
            return _bucket_schema(member, mtype).empty_table()
        return _bucket_table(
            np.concatenate(flats), np.concatenate(mems), None, member, mtype
        )

    return signatures.map_batches(explode, batch_format="pyarrow")


def _all_pairs(run: np.ndarray, out_a: list, out_b: list) -> None:
    i, j = np.triu_indices(len(run), k=1)
    out_a.append(run[i])
    out_b.append(run[j])


def _chain_star(run: np.ndarray, out_a: list, out_b: list) -> None:
    """O(n) emission for one (fragment of a) hot bucket, already
    member-sorted: star to the fragment's min + the sorted chain."""
    out_a.append(np.repeat(run[0], len(run) - 1))
    out_b.append(run[1:])
    out_a.append(run[1:-1])
    out_b.append(run[2:])


def _emit_table(
    out_a: list, out_b: list, frags: list, member: str, mtype: pa.DataType
) -> pa.Table:
    schema = _emit_schema(member, mtype)
    tables = []
    n_pairs = sum(len(a) for a in out_a)
    if n_pairs:
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        tables.append(
            pa.table(
                {
                    f"{member}_a": pa.array(a, type=mtype),
                    f"{member}_b": pa.array(b, type=mtype),
                    "fbucket": pa.nulls(n_pairs, pa.int64()),
                    "f_first": pa.nulls(n_pairs, mtype),
                    "f_last": pa.nulls(n_pairs, mtype),
                    "f_n": pa.nulls(n_pairs, pa.int64()),
                    "f_members": pa.nulls(n_pairs, pa.binary()),
                }
            )
        )
    if frags:
        tables.append(
            pa.table(
                {
                    f"{member}_a": pa.nulls(len(frags), mtype),
                    f"{member}_b": pa.nulls(len(frags), mtype),
                    "fbucket": pa.array([f[0] for f in frags], type=pa.int64()),
                    "f_first": pa.array([f[1] for f in frags], type=mtype),
                    "f_last": pa.array([f[2] for f in frags], type=mtype),
                    "f_n": pa.array([f[3] for f in frags], type=pa.int64()),
                    "f_members": pa.array([f[4] for f in frags], type=pa.binary()),
                }
            )
        )
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(tables)


def _make_block_emitter(cap: int, member: str, is_int: bool):
    def emit(t: pa.Table) -> pa.Table:
        n = len(t)
        mtype = t.schema.field(member).type
        if n == 0:
            return _emit_schema(member, mtype).empty_table()
        buckets = np.asarray(t["bucket"].combine_chunks().to_numpy(zero_copy_only=False))
        members = _member_np(t[member], is_int)
        starts = np.concatenate([[0], np.flatnonzero(buckets[1:] != buckets[:-1]) + 1])
        ends = np.concatenate([starts[1:], [n]])
        lens = ends - starts
        out_a: list = []
        out_b: list = []
        frags: list = []
        # only multi-member runs and the two edge runs matter; singleton
        # interior runs (the vast majority) are skipped wholesale
        interesting = np.flatnonzero((lens >= 2))
        edge_idx = {0, len(starts) - 1}
        for ri in set(interesting.tolist()) | edge_idx:
            s, e, m = int(starts[ri]), int(ends[ri]), int(lens[ri])
            run = members[s:e]
            if ri not in edge_idx:
                if m <= cap:
                    _all_pairs(run, out_a, out_b)
                else:
                    _chain_star(run, out_a, out_b)
                continue
            # edge run: may continue in a neighboring sorted block
            if m > cap:
                _chain_star(run, out_a, out_b)
                joined = b""
            else:
                joined = _pack_members(run, is_int)  # cold: defer, ship members
            first = run[0] if not is_int else int(run[0])
            last = run[-1] if not is_int else int(run[-1])
            frags.append((int(buckets[s]), first, last, m, joined))
        return _emit_table(out_a, out_b, frags, member, mtype)

    return emit


def _reconcile_fragments(
    frag_rows: list[dict], cap: int, member: str, mtype: pa.DataType, is_int: bool
) -> pa.Table:
    """Driver-side pass over the per-block edge-run summaries (at most
    two per sorted block): stitch fragments of the same bucket back
    together deterministically."""
    by_bucket: dict[int, list] = {}
    for r in frag_rows:
        by_bucket.setdefault(r["fbucket"], []).append(r)
    out_a: list = []
    out_b: list = []
    for frs in by_bucket.values():
        frs.sort(key=lambda r: r["f_first"])   # global member order
        total = sum(r["f_n"] for r in frs)
        if total < 2:
            continue
        if total <= cap:
            # every fragment is cold (f_n <= total <= cap) -> members known
            members = np.concatenate(
                [_unpack_members(r["f_members"], is_int) for r in frs]
            )
            _all_pairs(members, out_a, out_b)
            continue
        # hot overall: cold fragments emitted nothing locally -> give them
        # their chain+star now; then add the boundary links, which turn
        # the per-fragment chains into the bucket's full sorted chain
        for r in frs:
            if r["f_n"] <= cap and r["f_n"] >= 2:
                _chain_star(_unpack_members(r["f_members"], is_int), out_a, out_b)
        dtype = np.int64 if is_int else object
        for prev, nxt in zip(frs, frs[1:]):
            out_a.append(np.asarray([prev["f_last"]], dtype=dtype))
            out_b.append(np.asarray([nxt["f_first"]], dtype=dtype))
    if not out_a:
        return _pairs_schema(member, mtype).empty_table()
    return pa.table(
        {
            f"{member}_a": pa.array(np.concatenate(out_a), type=mtype),
            f"{member}_b": pa.array(np.concatenate(out_b), type=mtype),
        }
    )


# below this many key rows the duplicate-key detection runs on the
# driver (one streamed pull of the int64 column + one np.sort): a
# distributed sort costs 3+ fixed barriers (repartition, shuffle,
# collect) that dominate small inputs, while np.sort of 2M int64 is
# ~2s even on this memory-starved box (21M measured 35s — hence the
# cap, not a blanket driver path).
_DRIVER_KEYS_CAP = 2_000_000


def duplicate_bucket_keys(
    cells: ray.data.Dataset,
    num_partitions: int,
    approx_rows: int | None = None,
    col: str = "bucket",
):
    """Dataset with an int64 ``col`` -> ``ray.put`` ref of the SORTED
    int64 array of keys holding >= 2 rows — the only buckets that can
    emit a pair.

    Small inputs (``approx_rows`` <= ``_DRIVER_KEYS_CAP``): per-block
    ``np.unique`` as raw tasks over the (materialized) input's own
    blocks (``stages/blockops.py`` — when the caller passes an
    already-pinned dataset this costs no streaming-executor launch);
    the driver merges per-block uniques: a key is a duplicate if it
    repeats inside a block OR appears in >= 2 blocks' unique sets.

    Large inputs: distributed-sort the single int64 column (no string
    payload; this box sorts 21M int64 driver-side in ~35s, the
    distributed column sort takes ~5s) and reduce each sorted block's
    adjacent-equal keys with raw tasks over the sorted blocks. Per-block
    dup lists are each sorted and blocks are range-ordered, so their
    concatenation (plus block-border equals) is already globally sorted.
    Exact — no hashing, no lost candidates. At 100-TB scale if even
    that outgrows the driver, the same filter runs as a broadcast-join
    per key range."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    if approx_rows is not None and approx_rows <= _DRIVER_KEYS_CAP:
        mat = cells.materialize()

        def block_uniq(t: pa.Table):
            if not len(t):
                e = np.empty(0, dtype=np.int64)
                return e, e
            u, c = np.unique(
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return u, u[c > 1]

        parts = map_blocks(mat, block_uniq)
        if not parts:
            return ray.put(np.empty(0, dtype=np.int64))
        uniqs = np.sort(np.concatenate([p[0] for p in parts]))
        cross = uniqs[1:][uniqs[1:] == uniqs[:-1]]
        dups = np.unique(np.concatenate([cross] + [p[1] for p in parts]))
        return ray.put(dups)

    if col != "bucket" or len(cells.schema().names) > 1:
        cells = cells.map_batches(
            lambda t: pa.table({"bucket": t[col]}), batch_format="pyarrow"
        )
    sort_parts = max(2 * num_partitions, 8)
    srt = cells.repartition(sort_parts).sort("bucket").materialize()

    def block_dups(t: pa.Table):
        if len(t) == 0:
            return None
        c = t["bucket"].to_numpy(zero_copy_only=False)
        return (np.unique(c[1:][c[1:] == c[:-1]]), int(c[0]), int(c[-1]))

    parts = [r for r in map_blocks(srt, block_dups) if r is not None]
    # interleave [block dups, border dup?] in block order -> sorted
    pieces: list[np.ndarray] = [np.empty(0, dtype=np.int64)]
    for k, (d, first, last) in enumerate(parts):
        pieces.append(d)
        if k + 1 < len(parts) and last == parts[k + 1][1]:
            pieces.append(np.array([last], dtype=np.int64))
    keep = np.concatenate(pieces)
    if len(keep) > 1:
        keep = keep[np.concatenate([[True], keep[1:] != keep[:-1]])]
    return ray.put(keep)


def duplicated_hit_rows(
    cells: ray.data.Dataset,
    num_partitions: int,
    key_col: str = "bucket",
) -> ray.data.Dataset:
    """(..., key) rows -> the SUBSET whose key occurs in >= 2 rows
    anywhere in the dataset, as a DATASET — the join-route sibling of
    ``duplicate_bucket_keys``: nothing O(duplicated keys) ever touches
    the driver, so it holds at any boilerplate volume.

    ONE sort by key; each sorted block emits its interior >=2-run rows
    vectorized (adjacent-equal mask). A key RUN spanning a block border
    is resolved from O(blocks) per-block scalars: in a globally sorted
    layout a value that appears in two blocks is necessarily the
    first/last value of each, so the driver sums the per-block counts
    of border values only (a handful of ints per block — row data never
    moves) and passes each block two booleans. Raw tasks over the
    materialized sort's own block refs (``stages/blockops.py``) — no
    extra execution launch; output blocks go straight back to the
    object store via ``from_arrow_refs``."""
    import numpy as np

    from ordinarydumpdeduplicator_ray.stages.blockops import (
        _as_table,
        block_refs,
    )

    sort_parts = max(2 * num_partitions, 8)
    srt = cells.repartition(sort_parts).sort(key_col).materialize()
    # enumerate the block refs ONCE: the scal pass and the emit pass
    # must see the same blocks in the same order, or the border flags
    # attach to the wrong blocks
    refs = block_refs(srt)
    if not refs:
        # schema probe of the lazy input only on this cheap empty path
        # (probing before the sort would pay a limit-1 execution on
        # every call)
        return ray.data.from_arrow(cells.schema().base_schema.empty_table())

    def scal(t: pa.Table):
        k = t[key_col].to_numpy(zero_copy_only=False)
        return (int(k[0]), int(k[-1]),
                int((k == k[0]).sum()), int((k == k[-1]).sum()))

    scal_task = ray.remote(lambda blk: scal(_as_table(blk)))
    scals = ray.get([scal_task.remote(r) for r in refs])
    # global count of each border value: a value spanning blocks is the
    # first/last of every block it touches; one interior to a block
    # never appears elsewhere. first==last (single-value block) counts
    # once.
    border_count: dict[int, int] = {}
    for first, last, cf, cl in scals:
        border_count[first] = border_count.get(first, 0) + cf
        if last != first:
            border_count[last] = border_count.get(last, 0) + cl

    def emit(blk, dup_first: bool, dup_last: bool) -> pa.Table:
        t = _as_table(blk)
        k = t[key_col].to_numpy(zero_copy_only=False)
        dup = np.zeros(len(k), dtype=bool)
        eq = k[1:] == k[:-1]
        dup[1:] |= eq
        dup[:-1] |= eq
        dup[k == k[0]] = dup_first
        dup[k == k[-1]] = dup_last
        return t.filter(pa.array(dup))

    task = ray.remote(emit)
    out_refs = [
        task.remote(
            r,
            border_count[first] >= 2,
            border_count[last] >= 2,
        )
        for r, (first, last, _, _) in zip(refs, scals)
    ]
    return ray.data.from_arrow_refs(out_refs)


def collect_pair_ids(
    pairs: ray.data.Dataset, cap: int,
    a_col: str = "uid_a", b_col: str = "uid_b",
) -> pa.Array | None:
    """Distinct pair-participating int64 ids, or None once they exceed
    ``cap``. Per-block uniques run as raw tasks over the materialized
    pair blocks (workers do the unique — raw id columns never stream to
    the driver), fetched ONE block at a time with an early bail, so
    driver memory is bounded by ~cap + one block's distinct ids even
    when the pair table is huge (the regime a join fallback serves).
    Shared by the embedding re-rank and winnow verify cap checks."""
    from ordinarydumpdeduplicator_ray.stages.blockops import _as_table, block_refs

    refs = block_refs(pairs)
    if not refs:
        return pa.array([], type=pa.int64())

    def block_uniq(t: pa.Table) -> pa.Array:
        both = pa.chunked_array(
            [t[a_col].combine_chunks(), t[b_col].combine_chunks()]
        )
        return pc.unique(both)

    task = ray.remote(lambda blk: block_uniq(_as_table(blk)))
    out_refs = [task.remote(r) for r in refs]
    uniq = pa.array([], type=pa.int64())
    for r in out_refs:
        part = ray.get(r)
        if len(part) == 0:
            continue
        merged = pc.unique(pa.chunked_array([uniq, part]))
        uniq = merged.combine_chunks() if isinstance(merged, pa.ChunkedArray) \
            else merged
        if len(uniq) > cap:
            return None
    return uniq


def _prefilter_singleton_buckets(
    buckets: ray.data.Dataset, num_partitions: int, member: str, mtype: pa.DataType
) -> ray.data.Dataset:
    """Drop bucket rows whose bucket holds a single row BEFORE the
    (bucket, member) all-to-all sort — they can never emit a pair.
    Typically the large majority of LSH band rows (most docs have no
    near-dup), so the expensive sort shrinks ~3-5x. Duplicate-bucket
    detection via ``duplicate_bucket_keys``; the broadcast kept set
    filters rows with one vectorized ``searchsorted`` per batch."""
    # buckets is materialized by the caller: count is block metadata and
    # the driver-cap path reduces its pinned blocks launch-free
    keep_ref = duplicate_bucket_keys(
        buckets, num_partitions, approx_rows=buckets.count()
    )
    if len(ray.get(keep_ref)) == 0:
        # no bucket anywhere has two rows: nothing can pair
        return ray.data.from_arrow(_bucket_schema(member, mtype).empty_table())

    def filt(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        k = ray.get(keep_ref)  # zero-copy plasma read per worker
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(k, bk), len(k) - 1)
        return t.filter(pa.array(k[pos] == bk))

    return buckets.map_batches(filt, batch_format="pyarrow")


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def candidate_pairs(
    bucket_rows: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int = 16,
    prefiltered: bool = False,
    member_field: tuple[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """(bucket, member) rows -> distinct candidate (member_a, member_b)
    pairs, member_a < member_b. See module docstring for the sorted-run
    design and member-dtype genericity.
    ``prefiltered``: the caller already dropped singleton buckets (e.g.
    inline in the explodes via ``duplicate_bucket_keys``). Otherwise the
    singleton pre-filter runs only when ``config.singleton_prefilter``
    is set (see config.py — off by default at single-node scale; the
    sorted-run emitter skips singleton runs natively either way).
    ``member_field``: (name, arrow type) of the non-bucket column. Pass
    it when the caller knows it statically — ``Dataset.schema()`` on a
    lazy lineage runs a limit-1 probe execution through the explode
    kernels, a ~0.5-2 s cluster-idle launch that this avoids."""
    cap = config.max_group_pairs
    if member_field is not None:
        member, mtype = member_field
    else:
        schema = bucket_rows.schema()
        member = next(n for n in schema.names if n != "bucket")
        mtype = dict(zip(schema.names, schema.types))[member]
    is_int = pa.types.is_integer(mtype)
    if not prefiltered and config.singleton_prefilter:
        # the pre-filter consumes the bucket lineage twice (key sort +
        # filter pass) — pin the explode output so it computes once
        bucket_rows = bucket_rows.materialize()
        bucket_rows = _prefilter_singleton_buckets(bucket_rows, num_partitions, member, mtype)
    # coalesce before sorting: upstream explodes emit one small block per
    # actor batch, and Ray's sort pays O(blocks^2) partition metadata +
    # per-task overhead — hundreds of 512-row blocks measurably dominate
    # the sort wall. CPU-proportional block count keeps the reduce side
    # parallel without the tiny-block tax.
    sort_parts = max(2 * num_partitions, 8)
    # no materialize between sort and emit: the sorted table has exactly
    # one consumer, so pinning it would only add a barrier and a full
    # object-store copy of the sorted rows
    sorted_rows = bucket_rows.repartition(sort_parts).sort(["bucket", member])
    emitted = sorted_rows.map_batches(
        _make_block_emitter(cap, member, is_int), batch_format="pyarrow", batch_size=None
    ).materialize()

    a_col, b_col = f"{member}_a", f"{member}_b"

    def pair_rows(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.is_valid(t[a_col]))
        return keep.select([a_col, b_col])

    def frag_rows(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.is_null(t[a_col]))
        return keep.select(["fbucket", "f_first", "f_last", "f_n", "f_members"])

    pairs = emitted.map_batches(pair_rows, batch_format="pyarrow")
    # fragment rows are <=2 per sorted block — reduce them from the
    # pinned emit blocks with raw tasks (no extra execution launch)
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    frags = [
        r
        for t in map_blocks(emitted, frag_rows)
        for r in t.to_pylist()
    ]
    if frags:
        pairs = pairs.union(
            ray.data.from_arrow(_reconcile_fragments(frags, cap, member, mtype, is_int))
        )

    # canonical order + distinct across bands (vectorized count aggregate)
    def canon(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _pairs_schema(member, mtype).empty_table()
        swap = pc.greater(t[a_col], t[b_col])
        a = pc.if_else(swap, t[b_col], t[a_col])
        b = pc.if_else(swap, t[a_col], t[b_col])
        keep = pc.less(a, b)
        return pa.table({a_col: a, b_col: b}).filter(keep)

    pairs = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pairs
    if is_int and n_pairs <= _DRIVER_KEYS_CAP:
        # small pair tables (16 B/row) dedup on the driver: one lexsort
        # replaces the repartition + pk-sort + block-dedup barriers that
        # dominate small runs (the downstream verify collects the pair
        # uid set driver-side anyway, so this adds no new driver load).
        # Blocks are fetched with ONE parallel ray.get over the refs —
        # a serial iter_batches pull over the ~hundreds of small emit
        # blocks measured ~5 s where the lexsort itself is ~1 s.
        from ordinarydumpdeduplicator_ray.stages.blockops import block_refs

        refs = block_refs(pairs)
        tables = [
            pa.Table.from_batches([blk]) if isinstance(blk, pa.RecordBatch) else blk
            for blk in ray.get(refs)
        ]
        tables = [t for t in tables if len(t)]
        tbl = pa.concat_tables(tables).combine_chunks()
        a = tbl[a_col].to_numpy(zero_copy_only=False)
        bb = tbl[b_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])])
        a, bb = a[keep], bb[keep]
        # emit MULTIPLE blocks: a single from_arrow block would funnel
        # every downstream map of the pair table (verify, recheck) into
        # one Ray task — map tasks are per-block
        chunk = max(65_536, (len(a) + 63) // 64)
        out = [
            pa.table({a_col: pa.array(a[i:i + chunk], type=mtype),
                      b_col: pa.array(bb[i:i + chunk], type=mtype)})
            for i in range(0, len(a), chunk)
        ] or [_pairs_schema(member, mtype).empty_table()]
        return ray.data.from_arrow(out)
    # distinct across bands: sort on an int64 pair-hash key brings all
    # copies of a pair together (sorting by two STRING columns directly
    # measured ~6x slower per row), then each block drops its local
    # duplicates with an exact comparison — a hash collision between
    # different pairs cannot merge them. (A groupby aggregate here pays
    # per-group Python overhead for ~one group per pair — orders of
    # magnitude slower.) A pair run straddling a block border is closed
    # EXACTLY: each block also drops its leading rows when they equal
    # the previous block's last row (O(blocks) scalars to the driver,
    # the usual border pattern) — duplicate-free output matters to
    # consumers that EMIT per pair row (span extraction, cos re-rank),
    # not just to idempotent edge unions.
    import pandas.util as pdu

    def add_pair_key(t: pa.Table) -> pa.Table:
        if is_int:
            ha = t[a_col].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
            hb = t[b_col].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
        else:
            ha = pdu.hash_array(np.asarray(t[a_col].to_pylist(), dtype=object))
            hb = pdu.hash_array(np.asarray(t[b_col].to_pylist(), dtype=object))
        with np.errstate(over="ignore"):
            pk = (ha * _GOLD) ^ hb
        return t.append_column("pk", pa.array(pk.view(np.int64), type=pa.int64()))

    def local_unique(t: pa.Table, drop_leading=None) -> pa.Table:
        if len(t) == 0:
            return t.drop_columns(["pk"])
        a = _member_np(t[a_col], is_int)
        b = _member_np(t[b_col], is_int)
        keep = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        ) if len(t) > 1 else np.ones(1, dtype=bool)
        if drop_leading is not None and a[0] == drop_leading[0] \
                and b[0] == drop_leading[1]:
            keep[0] = False
        return t.filter(pa.array(keep)).drop_columns(["pk"])

    from ordinarydumpdeduplicator_ray.stages.blockops import _as_table, block_refs

    srt = (
        pairs.repartition(sort_parts)
        .map_batches(add_pair_key, batch_format="pyarrow")
        .sort("pk")
        .materialize()
    )
    refs = block_refs(srt)
    if not refs:
        return ray.data.from_arrow(_pairs_schema(member, mtype).empty_table())

    def ends(t: pa.Table):
        a = _member_np(t[a_col], is_int)
        b = _member_np(t[b_col], is_int)
        return (a[0], b[0], a[-1], b[-1])

    ends_task = ray.remote(lambda blk: ends(_as_table(blk)))
    bounds = ray.get([ends_task.remote(r) for r in refs])
    emit_task = ray.remote(
        lambda blk, dl: local_unique(_as_table(blk), drop_leading=dl)
    )
    out_refs = []
    for k, r in enumerate(refs):
        dl = None
        if k > 0:
            pa_, pb_ = bounds[k - 1][2], bounds[k - 1][3]
            dl = (pa_, pb_)
        out_refs.append(emit_task.remote(r, dl))
    return ray.data.from_arrow_refs(out_refs)
