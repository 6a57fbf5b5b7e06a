"""Candidate-pair verification -> edges table.

Pairs arrive as int64 ``(uid_a, uid_b)`` rows (stages/candidates.py
member genericity — the hot path never ships url strings) and are
verified against the signatures they were generated from; the emitted
edges carry url strings again (resolved from the signature lookup), so
everything downstream (components, groups, reports, SQL oracles) is
uid-free.

- minhash pairs: estimated Jaccard = agreeing-permutation fraction; with
  K=128 the estimate is ~4 sigma tight at +-0.1 around the 0.8 threshold,
  so estimates outside ``threshold +- verify_margin`` decide directly
  (error < 1e-4) while shared-substring pairs (J ~ 0.15) stay rejected by
  a wide margin. Estimates INSIDE the band are re-verified exactly on
  unique-shingle sets when the caller supplies the pages table
  (``exact_jaccard_recheck``) — the flagship pipeline always does.
- simhash pairs: exact Hamming distance <= ``simhash_max_hamming``.

Signature columns reach the pairs one of two ways:

- **Broadcast lookup** (default while the distinct pair-uid set is under
  ``_BROADCAST_VERIFY_URL_CAP``): the pair uid set is collected on the
  driver, signatures for ONLY those uids are filter-projected map-only
  (no shuffle) into a packed lookup (sorted uid array + aligned url
  strings + dense minhash matrix + simhash / sha-code / n_bytes
  vectors), ``ray.put`` once, and each verify task resolves both sides
  with one vectorized ``np.searchsorted`` + numpy row gather per batch.
  Zero shuffles; on a real cluster the lookup lands in each node's
  plasma store once.
- **Hash-shuffle joins** (fallback beyond the cap): two inner joins on
  uid attach the per-side columns — never holds more than a partition
  anywhere, at the price of shuffling the pair table twice. Still the
  scalable alternative to carrying 1 KiB signatures through every
  band-explode row (32x write amplification avoided).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

import pyarrow.compute as pc

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.minhash import (
    estimate_jaccard_matrix,
    packed_minhash,
)
from ordinarydumpdeduplicator_ray.functions.simhash import hamming_distance
from ordinarydumpdeduplicator_ray.stages.join import inner_join

_EDGE_SCHEMA = pa.schema(
    [("url_a", pa.string()), ("url_b", pa.string()),
     ("nb_a", pa.int64()), ("nb_b", pa.int64()),
     ("source", pa.string()), ("jaccard", pa.float64())]
)

# distinct pair-participating uids above which the packed signature
# lookup no longer broadcasts:
# 4M uids x (128 x 8 B minhash + url + scalars) ~ 4.5 GiB packed lookup —
# one plasma copy per node, read zero-copy by every task; above it the
# two-join attach takes over (driver/packing memory, not correctness)
_BROADCAST_VERIFY_URL_CAP = 4_000_000


def _emit_edges(
    urls: pa.Table,
    est: np.ndarray,
    mh_keep: np.ndarray,
    hd: np.ndarray,
    sh_keep: np.ndarray,
    ex_keep: np.ndarray,
    config: DedupConfig,
    recheck: bool,
) -> pa.Table:
    """Shared edge emission for both attach strategies. ``urls`` is the
    (url_a, url_b, nb_a, nb_b) table aligned row-for-row with the flag /
    score arrays.

    With ``recheck``: estimates AT or ABOVE the threshold accept
    directly (the unbiased-estimator decision at face value — a
    sub-threshold pair needs an upward est excursion past thr to be
    falsely accepted, strictly tighter than the legacy thr - margin
    acceptance that worried ADVICE); estimates in the DOWNWARD tail
    ``[thr - margin, thr)`` become 'minhash_margin' rows for the exact
    shingle re-check (recall rescue) — never accepted unchecked.
    Without ``recheck``, acceptance falls back to est >= thr - margin
    (legacy, documented in config.py)."""
    if recheck:
        mh_sure = mh_keep & (est >= config.jaccard_threshold)
        mh_band = mh_keep & ~mh_sure & ~ex_keep
    else:
        mh_sure = mh_keep
        mh_band = np.zeros(len(mh_keep), dtype=bool)
    out_ex = urls.take(np.nonzero(ex_keep)[0]) \
        .append_column("source", pa.array(["exact"] * int(ex_keep.sum()), type=pa.string())) \
        .append_column("jaccard", pa.array([1.0] * int(ex_keep.sum()), type=pa.float64()))
    out_mh = urls.take(np.nonzero(mh_sure)[0]) \
        .append_column("source", pa.array(["minhash"] * int(mh_sure.sum()), type=pa.string())) \
        .append_column("jaccard", pa.array(est[mh_sure], type=pa.float64()))
    out_band = urls.take(np.nonzero(mh_band)[0]) \
        .append_column("source", pa.array(["minhash_margin"] * int(mh_band.sum()), type=pa.string())) \
        .append_column("jaccard", pa.array(est[mh_band], type=pa.float64()))
    sim = 1.0 - hd[sh_keep].astype(np.float64) / 64.0
    out_sh = urls.take(np.nonzero(sh_keep)[0]) \
        .append_column("source", pa.array(["simhash"] * int(sh_keep.sum()), type=pa.string())) \
        .append_column("jaccard", pa.array(sim, type=pa.float64()))
    return pa.concat_tables([out_ex, out_mh, out_band, out_sh])


def _collect_pair_uids(pairs: ray.data.Dataset, cap: int) -> np.ndarray | None:
    """Distinct uids referenced by the (MATERIALIZED) pairs as a SORTED
    int64 numpy array, or None once the set exceeds ``cap`` (caller
    falls back to the shuffle-join attach).

    Per-block unique runs as raw tasks over the pairs' own pinned
    blocks (stages/blockops.py) — no extra streaming-executor launch
    (each launch idles the cluster ~0.5-1.5 s on this box) and no
    object-store copy. Driver memory stays O(sum of per-block
    distinct), collapsed through ``np.unique`` periodically."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    def block_uids(t: pa.Table) -> np.ndarray:
        if not len(t):
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate([
            t["uid_a"].combine_chunks().to_numpy(zero_copy_only=False),
            t["uid_b"].combine_chunks().to_numpy(zero_copy_only=False),
        ]))

    chunks: list[np.ndarray] = []
    pending = 0
    for a in map_blocks(pairs, block_uids):
        if len(a):
            chunks.append(a)
            pending += len(a)
        if pending >= 8_000_000:
            chunks = [np.unique(np.concatenate(chunks))]
            pending = 0
            if len(chunks[0]) > cap:
                return None
    if not chunks:
        return np.empty(0, dtype=np.int64)
    uniq = np.unique(np.concatenate(chunks))
    return None if len(uniq) > cap else uniq


def _pack_lookup_block(t: pa.Table, uid_ref, num_perm: int) -> tuple[int, dict | None]:
    """Filter one signature block to the pair uids and pack it into flat
    binary buffers (uids, minhash matrix, simhash, 32-byte sha as 4
    uint64 words, n_bytes, validity masks) + the url list. The expensive
    Arrow->dense-matrix packing runs HERE, in parallel tasks. Returns
    ``(row_count, payload)`` for ``map_blocks_scatter``: the count goes
    to the driver, the payload stays in plasma for the worker-side
    assembly (``_assemble_lookup``). ``(0, None)`` when no uid of this
    block is referenced by any pair."""
    k = ray.get(uid_ref)
    u = t["uid"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(k):
        pos = np.minimum(np.searchsorted(k, u), len(k) - 1)
        t = t.filter(pa.array(k[pos] == u))
    else:
        t = t.slice(0, 0)
    if len(t) == 0:
        return 0, None
    uids = t["uid"].combine_chunks().to_numpy(zero_copy_only=False)
    mh_mat, mh_valid = packed_minhash(t["minhash"], num_perm)
    sh_col = t["simhash"].combine_chunks()
    sh_valid = pc.is_valid(sh_col).to_numpy(zero_copy_only=False)
    sh = pc.fill_null(sh_col, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
    # 32-byte sha packs as a (n, 4) uint64 matrix — same fixed-width
    # buffer reinterpretation as the minhash sketch (k=4 words)
    sha_mat, sha_valid = packed_minhash(t["text_sha256"], 4)
    nb = pc.fill_null(t["n_bytes"].combine_chunks(), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return len(t), {
        "uids": uids.tobytes(),
        "mh": np.ascontiguousarray(mh_mat).tobytes(),
        "mh_valid": mh_valid.tobytes(),
        "sh": sh.tobytes(),
        "sh_valid": sh_valid.tobytes(),
        "sha": np.ascontiguousarray(sha_mat).tobytes(),
        "sha_valid": sha_valid.tobytes(),
        "nb": nb.tobytes(),
        "urls": t["url"].to_pylist(),
    }


def _build_sig_lookup(
    signatures: ray.data.Dataset, pair_uids: np.ndarray, config: DedupConfig
):
    """Filter-project signatures to the pair uids and pack them into a
    dense uid-sorted lookup: int64 uid vector + aligned url Arrow array
    + minhash matrix (n, k) uint64 + simhash / sha-word / n_bytes
    arrays. The per-block packing runs as raw tasks over the
    signatures' own pinned blocks (``stages/blockops.py`` — in the
    flagship the salt-0 uid column is derived inside the signature
    stage, so ``signatures`` is already materialized and this costs no
    extra streaming-executor launch); per-block payloads stay in plasma
    (``map_blocks_scatter``) and the buffer concatenation + ONE argsort
    run in a single remote ``_assemble_lookup`` task whose output IS the
    broadcast object — the ~300 MB+ matrix never transits the driver
    heap (the driver-side concat measured 1-2.4 s at 310k uids, all
    first-touch allocation). Returns an ObjectRef (numpy parts read
    zero-copy per node), or None when nothing matched."""
    import functools
    import os
    import time as _time

    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks_scatter

    _prof = os.environ.get("GRAFT_PROF") == "1"
    _marks: list[tuple[str, float]] = [("start", _time.perf_counter())]

    def _mark(label: str) -> None:
        if _prof:
            _marks.append((label, _time.perf_counter()))

    uid_ref = ray.put(pair_uids)
    k = config.num_perm
    signatures = signatures.materialize()
    _mark("materialize")
    counts, payload_refs = map_blocks_scatter(
        signatures,
        functools.partial(_pack_lookup_block, uid_ref=uid_ref, num_perm=k),
    )
    _mark("pack_blocks")
    keep = [r for c, r in zip(counts, payload_refs) if c]
    if not keep:
        return None
    ref = _assemble_lookup.remote(k, *keep)
    _mark("assemble_submit")
    if _prof:
        import sys

        segs = " ".join(
            f"{lbl}={_marks[i + 1][1] - _marks[i][1]:.2f}s"
            for i, (lbl, _) in enumerate(_marks[1:])
        )
        print(f"[GRAFT_PROF] build_sig_lookup {segs}", file=sys.stderr, flush=True)
    return ref


@ray.remote
def _assemble_lookup(k: int, *rows: dict) -> dict:
    """Worker-side assembly of the packed per-block payloads into the
    dense uid-sorted broadcast lookup. Runs as ONE remote task: reads
    the payloads from plasma, concatenates buffers, computes the sort
    permutation, and returns the dict — Ray stores the task output in
    the object store directly, so no driver copy and no extra
    ``ray.put``."""
    raw = np.concatenate([np.frombuffer(r["uids"], dtype=np.int64) for r in rows])
    order = np.argsort(raw, kind="stable")
    uids = raw[order]
    if len(uids) > 1 and (uids[1:] == uids[:-1]).any():
        raise RuntimeError(
            "duplicate uid in signature lookup — assign_uids should have "
            "re-salted; corpus may contain duplicate urls"
        )
    # matrices stay in CONCAT order; ``perm`` maps a sorted-uid position
    # to its concat row. Re-sorting the ~1 KiB/row payloads here was a
    # measured ~5 s serial driver gather at 154k uids x 32 CPUs — the
    # perm lookup instead rides the per-batch gathers in
    # _broadcast_verify_batch, which touch only batch-sized index arrays.
    mh = np.concatenate(
        [np.frombuffer(r["mh"], dtype=np.uint64) for r in rows]
    ).reshape(-1, k)
    mh_valid = np.concatenate(
        [np.frombuffer(r["mh_valid"], dtype=bool) for r in rows]
    )
    sh = np.concatenate([np.frombuffer(r["sh"], dtype=np.uint64) for r in rows])
    sh_valid = np.concatenate(
        [np.frombuffer(r["sh_valid"], dtype=bool) for r in rows]
    )
    sha = np.concatenate(
        [np.frombuffer(r["sha"], dtype=np.uint64) for r in rows]
    ).reshape(-1, 4)
    sha_valid = np.concatenate(
        [np.frombuffer(r["sha_valid"], dtype=bool) for r in rows]
    )
    nb = np.concatenate([np.frombuffer(r["nb"], dtype=np.int64) for r in rows])
    urls = pa.array(
        [u for r in rows for u in r["urls"]], type=pa.string()
    )
    return {"uids": uids, "perm": order, "urls": urls,
            "mh": mh, "mh_valid": mh_valid,
            "sh": sh, "sh_valid": sh_valid,
            "sha": sha, "sha_valid": sha_valid, "nb": nb}


# process-level cache of the last fetched broadcast object: broadcast
# maps run as TASKS on prestarted workers (a fresh ACTOR pool pays
# python + ray import per actor, measured ~10s of spin-up per pool),
# and this cache makes the per-task ``ray.get`` + unpickle a one-time
# cost per worker process
_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


def _get_broadcast(ref):
    """Per-worker broadcast cache. Bounded at a few entries (FIFO)
    rather than single-slot: kernels that read 2-3 broadcasts per batch
    (pagerank's nodes/ranks/degrees, the incremental scan's key tables)
    would otherwise evict each other every call and re-deserialize the
    object per batch. Entries are plasma-backed (numpy views are
    zero-copy), so the bound is about handle count, not bytes."""
    key = ref.hex()
    val = _BROADCAST_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = val
    return val


def _resolve_uids(col, lk: dict) -> np.ndarray:
    """Vectorized uid -> CONCAT-order lookup-row index (searchsorted on
    the sorted uid vector, then through ``perm``); -1 where absent."""
    u = col.combine_chunks().to_numpy(zero_copy_only=False)
    sorted_uids = lk["uids"]
    if len(sorted_uids) == 0:
        return np.full(len(u), -1, dtype=np.int64)
    pos = np.minimum(np.searchsorted(sorted_uids, u), len(sorted_uids) - 1)
    return np.where(sorted_uids[pos] == u, lk["perm"][pos], -1)


def _broadcast_verify_batch(
    t: pa.Table, config: DedupConfig, lookup_ref, recheck: bool
) -> pa.Table:
    """Verify one pair batch against the broadcast signature lookup:
    both sides resolve with ``np.searchsorted`` + numpy row gathers —
    no joins, no per-pair Python. Emits url-string edges."""
    if len(t) == 0:
        return _EDGE_SCHEMA.empty_table()
    lk = _get_broadcast(lookup_ref)
    ia = _resolve_uids(t["uid_a"], lk)
    ib = _resolve_uids(t["uid_b"], lk)
    found = (ia >= 0) & (ib >= 0)
    ia0, ib0 = np.where(ia >= 0, ia, 0), np.where(ib >= 0, ib, 0)
    mh, mh_valid = lk["mh"], lk["mh_valid"]
    est = estimate_jaccard_matrix(mh[ia0], mh[ib0])
    thr = config.jaccard_threshold - config.verify_margin
    mh_keep = found & mh_valid[ia0] & mh_valid[ib0] & (est >= thr)
    hd = hamming_distance(lk["sh"][ia0], lk["sh"][ib0])
    sh_keep = (
        found & lk["sh_valid"][ia0] & lk["sh_valid"][ib0]
        & (hd <= config.simhash_max_hamming)
    )
    sha = lk["sha"]
    ex_keep = (
        found & lk["sha_valid"][ia0] & lk["sha_valid"][ib0]
        & (sha[ia0] == sha[ib0]).all(axis=1)
    )
    url_col = lk["urls"]
    urls = pa.table(
        {"url_a": url_col.take(pa.array(ia0)), "url_b": url_col.take(pa.array(ib0)),
         "nb_a": pa.array(lk["nb"][ia0], type=pa.int64()),
         "nb_b": pa.array(lk["nb"][ib0], type=pa.int64())}
    )
    return _emit_edges(urls, est, mh_keep, hd, sh_keep, ex_keep, config, recheck)


def verify_pairs(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
    pages: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Merged verification for (uid_a, uid_b) candidates from ALL bucket
    families (content-sha + minhash bands + simhash blocks in one
    candidate pass): attach (url, minhash, simhash, sha, n_bytes) per
    side — broadcast lookup below ``_BROADCAST_VERIFY_URL_CAP`` distinct
    pair uids, two shuffle joins beyond it (module docstring) — then
    emit an 'exact' edge when the full content hashes agree, a 'minhash'
    edge when the Jaccard estimate clears the threshold and a 'simhash'
    edge when the Hamming ball admits the pair. Fully vectorized —
    signature matrices are pre-packed, no per-pair Python. ``signatures``
    must carry the ``uid`` column (``stages.signatures.assign_uids``).

    With ``pages``, margin-band estimates are re-verified exactly on
    shingle sets (see ``_emit_edges`` / config.py contract)."""
    recheck = pages is not None
    # the uid-set collection consumes the (lazy) pair lineage once and
    # the verify map consumes it again — pin the blocks first
    pairs = pairs.materialize()
    pair_uids = _collect_pair_uids(pairs, _BROADCAST_VERIFY_URL_CAP)
    if pair_uids is not None:
        lookup_ref = _build_sig_lookup(signatures, pair_uids, config) \
            if len(pair_uids) else None
        if lookup_ref is None:
            edges = ray.data.from_arrow(_EDGE_SCHEMA.empty_table())
        else:
            import functools

            edges = pairs.map_batches(
                functools.partial(
                    _broadcast_verify_batch, config=config,
                    lookup_ref=lookup_ref, recheck=recheck,
                ),
                batch_format="pyarrow",
                batch_size=8192,
            )
    else:
        edges = _verify_join(pairs, signatures, config, num_partitions, recheck)
    if not recheck:
        return edges
    # the margin band is a narrow est window — split it off with raw
    # per-block tasks over the pinned edge blocks (blockops) instead of
    # two filter executions + a count execution: three fewer
    # streaming-executor launches (~0.5-1.5 s of cluster idle each).
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    import os as _os
    import sys as _sys
    import time as _time

    _prof = _os.environ.get("GRAFT_PROF") == "1"
    _tv0 = _time.perf_counter()
    edges = edges.materialize()
    if _prof:
        print(
            f"[GRAFT_PROF] verify_edges_materialize {_time.perf_counter() - _tv0:.2f}s",
            file=_sys.stderr, flush=True,
        )
    n_pending = sum(
        map_blocks(
            edges,
            lambda t: int(pc.sum(pc.equal(t["source"], "minhash_margin")).as_py() or 0),
        )
    )
    accepted = edges.filter(expr="source != 'minhash_margin'")
    if n_pending == 0:
        return accepted
    if n_pending <= _BROADCAST_PENDING_CAP:
        parts = [
            t
            for t in map_blocks(
                edges,
                lambda t: t.filter(pc.equal(t["source"], "minhash_margin")),
            )
            if len(t)
        ]
        pending_tbl = pa.concat_tables(parts).combine_chunks()
        resolved = _recheck_broadcast_tbl(pending_tbl, pages, config)
    else:
        pending = edges.filter(expr="source == 'minhash_margin'")
        resolved = _recheck_join(pending, pages, config, num_partitions)
    if _prof:
        _tr = _time.perf_counter()
        resolved = resolved.materialize()
        print(
            f"[GRAFT_PROF] recheck_consume {_time.perf_counter() - _tr:.2f}s "
            f"rows={resolved.count()}",
            file=_sys.stderr, flush=True,
        )
    return accepted.union(resolved)


def _attach(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    side: str,
    columns: dict[str, str],
    num_partitions: int | None,
    out_schema: pa.Schema,
) -> ray.data.Dataset:
    """Join ``columns`` of signatures onto pairs via ``uid_{side}``.
    ``out_schema`` is the full joined schema, used when a side is empty."""
    key = f"uid_{side}"

    def project(t: pa.Table) -> pa.Table:
        cols = {key: t["uid"]}
        for src, dst in columns.items():
            cols[dst] = t[src]
        return pa.table(cols)

    proj = signatures.map_batches(project, batch_format="pyarrow")
    return inner_join(
        pairs, proj, on=(key,), num_partitions=num_partitions,
        empty_schema=out_schema,
    )


def _verify_join(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None,
    recheck: bool,
) -> ray.data.Dataset:
    """Shuffle-join attach fallback for pair-uid sets too large to
    broadcast; emits the same url-string edge rows (incl.
    'minhash_margin')."""
    thr = config.jaccard_threshold - config.verify_margin
    max_h = config.simhash_max_hamming
    base = [("uid_a", pa.int64()), ("uid_b", pa.int64())]
    a_cols = [("url_a", pa.string()), ("mh_a", pa.binary()), ("sh_a", pa.uint64()),
              ("sha_a", pa.binary()), ("nb_a", pa.int64())]
    b_cols = [("url_b", pa.string()), ("mh_b", pa.binary()), ("sh_b", pa.uint64()),
              ("sha_b", pa.binary()), ("nb_b", pa.int64())]
    with_a = _attach(
        pairs, signatures, "a",
        {"url": "url_a", "minhash": "mh_a", "simhash": "sh_a",
         "text_sha256": "sha_a", "n_bytes": "nb_a"},
        num_partitions,
        pa.schema(base + a_cols),
    )
    with_ab = _attach(
        with_a, signatures, "b",
        {"url": "url_b", "minhash": "mh_b", "simhash": "sh_b",
         "text_sha256": "sha_b", "n_bytes": "nb_b"},
        num_partitions,
        pa.schema(base + a_cols + b_cols),
    )
    # edges carry each endpoint's n_bytes so the driver union-find can
    # emit size-annotated components and the near-group aggregation
    # needs NO join back to the signatures table
    empty = _EDGE_SCHEMA.empty_table()

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        k = config.num_perm
        a_mat, a_ok = packed_minhash(t["mh_a"], k)
        b_mat, b_ok = packed_minhash(t["mh_b"], k)
        mh_valid = a_ok & b_ok
        est = estimate_jaccard_matrix(a_mat, b_mat)
        mh_keep = mh_valid & (est >= thr)

        sh_a_l, sh_b_l = t["sh_a"].to_pylist(), t["sh_b"].to_pylist()
        sh_valid = np.array([x is not None for x in sh_a_l]) & np.array(
            [x is not None for x in sh_b_l]
        )
        sh_a = np.array([x or 0 for x in sh_a_l], dtype=np.uint64)
        sh_b = np.array([x or 0 for x in sh_b_l], dtype=np.uint64)
        hd = hamming_distance(sh_a, sh_b)
        sh_keep = sh_valid & (hd <= max_h)

        sha_a, sha_b = t["sha_a"].to_pylist(), t["sha_b"].to_pylist()
        ex_keep = np.array(
            [x is not None and x == y for x, y in zip(sha_a, sha_b)]
        )

        urls = t.select(["url_a", "url_b", "nb_a", "nb_b"])
        return _emit_edges(
            urls, est, mh_keep, hd, sh_keep, ex_keep, config, recheck
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")


class _ShingleRecheck:
    """Exact unique-shingle Jaccard for the margin-band pairs arriving
    with ``text_a``/``text_b`` columns (the shuffle-JOIN fallback path).
    Token-hash cache + config in ``__init__``; per batch, each distinct
    text is tokenized/shingled once (cross-batch cache) and pair Jaccards
    come from sorted-array intersections. The broadcast path uses
    ``_ShingleLookupRecheck`` instead — shingles there are precomputed
    once cluster-wide in the pages filter pass."""

    def __init__(self, config: DedupConfig) -> None:
        from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher

        self.config = config
        self.hasher = TokenHasher()
        # shingle sets cached ACROSS batches (cluster members recur in
        # many pairs spread over batches); bounded to cap actor memory
        self._cache: dict[str, np.ndarray] = {}
        self._cache_cap = 200_000

    def _shingles(self, text: str | None, cache: dict) -> np.ndarray | None:
        import hashlib

        from ordinarydumpdeduplicator_ray.functions.hashing import shingle_hashes
        from ordinarydumpdeduplicator_ray.functions.text import tokenize

        if text is None:
            return None
        # key by a 16-byte digest, not the text itself: the entry-count
        # cap alone leaves the cache byte-UNBOUNDED with 10-100 KB web
        # texts as keys (GBs per worker at the cap); the digest keeps
        # the dedup benefit at ~24 B/key
        key = hashlib.blake2b(text.encode(), digest_size=16).digest()
        s = cache.get(key)
        if s is None:
            toks = tokenize(text, self.config.lowercase)
            s = shingle_hashes(self.hasher.hash_tokens(toks), self.config.shingle_size) \
                if toks else np.empty(0, dtype=np.uint64)
            if len(cache) < self._cache_cap:
                cache[key] = s
        return s

    def __call__(self, t: pa.Table) -> pa.Table:
        thr = self.config.jaccard_threshold
        cache = self._cache
        keep = np.zeros(len(t), dtype=bool)
        jac = np.zeros(len(t), dtype=np.float64)
        ta, tb = t["text_a"].to_pylist(), t["text_b"].to_pylist()
        for i, (x, y) in enumerate(zip(ta, tb)):
            a = self._shingles(x, cache)
            b = self._shingles(y, cache)
            if a is None or b is None or not len(a) or not len(b):
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            j = inter / union if union else 0.0
            jac[i] = j
            keep[i] = j >= thr
        cols = ["url_a", "url_b"] + [c for c in ("nb_a", "nb_b")
                                     if c in t.column_names]
        out = t.select(cols).filter(pa.array(keep))
        n = len(out)
        return out.append_column("source", pa.array(["minhash"] * n, type=pa.string())) \
                  .append_column("jaccard", pa.array(jac[keep], type=pa.float64()))


# above this, the broadcast path applies: the pending url set and its
# texts ride the object store instead of two full-corpus shuffle joins.
# 20M pairs x ~40B/url ~= 1.6 GB of driver set — beyond that, fall back
# to the join path (which never holds more than a partition anywhere).
_BROADCAST_PENDING_CAP = 20_000_000


def exact_jaccard_recheck(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Margin-band pairs -> 'minhash' edges kept iff the TRUE unique-
    shingle Jaccard >= threshold. ``pending`` rows carry url strings
    (verification already resolved uids).

    Fast path (pending below ``_BROADCAST_PENDING_CAP``): collect the
    band's url set on the driver; a map-only pages pass filters each
    block to the pending urls (sorted-uid searchsorted probe) and
    tokenizes/shingles each matched text EXACTLY ONCE
    (``_filter_shingle_block``); one remote task packs the shingle sets
    into a uid-sorted flat-buffer lookup (``_assemble_shingle_lookup``)
    that workers read zero-copy, so the pair pass is two slice gathers
    plus a sorted-intersection count per pair — zero shuffles, no
    full-corpus re-extraction, and no per-worker re-tokenization (the
    round-2 anti-scaling cause). The margin band is a narrow est
    window, so this covers every realistic run; beyond the cap, texts
    attach via two hash joins against the (fully re-extracted) pages
    and ``_ShingleRecheck`` shingles per worker with a cross-batch
    cache instead."""
    # pin once: the route-switch count and the chosen route's
    # consumption would otherwise each run the lazy pending lineage
    pending = pending.materialize()
    if pending.count() <= _BROADCAST_PENDING_CAP:
        return _recheck_broadcast(pending, pages, config)
    return _recheck_join(pending, pages, config, num_partitions)


def _recheck_broadcast_tbl(
    pending_tbl: pa.Table,
    pages: ray.data.Dataset,
    config: DedupConfig,
) -> ray.data.Dataset:
    """Broadcast recheck with the (small) pending band already on the
    driver: the url set derives locally — no collection execution."""
    url_arr = pc.unique(
        pa.chunked_array([
            pending_tbl["url_a"].combine_chunks(),
            pending_tbl["url_b"].combine_chunks(),
        ])
    )
    return _recheck_broadcast_core(
        url_arr, ray.data.from_arrow(pending_tbl), len(pending_tbl),
        pages, config,
    )


def _recheck_broadcast(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
) -> ray.data.Dataset:
    # distinct pending urls via raw per-block tasks over the pinned
    # pending blocks (blockops) — no extra execution launch
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    pending = pending.materialize()

    def block_urls(t: pa.Table) -> pa.Array:
        both = pa.chunked_array(
            [t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]
        )
        return pc.unique(both)

    parts = [a for a in map_blocks(pending, block_urls) if len(a)]
    if parts:
        url_arr = pc.unique(pa.chunked_array(parts))
    else:
        url_arr = pa.array([], type=pa.string())
    return _recheck_broadcast_core(
        url_arr, pending, pending.count(), pages, config
    )


# per-process TokenHasher for the distributed shingle-extract pass
# (tasks reuse prestarted worker processes; the Zipfian token cache
# persists across blocks in the same process)
_EXTRACT_HASHER = None


def _filter_shingle_block(
    t: pa.Table, uid_ref, lowercase: bool, shingle_size: int
) -> pa.Table:
    """One pages block -> (url, shingles) rows for the pending-band urls
    of THIS block. Membership is a searchsorted probe against the
    broadcast SORTED uid vector (O(batch x log n), no per-batch hash
    table — ``pc.is_in`` rebuilt a hash table over the whole wanted set
    per batch and saturated memory bandwidth at 32 workers). SipHash
    false positives just add an unused row (the pair lookup re-confirms
    urls). Each matched text is tokenized + shingled HERE, exactly once
    cluster-wide — per-worker shingle caches in the old pair loop meant
    every extra worker re-tokenized the same cluster texts, the measured
    anti-scaling of the recheck stage (21.6 s @8 -> 32.8 s @32 CPUs at
    3.84M docs)."""
    global _EXTRACT_HASHER
    from ordinarydumpdeduplicator_ray.functions.hashing import (
        TokenHasher,
        shingle_hashes,
        url_uids,
    )
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    empty = pa.schema(
        [("url", pa.string()), ("shingles", pa.large_binary())]
    ).empty_table()
    if len(t) == 0:
        return empty
    wanted = _get_broadcast(uid_ref)  # sorted int64, zero-copy per process
    if len(wanted) == 0:
        return empty
    u = url_uids(t["url"])
    pos = np.minimum(np.searchsorted(wanted, u), len(wanted) - 1)
    t = t.filter(pa.array(wanted[pos] == u))
    if len(t) == 0:
        return empty
    e = extract_batch(t)
    if _EXTRACT_HASHER is None:
        _EXTRACT_HASHER = TokenHasher()
    hasher = _EXTRACT_HASHER
    packed = []
    for text in e["text"].to_pylist():
        if text is None:
            packed.append(None)
            continue
        toks = tokenize(text, lowercase)
        s = shingle_hashes(hasher.hash_tokens(toks), shingle_size) \
            if toks else np.empty(0, dtype=np.uint64)
        packed.append(s.tobytes())
    return pa.table(
        {"url": e["url"], "shingles": pa.array(packed, type=pa.large_binary())}
    )


@ray.remote
def _assemble_shingle_lookup(*blocks) -> dict:
    """Worker-side assembly of the per-block (url, shingles) tables into
    ONE packed uid-sorted lookup: sorted int64 uids + perm to concat
    order + concat-order url array (collision confirm) + the flat
    uint64 shingle buffer with absolute per-row word offsets. Runs as a
    single remote task whose output IS the broadcast object — the
    shingle payload never transits the driver heap (same pattern as
    ``_assemble_lookup``)."""
    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
    from ordinarydumpdeduplicator_ray.stages.blockops import _as_table

    tables = [t for t in (_as_table(b) for b in blocks) if len(t)]
    if not tables:
        return {
            "uids": np.empty(0, dtype=np.int64),
            "perm": np.empty(0, dtype=np.int64),
            "urls": pa.array([], type=pa.string()),
            "flat": np.empty(0, dtype=np.uint64),
            "starts": np.empty(0, dtype=np.int64),
            "ends": np.empty(0, dtype=np.int64),
        }
    tbl = pa.concat_tables(tables).combine_chunks()
    col = tbl["shingles"].combine_chunks()
    # large_binary layout: buffers()[1] = int64 BYTE offsets,
    # buffers()[2] = data; shingle rows are uint64 words, so word
    # offsets = byte offsets / 8 (absolute into the shared data buffer)
    off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    valid = np.asarray(pc.is_valid(col))
    data_buf = col.buffers()[2]
    flat = (
        np.frombuffer(data_buf, dtype=np.uint64)
        if data_buf is not None and len(data_buf) >= 8
        else np.empty(0, dtype=np.uint64)
    )
    starts = off[:-1] // 8
    ends = np.where(valid, off[1:] // 8, starts)  # null text -> empty run
    raw = url_uids(tbl["url"])
    perm = np.argsort(raw, kind="stable")
    return {
        "uids": raw[perm],
        "perm": perm,
        "urls": tbl["url"].combine_chunks(),
        "flat": flat,
        "starts": starts.astype(np.int64),
        "ends": ends.astype(np.int64),
    }


class _ShingleLookupRecheck:
    """Pair recheck against the packed shingle lookup: uids resolve by
    searchsorted + vectorized url confirm (equal-uid runs scanned in
    full on the astronomically-rare SipHash collision), and each pair's
    exact Jaccard is a searchsorted membership count over two PRE-SORTED
    unique shingle slices — no tokenization, no hash tables, no text in
    the pair loop."""

    def __init__(self, config: DedupConfig, lookup_ref) -> None:
        self.config = config
        self.lk = _get_broadcast(lookup_ref)

    def _resolve(self, col) -> np.ndarray:
        """url column -> concat-order lookup row, -1 where absent."""
        from ordinarydumpdeduplicator_ray.functions.hashing import url_uids

        lk = self.lk
        uids, perm, urls = lk["uids"], lk["perm"], lk["urls"]
        n = len(col)
        if len(uids) == 0 or n == 0:
            return np.full(n, -1, dtype=np.int64)
        u = url_uids(col)
        lo = np.searchsorted(uids, u, side="left")
        present = (lo < len(uids)) & (uids[np.minimum(lo, len(uids) - 1)] == u)
        rows = np.where(present, perm[np.minimum(lo, len(uids) - 1)], 0)
        same = pc.fill_null(
            pc.equal(col, urls.take(pa.array(rows))), False
        ).to_numpy(zero_copy_only=False)
        out = np.where(present & same, rows, -1)
        # rare path: uid present but leftmost run row is a different url
        # (SipHash collision inside the lookup) — scan the full run
        misses = np.nonzero(present & ~same)[0]
        if len(misses):
            hi = np.searchsorted(uids, u[misses], side="right")
            col_py = col.to_pylist()
            for j, i in enumerate(misses):
                for p in range(lo[i] + 1, hi[j]):
                    r = perm[p]
                    if urls[int(r)].as_py() == col_py[i]:
                        out[i] = r
                        break
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        thr = self.config.jaccard_threshold
        lk = self.lk
        flat, starts, ends = lk["flat"], lk["starts"], lk["ends"]
        n = len(t)
        keep = np.zeros(n, dtype=bool)
        jac = np.zeros(n, dtype=np.float64)
        ra = self._resolve(t["url_a"])
        rb = self._resolve(t["url_b"])
        for i in range(n):
            ia, ib = ra[i], rb[i]
            if ia < 0 or ib < 0:
                continue
            a = flat[starts[ia]:ends[ia]]
            b = flat[starts[ib]:ends[ib]]
            if not len(a) or not len(b):
                continue
            if len(a) > len(b):
                a, b = b, a
            pos = np.searchsorted(b, a)
            pos_ok = pos < len(b)
            inter = int(
                np.count_nonzero(b[np.minimum(pos, len(b) - 1)][pos_ok] == a[pos_ok])
            )
            union = len(a) + len(b) - inter
            j = inter / union if union else 0.0
            jac[i] = j
            keep[i] = j >= thr
        cols = ["url_a", "url_b"] + [c for c in ("nb_a", "nb_b")
                                     if c in t.column_names]
        out = t.select(cols).filter(pa.array(keep))
        m = len(out)
        return out.append_column(
            "source", pa.array(["minhash"] * m, type=pa.string())
        ).append_column("jaccard", pa.array(jac[keep], type=pa.float64()))


# one _ShingleLookupRecheck per worker process (tasks-over-actors, same
# rationale as _BROADCAST_CACHE); keyed by the lookup ref
_RECHECK_STATE: dict = {}

# per-process _ShingleRecheck for the join fallback path, keyed by the
# config fields its kernels read (its text->shingles cache then persists
# across task invocations in the same worker process)
_JOIN_RECHECK_STATE: dict = {}


def _join_recheck_batch(t: pa.Table, config: DedupConfig) -> pa.Table:
    key = (config.jaccard_threshold, config.lowercase, config.shingle_size)
    inst = _JOIN_RECHECK_STATE.get(key)
    if inst is None:
        inst = _ShingleRecheck(config)
        _JOIN_RECHECK_STATE.clear()
        _JOIN_RECHECK_STATE[key] = inst
    return inst(t)


def _recheck_batch(t: pa.Table, config: DedupConfig, lookup_ref) -> pa.Table:
    key = lookup_ref.hex()
    inst = _RECHECK_STATE.get(key)
    if inst is None:
        inst = _ShingleLookupRecheck(config, lookup_ref)
        _RECHECK_STATE.clear()
        _RECHECK_STATE[key] = inst
    return inst(t)


def _recheck_broadcast_core(
    url_arr,
    pending: ray.data.Dataset,
    n_pending: int,
    pages: ray.data.Dataset,
    config: DedupConfig,
) -> ray.data.Dataset:
    """Distributed recheck, zero shuffles: the pending url set becomes a
    broadcast SORTED uid vector; a map over the pages blocks filters to
    those urls and tokenizes/shingles each matched text ONCE (the text
    re-read is sharded by the pages' own blocks — every worker reads a
    disjoint slice); one remote task packs the shingle sets into a
    uid-sorted flat-buffer lookup; and the pair pass gathers two slices
    + a searchsorted intersection count per pair."""
    import functools

    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
    from ordinarydumpdeduplicator_ray.stages.blockops import block_refs

    import os
    import sys
    import time as _t

    _prof = os.environ.get("GRAFT_PROF") == "1"
    _t0 = _t.perf_counter()
    uid_ref = ray.put(np.sort(url_uids(url_arr)))
    tmat = pages.map_batches(
        functools.partial(
            _filter_shingle_block,
            uid_ref=uid_ref,
            lowercase=config.lowercase,
            shingle_size=config.shingle_size,
        ),
        batch_format="pyarrow",
    ).materialize()
    _t1 = _t.perf_counter()
    lookup_ref = _assemble_shingle_lookup.remote(*block_refs(tmat))
    if _prof:
        ray.wait([lookup_ref])
        print(
            f"[GRAFT_PROF] recheck n_urls={len(url_arr)} n_pending={n_pending} "
            f"filter_shingle={_t1 - _t0:.2f}s assemble={_t.perf_counter() - _t1:.2f}s",
            file=sys.stderr, flush=True,
        )

    # map tasks are per-BLOCK: a pending set that arrives as one or two
    # blocks would run the whole shingle recheck on one core. Split it
    # so the per-pair work spreads across the session's CPUs.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    want_blocks = min(n_cpus, max(1, n_pending // 1024))
    if pending.num_blocks() < want_blocks:
        pending = pending.repartition(want_blocks)
    return pending.map_batches(
        functools.partial(_recheck_batch, config=config, lookup_ref=lookup_ref),
        batch_format="pyarrow",
        batch_size=4096,
    )


def _recheck_join(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    def url_text(t: pa.Table) -> pa.Table:
        e = extract_batch(t)
        return pa.table({"url": e["url"], "text": e["text"]})

    # materialize the extracted texts ONCE — both side joins reuse the
    # same blocks (two independent lazy lineages would re-extract the
    # whole corpus twice inside the join materializations)
    texts = pages.map_batches(url_text, batch_format="pyarrow").materialize()
    base = [("url_a", pa.string()), ("url_b", pa.string()),
            ("nb_a", pa.int64()), ("nb_b", pa.int64()),
            ("source", pa.string()), ("jaccard", pa.float64())]
    with_a = inner_join(
        pending,
        texts.map_batches(
            lambda t: pa.table({"url_a": t["url"], "text_a": t["text"]}),
            batch_format="pyarrow",
        ),
        on=("url_a",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(base + [("text_a", pa.string())]),
    )
    with_ab = inner_join(
        with_a,
        texts.map_batches(
            lambda t: pa.table({"url_b": t["url"], "text_b": t["text"]}),
            batch_format="pyarrow",
        ),
        on=("url_b",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(base + [("text_a", pa.string()), ("text_b", pa.string())]),
    )
    # stateless TASK map (per-process _ShingleRecheck via _join_recheck
    # _JOIN_RECHECK_STATE), not an actor pool: a fixed-size pool stacked
    # on the two JoinOperators' aggregator actors can deadlock a small
    # CPU budget (observed at num_cpus=4: pool + 2x join aggregators >
    # CPUs, executor stalls); tasks size themselves to whatever is free.
    import functools

    return with_ab.map_batches(
        functools.partial(_join_recheck_batch, config=config),
        batch_format="pyarrow",
        batch_size=1024,
    )
