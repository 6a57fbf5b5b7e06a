"""Embedding-cosine near-duplicate pairs — bucketed sign-LSH, fully
distributed.

Scale path for "find every pair with cosine >= threshold" over a
``list<float>`` embedding column, with NO driver-side materialization and
NO full-matrix broadcast (the round-1 version pulled every embedding to
the driver and shipped the whole normalized matrix to each worker):

1. **Codes** (actor pool): each vector -> an ``nbits``-bit sign code
   against a seeded random-hyperplane matrix (state built once per
   actor). Two vectors at angle theta disagree per bit with probability
   theta/pi, so near-parallel vectors share almost all bits — an
   exactly-parallel pair (cos = 1.0) shares every bit by construction.
2. **Banding**: the code splits into ``nbits/band_bits`` bands; each band
   becomes a 64-bit mixed bucket key. A pair is a candidate if ANY band
   matches. With the defaults (128 bits, 8 bands of 16), a pair at
   cos 0.99 agrees per bit w.p. ``1 - acos(.99)/pi ~ .9857``; the miss
   probability ``(1 - .9857^16)^8 < 1e-11`` — recall is 1 for exact
   scaled copies and ~1 through the threshold band.
3. **Candidates**: the (bucket, vec_id) rows flow through the skew-capped
   sorted-run pair emission of ``stages/candidates.py`` — one sort, O(n)
   hot-bucket handling (identical-code clusters larger than
   ``max_group_pairs`` emit star+chain, which keeps connectivity; the
   pairs list for such clusters is intentionally not all-C(n,2)).
   Members are the int64 vec_ids themselves — 8-byte sort keys, no
   string round-trip anywhere in the explode or the pair table.
4. **Verify** (exact): below ``_BROADCAST_ID_CAP`` distinct
   pair-participating ids, the (pre-normalized) vectors for ONLY those
   ids pack into a broadcast (ids, matrix) lookup resolved per pair
   batch with one ``searchsorted`` + numpy row gathers — zero shuffles
   (same rationale as stages/verify.py: one Ray hash join costs ~19s of
   fixed overhead at any partition count). Beyond the cap, two hash
   joins attach the vectors per side. Either way the exact cosine is
   computed vectorized and pairs below threshold are dropped — LSH only
   proposes; every emitted pair carries its true cosine.

Returns a Dataset — the result streams; nothing materializes on the
driver beyond the capped pair-id lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import combine_hash_rows
from ordinarydumpdeduplicator_ray.functions.vectors import list_to_matrix
from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs
from ordinarydumpdeduplicator_ray.stages.join import inner_join

# per-process hyperplane cache: band coding runs as TASKS on prestarted
# workers (fresh actor pools pay ~10s import spin-up); the seeded plane
# matrix still builds once per worker process
_PLANES: dict = {}


def _planes_of(dim: int, nbits: int, seed: int) -> np.ndarray:
    key = (dim, nbits, seed)
    planes = _PLANES.get(key)
    if planes is None:
        planes = np.random.default_rng(seed).standard_normal((dim, nbits))
        _PLANES.clear()
        _PLANES[key] = planes
    return planes


def _band_codes(t: pa.Table, nbits: int, band_bits: int, seed: int) -> pa.Table:
    """One batch of (vec_id, embedding) -> (bucket, vec_id) band rows."""
    if len(t) == 0:
        return pa.table({"bucket": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64())})
    ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_to_matrix(t["embedding"])
    planes = _planes_of(mat.shape[1], nbits, seed)
    bits = (mat @ planes) > 0  # (n, nbits)
    n_bands = nbits // band_bits
    keys = np.empty((len(ids), n_bands), dtype=np.uint64)
    for b in range(n_bands):
        chunk = bits[:, b * band_bits : (b + 1) * band_bits]
        packed = np.zeros(len(ids), dtype=np.uint64)
        for j in range(chunk.shape[1]):
            packed = (packed << np.uint64(1)) | chunk[:, j].astype(np.uint64)
        keys[:, b] = combine_hash_rows(packed.reshape(-1, 1), salt=b)
    return pa.table(
        {
            "bucket": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
            "vec_id": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
        }
    )


def embedding_near_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.99,
    nbits: int = 128,
    band_bits: int = 16,
    seed: int = 42,
    num_partitions: int = 8,
    concurrency: int = 4,
    config: DedupConfig | None = None,
) -> ray.data.Dataset:
    """embeddings(vec_id:int64, embedding:list<float>) -> Dataset
    (vec_a, vec_b, cos_sim) for every pair with round(cos, 6) >=
    threshold (vec_a < vec_b), via banded sign-LSH + exact re-rank."""
    cfg = config or DedupConfig()
    import functools

    if nbits % band_bits:
        raise ValueError(
            f"embedding_near_dup_pairs: nbits ({nbits}) must be divisible "
            f"by band_bits ({band_bits}) — trailing hyperplane bits would "
            "silently drop from every band key"
        )
    # consumed twice (band coding + re-rank vector fetch) — pin the
    # input lineage so an expensive upstream (read/synthesis) runs once
    embeddings = embeddings.materialize()
    bucket_rows = embeddings.map_batches(
        functools.partial(_band_codes, nbits=nbits, band_bits=band_bits, seed=seed),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    pairs = candidate_pairs(
        bucket_rows, cfg, num_partitions, member_field=("vec_id", pa.int64())
    ).materialize()

    # the broadcast cap is a BYTE budget: id count alone ignores the
    # embedding dim (2M ids x 768 dims ~= 12 GiB — the case the old
    # fixed id cap let through)
    sample = embeddings.take_batch(1, batch_format="pyarrow")
    dim = len(sample["embedding"][0]) if len(sample) else 1
    id_cap = min(_BROADCAST_ID_CAP,
                 max(1, _BROADCAST_BYTE_BUDGET // (max(dim, 1) * 8)))
    pair_ids = _collect_pair_ids(pairs, id_cap)
    if pair_ids is not None:
        return _rerank_broadcast(pairs, embeddings, pair_ids, threshold)
    return _rerank_join(pairs, embeddings, threshold, num_partitions)


# distinct pair ids above which the normalized-vector lookup no longer
# broadcasts and re-ranking falls back to the shuffle joins; the
# effective cap also honors a byte budget scaled by the embedding dim
# (the matrix is dim x 8 B per id)
_BROADCAST_ID_CAP = 2_000_000
_BROADCAST_BYTE_BUDGET = 2 << 30  # ~2 GiB of normalized vectors


def _collect_pair_ids(pairs: ray.data.Dataset, cap: int) -> pa.Array | None:
    """Distinct pair ids or None above ``cap`` — the shared per-block
    early-bail collector (stages/candidates.collect_pair_ids)."""
    from ordinarydumpdeduplicator_ray.stages.candidates import collect_pair_ids

    return collect_pair_ids(pairs, cap, a_col="vec_id_a", b_col="vec_id_b")


def _rerank_broadcast(
    pairs: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    pair_ids: pa.Array,
    threshold: float,
) -> ray.data.Dataset:
    """Exact cosine re-rank with a broadcast (sorted ids, normalized
    matrix) lookup — no joins; resolution is one searchsorted + two row
    gathers per batch."""
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_sim", pa.float64())]
    )
    if len(pair_ids) == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    ids_ref = ray.put(pair_ids)

    def project(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        t = t.filter(pc.is_in(t["vec_id"], value_set=wanted))
        if len(t) == 0:
            return pa.table({"ids": pa.array([], type=pa.binary()),
                             "mat": pa.array([], type=pa.binary())})
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pa.table({"ids": pa.array([ids.tobytes()], type=pa.binary()),
                         "mat": pa.array([mat.tobytes()], type=pa.binary())})

    parts = [
        r for r in embeddings.map_batches(project, batch_format="pyarrow").take_all()
        if r["ids"]
    ]
    if not parts:
        return ray.data.from_arrow(out_schema.empty_table())
    ids = np.concatenate([np.frombuffer(r["ids"], dtype=np.int64) for r in parts])
    mat = np.concatenate(
        [np.frombuffer(r["mat"], dtype=np.float64).reshape(len(np.frombuffer(r["ids"], dtype=np.int64)), -1)
         for r in parts]
    )
    order = np.argsort(ids)
    lookup_ref = ray.put({"ids": ids[order], "mat": mat[order]})

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        lk = _get_broadcast(lookup_ref)
        ids_s, mat_s = lk["ids"], lk["mat"]
        a_ids = t["vec_id_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b_ids = t["vec_id_b"].combine_chunks().to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_s, a_ids)
        ib = np.searchsorted(ids_s, b_ids)
        ia = np.minimum(ia, len(ids_s) - 1)
        ib = np.minimum(ib, len(ids_s) - 1)
        found = (ids_s[ia] == a_ids) & (ids_s[ib] == b_ids)
        cos = np.round(np.einsum("ij,ij->i", mat_s[ia], mat_s[ib]), 6)
        keep = found & (cos >= threshold)
        return pa.table(
            {
                "vec_a": pa.array(a_ids[keep], type=pa.int64()),
                "vec_b": pa.array(b_ids[keep], type=pa.int64()),
                "cos_sim": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def _rerank_join(
    pairs: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    threshold: float,
    num_partitions: int,
) -> ray.data.Dataset:
    """Shuffle-join re-rank fallback for pair-id sets too large to
    broadcast: attach the embedding per side (packed to binary — Acero
    joins reject list<double> payload columns), compute cosine
    vectorized after the join. Join keys are the int64 vec_ids."""

    def keyed(t: pa.Table) -> pa.Table:
        mat = list_to_matrix(t["embedding"])
        packed = [row.tobytes() for row in mat]
        return pa.table(
            {"key": t["vec_id"], "embedding": pa.array(packed, type=pa.binary())}
        )

    vecs = embeddings.map_batches(keyed, batch_format="pyarrow")
    emb_t = pa.binary()
    with_a = inner_join(
        pairs,
        vecs.map_batches(
            lambda t: pa.table({"vec_id_a": t["key"], "emb_a": t["embedding"]}),
            batch_format="pyarrow",
        ),
        on=("vec_id_a",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()), ("emb_a", emb_t)]
        ),
    )
    with_ab = inner_join(
        with_a,
        vecs.map_batches(
            lambda t: pa.table({"vec_id_b": t["key"], "emb_b": t["embedding"]}),
            batch_format="pyarrow",
        ),
        on=("vec_id_b",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()),
             ("emb_a", emb_t), ("emb_b", emb_t)]
        ),
    )

    out_schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_sim", pa.float64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        a = np.frombuffer(b"".join(t["emb_a"].to_pylist()), dtype=np.float64).reshape(len(t), -1)
        b = np.frombuffer(b"".join(t["emb_b"].to_pylist()), dtype=np.float64).reshape(len(t), -1)
        a = a / np.linalg.norm(a, axis=1, keepdims=True)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        cos = np.round(np.einsum("ij,ij->i", a, b), 6)
        keep = cos >= threshold
        keep_arr = pa.array(keep)
        return pa.table(
            {
                "vec_a": t["vec_id_a"].filter(keep_arr),
                "vec_b": t["vec_id_b"].filter(keep_arr),
                "cos_sim": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")
