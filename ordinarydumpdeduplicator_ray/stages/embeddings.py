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
3. **Candidates**: the (bucket, key) rows flow through the skew-capped
   sorted-run pair emission of ``stages/candidates.py`` — one sort, O(n)
   hot-bucket handling (identical-code clusters larger than
   ``max_group_pairs`` emit star+chain, which keeps connectivity; the
   pairs list for such clusters is intentionally not all-C(n,2)).
4. **Verify** (exact): candidate pairs join the embeddings back per side
   (two hash joins) and the exact cosine is computed vectorized; pairs
   below threshold are dropped. LSH only proposes — every emitted pair
   carries its true cosine.

Returns a Dataset — the result streams; nothing materializes on the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import combine_hash_rows
from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs
from ordinarydumpdeduplicator_ray.stages.join import inner_join

_KEY_WIDTH = 12  # zero-padded vec_id -> lexicographic == numeric order


def _key_of(ids: np.ndarray) -> pa.Array:
    return pa.array([f"v{int(i):0{_KEY_WIDTH}d}" for i in ids], type=pa.string())


def _id_of(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pa.array(
        [int(k[1:]) for k in col.to_pylist()], type=pa.int64()
    )


class _CodeBander:
    """Actor: seeded hyperplane matrix (lazy-built at first batch when
    the dimension is known) -> (bucket, url) band rows per vector."""

    def __init__(self, nbits: int, band_bits: int, seed: int) -> None:
        self.nbits = nbits
        self.band_bits = band_bits
        self.seed = seed
        self.planes: np.ndarray | None = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string())})
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((mat.shape[1], self.nbits))
        bits = (mat @ self.planes) > 0  # (n, nbits)
        n_bands = self.nbits // self.band_bits
        keys = np.empty((len(ids), n_bands), dtype=np.uint64)
        for b in range(n_bands):
            chunk = bits[:, b * self.band_bits : (b + 1) * self.band_bits]
            packed = np.zeros(len(ids), dtype=np.uint64)
            for j in range(chunk.shape[1]):
                packed = (packed << np.uint64(1)) | chunk[:, j].astype(np.uint64)
            keys[:, b] = combine_hash_rows(packed.reshape(-1, 1), salt=b)
        urls = np.asarray([f"v{int(i):0{_KEY_WIDTH}d}" for i in ids], dtype=object)
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "url": pa.array(np.repeat(urls, n_bands), type=pa.string()),
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

    bucket_rows = embeddings.map_batches(
        _CodeBander,
        fn_constructor_kwargs={"nbits": nbits, "band_bits": band_bits, "seed": seed},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    pairs = candidate_pairs(bucket_rows, cfg, num_partitions)

    # exact verification: attach the embedding per side (packed to
    # binary — Acero joins reject list<double> payload columns), compute
    # cosine vectorized after the join
    def keyed(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        packed = [
            np.asarray(e, dtype=np.float64).tobytes()
            for e in t["embedding"].to_pylist()
        ]
        return pa.table(
            {"key": _key_of(ids), "embedding": pa.array(packed, type=pa.binary())}
        )

    vecs = embeddings.map_batches(keyed, batch_format="pyarrow")
    emb_t = pa.binary()
    with_a = inner_join(
        pairs,
        vecs.map_batches(
            lambda t: pa.table({"url_a": t["key"], "emb_a": t["embedding"]}),
            batch_format="pyarrow",
        ),
        on=("url_a",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("url_a", pa.string()), ("url_b", pa.string()), ("emb_a", emb_t)]
        ),
    )
    with_ab = inner_join(
        with_a,
        vecs.map_batches(
            lambda t: pa.table({"url_b": t["key"], "emb_b": t["embedding"]}),
            batch_format="pyarrow",
        ),
        on=("url_b",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("url_a", pa.string()), ("url_b", pa.string()),
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
        return pa.table(
            {
                "vec_a": _id_of(t["url_a"].filter(pa.array(keep))),
                "vec_b": _id_of(t["url_b"].filter(pa.array(keep))),
                "cos_sim": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")
