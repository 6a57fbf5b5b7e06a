"""Bloom-filter-gated streaming dedup: new crawl data vs an existing
corpus, without joining the full new corpus against the full prior one.

The 100-TB re-crawl problem: a fresh batch of pages arrives and must be
reduced to the rows whose content the corpus has never seen. A direct
anti-join ships every new sha through a shuffle against every prior
sha. The bloom gate shrinks that to the duplicate rows plus an ``fpp``
sliver of the new ones:

1. **build** — ONE streaming pass over the prior corpus computes a
   per-block partial bloom (k bit positions per sha256, double
   hashing) at the fixed ceiling width ``_MAX_BITS``, each block
   emitting either the dense bitmap or (small blocks) the sparse
   set-bit indices plus its row count; the driver ORs the O(blocks)
   partials and then FOLDS the bitmap down to the smallest
   power-of-two width meeting the fpp target for the row count
   measured in the same pass — pow2 folding (OR of equal segments)
   preserves membership because ``x & (m_small-1) ==
   (x & (m_big-1)) & (m_small-1)``. No separate count pass: the prior
   corpus is read exactly once. The bitmap costs ~1.4 bytes/key at 1%
   fpp vs 32 bytes/key for an exact sha set.
2. **probe** — the folded bitmap broadcasts once (``ray.put``); each
   new-page batch tests membership vectorized (numpy gather on the
   word array). Misses are DEFINITELY new (blooms have no false
   negatives) and bypass the join entirely.
3. **verify** — only bloom hits (true dups + fpp false positives)
   enter the exact anti-join against the prior shas
   (``stages/join.py:209`` broadcast path with its shuffle fallback
   above the cap), so the expensive exchange sees ~(dup_rate + fpp)
   of the new corpus instead of all of it.

The final output is EXACT — the bloom only routes rows, it never
decides them — so the operator carries a plain SQL oracle
(``NOT IN`` set difference).

No reference counterpart (the reference re-hashes everything each
scan); this is the streaming-ingest analogue of
``stages/incremental.py``'s re-crawl reuse.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# Fixed build width (2^27 bits = 16 MiB dense) and hash count. k=8 is
# within a few percent of the optimal k across the 8-16 bits/key range
# this filter targets; fixing it lets the build run before n is known.
# Above the ceiling's key capacity, raise rather than silently degrade:
# at cluster scale the build should move to a tree of ray.remote OR
# tasks over a wider bitmap (documented integration point).
_MAX_BITS = 1 << 27
_K = 8


def target_bits(n_keys: int, fpp: float = 0.01) -> int:
    """Smallest power-of-two bit width whose k=8 false-positive rate at
    ``n_keys`` keys meets ``fpp``. Raises at the ceiling."""
    n = max(0, n_keys)
    fpp = max(1e-9, min(0.5, fpp))
    for p in range(6, _MAX_BITS.bit_length()):
        m = 1 << p
        if (1.0 - math.exp(-_K * n / m)) ** _K <= fpp:
            return m
    raise ValueError(
        f"{n_keys} keys exceed the {_MAX_BITS}-bit build ceiling at "
        f"fpp={fpp}; shard the corpus or integrate the tree-OR build "
        "for cluster-scale key counts"
    )


def fold_bits(words: np.ndarray, m_from: int, m_to: int) -> np.ndarray:
    """OR-fold a pow2 bloom bitmap down to a smaller pow2 width
    (membership-preserving)."""
    if m_to == m_from:
        return words
    return np.bitwise_or.reduce(words.reshape(m_from // m_to, m_to // 64), axis=0)


def _sha_digests(texts: pa.Array) -> pa.Array:
    """sha256 per row as 32-byte binary (the hashlib loop is the only
    per-row Python here — sha over variable-length text has no
    vectorized kernel; everything downstream reinterprets buffers)."""
    import hashlib

    return pa.array(
        [hashlib.sha256((v or "").encode("utf-8")).digest()
         for v in texts.to_pylist()],
        type=pa.binary(),
    )


def _h1_h2_from_digests(shas: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Binary sha column -> (h1, h2 odd) uint64 pairs, zero-copy-ish:
    fixed 32-byte rows reinterpret straight out of the Arrow buffer."""
    if isinstance(shas, pa.ChunkedArray):
        shas = shas.combine_chunks()
    n = len(shas)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(shas.buffers()[1], dtype=np.int32, count=n + 1,
                         offset=shas.offset * 4)
    data = np.frombuffer(shas.buffers()[2], dtype=np.uint8)
    mat = data[offs[0]:offs[-1]].reshape(n, 32)
    h1 = np.ascontiguousarray(mat[:, :8]).view("<u8").ravel()
    h2 = np.ascontiguousarray(mat[:, 8:16]).view("<u8").ravel() | np.uint64(1)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, mask: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: (h1 + i*h2) & mask."""
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(mask)


def build_sha_bloom(
    shas: ray.data.Dataset, fpp: float = 0.01, n_expected: int | None = None
) -> dict:
    """Binary ``text_sha256`` dataset -> ``{"bits": uint64 word array,
    "m": int, "k": int}``.

    One streaming pass; each block emits the SMALLER of its dense
    partial bitmap (at the ceiling width) and its sparse set-bit index
    list, plus its row count; the driver ORs O(blocks) partials, then
    folds to the width the measured count requires — no corpus-sized
    driver load and no separate count pass. ``n_expected`` only widens
    the fold target (useful when more keys will be added later)."""
    mask = _MAX_BITS - 1
    n_words = _MAX_BITS // 64

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"dense": pa.array([], type=pa.binary()),
                             "sparse": pa.array([], type=pa.binary()),
                             "n": pa.array([], type=pa.int64())})
        h1, h2 = _h1_h2_from_digests(t["text_sha256"])
        pos = np.unique(_positions(h1, h2, _K, mask).ravel())
        if len(pos) < n_words:
            return pa.table({
                "dense": pa.array([None], type=pa.binary()),
                "sparse": pa.array([pos.tobytes()], type=pa.binary()),
                "n": pa.array([len(t)], type=pa.int64()),
            })
        words = np.zeros(n_words, dtype=np.uint64)
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return pa.table({
            "dense": pa.array([words.tobytes()], type=pa.binary()),
            "sparse": pa.array([None], type=pa.binary()),
            "n": pa.array([len(t)], type=pa.int64()),
        })

    bits = np.zeros(n_words, dtype=np.uint64)
    n_total = 0
    for b in shas.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for dense, sparse, n in zip(
            b["dense"].to_pylist(), b["sparse"].to_pylist(), b["n"].to_pylist()
        ):
            n_total += n
            if dense is not None:
                bits |= np.frombuffer(dense, dtype=np.uint64)
            elif sparse is not None:
                pos = np.frombuffer(sparse, dtype=np.uint64)
                # bitwise_or.at, NOT fancy-index |=: duplicate word
                # indices (distinct bits sharing a word) would be
                # buffered to a single write and silently drop bits
                np.bitwise_or.at(
                    bits, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
    m = target_bits(max(n_total, n_expected or 0), fpp)
    return {"bits": fold_bits(bits, _MAX_BITS, m), "m": m, "k": _K}


def build_text_bloom(
    pages: ray.data.Dataset, fpp: float = 0.01, n_expected: int | None = None
) -> dict:
    """(url, text) corpus -> bloom over sha256(text) (see
    ``build_sha_bloom``; this wrapper hashes inline for callers that
    do not already hold a sha table)."""
    shas = pages.map_batches(
        lambda t: pa.table({"text_sha256": _sha_digests(t["text"].combine_chunks())})
        if len(t) else pa.table({"text_sha256": pa.array([], type=pa.binary())}),
        batch_format="pyarrow",
    )
    return build_sha_bloom(shas, fpp=fpp, n_expected=n_expected)


def _probe_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions -> bool[n]: all k bits set (bloom hit)."""
    words = bits[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_new_docs(
    new_pages: ray.data.Dataset,
    prior_pages: ray.data.Dataset,
    fpp: float = 0.01,
) -> ray.data.Dataset:
    """EXACT set of new-corpus rows whose text the prior corpus lacks,
    as ``(url, text_sha256)`` — bloom-routed, join-verified.

    The prior corpus is READ AND SHA-HASHED EXACTLY ONCE: its narrow
    binary sha table materializes (~32 B/row) and feeds both the bloom
    build and the verify anti-join. The probe output is likewise
    projected to (url, sha, flag) before the materialize that feeds the
    two consumers — full text payloads never materialize on either
    side. Joins and probes run on binary shas; hex is rendered only on
    the output rows.
    """
    from ordinarydumpdeduplicator_ray.stages.join import broadcast_anti_join

    prior_shas = prior_pages.map_batches(
        lambda t: pa.table({"sha_bin": _sha_digests(t["text"].combine_chunks())})
        if len(t) else pa.table({"sha_bin": pa.array([], type=pa.binary())}),
        batch_format="pyarrow",
    ).materialize()

    bloom = build_sha_bloom(
        prior_shas.map_batches(
            lambda t: t.rename_columns(["text_sha256"]), batch_format="pyarrow"
        ),
        fpp=fpp,
    )
    ref = ray.put(bloom["bits"])
    k, mask = bloom["k"], bloom["m"] - 1

    def probe(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"url": pa.array([], type=pa.string()),
                             "sha_bin": pa.array([], type=pa.binary()),
                             "maybe_dup": pa.array([], type=pa.bool_())})
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        bits = _get_broadcast(ref)
        shas = _sha_digests(t["text"].combine_chunks())
        h1, h2 = _h1_h2_from_digests(shas)
        hit = _probe_bits(bits, _positions(h1, h2, k, mask))
        return pa.table({
            "url": t["url"],
            "sha_bin": shas,
            "maybe_dup": pa.array(hit),
        })

    probed = new_pages.map_batches(probe, batch_format="pyarrow").materialize()
    definite = probed.map_batches(
        lambda t: t.filter(pc.invert(t["maybe_dup"])).drop_columns(["maybe_dup"]),
        batch_format="pyarrow",
    )
    cand = probed.map_batches(
        lambda t: t.filter(t["maybe_dup"]).drop_columns(["maybe_dup"]),
        batch_format="pyarrow",
    )

    survivors = broadcast_anti_join(cand, prior_shas, on="sha_bin")

    def to_hex(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"url": pa.array([], type=pa.string()),
                             "text_sha256": pa.array([], type=pa.string())})
        hexes = [v.hex() for v in t["sha_bin"].to_pylist()]
        return pa.table({"url": t["url"],
                         "text_sha256": pa.array(hexes, type=pa.string())})

    return definite.union(survivors).map_batches(to_hex, batch_format="pyarrow")


# --- persistence: the filter survives across ingest runs ---------------------

def bloom_to_table(bloom: dict) -> pa.Table:
    """Bloom -> 1-row Arrow table (bitmap as one binary cell + params)
    for Parquet checkpointing — a re-crawl ingests against yesterday's
    filter without re-reading the prior corpus."""
    return pa.table({
        "bits": pa.array([bloom["bits"].tobytes()], type=pa.binary()),
        "m": pa.array([bloom["m"]], type=pa.int64()),
        "k": pa.array([bloom["k"]], type=pa.int64()),
    })


def bloom_from_table(t: pa.Table) -> dict:
    if len(t) != 1:
        raise ValueError(f"bloom table must have exactly 1 row, got {len(t)}")
    m = t["m"][0].as_py()
    bits = np.frombuffer(t["bits"][0].as_py(), dtype=np.uint64)
    if len(bits) * 64 != m:
        raise ValueError("bloom bitmap length does not match m")
    return {"bits": bits, "m": m, "k": t["k"][0].as_py()}


def save_bloom(bloom: dict, path: str) -> None:
    import pyarrow.parquet as pq

    pq.write_table(bloom_to_table(bloom), path)


def load_bloom(path: str) -> dict:
    import pyarrow.parquet as pq

    return bloom_from_table(pq.read_table(path))
