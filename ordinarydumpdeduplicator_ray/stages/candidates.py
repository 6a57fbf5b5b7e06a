"""Candidate generation: LSH band explode, SimHash block explode, and
skew-aware pair emission.

This generalizes the reference's exact-key grouping
(``DataControllerSimple.GetDuplicates``, ``DataControllerSimple.cs:247-304``)
to similarity bucket keys (SURVEY.md §2.4 "LSH candidate generation").

Skew design (north rule: explicit hot-key handling): bucket keys on web
data are Zipfian (boilerplate). Pair emission therefore splits buckets by
size using a vectorized count aggregate:

- **cold buckets** (2 <= n <= ``max_group_pairs``): a hash-shuffle
  self-join emits all C(n,2) pairs — fully vectorized (Acero), blowup
  bounded by the cap squared;
- **hot buckets** (n > cap): explicitly SALTED (north rule) — each hot
  bucket splits into ``salt_buckets`` sub-buckets by url hash so no
  single reducer ever holds a full boilerplate cluster; each sub-bucket
  emits O(n) star-to-canonical + sorted-chain pairs, and a second (tiny)
  pass chains the per-sub-bucket minimum urls so the cluster stays
  connected across salts.

No stage materializes all-pairs; everything streams through groupby /
join shuffles keyed on the bucket key.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import combine_hash_rows
from ordinarydumpdeduplicator_ray.functions.simhash import simhash_block_keys
from ordinarydumpdeduplicator_ray.stages.join import inner_join


def _minhash_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(valid_row_indices, (n_valid, K) uint64 matrix) from the packed
    binary minhash column."""
    col = batch["minhash"].to_pylist()
    idx = [i for i, b in enumerate(col) if b is not None]
    if not idx:
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.uint64)
    mat = np.vstack([np.frombuffer(col[i], dtype="<u8") for i in idx])
    return np.asarray(idx, dtype=np.int64), mat


def explode_minhash_bands(signatures: ray.data.Dataset, config: DedupConfig) -> ray.data.Dataset:
    """signatures -> (bucket, url) rows, one per (row, band). bucket is a
    64-bit mix of (band index, the band's r signature values)."""
    b, r = config.lsh_bands, config.lsh_rows

    def explode(batch: pa.Table) -> pa.Table:
        idx, mat = _minhash_matrix(batch)
        if len(idx) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string())})
        urls = np.asarray(batch["url"].to_pylist(), dtype=object)[idx]
        keys = np.empty((len(idx), b), dtype=np.uint64)
        for band in range(b):
            keys[:, band] = combine_hash_rows(mat[:, band * r : (band + 1) * r], salt=band)
        # int64 bit-reinterpretation: groupby/aggregate round-trips through
        # pandas, where full-range uint64 degrades to pickled objects.
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "url": pa.array(np.repeat(urls, b), type=pa.string()),
            }
        )

    return signatures.map_batches(explode, batch_format="pyarrow")


def explode_simhash_blocks(signatures: ray.data.Dataset, config: DedupConfig) -> ray.data.Dataset:
    """signatures -> (bucket, url) rows, one per (row, simhash block).
    Pairs within Hamming distance <= blocks-1 share at least one block
    (pigeonhole), so block-bucket grouping catches them all."""
    blocks = config.simhash_blocks

    def explode(batch: pa.Table) -> pa.Table:
        col = batch["simhash"].to_pylist()
        idx = [i for i, v in enumerate(col) if v is not None]
        if not idx:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string())})
        sims = np.array([col[i] for i in idx], dtype=np.uint64)
        urls = np.asarray(batch["url"].to_pylist(), dtype=object)[idx]
        keys = simhash_block_keys(sims, blocks)
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "url": pa.array(np.repeat(urls, blocks), type=pa.string()),
            }
        )

    return signatures.map_batches(explode, batch_format="pyarrow")


def _chain_star_pairs(group: pa.Table) -> pa.Table:
    """O(n) pair emission for one hot bucket: star to min url + sorted
    chain — preserves connectivity without C(n,2) blowup. Arrow in/out so
    hot-path blocks union cleanly with the cold self-join's blocks."""
    urls = np.sort(np.asarray(group["url"].to_pylist(), dtype=object))
    if len(urls) < 2:
        return pa.table({"url_a": pa.array([], type=pa.string()),
                         "url_b": pa.array([], type=pa.string())})
    star_a = np.repeat(urls[0], len(urls) - 1)
    star_b = urls[1:]
    chain_a = urls[1:-1]
    chain_b = urls[2:]
    return pa.table(
        {
            "url_a": pa.array(np.concatenate([star_a, chain_a]), type=pa.string()),
            "url_b": pa.array(np.concatenate([star_b, chain_b]), type=pa.string()),
        }
    )


def candidate_pairs(
    bucket_rows: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(bucket, url) rows -> distinct candidate (url_a, url_b) pairs,
    url_a < url_b. See module docstring for the cold/hot split."""
    cap = config.max_group_pairs

    counts = bucket_rows.groupby("bucket").aggregate(Count(alias_name="n")).materialize()
    dup_keys = counts.filter(expr=f"n >= 2 and n <= {cap}").drop_columns(["n"])
    hot_keys = counts.filter(expr=f"n > {cap}").drop_columns(["n"]).materialize()

    bucket_url = pa.schema([("bucket", pa.int64()), ("url", pa.string())])
    # cold: semi-join rows onto small dup buckets, then self-join
    cold_rows = inner_join(bucket_rows, dup_keys, on=("bucket",),
                           num_partitions=num_partitions, empty_schema=bucket_url)
    left = cold_rows.map_batches(
        lambda t: pa.table({"bucket": t["bucket"], "url_a": t["url"]}),
        batch_format="pyarrow",
    )
    right = cold_rows.map_batches(
        lambda t: pa.table({"bucket": t["bucket"], "url_b": t["url"]}),
        batch_format="pyarrow",
    )
    pairs = inner_join(
        left, right, on=("bucket",), num_partitions=num_partitions,
        empty_schema=pa.schema([("bucket", pa.int64()), ("url_a", pa.string()),
                                ("url_b", pa.string())]),
    ).filter(expr="url_a < url_b").drop_columns(["bucket"])

    # hot: few giant buckets -> salt into sub-buckets, O(n) chain+star
    # per sub-bucket, then link sub-bucket minima (connectivity)
    if hot_keys.count() > 0:
        n_salts = config.salt_buckets
        hot_rows = inner_join(bucket_rows, hot_keys, on=("bucket",),
                              num_partitions=num_partitions, empty_schema=bucket_url)

        def add_salt(t: pa.Table) -> pa.Table:
            salts = np.asarray(
                [zlib.crc32(u.encode()) % n_salts for u in t["url"].to_pylist()],
                dtype=np.int64,
            )
            return t.append_column("salt", pa.array(salts, type=pa.int64()))

        salted = hot_rows.map_batches(add_salt, batch_format="pyarrow")
        pairs_sub = salted.groupby(["bucket", "salt"]).map_groups(
            _chain_star_pairs, batch_format="pyarrow"
        )
        minima = salted.groupby(["bucket", "salt"]).aggregate(
            Min("url", alias_name="url")
        )
        pairs_link = minima.groupby("bucket").map_groups(
            _chain_star_pairs, batch_format="pyarrow"
        )
        pairs = pairs.union(pairs_sub).union(pairs_link)

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return pairs
    # distinct across buckets/bands — vectorized count aggregate, not map_groups
    return (
        pairs.groupby(["url_a", "url_b"])
        .aggregate(Count(alias_name="n_buckets"))
        .drop_columns(["n_buckets"])
    )
