"""Bucket-partitioned inverted token index: build, APPEND, lookup.

Layout: (token, key, tf) postings as Parquet under
``<root>/bucket=<md5(token) % buckets>/``. A term lookup reads ONE
bucket directory (partition-pruned); an incremental crawl appends its
new documents' postings as ADDITIONAL files inside each bucket — no
rewrite of the existing index — and readers see the union for free
because a bucket read lists the directory. When appends fragment a
bucket, ``sources/compact.py`` rewrites it to target-size files; the
three pieces together are the index lifecycle a 100-TB ingest runs.

The key column is caller-defined (url for page corpora, doc_id cast to
string for the documents table) so the index serves both shapes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_BUCKETS = 16


def token_bucket(term: str, buckets: int = DEFAULT_BUCKETS) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % buckets


def postings_batch(
    t: pa.Table, key_col: str, buckets: int = DEFAULT_BUCKETS
) -> pa.Table:
    """One batch of (key, text) rows -> (token, key, tf, bucket)
    postings. Per-block tf combiner via ONE Arrow sort of the
    (key-position, token) pairs + neighbor-inequality run detection —
    no per-row Python beyond the bucket hash of the (small) distinct
    set."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        _doc_token_lists,
    )

    empty = pa.table({
        "token": pa.array([], type=pa.string()),
        "key": pa.array([], type=pa.string()),
        "tf": pa.array([], type=pa.int64()),
        "bucket": pa.array([], type=pa.int64()),
    })
    if len(t) == 0:
        return empty
    flat, n_per_doc = _doc_token_lists(t)
    if len(flat) == 0:
        return empty
    keys = t[key_col].combine_chunks()
    pos = np.repeat(np.arange(len(t), dtype=np.int64), n_per_doc)
    pairs = pa.table({"pos": pa.array(pos, type=pa.int64()), "token": flat})
    order = pc.sort_indices(
        pairs, sort_keys=[("pos", "ascending"), ("token", "ascending")]
    )
    s_pos = pc.take(pairs["pos"], order).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    s_tok = pc.take(pairs["token"], order).combine_chunks()
    n = len(s_pos)
    pos_change = np.concatenate([[True], s_pos[1:] != s_pos[:-1]])
    tok_change = np.concatenate([[True], pc.not_equal(
        s_tok.slice(1), s_tok.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)])
    starts = np.flatnonzero(pos_change | tok_change)
    tf = np.diff(np.concatenate([starts, [n]]))
    tok_out = s_tok.take(pa.array(starts))
    key_out = keys.take(pa.array(s_pos[starts]))
    bkt = np.array(
        [token_bucket(x, buckets) for x in tok_out.to_pylist()],
        dtype=np.int64,
    )
    return pa.table({
        "token": tok_out,
        "key": pc.cast(key_out, pa.string()),
        "tf": pa.array(tf, type=pa.int64()),
        "bucket": pa.array(bkt, type=pa.int64()),
    })


def build_token_index(
    docs: ray.data.Dataset, out_dir: str, key_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Stream ``docs`` into a fresh bucket-partitioned index at
    ``out_dir`` (atomic rename; an index already present is REPLACED —
    renamed aside then removed, so readers never see a half-built
    directory and a rebuild never silently keeps the stale index)."""
    tmp = out_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    docs.map_batches(
        lambda t: postings_batch(t, key_col, buckets),
        batch_format="pyarrow",
    ).write_parquet(tmp, partition_cols=["bucket"])
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # out_dir already exists: replace it (rename aside -> swap in
        # -> drop the old). The pre-fix branch assumed "concurrent
        # builder won" and DISCARDED the fresh build, silently serving
        # the stale index after every rebuild.
        old = out_dir.rstrip("/") + f".old-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(out_dir, old)
            os.rename(tmp, out_dir)
            shutil.rmtree(old, ignore_errors=True)
        except OSError:  # genuine concurrent-builder race
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def append_token_index(
    idx_dir: str, docs: ray.data.Dataset, key_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Append ``docs``' postings to an EXISTING index: the delta is
    written bucket-partitioned to a scratch dir, then each delta file
    moves into its live bucket directory under a unique name — no
    existing file is touched, a crash loses only the un-moved delta.
    Returns the number of posting rows appended."""
    scratch = os.path.join(
        os.path.dirname(idx_dir.rstrip("/")),
        f".{os.path.basename(idx_dir.rstrip('/'))}.delta-{uuid.uuid4().hex[:8]}",
    )
    delta = docs.map_batches(
        lambda t: postings_batch(t, key_col, buckets),
        batch_format="pyarrow",
    ).materialize()
    n_rows = delta.count()
    if n_rows == 0:
        # nothing to append: write_parquet creates no scratch dir for
        # an empty delta, so listing it would crash the ingest
        return 0
    delta.write_parquet(scratch, partition_cols=["bucket"])
    for bdir in sorted(os.listdir(scratch)):
        src_b = os.path.join(scratch, bdir)
        if not (bdir.startswith("bucket=") and os.path.isdir(src_b)):
            continue
        dst_b = os.path.join(idx_dir, bdir)
        os.makedirs(dst_b, exist_ok=True)
        for f in os.listdir(src_b):
            os.rename(
                os.path.join(src_b, f),
                os.path.join(dst_b, f"delta-{uuid.uuid4().hex[:8]}-{f}"),
            )
    shutil.rmtree(scratch, ignore_errors=True)
    return n_rows


def lookup_postings(
    idx_dir: str, term: str, buckets: int = DEFAULT_BUCKETS
) -> ray.data.Dataset:
    """Postings (key, tf) for ``term`` — reads ONLY the term's bucket
    partition; missing bucket = empty result."""
    part = os.path.join(idx_dir, f"bucket={token_bucket(term, buckets)}")
    empty = pa.schema([("key", pa.string()), ("tf", pa.int64())])
    if not os.path.isdir(part):
        return ray.data.from_arrow(empty.empty_table())

    # public API taking an arbitrary string: match with a compute
    # predicate, never by interpolating ``term`` into a filter
    # expression (a quote in the term would break or change the
    # expression's meaning — ADVICE round 4)
    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["token"], term)).select(["key", "tf"])

    return ray.data.read_parquet(part).map_batches(
        match, batch_format="pyarrow"
    )
