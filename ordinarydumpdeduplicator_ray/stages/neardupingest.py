"""Streaming NEAR-dup ingest against a persisted prior-corpus index.

Completes the ingest trio: ``stages/bloom.py`` gates EXACT re-crawls,
``stages/semdedup.py`` gates semantic re-crawls, and this stage gates
MinHash near-duplicates — new snapshot docs are probed against the
prior corpus WITHOUT re-reading or re-hashing the prior text. The
prior run persists two narrow Parquet tables once
(``persist_near_dup_index``):

- ``buckets/``  — (bucket int64, url) from the minhash band explode
- ``sketches/`` — (url, minhash 8K-byte packed binary)

Ingest (``ingest_near_dup``) computes signatures for the NEW docs
only, explodes their band buckets, inner-joins against the prior
bucket table (the one shuffle — at full scale, partition ``buckets/``
by bucket hash and only probed partitions leave storage), attaches the
candidate prior sketches with a second narrow join, and verifies each
candidate with the vectorized minhash-agreement estimator. Verdict:
one row per new doc — duplicate of the smallest matching prior url,
or new.

Reference parity: the reference's re-inspection only knows
whole-content equality (``DataControllerSimple.cs:190-213``); the
north rule's near-dup extension applied to its incremental-scan shape.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.minhash import packed_minhash
from ordinarydumpdeduplicator_ray.stages.candidates import explode_minhash_bands
from ordinarydumpdeduplicator_ray.stages.join import inner_join
from ordinarydumpdeduplicator_ray.stages.signatures import compute_signatures

# new-snapshot sketch map broadcast cap — a snapshot bigger than this
# should go through the full flagship instead of the ingest fast path
_NEW_SKETCH_CAP = 2_000_000


def persist_near_dup_index(
    pages: ray.data.Dataset,
    out_dir: str,
    config: DedupConfig | None = None,
) -> None:
    """One pass over the PRIOR corpus -> the persisted probe index
    (buckets/ + sketches/ Parquet, sharded by Ray — resumable output)."""
    cfg = config or DedupConfig()
    sigs = compute_signatures(pages, cfg).materialize()
    explode_minhash_bands(sigs, cfg, member="url").write_parquet(
        os.path.join(out_dir, "buckets")
    )
    sigs.map_batches(
        lambda t: t.select(["url", "minhash"]), batch_format="pyarrow"
    ).write_parquet(os.path.join(out_dir, "sketches"))


def ingest_near_dup(
    new_pages: ray.data.Dataset,
    index_dir: str,
    config: DedupConfig | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """New docs -> (url, is_dup, dup_of, est) verdicts vs the prior
    index. ``est`` is the minhash-agreement Jaccard estimate of the
    accepted match (null for new docs); acceptance is
    est >= config.jaccard_threshold, dup_of = the smallest matching
    prior url (the repo's canonical-min convention)."""
    from ordinarydumpdeduplicator_ray.sources.pages import read_parquet_clean

    cfg = config or DedupConfig()
    k = cfg.num_perm
    new_sigs = compute_signatures(new_pages, cfg).materialize()

    def proj_new(t: pa.Table) -> pa.Table:
        return pa.table({"bucket": t["bucket"], "new_url": t["url"]})

    new_buckets = explode_minhash_bands(new_sigs, cfg, member="url").map_batches(
        proj_new, batch_format="pyarrow"
    )
    prior_buckets = read_parquet_clean(os.path.join(index_dir, "buckets")) \
        .map_batches(
            lambda t: pa.table({"bucket": t["bucket"], "prior_url": t["url"]}),
            batch_format="pyarrow",
        )
    pair_schema = pa.schema([
        ("bucket", pa.int64()), ("new_url", pa.string()),
        ("prior_url", pa.string()),
    ])
    pairs = inner_join(
        new_buckets, prior_buckets, on=("bucket",),
        num_partitions=num_partitions, empty_schema=pair_schema,
    ).map_batches(
        lambda t: t.select(["new_url", "prior_url"]), batch_format="pyarrow"
    )
    prior_sketches = read_parquet_clean(
        os.path.join(index_dir, "sketches")
    ).map_batches(
        lambda t: pa.table({"prior_url": t["url"], "prior_minhash": t["minhash"]}),
        batch_format="pyarrow",
    )
    cand_schema = pa.schema([
        ("new_url", pa.string()), ("prior_url", pa.string()),
        ("prior_minhash", pa.binary()),
    ])
    cands = inner_join(
        pairs, prior_sketches, on=("prior_url",),
        num_partitions=num_partitions, empty_schema=cand_schema,
    )

    # broadcast the NEW snapshot's sketch map once (bounded: a snapshot
    # is ingest-sized; above the cap run the flagship instead)
    new_rows = new_sigs.map_batches(
        lambda t: t.select(["url", "minhash"]), batch_format="pyarrow"
    ).take_all()
    if len(new_rows) > _NEW_SKETCH_CAP:
        raise ValueError(
            f"ingest_near_dup: new snapshot exceeds {_NEW_SKETCH_CAP} docs; "
            "run the full flagship pipeline instead"
        )
    new_map = {r["url"]: r["minhash"] for r in new_rows}
    ref = ray.put(new_map)
    thr = cfg.jaccard_threshold

    def verify(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("new_url", pa.string()), ("prior_url", pa.string()),
            ("agree", pa.int64()),
        ])
        if len(t) == 0:
            return out_schema.empty_table()
        m = ray.get(ref)
        pm, pvalid = packed_minhash(t["prior_minhash"], k)
        new_urls = t["new_url"].to_pylist()
        packed = [m.get(u) for u in new_urls]
        nvalid = np.array([p is not None for p in packed])
        nm = np.zeros((len(t), k), dtype=np.uint64)
        ok = np.flatnonzero(nvalid)
        if len(ok):
            nm[ok] = np.frombuffer(
                b"".join(packed[i] for i in ok), dtype=np.uint64
            ).reshape(len(ok), k)
        agree = (nm == pm).sum(axis=1)
        keep = (agree / k >= thr) & pvalid & nvalid
        t2 = t.filter(pa.array(keep))
        return pa.table({
            "new_url": t2["new_url"],
            "prior_url": t2["prior_url"],
            "agree": pa.array(agree[keep].astype(np.int64), type=pa.int64()),
        })

    matches = cands.map_batches(verify, batch_format="pyarrow")
    # one verdict per new doc: smallest matching prior url + its est.
    # The est rides the Min aggregate inside a composite sort key
    # ("<prior_url>\x00<agree:05d>"): lexicographic min of the key IS
    # min by prior_url (agree is deterministic per pair, so keys sharing
    # a prior_url are identical) — no driver-side dicts, the whole
    # resolution is one groupby + one narrow join (the packed-broadcast
    # cleanup from VERDICT r4 finding #3, expressed as dataflow).
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ordinarydumpdeduplicator_ray.stages.join import broadcast_left_join

    def encode(t: pa.Table) -> pa.Table:
        pad = pc.utf8_lpad(
            pc.cast(t["agree"], pa.string()), width=5, padding="0"
        )
        return pa.table({
            "new_url": t["new_url"],
            "pick": pc.binary_join_element_wise(
                t["prior_url"].combine_chunks().cast(pa.string()), pad, "\x00"
            ),
        })

    best = (
        matches.map_batches(encode, batch_format="pyarrow")
        .groupby("new_url")
        .aggregate(Min("pick", alias_name="pick"))
        .map_batches(
            lambda t: pa.table({"url": t["new_url"], "pick": t["pick"]}),
            batch_format="pyarrow",
        )
    )
    # the verdict table is one row per MATCHED new doc (<= the ingest
    # cap), and its url key is unique by construction — the packed
    # broadcast lookup beats a hash-shuffle join at every ingest size
    # (cap-guarded with the shuffle fallback inside broadcast_left_join)
    verdict_schema = pa.schema([("url", pa.string()), ("pick", pa.string())])
    joined = broadcast_left_join(
        new_sigs.map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"
        ),
        best,
        on="url",
        empty_schema=verdict_schema,
    )

    def finalize(t: pa.Table) -> pa.Table:
        picks = t["pick"].to_pylist()
        dup_of, est = [], []
        for p in picks:
            if p is None:
                dup_of.append(None)
                est.append(None)
            else:
                u, a = p.rsplit("\x00", 1)
                dup_of.append(u)
                est.append(float(np.round(int(a) / k, 6)))
        return pa.table({
            "url": t["url"],
            "is_dup": pa.array([d is not None for d in dup_of]),
            "dup_of": pa.array(dup_of, type=pa.string()),
            "est": pa.array(est, type=pa.float64()),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")
