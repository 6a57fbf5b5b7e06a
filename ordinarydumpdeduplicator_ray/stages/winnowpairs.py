"""Containment / local-copy detection via winnowed fingerprints.

MinHash Jaccard misses the "doc A contains a chunk of doc B" case: a
small boilerplate block inside a large page barely moves Jaccard.
Winnowed fingerprints (``functions/winnow.py``) localize it — any
shared run of ``w + k - 1`` tokens shares a fingerprint — so pairs
with high CONTAINMENT ``|A ∩ B| / min(|A|, |B|)`` surface docs that
embed copies of each other at any size ratio.

Distributed shape (the same bucket machinery as MinHash LSH):

1. actor-pool ``map_batches`` winnows each doc to its fingerprint set
   (sorted distinct int64), output narrow (uid, url, fps) — texts are
   dropped before anything materializes;
2. explode (bucket=fingerprint, uid) vectorized via list flatten →
   ``candidate_pairs`` (stages/candidates.py): one sort, skew-capped,
   distinct pairs sharing ≥1 fingerprint;
3. exact verify: the fp sets of ONLY the uids appearing in pairs are
   packed worker-side (offsets + flat words, same discipline as the
   embedding re-rank broadcast) and broadcast once; each pair batch
   computes exact intersection sizes against it. Above
   ``_BROADCAST_UID_CAP`` distinct uids the verify falls back to two
   shuffle hash-joins on the int64 uids with the fp sets riding as
   packed binary payloads (``_verify_join``, parity-tested against
   the broadcast path) — no side ever broadcasts.

uid = SipHash64(url) (``functions/hashing.py:87``); the broadcast
assembly raises on uid collision rather than silently merging two
docs' fingerprint sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig

_BROADCAST_UID_CAP = 2_000_000

_PAIRS_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("n_shared", pa.int64()),
        ("containment", pa.float64()),
    ]
)


class WinnowSigActor:
    """(url, text) -> (uid, url, fps list<int64>, n_fp). One TokenHasher
    per actor (Zipfian cache), winnow kernel per row, list column built
    from one flat buffer — no per-token Python."""

    def __init__(self, k: int = 5, w: int = 4) -> None:
        from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher

        self.k, self.w = k, w
        self.hasher = TokenHasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
        from ordinarydumpdeduplicator_ray.functions.winnow import winnow_fingerprints

        urls = t["url"]
        texts = t["text"].to_pylist()
        fp_arrays = []
        for txt in texts:
            _, fps = winnow_fingerprints(txt or "", self.hasher, self.k, self.w)
            fp_arrays.append(np.unique(fps.view(np.int64)))
        lengths = np.array([len(a) for a in fp_arrays], dtype=np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        flat = (np.concatenate(fp_arrays) if fp_arrays else
                np.empty(0, dtype=np.int64))
        fps_col = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int64())
        )
        return pa.table(
            {
                "uid": pa.array(url_uids(urls), type=pa.int64()),
                "url": urls,
                "fps": fps_col,
                "n_fp": pa.array(lengths.astype(np.int64), type=pa.int64()),
            }
        )


def _explode_fps(t: pa.Table) -> pa.Table:
    """(uid, fps) -> (bucket=fp, uid) rows, vectorized."""
    if len(t) == 0:
        return pa.table({"bucket": pa.array([], type=pa.int64()),
                         "uid": pa.array([], type=pa.int64())})
    fps = t["fps"].combine_chunks()
    parents = pc.list_parent_indices(fps)
    return pa.table({
        "bucket": pc.list_flatten(fps),
        "uid": pc.take(t["uid"], parents),
    })


def _assemble_fp_lookup(sigs: ray.data.Dataset, wanted: pa.Array) -> dict:
    """Packed (sorted uids, offsets, flat fps, urls) for the uids in
    ``wanted`` — per-block projection tasks pack bytes, the driver
    concatenates O(blocks) partials."""
    ids_ref = ray.put(wanted)

    def project(t: pa.Table) -> pa.Table:
        ks = ray.get(ids_ref)
        t = t.filter(pc.is_in(t["uid"], value_set=ks))
        if len(t) == 0:
            return pa.table({"uids": pa.array([], type=pa.binary()),
                             "lens": pa.array([], type=pa.binary()),
                             "flat": pa.array([], type=pa.binary()),
                             "urls": pa.array([], type=pa.list_(pa.string()))})
        fps = t["fps"].combine_chunks()
        flat = pc.list_flatten(fps).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(fps).to_numpy(zero_copy_only=False).astype(np.int64)
        uids = t["uid"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "uids": pa.array([uids.tobytes()], type=pa.binary()),
            "lens": pa.array([lens.tobytes()], type=pa.binary()),
            "flat": pa.array([flat.astype(np.int64).tobytes()], type=pa.binary()),
            "urls": pa.array([t["url"].to_pylist()], type=pa.list_(pa.string())),
        })

    parts = [r for r in sigs.map_batches(project, batch_format="pyarrow").take_all()
             if r["uids"]]
    if not parts:
        return {"uids": np.empty(0, dtype=np.int64),
                "offs": np.zeros(1, dtype=np.int64),
                "flat": np.empty(0, dtype=np.int64), "urls": np.empty(0, object)}
    uids = np.concatenate([np.frombuffer(r["uids"], dtype=np.int64) for r in parts])
    lens = np.concatenate([np.frombuffer(r["lens"], dtype=np.int64) for r in parts])
    flat = np.concatenate([np.frombuffer(r["flat"], dtype=np.int64) for r in parts])
    urls = np.concatenate([np.asarray(r["urls"], dtype=object) for r in parts])
    if len(np.unique(uids)) != len(uids):
        # duplicate uids: an exact re-crawl (same url, same fingerprint
        # sequence) collapses silently; same url with DIFFERENT
        # fingerprints (ambiguous corpus) or distinct urls sharing a
        # SipHash64 (collision) raise with the actual cause
        offs0 = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        seen: dict[int, tuple] = {}
        keep_rows = []
        for i in range(len(uids)):
            key = int(uids[i])
            payload = (urls[i], flat[offs0[i]:offs0[i + 1]].tobytes())
            prev = seen.get(key)
            if prev is None:
                seen[key] = payload
                keep_rows.append(i)
            elif prev[0] != payload[0]:
                raise ValueError(
                    "uid collision in winnow fingerprint lookup — urls "
                    f"{prev[0]!r} and {payload[0]!r} share a SipHash64; "
                    "re-salt or fall back to the join path"
                )
            elif prev[1] != payload[1]:
                raise ValueError(
                    f"winnow: url {payload[0]!r} appears multiple times "
                    "with DIFFERENT texts — deduplicate the corpus by url "
                    "(e.g. latest_page_versions) before containment pairing"
                )
            # else: exact duplicate row — drop silently
        if len(keep_rows) != len(uids):
            keep_idx = np.asarray(keep_rows, dtype=np.int64)
            flat = np.concatenate(
                [flat[offs0[i]:offs0[i + 1]] for i in keep_rows]
            ) if keep_rows else np.empty(0, dtype=np.int64)
            uids = uids[keep_idx]
            lens = lens[keep_idx]
            urls = urls[keep_idx]
    order = np.argsort(uids)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    # reorder the ragged rows by sorted uid
    starts, ends = offs[:-1], offs[1:]
    sorted_flat = np.concatenate(
        [flat[starts[i]:ends[i]] for i in order]
    ) if len(order) else np.empty(0, dtype=np.int64)
    sorted_lens = lens[order]
    return {
        "uids": uids[order],
        "offs": np.concatenate([[0], np.cumsum(sorted_lens)]).astype(np.int64),
        "flat": sorted_flat,
        "urls": urls[order],
    }


def winnow_containment_pairs(
    pages: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 5,
    w: int = 4,
    config: DedupConfig | None = None,
    num_partitions: int = 8,
    concurrency: int | tuple = 4,
) -> ray.data.Dataset:
    """(url, text) corpus -> (url_a, url_b, n_shared, containment)
    for every pair with containment >= threshold (url_a < url_b).

    Input urls should be distinct per text: exact re-crawl rows (same
    url, same text) collapse silently on the broadcast path; the same
    url with DIFFERENT texts raises (ambiguous — scope the corpus with
    latest_page_versions first). The >cap join fallback assumes
    url-distinct input."""
    from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs

    cfg = config or DedupConfig()
    sigs = pages.map_batches(
        WinnowSigActor,
        fn_constructor_kwargs={"k": k, "w": w},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    ).materialize()

    pairs = candidate_pairs(
        sigs.map_batches(_explode_fps, batch_format="pyarrow"),
        cfg, num_partitions, member_field=("uid", pa.int64()),
    ).materialize()

    from ordinarydumpdeduplicator_ray.stages.candidates import collect_pair_ids

    # distinct pair uids via per-block worker-side uniques with an
    # early bail at the cap — the raw uid columns never stream to the
    # driver (they used to, gigabytes at the very scale the join
    # fallback exists for)
    wanted = collect_pair_ids(pairs, _BROADCAST_UID_CAP)
    if wanted is not None and len(wanted) == 0:
        return ray.data.from_arrow(_PAIRS_SCHEMA.empty_table())
    if wanted is None:
        return _verify_join(pairs, sigs, threshold, num_partitions)
    lookup_ref = ray.put(_assemble_fp_lookup(sigs, wanted))

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIRS_SCHEMA.empty_table()
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        lk = _get_broadcast(lookup_ref)
        uids, offs, flat, urls = lk["uids"], lk["offs"], lk["flat"], lk["urls"]
        a = t["uid_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["uid_b"].combine_chunks().to_numpy(zero_copy_only=False)
        ia = np.searchsorted(uids, a)
        ib = np.searchsorted(uids, b)
        out_a, out_b, out_n, out_c = [], [], [], []
        for j in range(len(a)):
            sa = flat[offs[ia[j]]:offs[ia[j] + 1]]
            sb = flat[offs[ib[j]]:offs[ib[j] + 1]]
            if len(sa) == 0 or len(sb) == 0:
                continue
            n_shared = len(np.intersect1d(sa, sb, assume_unique=True))
            c = n_shared / min(len(sa), len(sb))
            if round(c, 6) >= threshold:
                ua, ub = urls[ia[j]], urls[ib[j]]
                if ub < ua:
                    ua, ub = ub, ua
                out_a.append(ua)
                out_b.append(ub)
                out_n.append(n_shared)
                out_c.append(round(c, 6))
        return pa.table({
            "url_a": pa.array(out_a, type=pa.string()),
            "url_b": pa.array(out_b, type=pa.string()),
            "n_shared": pa.array(out_n, type=pa.int64()),
            "containment": pa.array(out_c, type=pa.float64()),
        })

    return pairs.map_batches(verify, batch_format="pyarrow")


def _verify_join(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    threshold: float,
    num_partitions: int,
) -> ray.data.Dataset:
    """Shuffle-join verify fallback above the broadcast uid cap (the
    same two-hash-join shape as the embedding re-rank fallback,
    stages/embeddings.py:228): fp sets ride as packed binary payloads
    through joins on the int64 uids; no side ever broadcasts."""
    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    def packed(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string()),
                             "fps_bin": pa.array([], type=pa.binary())})
        fps = t["fps"].combine_chunks()
        flat = pc.list_flatten(fps).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(fps).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        blobs = [flat[offs[i]:offs[i + 1]].tobytes() for i in range(len(t))]
        return pa.table({"key": t["uid"], "url": t["url"],
                         "fps_bin": pa.array(blobs, type=pa.binary())})

    packed_sigs = sigs.map_batches(packed, batch_format="pyarrow")
    with_a = inner_join(
        pairs,
        packed_sigs.map_batches(
            lambda t: pa.table({"uid_a": t["key"], "url_a": t["url"],
                                "fps_a": t["fps_bin"]}),
            batch_format="pyarrow",
        ),
        on=("uid_a",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("uid_a", pa.int64()), ("uid_b", pa.int64()),
             ("url_a", pa.string()), ("fps_a", pa.binary())]
        ),
    )
    with_ab = inner_join(
        with_a,
        packed_sigs.map_batches(
            lambda t: pa.table({"uid_b": t["key"], "url_b": t["url"],
                                "fps_b": t["fps_bin"]}),
            batch_format="pyarrow",
        ),
        on=("uid_b",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("uid_a", pa.int64()), ("uid_b", pa.int64()),
             ("url_a", pa.string()), ("fps_a", pa.binary()),
             ("url_b", pa.string()), ("fps_b", pa.binary())]
        ),
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIRS_SCHEMA.empty_table()
        fa = t["fps_a"].to_pylist()
        fb = t["fps_b"].to_pylist()
        ua_l = t["url_a"].to_pylist()
        ub_l = t["url_b"].to_pylist()
        out_a, out_b, out_n, out_c = [], [], [], []
        for j in range(len(t)):
            sa = np.frombuffer(fa[j], dtype=np.int64)
            sb = np.frombuffer(fb[j], dtype=np.int64)
            if len(sa) == 0 or len(sb) == 0:
                continue
            n_shared = len(np.intersect1d(sa, sb, assume_unique=True))
            c = n_shared / min(len(sa), len(sb))
            if round(c, 6) >= threshold:
                ua, ub = ua_l[j], ub_l[j]
                if ub < ua:
                    ua, ub = ub, ua
                out_a.append(ua)
                out_b.append(ub)
                out_n.append(n_shared)
                out_c.append(round(c, 6))
        return pa.table({
            "url_a": pa.array(out_a, type=pa.string()),
            "url_b": pa.array(out_b, type=pa.string()),
            "n_shared": pa.array(out_n, type=pa.int64()),
            "containment": pa.array(out_c, type=pa.float64()),
        })

    return with_ab.map_batches(verify, batch_format="pyarrow")
