"""Sorted-run grouped aggregation — the single-shuffle replacement for
``groupby().aggregate()`` on high-cardinality keys.

Ray's sort-based aggregate pays per-group Python overhead; with ~one
group per row (content hashes, candidate pairs) that dominates wall
time. The pattern here (shared with ``stages/candidates.py``): one
global ``sort(key)``, then a map-only pass over whole sorted blocks that
finalizes interior runs vectorized (``np.add.reduceat`` /
``np.minimum.reduceat``) and defers the at-most-two edge runs per block
to a tiny driver-side merge.

Used for the reference's core grouping (group FileStates by BlobInfo,
``DataControllerSimple.cs:247-304``) over ``text_sha256``. The sort is
LIGHT on purpose: only (text_sha256, url, n_bytes[, uid]) enter the
shuffle — the ~1 KiB MinHash sketches never move. Group
representatives (the min-url member per distinct text — only those
enter LSH band / SimHash block explosion, so a corpus with heavy exact
duplication never multiplies its dup clusters through 50+ bucket
families) are recovered afterwards by ``representative_signatures``: the
canonical members' int64 uids broadcast as one sorted array and a
map-only ``searchsorted`` filter selects their signature rows — zero
shuffle of sketch bytes (hash-join fallback past the broadcast cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _index_schema(with_uid: bool) -> pa.Schema:
    fields = [
        ("text_sha256", pa.binary()),
        ("n_copies", pa.int64()),
        ("canonical_url", pa.string()),
        ("n_bytes", pa.int64()),
    ]
    if with_uid:
        fields.append(("canonical_uid", pa.int64()))
    fields.append(("is_edge", pa.bool_()))
    return pa.schema(fields)


def _block_partials(t: pa.Table) -> pa.Table:
    """One sorted block of (text_sha256, url, n_bytes[, uid]) -> one
    partial row per run. Rows are sorted by (key, url), so the run head
    IS the canonical (min-url) member."""
    n = len(t)
    with_uid = "uid" in t.column_names
    if n == 0:
        return _index_schema(with_uid).empty_table()
    keys = t["text_sha256"].to_pylist()
    nbs = np.asarray(t["n_bytes"].combine_chunks().to_numpy(zero_copy_only=False))
    change = np.fromiter(
        (keys[i] != keys[i - 1] for i in range(1, n)), dtype=bool, count=n - 1
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    counts = ends - starts
    min_nb = np.minimum.reduceat(nbs, starts)
    heads = t.take(starts)
    is_edge = np.zeros(len(starts), dtype=bool)
    is_edge[0] = True
    is_edge[-1] = True
    cols = {
        "text_sha256": heads["text_sha256"],
        "n_copies": pa.array(counts, type=pa.int64()),
        "canonical_url": heads["url"],
        "n_bytes": pa.array(min_nb, type=pa.int64()),
    }
    if with_uid:
        cols["canonical_uid"] = heads["uid"]
    cols["is_edge"] = pa.array(is_edge)
    return pa.table(cols)


def exact_group_index(
    valid_signatures: ray.data.Dataset, sort_partitions: int = 0
) -> ray.data.Dataset:
    """signatures -> one row per distinct content hash: (text_sha256,
    n_copies, canonical_url, n_bytes[, canonical_uid]). ONE light sort
    (no sketch bytes in the shuffle) + vectorized block pass + driver
    merge of <= 2 partials per sorted block. ``canonical_uid`` rides
    along when the input carries ``uid`` (flagship path) — it feeds
    ``representative_signatures``'s broadcast filter."""
    def project(t: pa.Table) -> pa.Table:
        cols = {
            "text_sha256": t["text_sha256"],
            "url": t["url"],
            "n_bytes": t["n_bytes"],
        }
        if "uid" in t.column_names:
            cols["uid"] = t["uid"]
        return pa.table(cols)

    proj = valid_signatures.map_batches(project, batch_format="pyarrow")
    if sort_partitions:
        proj = proj.repartition(sort_partitions)
    srt = proj.sort(["text_sha256", "url"]).materialize()
    partials = srt.map_batches(
        _block_partials, batch_format="pyarrow", batch_size=None
    ).materialize()

    interior = partials.map_batches(
        lambda t: t.filter(pc.invert(t["is_edge"])).drop_columns(["is_edge"]),
        batch_format="pyarrow",
    )
    edge_rows = partials.map_batches(
        lambda t: t.filter(t["is_edge"]).drop_columns(["is_edge"]),
        batch_format="pyarrow",
    ).take_all()

    # merge fragments of runs that straddle block borders; fragments
    # arrive in (key, url) order per block, so the min-url head is the
    # fragment whose canonical_url is smallest
    merged: dict[bytes, dict] = {}
    with_uid = any("canonical_uid" in r for r in edge_rows[:1])
    for r in edge_rows:
        cur = merged.get(r["text_sha256"])
        if cur is None:
            merged[r["text_sha256"]] = dict(r)
        else:
            cur["n_copies"] += r["n_copies"]
            cur["n_bytes"] = min(cur["n_bytes"], r["n_bytes"])
            if r["canonical_url"] < cur["canonical_url"]:
                cur["canonical_url"] = r["canonical_url"]
                if with_uid:
                    cur["canonical_uid"] = r["canonical_uid"]
    if merged:
        vals = list(merged.values())
        cols = {
            "text_sha256": pa.array([v["text_sha256"] for v in vals], type=pa.binary()),
            "n_copies": pa.array([v["n_copies"] for v in vals], type=pa.int64()),
            "canonical_url": pa.array([v["canonical_url"] for v in vals], type=pa.string()),
            "n_bytes": pa.array([v["n_bytes"] for v in vals], type=pa.int64()),
        }
        if with_uid:
            cols["canonical_uid"] = pa.array(
                [v["canonical_uid"] for v in vals], type=pa.int64()
            )
        return interior.union(ray.data.from_arrow(pa.table(cols)))
    return interior


# above this many distinct texts, the canonical-uid set stops
# broadcasting (8 B/uid -> ~400 MB at 50M) and representative selection
# falls back to a hash join on uid.
_REP_BROADCAST_CAP = 50_000_000


def representative_signatures(
    index: ray.data.Dataset, signatures: ray.data.Dataset
) -> ray.data.Dataset:
    """exact_group_index + uid-carrying signatures -> signature rows of
    the canonical (min-url) member of each distinct text: the inputs to
    LSH band / SimHash block explosion, as (uid, minhash, simhash).

    The canonical uids collect to ONE sorted int64 array, broadcast via
    ``ray.put``; a map-only ``searchsorted`` filter then selects the
    representative signature rows — the sketch bytes never enter a
    shuffle. Join fallback past ``_REP_BROADCAST_CAP``."""
    import ray as _ray

    # pin once: the cap count and the chosen route's consumption would
    # otherwise each run the lazy index lineage (exact_group_index
    # returns a lazy union)
    index = index.materialize()
    if index.count() > _REP_BROADCAST_CAP:
        from ordinarydumpdeduplicator_ray.stages.join import inner_join

        canon = index.map_batches(
            lambda t: pa.table({"uid": t["canonical_uid"]}), batch_format="pyarrow"
        )
        proj = signatures.map_batches(
            lambda t: t.select(["uid", "minhash", "simhash"]), batch_format="pyarrow"
        )
        return inner_join(
            proj, canon, on=("uid",),
            empty_schema=pa.schema(
                [("uid", pa.int64()), ("minhash", pa.binary()),
                 ("simhash", pa.uint64())]
            ),
        )

    chunks = [
        b["canonical_uid"].combine_chunks().to_numpy(zero_copy_only=False)
        for b in index.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(b)
    ]
    uids = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)
    ref = _ray.put(uids)

    def filt(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("uid", pa.int64()), ("minhash", pa.binary()), ("simhash", pa.uint64())]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        k = _ray.get(ref)
        if len(k) == 0:
            return out_schema.empty_table()
        u = t["uid"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(k, u), len(k) - 1)
        return t.select(["uid", "minhash", "simhash"]).filter(pa.array(k[pos] == u))

    return signatures.map_batches(filt, batch_format="pyarrow")


def exact_group_aggregates(
    valid_signatures: ray.data.Dataset, sort_partitions: int = 0
) -> ray.data.Dataset:
    """(url, text_sha256, n_bytes) rows -> one row per content group:
    (text_sha256, n_copies, canonical_url, n_bytes). Thin wrapper over
    the index (kept for callers that don't need representatives)."""
    return exact_group_index(valid_signatures, sort_partitions).map_batches(
        lambda t: t.select(["text_sha256", "n_copies", "canonical_url", "n_bytes"]),
        batch_format="pyarrow",
    )
