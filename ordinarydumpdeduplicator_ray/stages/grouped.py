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
``DataControllerSimple.cs:247-304``) over ``text_sha256`` — fused with
**representative extraction**: the same sort also yields, per distinct
content hash, the canonical (min-url) member's MinHash/SimHash sketches.
Only those representatives enter LSH band / SimHash block explosion
downstream (near-dup detection runs on distinct texts; exact copies
reach the same component through the content-sha candidate family), so a
corpus with heavy exact duplication — the common web-crawl case — never
multiplies its dup clusters through 50+ bucket families.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_INDEX_FIELDS = [
    ("text_sha256", pa.binary()),
    ("n_copies", pa.int64()),
    ("canonical_url", pa.string()),
    ("n_bytes", pa.int64()),
    ("minhash", pa.binary()),
    ("simhash", pa.uint64()),
    ("is_edge", pa.bool_()),
]
_INDEX_SCHEMA = pa.schema(_INDEX_FIELDS)


def _block_partials(t: pa.Table) -> pa.Table:
    """One sorted block of (text_sha256, url, n_bytes, minhash, simhash)
    -> one partial row per run. Rows are sorted by (key, url), so the
    run head IS the canonical (min-url) member and carries the group's
    representative sketches."""
    n = len(t)
    if n == 0:
        return _INDEX_SCHEMA.empty_table()
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
    return pa.table(
        {
            "text_sha256": heads["text_sha256"],
            "n_copies": pa.array(counts, type=pa.int64()),
            "canonical_url": heads["url"],
            "n_bytes": pa.array(min_nb, type=pa.int64()),
            "minhash": heads["minhash"],
            "simhash": heads["simhash"],
            "is_edge": pa.array(is_edge),
        }
    )


def exact_group_index(
    valid_signatures: ray.data.Dataset, sort_partitions: int = 0
) -> ray.data.Dataset:
    """signatures -> one row per distinct content hash: (text_sha256,
    n_copies, canonical_url, n_bytes, minhash, simhash) where the
    sketches are the canonical member's (= the group representative for
    near-dup bucketing). ONE sort + vectorized block pass + driver merge
    of <= 2 partials per sorted block."""
    def project(t: pa.Table) -> pa.Table:
        # callers without sketch columns (plain extracted tables) still
        # group — the sketches ride along as nulls
        mh = t["minhash"] if "minhash" in t.column_names else pa.nulls(len(t), pa.binary())
        sh = t["simhash"] if "simhash" in t.column_names else pa.nulls(len(t), pa.uint64())
        return pa.table(
            {
                "text_sha256": t["text_sha256"],
                "url": t["url"],
                "n_bytes": t["n_bytes"],
                "minhash": mh,
                "simhash": sh,
            }
        )

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
    for r in edge_rows:
        cur = merged.get(r["text_sha256"])
        if cur is None:
            merged[r["text_sha256"]] = dict(r)
        else:
            cur["n_copies"] += r["n_copies"]
            cur["n_bytes"] = min(cur["n_bytes"], r["n_bytes"])
            if r["canonical_url"] < cur["canonical_url"]:
                cur["canonical_url"] = r["canonical_url"]
                cur["minhash"] = r["minhash"]
                cur["simhash"] = r["simhash"]
    if merged:
        vals = list(merged.values())
        edge_tbl = pa.table(
            {
                "text_sha256": pa.array([v["text_sha256"] for v in vals], type=pa.binary()),
                "n_copies": pa.array([v["n_copies"] for v in vals], type=pa.int64()),
                "canonical_url": pa.array([v["canonical_url"] for v in vals], type=pa.string()),
                "n_bytes": pa.array([v["n_bytes"] for v in vals], type=pa.int64()),
                "minhash": pa.array([v["minhash"] for v in vals], type=pa.binary()),
                "simhash": pa.array([v["simhash"] for v in vals], type=pa.uint64()),
            }
        )
        return interior.union(ray.data.from_arrow(edge_tbl))
    return interior


def representative_signatures(index: ray.data.Dataset) -> ray.data.Dataset:
    """exact_group_index -> signatures-shaped (url, minhash, simhash)
    rows, ONE per distinct text: the inputs to LSH band / SimHash block
    explosion."""
    return index.map_batches(
        lambda t: pa.table(
            {
                "url": t["canonical_url"],
                "minhash": t["minhash"],
                "simhash": t["simhash"],
            }
        ),
        batch_format="pyarrow",
    )


def exact_group_aggregates(
    valid_signatures: ray.data.Dataset, sort_partitions: int = 0
) -> ray.data.Dataset:
    """(url, text_sha256, n_bytes) rows -> one row per content group:
    (text_sha256, n_copies, canonical_url, n_bytes). Thin wrapper over
    the fused index (kept for callers that don't need the sketches)."""
    return exact_group_index(valid_signatures, sort_partitions).map_batches(
        lambda t: t.select(["text_sha256", "n_copies", "canonical_url", "n_bytes"]),
        batch_format="pyarrow",
    )
