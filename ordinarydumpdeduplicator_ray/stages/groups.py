"""Duplicate-group construction — the reference's core query.

Exact grouping reproduces ``DataControllerSimple.GetDuplicates``
(``DataControllerSimple.cs:247-304``): group by content identity, keep
groups with more than one copy (``:288-301``), excluding broken rows
(``:263-275``); per-group aggregates follow ``SameContentFilesInfo``
(``SameContentFilesInfo.cs:34-68``): all_data_size = size * copies,
dup_data_size = size * (copies - 1). Canonical copy = min url
(deterministic; replaces the reference's filesystem-location oracle,
``DuplicatesProcessor.cs:275-295``).

Everything is vectorized (sorted-run aggregate / builtin Count/Min/Sum)
— no per-group Python in the main path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
from ordinarydumpdeduplicator_ray.stages.join import inner_join


def _sizes(t: pa.Table, copies: str = "n_copies", size: str = "n_bytes") -> pa.Table:
    all_sz = pc.multiply(t[size], t[copies])
    dup_sz = pc.multiply(t[size], pc.subtract(t[copies], pa.scalar(1, pa.int64())))
    t = t.append_column("all_data_size", pc.cast(all_sz, pa.int64()))
    return t.append_column("dup_data_size", pc.cast(dup_sz, pa.int64()))


def finalize_exact_groups(agg: ray.data.Dataset) -> ray.data.Dataset:
    """Group-index rows (text_sha256, n_copies, canonical_url, n_bytes,
    ...) -> the duplicate-groups report table (n_copies > 1, hex key,
    SameContentFilesInfo size arithmetic)."""
    dups = agg.filter(expr="n_copies > 1")

    def finish(t: pa.Table) -> pa.Table:
        keys = pa.array([b.hex() for b in t["text_sha256"].to_pylist()], type=pa.string())
        out = pa.table(
            {
                "group_key": keys,
                "n_copies": t["n_copies"],
                "n_bytes": t["n_bytes"],
                "canonical_url": t["canonical_url"],
            }
        )
        return _sizes(out)

    return dups.map_batches(finish, batch_format="pyarrow")


def exact_groups(
    signatures: ray.data.Dataset, sort_partitions: int = 0
) -> ray.data.Dataset:
    """signatures -> exact duplicate groups (n_copies > 1), keyed by the
    hex text_sha256. Empty rows form their own group (EmptyBlobInfo
    semantics); broken rows are excluded before grouping. Grouping runs
    as a sorted-run aggregate (stages/grouped.py) — one sort, vectorized
    per-run partials, driver-side merge of block-edge runs."""
    from ordinarydumpdeduplicator_ray.stages.grouped import exact_group_aggregates

    valid = signatures.filter(expr=f"status != '{STATUS_BROKEN}'")
    return finalize_exact_groups(exact_group_aggregates(valid, sort_partitions))


def _component_groups_local(t: pa.Table) -> pa.Table:
    """Vectorized single-pass equivalent of the component_groups
    aggregate for a driver-resident (url, component_id, n_bytes) table:
    lexsort by (component_id, url), run boundaries, ``reduceat``
    aggregates. Same output as the distributed groupby path."""
    import numpy as np

    if len(t) == 0:
        return pa.schema(
            [("group_key", pa.string()), ("n_copies", pa.int64()),
             ("n_bytes", pa.int64()), ("canonical_url", pa.string()),
             ("all_data_size", pa.int64()), ("dup_data_size", pa.int64())]
        ).empty_table()
    cids = np.asarray(t["component_id"].to_pylist(), dtype=object)
    urls = np.asarray(t["url"].to_pylist(), dtype=object)
    sizes = np.asarray(t["n_bytes"].to_pylist(), dtype=np.int64)
    order = np.lexsort((urls, cids))
    cids, urls, sizes = cids[order], urls[order], sizes[order]
    starts = np.concatenate([[0], np.flatnonzero(cids[1:] != cids[:-1]) + 1])
    counts = np.diff(np.concatenate([starts, [len(cids)]]))
    max_sz = np.maximum.reduceat(sizes, starts)
    sum_sz = np.add.reduceat(sizes, starts)
    return pa.table(
        {
            "group_key": pa.array(cids[starts], type=pa.string()),
            "n_copies": pa.array(counts, type=pa.int64()),
            "n_bytes": pa.array(max_sz, type=pa.int64()),
            "canonical_url": pa.array(urls[starts], type=pa.string()),
            "all_data_size": pa.array(sum_sz, type=pa.int64()),
            "dup_data_size": pa.array(sum_sz - max_sz, type=pa.int64()),
        }
    )


def component_groups(
    components: ray.data.Dataset,
    signatures: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """components (url, component_id) -> near-dup group aggregates.

    Near-dup members differ slightly in size, so (deviating from the
    exact-group arithmetic): n_bytes = max member size (representative),
    all_data_size = sum of member sizes, dup_data_size = sum - max
    (bytes reclaimable keeping the largest copy).

    When the components table already carries ``n_bytes`` (driver
    union-find over size-annotated edges), the sizes join is skipped
    entirely; the join remains as the fallback for components from
    label propagation."""
    comp_schema = components.schema()
    if comp_schema is not None and "n_bytes" in (comp_schema.names or []):
        # pin before the count: a lazy size-annotated components input
        # would otherwise run its lineage for count() and AGAIN for the
        # iter_batches below
        joined = components.materialize()
        # the size-annotated components table comes from the driver
        # union-find (<= max_driver_edges) — it is small and already on
        # the driver's side of the fence. Ray's shuffle aggregate pays
        # ~10 s of fixed hash-partition actor overhead for it at ANY
        # parallelism; one vectorized sorted-run pass is milliseconds.
        if joined.count() <= 5_000_000:
            import pyarrow as _pa

            tbl = _pa.concat_tables(
                joined.iter_batches(batch_size=None, batch_format="pyarrow")
            )
            return ray.data.from_arrow(_component_groups_local(tbl))
    else:
        sizes = signatures.map_batches(
            lambda t: t.select(["url", "n_bytes"]), batch_format="pyarrow"
        )
        joined = inner_join(
            components, sizes, on=("url",), num_partitions=num_partitions,
            empty_schema=pa.schema(
                [("url", pa.string()), ("component_id", pa.string()),
                 ("n_bytes", pa.int64())]
            ),
        )
    agg = joined.groupby("component_id").aggregate(
        Count(alias_name="n_copies"),
        Min("url", alias_name="canonical_url"),
        Max("n_bytes", alias_name="n_bytes"),
        Sum("n_bytes", alias_name="all_data_size"),
    )

    def finish(t: pa.Table) -> pa.Table:
        dup_sz = pc.subtract(t["all_data_size"], t["n_bytes"])
        return pa.table(
            {
                "group_key": t["component_id"],
                "n_copies": t["n_copies"],
                "n_bytes": t["n_bytes"],
                "canonical_url": t["canonical_url"],
                "all_data_size": pc.cast(t["all_data_size"], pa.int64()),
                "dup_data_size": pc.cast(dup_sz, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
