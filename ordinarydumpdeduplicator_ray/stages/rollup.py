"""Host-prefix rollups — the reference's directory tree of duplicates
(``DuplicateReport.GroupDuplicatesByDirectories``,
``DuplicateReport.cs:74-142``) re-expressed relationally: urls roll up to
their host (the "directory"), aggregates per host, driver assembles any
tree from the (small) aggregated result."""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ordinarydumpdeduplicator_ray.schemas import ACTION_KEEP
from ordinarydumpdeduplicator_ray.stages.join import inner_join


def add_host(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Append a ``host`` column parsed from the url (M7 path-algebra
    analogue, FileSystemHelper.cs:19-68)."""

    def parse(t: pa.Table) -> pa.Table:
        hosts = [urlparse(u).netloc or "(none)" for u in t[url_col].to_pylist()]
        return t.append_column("host", pa.array(hosts, type=pa.string()))

    return ds.map_batches(parse, batch_format="pyarrow")


def host_dup_rollup(
    actions: ray.data.Dataset,
    signatures: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-host duplicate footprint: n_dup_pages (isolate/delete rows) and
    dup_bytes. Sorted descending by dup_bytes — the report-table ordering
    of the reference (DuplicatesViewController.cs:31-59)."""
    dups = actions.filter(expr=f"action != '{ACTION_KEEP}'")
    sizes = signatures.map_batches(
        lambda t: t.select(["url", "n_bytes"]), batch_format="pyarrow"
    )
    joined = inner_join(
        dups, sizes, on=("url",), num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("url", pa.string()), ("action", pa.string()),
             ("group_key", pa.string()), ("n_bytes", pa.int64())]
        ),
    )
    rolled = (
        add_host(joined)
        .groupby("host")
        .aggregate(Count(alias_name="n_dup_pages"), Sum("n_bytes", alias_name="dup_bytes"))
    )
    return rolled.sort("dup_bytes", descending=True)
