"""Isolation / deletion planning — the reference's move/delete verbs as
pure planning queries.

``MoveDuplicatesToSpecialFolder`` (``DuplicatesProcessor.cs:98-183``)
physically moves non-canonical copies under an ``isolated duplicates``
dir; at 10^12 rows nothing mutates in place, so the analogue is an
**actions table** (keep / isolate / delete) plus filtered output tables.
The delete guard invariant is preserved: only already-isolated rows may
be deleted (``DuplicatesProcessor.cs:192-212`` throws otherwise).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.schemas import ACTION_DELETE, ACTION_ISOLATE, ACTION_KEEP
from ordinarydumpdeduplicator_ray.stages.join import left_outer_join


def plan_isolation(components: ray.data.Dataset) -> ray.data.Dataset:
    """components (url, component_id) -> actions: the canonical copy
    (url == component_id, i.e. the min url) keeps, every other member is
    isolated. Docs outside any component implicitly keep (not listed)."""

    def to_actions(t: pa.Table) -> pa.Table:
        is_canon = pc.equal(t["url"], t["component_id"])
        action = pc.if_else(is_canon, pa.scalar(ACTION_KEEP), pa.scalar(ACTION_ISOLATE))
        return pa.table(
            {"url": t["url"], "action": action, "group_key": t["component_id"]}
        )

    return components.map_batches(to_actions, batch_format="pyarrow")


def plan_deletion(
    actions: ray.data.Dataset,
    delete_urls: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Upgrade isolate -> delete for the requested urls, enforcing the
    reference's guard: a request for a url that is not currently
    ``isolate`` (missing, kept, or canonical) raises ValueError
    (DuplicatesProcessor.cs:192-212 throws on non-isolated input).
    """
    # distinct request urls: a duplicated url in the request would
    # otherwise multiply its action row through the left join (and let
    # the count guard below pass on mismatched multiplicity)
    from ray.data.aggregate import Count

    req = delete_urls.groupby("url").aggregate(
        Count(alias_name="_c")
    ).map_batches(
        lambda t: pa.table({"url": t["url"],
                            "requested": pa.array([True] * len(t))}),
        batch_format="pyarrow",
    ).materialize()
    n_requested = req.count()
    # pin: the guard count and the returned lineage both consume it
    joined = left_outer_join(
        actions, req, on=("url",), num_partitions=num_partitions
    ).materialize()

    def requested_isolated(t: pa.Table) -> pa.Table:
        mask = pc.and_kleene(
            pc.fill_null(t["requested"], False),
            pc.equal(t["action"], ACTION_ISOLATE),
        )
        return t.filter(pc.fill_null(mask, False))

    n_isolated_requested = joined.map_batches(
        requested_isolated, batch_format="pyarrow"
    ).count()
    if n_isolated_requested != n_requested:
        raise ValueError(
            f"delete guard: {n_requested - n_isolated_requested} of {n_requested} "
            "requested urls are not currently isolated "
            "(only already-isolated duplicates may be deleted)"
        )

    def upgrade(t: pa.Table) -> pa.Table:
        req_col = pc.fill_null(t["requested"], False)
        action = pc.if_else(req_col, pa.scalar(ACTION_DELETE), t["action"])
        return pa.table(
            {"url": t["url"], "action": action, "group_key": t["group_key"]}
        )

    return joined.map_batches(upgrade, batch_format="pyarrow")


def quarantine_report(
    kept: ray.data.Dataset, quarantined: ray.data.Dataset
) -> ray.data.Dataset:
    """Re-read the quarantine table alongside the kept table and
    re-derive the exact duplicates report over their union — the
    reference's isolated-dir re-scan merged into the report
    (``DataControllerSimple.cs:309-361``, ``DuplicatesProcessor.cs:89-93``):
    isolation moves rows, it never loses them, so the re-derived report
    must equal the pre-isolation report (pytest-asserted round trip)."""
    from ordinarydumpdeduplicator_ray.stages.groups import exact_groups
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    pages = kept.union(quarantined)
    extracted = pages.map_batches(extract_batch, batch_format="pyarrow")
    return exact_groups(extracted)


def apply_actions(
    pages: ray.data.Dataset,
    actions: ray.data.Dataset,
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(kept_pages, quarantined_pages): the deduplicated output table and
    the quarantine table — a filter + join, never mutating inputs
    (SURVEY.md §2.1 S5)."""
    marks = actions.map_batches(
        lambda t: pa.table({"url": t["url"], "action": t["action"]}),
        batch_format="pyarrow",
    )
    # two consumers (kept + quarantined) -> pin the join result once
    joined = left_outer_join(pages, marks, on=("url",), num_partitions=num_partitions).materialize()

    def keep_rows(t: pa.Table) -> pa.Table:
        mask = pc.or_kleene(pc.is_null(t["action"]), pc.equal(t["action"], ACTION_KEEP))
        return t.filter(pc.fill_null(mask, False)).drop_columns(["action"])

    def quarantine_rows(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["action"], ACTION_ISOLATE)
        return t.filter(pc.fill_null(mask, False)).drop_columns(["action"])

    kept = joined.map_batches(keep_rows, batch_format="pyarrow")
    quarantined = joined.map_batches(quarantine_rows, batch_format="pyarrow")
    return kept, quarantined
