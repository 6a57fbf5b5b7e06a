"""Incremental connected-components label carry.

Completes the engine's incremental story: ``stages/incremental.py``
reuses prior SIGNATURES, ``stages/neardupingest.py`` probes new docs
against the prior band-bucket INDEX — this module carries the prior
COMPONENT LABELS forward, so a re-crawl updates the cluster assignment
without re-running union-find over the prior corpus's edges.

Contract: when ``prior_labels`` are the min-url component labels of
some edge set E1 (``state/unionfind.py:components_from_edges``
semantics) and ``new_edges`` is ANY edge set over new and/or prior
urls, the carried output equals ``components_from_edges(E1 ∪ E2)``
restricted to (prior members ∪ E2-touched urls). Why contraction is
lossless: every prior component collapses to its canonical (its min
url), so unioning E2 over the contracted graph yields exactly the
joined partition, and min-over-rewritten-nodes = min-over-all-members
because each prior canonical IS its component's min.

Scale shape: union-find never sees the prior corpus — its input is
O(|E2| + touched components). The prior table is only touched by two
map-only passes: the endpoint rewrite (broadcast url->canonical below
the cap, two hash joins above it) and the final label remap through
the delta (broadcast: O(touched) entries, with the anti-join helper's
own shuffle fallback guarding the fresh-url split). The reference's
analogue re-inspects everything (``DataControllerSimple.cs:190-213``);
this is the clustered extension of its incremental scan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ordinarydumpdeduplicator_ray.stages.join import (
    _drop_empty_blocks,
    broadcast_anti_join,
    left_outer_join,
)

# prior url->canonical rewrite map cap; above it the rewrite goes
# through two hash joins instead of a plasma broadcast
_REWRITE_BROADCAST_CAP = 2_000_000


def _collect_labels(ds: ray.data.Dataset):
    """Driver-side (url, component_id) arrays — callers cap the size."""
    ka, kb = [], []
    for t in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        ka.extend(t["url"].chunks)
        kb.extend(t["component_id"].chunks)
    return (
        pa.chunked_array(ka).combine_chunks(),
        pa.chunked_array(kb).combine_chunks(),
    )


def _rewrite_broadcast(
    new_edges: ray.data.Dataset, urls: pa.Array, canon: pa.Array
) -> ray.data.Dataset:
    ref = ray.put((urls, canon))

    def rewrite(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        u, c = _get_broadcast(ref)
        a = pc.coalesce(pc.take(c, pc.index_in(t["url_a"], u)), t["url_a"])
        b = pc.coalesce(pc.take(c, pc.index_in(t["url_b"], u)), t["url_b"])
        keep = pc.invert(pc.equal(a, b))
        return pa.table({"url_a": pc.filter(a, keep), "url_b": pc.filter(b, keep)})

    return new_edges.map_batches(rewrite, batch_format="pyarrow")


def _rewrite_join(
    new_edges: ray.data.Dataset, prior_labels: ray.data.Dataset
) -> ray.data.Dataset:
    """Above-cap path: two left joins rewrite each endpoint."""
    m = prior_labels.map_batches(
        lambda t: pa.table({"url": t["url"], "canon": t["component_id"]}),
        batch_format="pyarrow",
    )
    e = left_outer_join(new_edges, m, on=("url_a",), right_on=("url",))
    e = e.map_batches(
        lambda t: pa.table(
            {"url_a": pc.coalesce(t["canon"], t["url_a"]), "url_b": t["url_b"]}
        ),
        batch_format="pyarrow",
    )
    e = left_outer_join(e, m, on=("url_b",), right_on=("url",))

    def finish(t: pa.Table) -> pa.Table:
        a = t["url_a"]
        b = pc.coalesce(t["canon"], t["url_b"])
        keep = pc.invert(pc.equal(a, b))
        return pa.table({"url_a": pc.filter(a, keep), "url_b": pc.filter(b, keep)})

    return e.map_batches(finish, batch_format="pyarrow")


def carry_components(
    prior_labels: ray.data.Dataset,
    new_edges: ray.data.Dataset,
    max_driver_edges: int = 50_000_000,
) -> ray.data.Dataset:
    """(url, component_id) prior labels + (url_a, url_b) new edges ->
    updated (url, component_id) labels over prior members and every
    url the new edges touch. Deterministic regardless of edge order
    and blocking; labels are min-url canonicals."""
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges,
        label_propagation,
    )

    new_edges = _drop_empty_blocks(new_edges).materialize()
    if new_edges.count() == 0:
        return prior_labels
    prior_labels = prior_labels.materialize()
    n_prior = prior_labels.count()

    # 1. rewrite endpoints to prior canonicals (contract prior components)
    if n_prior == 0:
        rewritten = new_edges
    elif n_prior <= _REWRITE_BROADCAST_CAP:
        urls, canon = _collect_labels(prior_labels)
        rewritten = _rewrite_broadcast(new_edges, urls, canon)
    else:
        rewritten = _rewrite_join(new_edges, prior_labels)
    rewritten = _drop_empty_blocks(rewritten).materialize()

    # 2. components over the contracted graph (O(E2 + touched) nodes)
    if rewritten.count() == 0:
        return prior_labels
    if rewritten.count() <= max_driver_edges:
        delta_ds = ray.data.from_arrow(components_from_edges(rewritten))
    else:
        delta_ds = label_propagation(rewritten)  # (url, component_id)
    delta_ds = delta_ds.materialize()
    if n_prior == 0:
        return delta_ds

    # 3. remap prior members through the delta (touched canonicals only)
    if delta_ds.count() <= _REWRITE_BROADCAST_CAP:
        delta_ref = ray.put(_collect_labels(delta_ds))

        def remap_prior(t: pa.Table) -> pa.Table:
            from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

            du, dl = _get_broadcast(delta_ref)
            lab = pc.coalesce(
                pc.take(dl, pc.index_in(t["component_id"], du)), t["component_id"]
            )
            return pa.table({"url": t["url"], "component_id": lab})

        prior_out = prior_labels.map_batches(remap_prior, batch_format="pyarrow")
    else:
        dm = delta_ds.map_batches(
            lambda t: pa.table(
                {"canon_key": t["url"], "new_label": t["component_id"]}
            ),
            batch_format="pyarrow",
        )
        prior_out = left_outer_join(
            prior_labels, dm, on=("component_id",), right_on=("canon_key",)
        ).map_batches(
            lambda t: pa.table(
                {"url": t["url"],
                 "component_id": pc.coalesce(t["new_label"], t["component_id"])}
            ),
            batch_format="pyarrow",
        )

    # 4. delta rows for urls the prior corpus never saw (fresh docs);
    # broadcast_anti_join falls back to a shuffle join above its cap
    fresh = broadcast_anti_join(
        delta_ds, prior_labels.select_columns(["url"]), on="url"
    )
    return prior_out.union(fresh)
