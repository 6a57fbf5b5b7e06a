"""Union-find connected components over the edges table.

The Dataset API cannot express an incremental mutable index, so this is
one of the two sanctioned drop-to-raw-state points (SURVEY.md §2.5 "new"
row): the driver streams deduplicated edges via ``iter_batches`` (never
materializing the Dataset) into a weighted path-compressing union-find.

Scale note: edge count is O(duplicate docs), orders of magnitude below
corpus size; the driver holds only urls that appear in at least one edge.
For corpora where even that overflows one node, ``label_propagation``
(below) computes the same components fully distributed (iterated
min-label exchange — the BTS-style alternative referenced in PAPERS.md);
the two implementations are cross-checked in tests.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.stages.join import inner_join


class UnionFind:
    """Weighted quick-union with path halving."""

    __slots__ = ("parent", "size")

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.size[x] = 1
            return x
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def components_from_edges(edges: ray.data.Dataset) -> pa.Table:
    """edges Dataset -> components table (url, component_id), where
    component_id = lexicographic min url of the component. Streaming
    driver-side consumption; deterministic regardless of edge order."""
    uf = UnionFind()
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["url_a"].to_pylist(), batch["url_b"].to_pylist()):
            uf.union(a, b)
    # root -> min url, then emit sorted for determinism
    min_url: dict[str, str] = {}
    for url in uf.parent:
        r = uf.find(url)
        cur = min_url.get(r)
        if cur is None or url < cur:
            min_url[r] = url
    urls = sorted(uf.parent)
    comp = [min_url[uf.find(u)] for u in urls]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "component_id": pa.array(comp, type=pa.string()),
        }
    )


def label_propagation(edges: ray.data.Dataset, max_iters: int = 50) -> ray.data.Dataset:
    """Distributed alternative: iterated min-label propagation.

    labels(url, label) start as url; each round joins labels across edges
    and keeps the per-url min of (own, neighbors'); converges in
    O(component diameter) rounds (star/chain pair emission keeps
    diameters small). Each round is a vectorized groupby Min — no
    driver-side state.
    """
    from ray.data.aggregate import Min

    # undirected incidence: both directions
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.concat_arrays([t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]),
                "nbr": pa.concat_arrays([t["url_b"].combine_chunks(), t["url_a"].combine_chunks()]),
            }
        )

    incidence = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    # initial label of every url = min neighbor vs self
    labels = incidence.map_batches(
        lambda t: pa.table({"url": t["url"], "label": t["nbr"]}), batch_format="pyarrow"
    ).union(
        incidence.map_batches(
            lambda t: pa.table({"url": t["url"], "label": t["url"]}), batch_format="pyarrow"
        )
    ).groupby("url").aggregate(Min("label", alias_name="label"))

    for _ in range(max_iters):
        labels = labels.materialize()
        # propagate: neighbor's label reaches url through the edge
        nbr_labels = inner_join(
            incidence,
            labels.map_batches(
                lambda t: pa.table({"nbr": t["url"], "nbr_label": t["label"]}),
                batch_format="pyarrow",
            ),
            on=("nbr",),
            num_partitions=16,
        ).map_batches(
            lambda t: pa.table({"url": t["url"], "label": t["nbr_label"]}),
            batch_format="pyarrow",
        )
        new_labels = (
            labels.union(nbr_labels)
            .groupby("url")
            .aggregate(Min("label", alias_name="label"))
        )
        new_labels = new_labels.materialize()
        # converged when no label changed: compare via anti-join-free count
        changed = (
            inner_join(
                labels.map_batches(
                    lambda t: pa.table({"url": t["url"], "old": t["label"]}),
                    batch_format="pyarrow",
                ),
                new_labels,
                on=("url",),
                num_partitions=16,
            )
            .filter(expr="old != label")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.map_batches(
        lambda t: pa.table({"url": t["url"], "component_id": t["label"]}),
        batch_format="pyarrow",
    )
