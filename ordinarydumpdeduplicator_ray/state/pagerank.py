"""Deterministic distributed PageRank over the duplicate graph.

Centrality over the near-dup edge table finds the HUB documents of
duplication clusters — the boilerplate template a thousand pages
near-copy, the mirror root a crawl keeps re-finding — which is what an
operator actually wants to inspect (or blocklist) before bulk-dropping
a component. Analytics layer over the same edges the flagship already
produces; no new corpus pass.

Scale shape, TWO parity-tested routes (tests force each and compare
bit-for-bit):

- ``broadcast`` (below ``_MAX_BROADCAST_NODES``): each power iteration
  is one ``map_blocks`` round emitting an int64 per-node contribution
  partial, folded driver-side; the O(nodes) rank vector broadcasts
  once per iteration via ``ray.put``.
- ``distributed`` (above the cap, or forced): the rank vector lives as
  a Dataset partitioned by url — each iteration is ONE hash join of
  the degree-annotated incidence table with the rank table plus ONE
  groupby-sum; nothing O(nodes) ever touches the driver or any single
  worker (the label-propagation exchange shape, ``state/unionfind.py``).

Both routes run the identical integer recurrence, and int64 partial
sums are commutative, so they produce bit-identical ranks under any
blocking/partitioning.

Determinism: ALL arithmetic is integer. Ranks live in 1e-9 units;
a node's per-edge contribution is ``rank // degree`` (integer
division), partials are exact int64 sums (commutative — any block
layout folds identically), damping is ``(85 * x) // 100``. The whole
iteration is bit-identical under any blocking, so the result table is
hash-lockable — same trick as ``stages/kmeanslloyd.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_SCALE = 1_000_000_000  # nano-units
_DAMP_NUM, _DAMP_DEN = 85, 100

# rank vector must broadcast: node count cap (mirrors MAX_DRIVER_EDGES)
_MAX_BROADCAST_NODES = 50_000_000


_EMPTY_RANKS = pa.schema([("url", pa.string()), ("rank", pa.float64())])


def pagerank_distributed(
    edges: ray.data.Dataset,
    iters: int = 10,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Partitioned-rank-vector route: the O(nodes) state lives as a
    (url, rank:int64 nano-units) Dataset; each iteration is one hash
    join (degree-annotated incidence ⋈ ranks on url) and one
    groupby-sum — no O(nodes) broadcast, no driver materialization.
    Bit-identical to the broadcast route (same integer recurrence,
    commutative int64 partials); returns (url, rank:float64)."""
    from ray.data.aggregate import Sum

    from ordinarydumpdeduplicator_ray.stages.join import (
        _drop_empty_blocks,
        inner_join,
    )

    # undirected incidence with source degree attached once: (url, nbr)
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.concat_arrays(
                    [t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t["url_b"].combine_chunks(), t["url_a"].combine_chunks()]
                ),
            }
        )

    incidence = edges.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    ).materialize()
    if incidence.count() == 0:
        return ray.data.from_arrow(_EMPTY_RANKS.empty_table())
    incidence = _drop_empty_blocks(incidence)
    from ray.data.aggregate import Count

    degrees = (
        incidence.groupby("url")
        .aggregate(Count(alias_name="deg"))
        .map_batches(
            lambda t: pa.table(
                {"url": t["url"],
                 "deg": pc.max_element_wise(
                     t["deg"].combine_chunks().cast(pa.int64()), 1
                 )}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = degrees.count()
    inc_deg = inner_join(
        incidence, degrees, on=("url",), num_partitions=num_partitions
    ).materialize()

    init_rank = _SCALE // n
    teleport = ((_DAMP_DEN - _DAMP_NUM) * _SCALE) // (_DAMP_DEN * n)
    ranks = degrees.map_batches(
        lambda t: pa.table(
            {"url": t["url"],
             "rank": pa.array(np.full(len(t), init_rank, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        sends = inner_join(
            inc_deg, _drop_empty_blocks(ranks), on=("url",),
            num_partitions=num_partitions,
        ).map_batches(
            # each endpoint sends rank // degree to its neighbor
            lambda t: pa.table(
                {
                    "url": t["nbr"],
                    "contrib": pc.divide(
                        t["rank"].combine_chunks().cast(pa.int64()),
                        t["deg"].combine_chunks().cast(pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        ranks = (
            sends.groupby("url")
            .aggregate(Sum("contrib", alias_name="s"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "url": t["url"],
                        "rank": pc.add(
                            pa.scalar(teleport, type=pa.int64()),
                            pc.divide(
                                pc.multiply(
                                    pa.scalar(_DAMP_NUM, type=pa.int64()),
                                    t["s"].combine_chunks().cast(pa.int64()),
                                ),
                                pa.scalar(_DAMP_DEN, type=pa.int64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "rank": pc.divide(
                    t["rank"].combine_chunks().cast(pa.float64()),
                    pa.scalar(float(_SCALE), type=pa.float64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def pagerank(
    edges: ray.data.Dataset, iters: int = 10, route: str = "auto"
) -> pa.Table:
    """Undirected PageRank over (url_a, url_b) edges; returns
    (url, rank) with rank summing to ~1. Deterministic and
    blocking-independent (integer arithmetic throughout).
    This convenience wrapper returns a DRIVER-side table, so above
    ``_MAX_BROADCAST_NODES`` it refuses (the O(nodes) driver pull is
    itself the hazard the cap guards) and directs callers to the
    implemented scale path: ``pagerank_distributed`` keeps the ranks a
    partitioned Dataset end-to-end, and ``queries.dup_graph_hubs``
    shows the per-block top-k consumption pattern. ``route``:
    ``broadcast`` / ``distributed`` force a route (the explicit
    distributed route still collects — parity-test use)."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks
    from ordinarydumpdeduplicator_ray.stages.spans import _pair_urls
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    if route == "distributed":
        out = pagerank_distributed(edges, iters)
        return pa.Table.from_pylist(
            out.sort("url").take_all(), schema=_EMPTY_RANKS
        )
    if route not in ("auto", "broadcast"):
        raise ValueError(f"pagerank: unknown route {route!r}")
    edges = edges.materialize()
    nodes = _pair_urls(edges)
    n = len(nodes)
    if n == 0:
        return _EMPTY_RANKS.empty_table()
    if n > _MAX_BROADCAST_NODES:  # pragma: no cover - cluster scale
        raise ValueError(
            "pagerank: the node set exceeds the broadcast cap and a "
            "pa.Table return would materialize O(nodes) rows on the "
            "driver; consume pagerank_distributed() (partitioned rank "
            "Dataset) instead — see queries.dup_graph_hubs for the "
            "per-block top-k pattern"
        )
    nodes_ref = ray.put(nodes)

    def degree_partial(t: pa.Table) -> np.ndarray:
        nd = _get_broadcast(nodes_ref)
        deg = np.zeros(len(nd), dtype=np.int64)
        for col in ("url_a", "url_b"):
            idx = pc.index_in(t[col], value_set=nd).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(deg, idx, 1)
        return deg

    deg = np.zeros(n, dtype=np.int64)
    for p in map_blocks(edges, degree_partial):
        deg += p
    deg = np.maximum(deg, 1)
    deg_ref = ray.put(deg)

    ranks = np.full(n, _SCALE // n, dtype=np.int64)
    teleport = ((_DAMP_DEN - _DAMP_NUM) * _SCALE) // (_DAMP_DEN * n)

    for _ in range(iters):
        rank_ref = ray.put(ranks)

        def contrib_partial(t: pa.Table, _r=rank_ref) -> np.ndarray:
            nd = _get_broadcast(nodes_ref)
            r = _get_broadcast(_r)
            d = _get_broadcast(deg_ref)
            out = np.zeros(len(nd), dtype=np.int64)
            ia = pc.index_in(t["url_a"], value_set=nd).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(t["url_b"], value_set=nd).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # undirected: each endpoint sends rank/degree to the other
            np.add.at(out, ib, r[ia] // d[ia])
            np.add.at(out, ia, r[ib] // d[ib])
            return out

        contrib = np.zeros(n, dtype=np.int64)
        for p in map_blocks(edges, contrib_partial):
            contrib += p
        ranks = teleport + (_DAMP_NUM * contrib) // _DAMP_DEN

    return pa.table({
        "url": nodes,
        "rank": pa.array(ranks.astype(np.float64) / _SCALE,
                         type=pa.float64()),
    })
