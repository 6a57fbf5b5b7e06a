"""Deterministic distributed PageRank over the duplicate graph.

Centrality over the near-dup edge table finds the HUB documents of
duplication clusters — the boilerplate template a thousand pages
near-copy, the mirror root a crawl keeps re-finding — which is what an
operator actually wants to inspect (or blocklist) before bulk-dropping
a component. Analytics layer over the same edges the flagship already
produces; no new corpus pass.

Scale shape: edges stream as blocks (O(duplicated docs), NOT corpus
-sized); each power iteration is one ``map_blocks`` round emitting an
int64 per-node contribution partial, folded driver-side. The rank
vector is O(nodes) and broadcasts once per iteration via ``ray.put``
(nodes = dup-graph members; the documented cap mirrors the flagship's
``MAX_DRIVER_EDGES`` seam — beyond it, ranks would partition by node
range like the distributed label propagation).

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


def pagerank(
    edges: ray.data.Dataset, iters: int = 10
) -> pa.Table:
    """Undirected PageRank over (url_a, url_b) edges; returns
    (url, rank) with rank summing to ~1. Deterministic and
    blocking-independent (integer arithmetic throughout)."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks
    from ordinarydumpdeduplicator_ray.stages.spans import _pair_urls
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    edges = edges.materialize()
    nodes = _pair_urls(edges)
    n = len(nodes)
    if n == 0:
        return pa.table({"url": pa.array([], type=pa.string()),
                         "rank": pa.array([], type=pa.float64())})
    if n > _MAX_BROADCAST_NODES:  # pragma: no cover - cluster scale
        raise NotImplementedError(
            "pagerank: node set exceeds the broadcast cap; partition the "
            "rank vector by node range (label-propagation seam)"
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
