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


def _min_rank_components(ca, cb, urls):
    """Vectorized exact connected components over integer-coded edge
    arrays: min-rank label propagation with pointer doubling
    (O(E) ``np.minimum.at`` per round, O(log diameter) rounds).
    ``urls`` is the Arrow string dictionary the codes index into — the
    lexicographic rank comes from ``pc.sort_indices`` (C++ string sort;
    the previous object-dtype ``np.argsort`` plus ``to_pylist`` cost
    ~10+ s at 1.2M urls on the driver). Returns ``(rank_order,
    labels)`` over codes. Shared by the driver path (whole edge set)
    and the distributed path (per-block local contraction)."""
    import numpy as np
    import pyarrow.compute as pc

    m = len(urls)
    # rank space: label r means "min url seen so far is the r-th
    # smallest" — min-rank propagation == min-url propagation
    rank_order = pc.sort_indices(urls).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)                        # rank -> code
    labels = np.empty(m, dtype=np.int64)      # code -> current min rank
    labels[rank_order] = np.arange(m)
    for _ in range(200):
        before = labels.copy()
        mn = np.minimum(labels[ca], labels[cb])
        np.minimum.at(labels, ca, mn)
        np.minimum.at(labels, cb, mn)
        # pointer doubling: adopt the label of the node my label names
        labels = np.minimum(labels, labels[rank_order[labels]])
        if np.array_equal(labels, before):
            break
    else:  # pragma: no cover - connectivity always converges
        raise RuntimeError("min-rank components did not converge")
    return rank_order, labels


def components_from_edges(edges: ray.data.Dataset) -> pa.Table:
    """edges Dataset -> components table (url, component_id[, n_bytes]),
    where component_id = lexicographic min url of the component.
    Deterministic regardless of edge order. When the edges carry
    per-endpoint sizes (``nb_a``/``nb_b``, attached during
    verification), the output carries ``n_bytes`` per member — the
    near-group aggregation then needs no join back to the signatures
    table.

    Fully vectorized: urls dictionary-encode to int codes, components
    come from min-rank label propagation over the edge arrays with
    pointer doubling (O(E) ``np.minimum.at`` per round, O(log diameter)
    rounds) — no per-edge Python. Measured ~5x faster than the dict
    union-find it replaced at ~500k edges."""
    import numpy as np
    import pyarrow.compute as pc

    a_chunks: list[pa.Array] = []
    b_chunks: list[pa.Array] = []
    na_chunks: list[pa.Array] = []
    nb_chunks: list[pa.Array] = []
    have_nb = False
    for batch in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        a_chunks.extend(batch["url_a"].chunks)
        b_chunks.extend(batch["url_b"].chunks)
        if "nb_a" in batch.column_names and "nb_b" in batch.column_names:
            have_nb = True
            na_chunks.extend(batch["nb_a"].chunks)
            nb_chunks.extend(batch["nb_b"].chunks)
    empty = pa.table(
        {"url": pa.array([], type=pa.string()),
         "component_id": pa.array([], type=pa.string())}
    )
    if not a_chunks:
        return empty
    enc = pc.dictionary_encode(
        pa.chunked_array(a_chunks + b_chunks).combine_chunks()
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(codes) == 0:
        return empty
    n_edges = len(codes) // 2
    ca, cb = codes[:n_edges], codes[n_edges:]
    urls_dict = enc.dictionary
    m = len(urls_dict)
    rank_order, labels = _min_rank_components(ca, cb, urls_dict)
    out_order = rank_order  # emit sorted by url for determinism
    cols = {
        "url": urls_dict.take(pa.array(out_order)),
        "component_id": urls_dict.take(pa.array(rank_order[labels][out_order])),
    }
    if have_nb:
        na = pc.fill_null(
            pa.chunked_array(na_chunks).combine_chunks(), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        nb = pc.fill_null(
            pa.chunked_array(nb_chunks).combine_chunks(), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.full(m, -1, dtype=np.int64)
        mask_a, mask_b = na >= 0, nb >= 0
        sizes[ca[mask_a]] = na[mask_a]
        sizes[cb[mask_b]] = nb[mask_b]
        out_sizes = sizes[out_order]
        if (out_sizes >= 0).any():
            cols["n_bytes"] = pa.array(out_sizes, type=pa.int64(),
                                       mask=out_sizes < 0)
    return pa.table(cols)


def _labels_checksum(labels: ray.data.Dataset) -> int:
    """Order-independent fingerprint of the (url, label) assignment:
    sum mod 2^64 of per-row 64-bit mixes. The per-block partial wraps
    mod 2^64, so the driver-side total must ALSO be taken mod 2^64 —
    otherwise the value depends on how rows are split into blocks and
    the same assignment materialized with different blocking compares
    unequal (convergence is then only ever detected by accident).
    The map emits ONE row per block; the driver pulls those few rows
    directly instead of a Sum aggregate (whose exact-int Python sum
    overflows int64 and degrades blocks to pickled objects).
    Labels only ever decrease monotonically here, so two successive
    iterations have equal assignments iff their checksums match (a
    checksum collision between DIFFERENT assignments would need a
    2^-64 accident AND could at worst stop one round early of a
    fixpoint that the monotone decrease guarantees is near)."""
    import numpy as np
    import pandas.util as pdu

    def mix(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        hu = pdu.hash_array(np.asarray(t["url"].to_pylist(), dtype=object))
        hl = pdu.hash_array(np.asarray(t["label"].to_pylist(), dtype=object))
        with np.errstate(over="ignore"):
            h = (hu * np.uint64(0x9E3779B97F4A7C15)) ^ hl
            s = np.uint64(h.sum())
        return pa.table({"h": pa.array([np.int64(s.astype(np.int64))], type=pa.int64())})

    rows = labels.map_batches(mix, batch_format="pyarrow").take_all()
    return sum(int(r["h"]) for r in rows) % (1 << 64)


def label_propagation(
    edges: ray.data.Dataset,
    max_iters: int = 50,
    num_partitions: int = 16,
    doubling_every: int = 1,
    rounds_per_sync: int = 1,
) -> ray.data.Dataset:
    """Distributed alternative: iterated min-label propagation with
    periodic pointer doubling.

    labels(url, label) start as min(self, neighbors); each round joins
    labels across edges and keeps the per-url min — 2 shuffles per round
    (the propagate join + the groupby Min; convergence is detected by an
    order-independent checksum reduce instead of a third join). Every
    ``doubling_every``-th round additionally propagates label-of-label
    (one extra join keyed on the current label), which contracts label
    chains geometrically — a path component of diameter d converges in
    O(log d) doubling rounds instead of O(d) plain rounds
    (tests/test_round2_ops.py stress-tests 128- and 10k-url chains).
    The default doubles EVERY round: wall time is dominated by the
    per-sync barrier (materialize + checksum reduce), not by the extra
    O(V)-row join fused into the same execution, so minimizing round
    count wins at every scale measured.

    Non-convergence within ``max_iters`` raises RuntimeError (silent
    wrong labels are never returned); converged labels are exact —
    cross-checked against driver union-find in tests.
    """
    import ray as _ray
    from ray.data.aggregate import Min

    from ordinarydumpdeduplicator_ray.stages.join import _drop_empty_blocks

    # hash-shuffle aggregator pools larger than the CPU count starve the
    # lazy map tasks feeding them (observed deadlock at 16 partitions on
    # a 4-CPU session); cap by the session's CPUs
    if _ray.is_initialized():
        num_partitions = max(
            2, min(num_partitions, int(_ray.cluster_resources().get("CPU", num_partitions)))
        )

    # undirected incidence: both directions
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.concat_arrays([t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]),
                "nbr": pa.concat_arrays([t["url_b"].combine_chunks(), t["url_a"].combine_chunks()]),
            }
        )

    incidence = edges.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    ).materialize()
    if incidence.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("url", pa.string()), ("component_id", pa.string())]).empty_table()
        )
    incidence = _drop_empty_blocks(incidence)

    # LOCAL CONTRACTION init: exact components of each block's edge
    # subset via the same vectorized min-rank kernel the driver path
    # uses — every chain/star segment that fits in one block collapses
    # to its minimum before the first global round, so the iterated
    # rounds only stitch ACROSS blocks: O(log #blocks-ish) syncs instead
    # of O(log component-diameter). Subsumes the classic
    # min(self, neighbors) init (label <= self and <= every same-block
    # neighbor by construction).
    def local_contract(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if len(t) == 0:
            return pa.table({"url": pa.array([], type=pa.string()),
                             "label": pa.array([], type=pa.string())})
        enc = pc.dictionary_encode(
            pa.concat_arrays([t["url"].combine_chunks(), t["nbr"].combine_chunks()])
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ne = len(codes) // 2
        urls_dict = enc.dictionary
        rank_order, lab = _min_rank_components(codes[:ne], codes[ne:], urls_dict)
        return pa.table(
            {
                "url": urls_dict,
                "label": urls_dict.take(pa.array(rank_order[lab])),
            }
        )

    labels = incidence.map_batches(
        local_contract, batch_format="pyarrow", batch_size=None
    ).groupby("url").aggregate(Min("label", alias_name="label")).materialize()

    checksum = _labels_checksum(labels)
    converged = False
    it = 0
    while it < max_iters:
        # one fused streaming execution per sync: the propagate join (and
        # the doubling join) feed the groupby lazily, so a round costs
        # ONE materialize + one checksum reduce — separate materialize
        # rounds per join measurably dominate at low data volumes.
        # (groupby hash-aggregate emits schema-less empty blocks that
        # poison downstream Acero joins, hence the metadata-only
        # _drop_empty_blocks on the previous round's output.)
        # rounds_per_sync > 1 chains several rounds lazily into the same
        # execution (saving the intermediate barriers) — opt-in only:
        # safe when every hash partition is guaranteed non-empty
        # (intermediate groupby outputs feed joins without the
        # empty-block scrub).
        lazy = labels
        for _ in range(min(rounds_per_sync, max_iters - it)):
            lazy = _one_round(lazy if lazy is not labels else _drop_empty_blocks(labels),
                              incidence, it, num_partitions, doubling_every)
            it += 1
        labels = lazy.materialize()
        new_checksum = _labels_checksum(labels)
        if new_checksum == checksum:
            converged = True
            break
        checksum = new_checksum
    if not converged:
        raise RuntimeError(
            f"label_propagation did not converge within {max_iters} iterations "
            "— component diameter exceeds the doubling budget; raise max_iters"
        )
    return labels.map_batches(
        lambda t: pa.table({"url": t["url"], "component_id": t["label"]}),
        batch_format="pyarrow",
    )


def _one_round(clean, incidence, it, num_partitions, doubling_every):
    from ray.data.aggregate import Min

    # propagate + HOOK: join the edge's neighbor label, then the url's
    # own label, and emit BOTH {url <- nbr_label} (classic propagate)
    # and {own_label <- nbr_label} (Shiloach-Vishkin-style hook: the
    # url's tree ROOT learns the cross-edge minimum directly). Without
    # the hook, a star-shaped label region — exactly what local
    # contraction produces — only advances its frontier one edge per
    # round (the root's own row never sees the smaller label, so
    # doubling has no chain to jump); with hook + doubling every round,
    # convergence is O(log n) from ANY initial assignment.
    from ordinarydumpdeduplicator_ray.stages.join import _drop_empty_blocks

    # the first join's output feeds the second join directly; hash-join
    # partitions that come out EMPTY emit zero-column blocks that crash
    # Acero ("No match for key field") — scrub them by block metadata.
    # This adds one barrier per round; harmless at the >=50M-edge scale
    # this path serves (the per-sync materialize already dominates), and
    # required for sparse graphs where partitions outnumber distinct keys.
    j1 = _drop_empty_blocks(
        incidence.join(
            clean.map_batches(
                lambda t: pa.table({"nbr": t["url"], "nbr_label": t["label"]}),
                batch_format="pyarrow",
            ),
            "inner",
            num_partitions=num_partitions,
            on=("nbr",),
        ).materialize()
    )
    nbr_labels = j1.join(
            clean.map_batches(
                lambda t: pa.table({"url": t["url"], "own_label": t["label"]}),
                batch_format="pyarrow",
            ),
            "inner",
            num_partitions=num_partitions,
            on=("url",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "url": pa.concat_arrays(
                        [t["url"].combine_chunks(), t["own_label"].combine_chunks()]
                    ),
                    "label": pa.concat_arrays(
                        [t["nbr_label"].combine_chunks(), t["nbr_label"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    candidates = clean.union(nbr_labels)
    if doubling_every and (it + 1) % doubling_every == 0:
        # pointer doubling: url's label jumps to its label's label
        lol = clean.map_batches(
            lambda t: pa.table({"url": t["url"], "mid": t["label"]}),
            batch_format="pyarrow",
        ).join(
            clean.map_batches(
                lambda t: pa.table({"mid": t["url"], "mid_label": t["label"]}),
                batch_format="pyarrow",
            ),
            "inner",
            num_partitions=num_partitions,
            on=("mid",),
        ).map_batches(
            lambda t: pa.table({"url": t["url"], "label": t["mid_label"]}),
            batch_format="pyarrow",
        )
        candidates = candidates.union(lol)
    # per-url min over (self, neighbors[, label-of-label])
    return candidates.groupby("url").aggregate(Min("label", alias_name="label"))
