"""Dedup analytics: threshold sweeps, method matrix, novelty, graph hubs, line/boilerplate dedup, URL normalization.

Split from the single-file catalog (pipelines/queries.py facade re-exports everything; see its docstring for catalog semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.sources.pages import read_parquet_clean
from ray.data.aggregate import Count, Max, Min, Sum

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.vectors import list_to_matrix
from ordinarydumpdeduplicator_ray.stages.groups import exact_groups
from ordinarydumpdeduplicator_ray.stages.join import (
    broadcast_anti_join,
    broadcast_inner_join,
    inner_join,
)
from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

from ordinarydumpdeduplicator_ray.pipelines.q_neardup import (
    winnow_containment_pairs,
)
from ordinarydumpdeduplicator_ray.pipelines.q_text import _doc_trigrams
from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    _flagship,
    _nparts,
    _read_documents,
    _round4_half_away,
    _row_digest_table,
    _segment_sums,
    _snapshot_pages,
    dup_corpus,
)


def url_dedup_normalized(sf_dir: str) -> ray.data.Dataset:
    """Crawl-record dedup by URL canonicalization (the reference's
    path-identity algebra, Common/FsEntity.cs:38-51, in webtext form):
    a messy-url corpus — every doc crawled once with a clean url, every
    fourth doc ALSO seen with an uppercase host, trailing slash,
    reordered query, a utm_ tracking param and a fragment — collapses
    by the normal form (functions/urlnorm.py). Emits groups with >1
    variant: (norm_url, n_urls, canonical_url). One stateless map + one
    groupby over the normalized key."""
    from ordinarydumpdeduplicator_ray.functions.urlnorm import normalize_url

    ds = _read_documents(sf_dir, columns=["doc_id", "source"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        urls = []
        for d, s in zip(ids, srcs):
            urls.append(f"https://{s}.example/{d:08d}?a=1&b=2")
            if d % 4 == 0:
                urls.append(
                    f"https://{s.upper()}.EXAMPLE/{d:08d}/?b=2&utm_source=x&a=1#top"
                )
        return pa.table({"url": pa.array(urls, type=pa.string())})

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "norm_url": pa.array(
                    [normalize_url(u) for u in t["url"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return (
        ds.map_batches(build, batch_format="pyarrow")
        .map_batches(norm, batch_format="pyarrow")
        .groupby("norm_url")
        .aggregate(Count(alias_name="n_urls"), Min("url", alias_name="canonical_url"))
        .filter(expr="n_urls > 1")
    )


def line_dedup(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style corpus-wide exact line dedup (stages/linededup.py):
    every "line" occurring in >= 2 distinct documents is removed from
    ALL of them. The harness corpus is single-line token streams, so a
    line here is each consecutive 10-token window (``token_window``
    mode — the oracle builds the identical windows with
    ``list_slice``); real webtext uses ``mode="newline"``. Sub-document
    analogue of the reference's whole-blob hashing
    (OrdinaryDumpDeduplicator.cs:107-130)."""
    from ordinarydumpdeduplicator_ray.stages import linededup as ld

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no scan
    return ld.line_dedup(
        docs, mode="token_window", window=10,
        num_partitions=_nparts(), approx_rows=n_docs * 8,
    )


def host_boilerplate_dedup(sf_dir: str) -> ray.data.Dataset:
    """HOST-scoped boilerplate line removal
    (stages/linededup.host_boilerplate_dedup): a line drops from a page
    iff >= 2 distinct pages of the SAME host carry it — the CCNet
    within-site pass that strips nav/footer repetition while keeping
    content sentences that merely recur across unrelated hosts (which
    the corpus-wide line_dedup would strip). Over the host-keyed dup
    corpus, token_window lines match the oracle's list_slice windows."""
    from ordinarydumpdeduplicator_ray.stages.linededup import (
        host_boilerplate_dedup as impl,
    )

    pages = dup_corpus(sf_dir, with_source_host=True)
    n = pages.count()
    return impl(
        pages, mode="token_window", window=10,
        num_partitions=_nparts(), approx_rows=n * 8,
    )


def dedup_threshold_sweep(sf_dir: str) -> pa.Table:
    """Near-dup sensitivity analysis: component count / member count /
    reclaimable bytes at several Jaccard thresholds, from ONE flagship
    run — the verified edge table (O(duplicated docs), already
    estimated-Jaccard-scored) is filtered per threshold and re-labeled,
    so the corpus streams once no matter how many thresholds the
    operator sweeps. The production knob-tuning loop ("how much do we
    lose at 0.9 vs 0.8?") without re-running LSH. Rows-only (the
    MinHash estimate is not SQL-expressible); locked via
    dedup_threshold_sweep_checksum, and monotonicity is pytest-carried."""
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges, label_propagation,
    )

    edges = _flagship(sf_dir)["edges"].materialize()
    # same driver-vs-distributed auto-select as the flagship
    # (pipelines/dedup.py build_components); the driver path handles
    # every realistic edge volume, label propagation covers the rest
    from ordinarydumpdeduplicator_ray.pipelines.dedup import MAX_DRIVER_EDGES

    driver_ok = edges.count() <= MAX_DRIVER_EDGES
    rows = {"threshold": [], "n_components": [], "n_members": [],
            "reclaim_bytes": []}
    for thr in (0.7, 0.8, 0.9, 0.95, 1.0):
        sub = edges.filter(expr=f"jaccard >= {thr}")
        if driver_ok:
            # comp is the driver union-find's own output (the flagship's
            # documented <=MAX_DRIVER_EDGES regime) — summarize it with
            # vectorized numpy group-reduces, no pandas round-trip
            n_comp, n_members, reclaim = _summarize_members_table(
                components_from_edges(sub)
            )
        else:  # pragma: no cover - exercised only at cluster scale
            # distributed regime: per-component aggregation stays in Ray
            # (groupby + Sum/Max/Count), only the per-block 1-row
            # partials reach the driver — the member table never does
            n_comp, n_members, reclaim = _summarize_members_dataset(
                label_propagation(sub), sub
            )
        rows["threshold"].append(thr)
        rows["n_components"].append(n_comp)
        rows["n_members"].append(n_members)
        rows["reclaim_bytes"].append(reclaim)
    return pa.table({
        "threshold": pa.array(rows["threshold"], type=pa.float64()),
        "n_components": pa.array(rows["n_components"], type=pa.int64()),
        "n_members": pa.array(rows["n_members"], type=pa.int64()),
        "reclaim_bytes": pa.array(rows["reclaim_bytes"], type=pa.int64()),
    })


def _summarize_members_table(comp: pa.Table) -> tuple[int, int, int]:
    """(n_components, n_members, reclaim_bytes) of a driver-resident
    component-members table, via dictionary-encode + np.add/maximum.at
    group-reduces. reclaim = sum - max of n_bytes per component (keep
    the largest copy — the flagship's dup_data_size convention,
    stages/groups.py)."""
    import pyarrow.compute as pc

    if len(comp) == 0:
        return 0, 0, 0
    enc = pc.dictionary_encode(comp["component_id"].combine_chunks())
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(enc.dictionary)
    if "n_bytes" not in comp.column_names:
        return k, len(comp), 0
    nb = comp["n_bytes"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    sums = np.zeros(k, dtype=np.int64)
    np.add.at(sums, idx, nb)
    maxs = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(maxs, idx, nb)
    return k, len(comp), int(sums.sum() - maxs.sum())


def _summarize_members_dataset(
    labels: ray.data.Dataset, edges_sub: ray.data.Dataset
) -> tuple[int, int, int]:  # pragma: no cover - cluster-scale path
    """Same summary for the distributed label-propagation regime with
    the per-component aggregation in Ray: attach each member's n_bytes
    (carried on the verified edges as nb_a/nb_b), groupby component
    with Sum/Max/Count, then reduce the per-component table to one row
    per block — only O(blocks) partials reach the driver."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    def url_nb(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.concat_arrays([t["url_a"].combine_chunks(),
                                     t["url_b"].combine_chunks()]),
            "nb": pa.concat_arrays([
                t["nb_a"].combine_chunks(), t["nb_b"].combine_chunks()
            ]),
        })

    nbs = (
        edges_sub.map_batches(url_nb, batch_format="pyarrow")
        .groupby("url").aggregate(Min("nb", alias_name="n_bytes"))
    )
    per_comp = (
        inner_join(labels, nbs, on=("url",))
        .groupby("component_id")
        .aggregate(Count(alias_name="n"), Sum("n_bytes", alias_name="s"),
                   Max("n_bytes", alias_name="m"))
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "r": pa.array([], type=pa.int64())})
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array([len(t)], type=pa.int64()),
                         "n": pa.array([int(n.sum())], type=pa.int64()),
                         "r": pa.array([int((s - m).sum())], type=pa.int64())})

    parts = per_comp.map_batches(partial, batch_format="pyarrow").take_all()
    return (sum(p["k"] for p in parts), sum(p["n"] for p in parts),
            sum(p["r"] for p in parts))


def dedup_threshold_sweep_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the threshold sweep."""
    return _row_digest_table(
        ray.data.from_arrow(dedup_threshold_sweep(sf_dir)),
        ["threshold", "n_components", "n_members", "reclaim_bytes"],
        "n_thresholds",
    )


def novelty_scores(sf_dir: str) -> ray.data.Dataset:
    """Per-document content NOVELTY of the current crawl snapshot vs
    the previous one: the fraction of each cur-doc's token trigrams
    never seen in ANY prev-snapshot doc — the "how much genuinely new
    text did this re-crawl bring" signal that complements the
    url-keyed snapshot_diff (content-keyed, url-independent). The
    prior side collapses to its DISTINCT trigram set (per-block
    value_counts combiner -> one narrow groupby); below the join cap
    the set broadcasts once and the cur snapshot streams through a
    single membership pass; above it the exploded (url, trigram) rows
    take a shuffle anti-join (stages/join.py broadcast_anti_join picks
    the route). SQL-oracled."""
    from ordinarydumpdeduplicator_ray.stages.join import _BROADCAST_JOIN_CAP
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    prev = _snapshot_pages(sf_dir, "prev")
    cur = _snapshot_pages(sf_dir, "cur")

    def partial_distinct(t: pa.Table) -> pa.Table:
        tri, _ = _doc_trigrams(t)
        vc = pc.value_counts(tri)
        return pa.table({"sh": vc.field("values")})

    prev_set = (
        prev.map_batches(partial_distinct, batch_format="pyarrow")
        .groupby("sh").aggregate(Count(alias_name="c"))
        .materialize()
    )

    out_schema = pa.schema(
        [("url", pa.string()), ("n_trigrams", pa.int64()),
         ("n_unseen", pa.int64()), ("novelty", pa.float64())]
    )

    if prev_set.count() <= _BROADCAST_JOIN_CAP:
        packed = pa.concat_tables(
            prev_set.iter_batches(batch_size=None, batch_format="pyarrow")
        ).combine_chunks() if prev_set.count() else None
        ref = ray.put(packed["sh"] if packed is not None else None)

        def score(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return out_schema.empty_table()
            shset = _get_broadcast(ref)
            tri, n_tri = _doc_trigrams(t)
            if shset is not None and len(tri):
                seen = pc.is_valid(
                    pc.index_in(tri, value_set=shset)
                ).to_numpy(zero_copy_only=False)
            else:
                seen = np.zeros(len(tri), dtype=bool)
            unseen = _segment_sums((~seen).astype(np.float64), n_tri)
            with np.errstate(invalid="ignore", divide="ignore"):
                nov = np.where(n_tri > 0, unseen / np.maximum(n_tri, 1), 0.0)
            return pa.table({
                "url": t["url"],
                "n_trigrams": pa.array(n_tri, type=pa.int64()),
                "n_unseen": pa.array(unseen.astype(np.int64), type=pa.int64()),
                "novelty": pa.array(_round4_half_away(nov), type=pa.float64()),
            })

        return cur.map_batches(score, batch_format="pyarrow")

    # above-cap route: explode and anti-join (shuffle fallback inside)
    from ordinarydumpdeduplicator_ray.stages.join import (
        broadcast_anti_join, broadcast_left_join,
    )

    def explode(t: pa.Table) -> pa.Table:
        tri, n_tri = _doc_trigrams(t)
        urls = np.repeat(
            np.asarray(t["url"].to_pylist(), dtype=object), n_tri
        )
        return pa.table({"url": pa.array(urls, type=pa.string()), "sh": tri})

    exploded = cur.map_batches(explode, batch_format="pyarrow")
    unseen_rows = broadcast_anti_join(exploded, prev_set, on="sh")
    unseen_per_url = unseen_rows.groupby("url").aggregate(
        Count(alias_name="n_unseen")
    )

    def totals(t: pa.Table) -> pa.Table:
        tri, n_tri = _doc_trigrams(t)
        return pa.table({
            "url": t["url"],
            "n_trigrams": pa.array(n_tri, type=pa.int64()),
        })

    tot = cur.map_batches(totals, batch_format="pyarrow")
    joined = broadcast_left_join(
        tot, unseen_per_url, on="url",
        empty_schema=pa.schema(
            [("url", pa.string()), ("n_trigrams", pa.int64()),
             ("n_unseen", pa.int64())]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_trigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = pc.fill_null(t["n_unseen"], 0).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            nov = np.where(n > 0, u / np.maximum(n, 1), 0.0)
        return pa.table({
            "url": t["url"],
            "n_trigrams": t["n_trigrams"],
            "n_unseen": pa.array(u.astype(np.int64), type=pa.int64()),
            "novelty": pa.array(_round4_half_away(nov), type=pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def dedup_method_matrix(sf_dir: str) -> ray.data.Dataset:
    """Method-agreement matrix: one row per page with a boolean per
    dedup detector — exact sha, MinHash-near, SimHash-near, winnowed
    containment — the side-by-side a curation team reads before picking
    its production tier mix (which docs does each method uniquely
    catch?). All four flag sets are O(duplicated docs): the flagship's
    edge table split by source plus the winnow pair table, each
    collapsed to a distinct-url set worker-side and broadcast; the
    corpus then streams through ONE membership pass. Rows-only
    (three of the four detectors are not SQL-expressible); locked via
    dedup_method_matrix_checksum."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    cached = _MATRIX_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    fl = _flagship(sf_dir)
    edges = fl["edges"].materialize()
    winnow = winnow_containment_pairs(sf_dir).materialize()

    def edge_urls_of(src: str):
        def f(t: pa.Table) -> pa.Array:
            sub = t.filter(pc.equal(t["source"], src))
            return pc.unique(pa.chunked_array(
                [sub["url_a"].combine_chunks(), sub["url_b"].combine_chunks()]
            ))
        return f

    from ordinarydumpdeduplicator_ray.stages.spans import _pair_urls

    sets = {}
    for name, src in (("exact", "exact"), ("minhash", "minhash"),
                      ("simhash", "simhash")):
        parts = [a for a in map_blocks(edges, edge_urls_of(src)) if len(a)]
        uniq = pc.unique(pa.chunked_array(parts)) if parts \
            else pa.array([], type=pa.string())
        if isinstance(uniq, pa.ChunkedArray):
            uniq = uniq.combine_chunks()
        sets[name] = uniq
    sets["winnow"] = _pair_urls(winnow)
    ref = ray.put(sets)

    pages = dup_corpus(sf_dir, near=True)

    def flag(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("url", pa.string())] +
            [(f"by_{m}", pa.bool_()) for m in
             ("exact", "minhash", "simhash", "winnow")] +
            [("n_methods", pa.int64())]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        lk = _get_broadcast(ref)
        cols = {"url": t["url"]}
        total = np.zeros(len(t), dtype=np.int64)
        for m in ("exact", "minhash", "simhash", "winnow"):
            hit = pc.is_valid(pc.index_in(t["url"], value_set=lk[m])) \
                if len(lk[m]) else pa.array([False] * len(t))
            cols[f"by_{m}"] = hit
            total += hit.to_numpy(zero_copy_only=False).astype(np.int64)
        cols["n_methods"] = pa.array(total, type=pa.int64())
        return pa.table(cols)

    out = pages.map_batches(flag, batch_format="pyarrow").materialize()
    _MATRIX_CACHE[sf_dir] = out
    return out


_MATRIX_CACHE: dict = {}


def dedup_method_matrix_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the method-agreement matrix."""
    return _row_digest_table(
        dedup_method_matrix(sf_dir),
        ["url", "by_exact", "by_minhash", "by_simhash", "by_winnow",
         "n_methods"],
        "n_pages",
    )


def intra_dup_stats(sf_dir: str) -> ray.data.Dataset:
    """WITHIN-document repetition: per doc, total vs distinct trigram
    counts and the intra-dup rate (1 - distinct/total) — the
    self-repetition signal (boilerplate loops, generated spam) that
    corpus-level dedup never sees because no second document is
    involved. Stateless and fully vectorized: one Arrow sort of the
    batch's (segment, trigram) pairs, neighbor-inequality boundaries,
    segmented counts — no per-doc Python, no shuffle at all.
    SQL-oracled (len vs len(list_distinct))."""
    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("n_trigrams", pa.int64()),
             ("n_distinct", pa.int64()), ("intra_dup_rate", pa.float64())]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        tri, n_tri = _doc_trigrams(t)
        seg = np.repeat(np.arange(len(n_tri), dtype=np.int64), n_tri)
        if len(tri):
            pairs = pa.table({"seg": pa.array(seg), "sh": tri})
            order = pc.sort_indices(
                pairs, sort_keys=[("seg", "ascending"), ("sh", "ascending")]
            )
            s_seg = pc.take(pairs["seg"], order).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            s_sh = pc.take(pairs["sh"], order).combine_chunks()
            n = len(s_seg)
            # a sorted row opens a new distinct value iff its segment or
            # its trigram differs from the previous row
            seg_change = np.concatenate([[True], s_seg[1:] != s_seg[:-1]])
            sh_change = np.concatenate([[True], pc.not_equal(
                s_sh.slice(1), s_sh.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)])
            new_val = (seg_change | sh_change).astype(np.int64)
            distinct = np.zeros(len(n_tri), dtype=np.int64)
            np.add.at(distinct, s_seg, new_val)
        else:
            distinct = np.zeros(len(n_tri), dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rate = np.where(
                n_tri > 0, 1.0 - distinct / np.maximum(n_tri, 1), 0.0
            )
        return pa.table({
            "doc_id": t["doc_id"],
            "n_trigrams": pa.array(n_tri, type=pa.int64()),
            "n_distinct": pa.array(distinct, type=pa.int64()),
            "intra_dup_rate": pa.array(_round4_half_away(rate),
                                       type=pa.float64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


def _topk_hubs(urls: pa.Array | pa.ChunkedArray, ranks: np.ndarray,
               k: int) -> pa.Table:
    """(rank_nano desc, url asc) top-k — shared by the driver path and
    the per-block candidate emit of the distributed path."""
    order = np.lexsort(
        (np.asarray(urls.to_pylist(), dtype=object), -ranks)
    )[:k]
    return pa.table({
        "url": (urls.combine_chunks() if isinstance(urls, pa.ChunkedArray)
                else urls).take(pa.array(order)),
        "rank_nano": pa.array(ranks[order], type=pa.int64()),
    })


def dup_graph_hubs(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k PageRank hubs of the near-dup graph (state/pagerank.py):
    the template/mirror documents the most duplication mass flows
    through — what an operator inspects before bulk-dropping a
    component. Integer-quantized power iteration over the flagship's
    edge table: deterministic, blocking-independent, hash-locked via
    dup_graph_hubs_checksum. Rows-only (iterative graph analytics is
    not SQL-expressible).

    Scale shape: below the pagerank broadcast cap the rank table is
    dup-graph-member-sized and the top-k runs driver-side; above it the
    ranks STAY a partitioned Dataset (pagerank_distributed) and each
    block emits only its local top-k — the driver merges O(blocks x k)
    candidate rows, never O(nodes). Both paths produce identical rows
    (parity pytest with a forced cap)."""
    from ordinarydumpdeduplicator_ray.state import pagerank as pr

    empty = pa.table({"url": pa.array([], type=pa.string()),
                      "rank_nano": pa.array([], type=pa.int64())})
    edges = _flagship(sf_dir)["edges"]
    # nodes <= 2 x edges: edge count is a free conservative route switch
    if edges.count() * 2 > pr._MAX_BROADCAST_NODES:
        ranks_ds = pr.pagerank_distributed(edges)

        def block_topk(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return empty
            rn = np.rint(
                t["rank"].to_numpy(zero_copy_only=False) * 1e9
            ).astype(np.int64)
            return _topk_hubs(t["url"], rn, k)

        cand = pa.concat_tables(
            list(ranks_ds.map_batches(block_topk, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
            or [empty]
        )
        if len(cand) == 0:
            return empty
        return _topk_hubs(
            cand["url"],
            cand["rank_nano"].to_numpy(zero_copy_only=False).astype(np.int64),
            k,
        )
    tbl = pr.pagerank(edges)
    if len(tbl) == 0:
        return empty
    ranks = np.rint(
        tbl["rank"].to_numpy(zero_copy_only=False) * 1e9
    ).astype(np.int64)
    return _topk_hubs(tbl["url"], ranks, k)


def dup_graph_hubs_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the dup-graph PageRank hubs."""
    return _row_digest_table(
        ray.data.from_arrow(dup_graph_hubs(sf_dir)),
        ["url", "rank_nano"], "n_hubs",
    )

