"""Near-duplicate flagship family: MinHash/SimHash edges, components, groups, spans, recall, ingest, carry, hash-locks.

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

from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    _docs_pages_subset,
    _flagship,
    _nparts,
    _qcfg,
    _read_documents,
    _round4_half_away,
    _row_digest_table,
    dup_corpus,
)


# ---------------------------------------------------------------------------
# rows-only queries (no SQL equivalent)
# ---------------------------------------------------------------------------


def near_dup_components(sf_dir: str) -> ray.data.Dataset:
    """Full near-dup pipeline (minhash+simhash+exact -> union-find) over
    the derived near-dup corpus."""
    return _flagship(sf_dir)["components"]


def near_dup_actions_by_quality(sf_dir: str) -> ray.data.Dataset:
    """Quality-aware keeper selection over the flagship's near-dup
    components: instead of the reference's min-url canonical
    (DuplicatesProcessor.cs keep-first), KEEP the member with the
    HIGHEST quality score (ties -> min url) and isolate the rest — the
    LLM-curation policy ("keep the best copy, not the first copy")
    that matters precisely when members are near (not exact) dups and
    their quality genuinely differs.

    Scale shape: quality is a stateless streaming map over the corpus;
    the component table (O(dup docs)) joins it url-keyed; keeper
    selection is ONE (component_id, quality desc, url) sort + the
    vectorized block-top-1 + O(blocks) border merge (the latest_pages
    pattern), then one broadcast-side map attaches verdicts. Rows-only
    (components are not SQL-expressible); hash-locked via
    near_dup_actions_by_quality_checksum."""
    from ordinarydumpdeduplicator_ray.functions.textstats import (
        quality_features,
        quality_score,
    )
    from ordinarydumpdeduplicator_ray.stages.join import inner_join
    from ordinarydumpdeduplicator_ray.stages.snapshot import _latest_block

    comp = near_dup_components(sf_dir).map_batches(
        lambda t: t.select(["url", "component_id"]), batch_format="pyarrow"
    ).materialize()

    def score(t: pa.Table) -> pa.Table:
        qs = [
            quality_score(*quality_features(x or ""))
            for x in t["text"].to_pylist()
        ]
        return pa.table({
            "url": t["url"],
            "quality": pa.array(qs, type=pa.float64()),
        })

    scored = dup_corpus(sf_dir, near=True).map_batches(
        score, batch_format="pyarrow"
    )
    members = inner_join(
        comp, scored, on=("url",),
        empty_schema=pa.schema([
            ("url", pa.string()), ("component_id", pa.string()),
            ("quality", pa.float64()),
        ]),
    ).materialize()

    # keeper per component: ONE sort (component, quality desc, url asc)
    # + block top-1 with border-run reconciliation
    import functools

    srt = members.sort(
        ["component_id", "quality", "url"], descending=[False, True, False]
    )
    marked = srt.map_batches(
        functools.partial(_latest_block, key_cols=("component_id",)),
        batch_format="pyarrow", batch_size=None,
    ).materialize()
    interior = marked.filter(expr="is_edge == False").drop_columns(["is_edge"])
    edge_batches = list(
        marked.filter(expr="is_edge == True").drop_columns(["is_edge"])
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    keepers = interior
    if edge_batches:
        et = pa.concat_tables(edge_batches, promote_options="default")
        order = pc.sort_indices(et, sort_keys=[
            ("component_id", "ascending"), ("quality", "descending"),
            ("url", "ascending"),
        ])
        s = et.take(order)
        cids = np.asarray(s["component_id"].to_pylist(), dtype=object)
        first = np.concatenate([[True], cids[1:] != cids[:-1]])
        keepers = interior.union(ray.data.from_arrow(s.filter(pa.array(first))))
    keeper_tbl = keepers.map_batches(
        lambda t: pa.table({"component_id": t["component_id"],
                            "keeper": t["url"]}),
        batch_format="pyarrow",
    )

    out = inner_join(
        members.map_batches(
            lambda t: t.select(["url", "component_id", "quality"]),
            batch_format="pyarrow"),
        keeper_tbl, on=("component_id",),
        empty_schema=pa.schema([
            ("url", pa.string()), ("component_id", pa.string()),
            ("quality", pa.float64()), ("keeper", pa.string()),
        ]),
    )

    def verdict(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["url"], t["keeper"])
        return pa.table({
            "url": t["url"],
            "action": pc.if_else(
                keep, pa.array(["keep"] * len(t)),
                pa.array(["isolate"] * len(t))),
            "group_key": t["keeper"],
            "quality": t["quality"],
        })

    return out.map_batches(verdict, batch_format="pyarrow")


def near_dup_actions_by_quality_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the quality-keeper near-dup actions."""
    return _row_digest_table(
        near_dup_actions_by_quality(sf_dir),
        ["url", "action", "group_key", "quality"],
        "n_members",
    )


def near_dup_recall(sf_dir: str) -> pa.Table:
    """The north rule's dup-pair recall bar (>=0.99) measured as a
    first-class operator: the derived corpus injects known truth pairs
    (X, X-copy) exact and (X, X-near) near — recall = fraction of
    injected pairs whose endpoints land in the SAME flagship component.
    Scale-safe: the component table splits into base/variant sides by
    url suffix (a string map — no extra data), one base-url-keyed join
    compares labels, per-block 1-row partials reduce to the 2-row
    summary; denominators come from a documents count, so missed pairs
    (an endpoint absent from any component) count against recall.
    Hash-locked via literal oracle constants at sf0.01."""
    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    comp = near_dup_components(sf_dir).materialize()

    def split(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        comps = t["component_id"].to_pylist()
        base, kind, cid = [], [], []
        for u, c in zip(urls, comps):
            if u.endswith("-copy"):
                base.append(u[:-5])
                kind.append("exact")
            elif u.endswith("-near"):
                base.append(u[:-5])
                kind.append("near")
            else:
                base.append(u)
                kind.append("base")
            cid.append(c)
        return pa.table({
            "base": pa.array(base, type=pa.string()),
            "kind": pa.array(kind, type=pa.string()),
            "cid": pa.array(cid, type=pa.string()),
        })

    tagged = comp.map_batches(split, batch_format="pyarrow").materialize()
    bases = tagged.filter(expr="kind == 'base'").map_batches(
        lambda t: pa.table({"base": t["base"], "cid_base": t["cid"]}),
        batch_format="pyarrow",
    )
    variants = tagged.filter(expr="kind != 'base'")
    joined = inner_join(
        variants, bases, on=("base",),
        empty_schema=pa.schema([
            ("base", pa.string()), ("kind", pa.string()),
            ("cid", pa.string()), ("cid_base", pa.string()),
        ]),
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"kind": pa.array([], type=pa.string()),
                             "m": pa.array([], type=pa.int64())})
        hit = pc.equal(t["cid"], t["cid_base"])
        kinds = t["kind"].to_pylist()
        hits = hit.to_pylist()
        agg: dict[str, int] = {}
        for k, h in zip(kinds, hits):
            agg[k] = agg.get(k, 0) + (1 if h else 0)
        return pa.table({
            "kind": pa.array(list(agg), type=pa.string()),
            "m": pa.array(list(agg.values()), type=pa.int64()),
        })

    matched = {"exact": 0, "near": 0}
    for r in joined.map_batches(partial, batch_format="pyarrow").take_all():
        matched[r["kind"]] = matched.get(r["kind"], 0) + r["m"]

    # truth denominators straight from the corpus derivation
    docs = _read_documents(sf_dir, columns=["doc_id"])

    def truth_partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return pa.table({
            "e": pa.array([int(np.sum(ids % 3 == 0))], type=pa.int64()),
            "n": pa.array([int(np.sum(ids % 5 == 0))], type=pa.int64()),
        })

    n_exact = n_near = 0
    for r in docs.map_batches(truth_partial, batch_format="pyarrow").take_all():
        n_exact += r["e"]
        n_near += r["n"]

    return pa.table({
        "kind": pa.array(["exact", "near"], type=pa.string()),
        "n_pairs": pa.array([n_exact, n_near], type=pa.int64()),
        "n_matched": pa.array([matched["exact"], matched["near"]],
                              type=pa.int64()),
        "recall": pa.array(
            _round4_half_away(np.array([
                matched["exact"] / n_exact if n_exact else 1.0,
                matched["near"] / n_near if n_near else 1.0,
            ])), type=pa.float64()),
    })


def near_dup_groups(sf_dir: str) -> ray.data.Dataset:
    return _flagship(sf_dir)["groups_near"]


def minhash_edges(sf_dir: str) -> ray.data.Dataset:
    return _flagship(sf_dir)["edges"].filter(expr="source == 'minhash'")


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.8, shingle_size: int = 5
) -> ray.data.Dataset:
    """EXACT n-gram (word 5-shingle) Jaccard near-duplicate pairs over
    the documents table: (doc_a < doc_b, round(j, 6) >= threshold) on
    DISTINCT shingle sets — the true-Jaccard dedup flavor, the exact
    counterpart of the minhash estimate path (cf. knn_cosine_vec0 brute
    baseline vs knn_cosine_lsh scale path). SQL-oracled.

    Shape: one task map computes each doc's sorted unique 64-bit
    shingle-hash set (same tokenizer + hash kernels as minhash); the
    packed per-doc sets broadcast via the object store together with a
    (shingle -> doc) inverted index; a second distributed map finds each
    doc's partners through shared shingles (two searchsorteds) and reads
    |intersection| directly off the partner multiplicities — work is
    proportional to truly-shared shingles, not all pairs. Beyond the
    broadcast cap the scale path is the minhash pipeline (LSH candidates
    + exact margin recheck)."""
    import ray as _ray
    from ordinarydumpdeduplicator_ray.functions.hashing import (
        TokenHasher,
        shingle_hashes,
    )
    from ordinarydumpdeduplicator_ray.functions.text import tokenize

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def shingle_sets(t: pa.Table) -> pa.Table:
        hasher = TokenHasher()
        ids, sets = [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = tokenize(x) if x else []
            if len(toks) < shingle_size:
                continue  # oracle parity: <w tokens -> no w-shingles
            ids.append(did)
            sets.append(shingle_hashes(hasher.hash_tokens(toks), shingle_size))
        if not ids:
            return pa.table({"ids": pa.array([], type=pa.binary()),
                             "offs": pa.array([], type=pa.binary()),
                             "flat": pa.array([], type=pa.binary())})
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        return pa.table(
            {"ids": pa.array([np.asarray(ids, dtype=np.int64).tobytes()], type=pa.binary()),
             "offs": pa.array([offs.tobytes()], type=pa.binary()),
             "flat": pa.array([np.concatenate(sets).tobytes()], type=pa.binary())}
        )

    parts = [
        r for r in docs.map_batches(shingle_sets, batch_format="pyarrow").take_all()
        if r["ids"]
    ]
    out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("jaccard", pa.float64())])
    if not parts:
        return ray.data.from_arrow(out_schema.empty_table())
    ids = np.concatenate([np.frombuffer(r["ids"], dtype=np.int64) for r in parts])
    if len(ids) > 1_000_000:
        raise ValueError(
            "ngram_jaccard_pairs broadcasts per-doc shingle sets; beyond "
            "1M docs use the minhash pipeline (LSH + exact margin recheck)"
        )
    lens = [np.diff(np.frombuffer(r["offs"], dtype=np.int64)) for r in parts]
    flat = np.concatenate([np.frombuffer(r["flat"], dtype=np.uint64) for r in parts])
    lens = np.concatenate(lens)
    # re-pack in doc_id order so partner index > i <=> doc_b > doc_a
    order = np.argsort(ids)
    offs_orig = np.concatenate([[0], np.cumsum(lens)])
    sets_sorted = [flat[offs_orig[k]:offs_orig[k + 1]] for k in order]
    ids, lens = ids[order], lens[order]
    flat = np.concatenate(sets_sorted)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    # inverted index: shingle-sorted (hash, doc_idx)
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    inv_order = np.argsort(flat, kind="stable")
    lookup_ref = _ray.put(
        {"ids": ids, "offs": offs, "flat": flat,
         "sh_sorted": flat[inv_order], "doc_of": doc_of[inv_order]}
    )

    def pair_batch(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        lk = _get_broadcast(lookup_ref)
        ids_l, offs_l, flat_l = lk["ids"], lk["offs"], lk["flat"]
        sh_sorted, doc_of_l = lk["sh_sorted"], lk["doc_of"]
        out_a, out_b, out_j = [], [], []
        for i in t["id"].to_numpy(zero_copy_only=False):
            s = flat_l[offs_l[i]:offs_l[i + 1]]
            lo = np.searchsorted(sh_sorted, s, side="left")
            hi = np.searchsorted(sh_sorted, s, side="right")
            spans = hi - lo
            total = int(spans.sum())
            if total <= len(s):  # only self-occurrences
                continue
            # gather all (shingle, partner) hits: vectorized range expand
            base = np.repeat(lo, spans)
            step = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(spans)[:-1]]), spans
            )
            partners = doc_of_l[base + step]
            partners = partners[partners > i]
            if not len(partners):
                continue
            uniq, counts = np.unique(partners, return_counts=True)
            # per-doc sets are unique: shared-shingle hit count == |A ∩ B|
            union = len(s) + (offs_l[uniq + 1] - offs_l[uniq]) - counts
            jac = np.round(counts / union, 6)
            keep = jac >= threshold
            for p, j in zip(uniq[keep], jac[keep]):
                out_a.append(int(ids_l[i]))
                out_b.append(int(ids_l[p]))
                out_j.append(float(j))
        return pa.table(
            {"doc_a": pa.array(out_a, type=pa.int64()),
             "doc_b": pa.array(out_b, type=pa.int64()),
             "jaccard": pa.array(out_j, type=pa.float64())}
        )

    return ray.data.range(len(ids)).map_batches(
        pair_batch, batch_format="pyarrow", batch_size=2048
    )


def ngram_jaccard_components(
    sf_dir: str, threshold: float = 0.5, shingle_size: int = 5
) -> pa.Table:
    """Connected components of the EXACT word-5-shingle Jaccard
    near-dup graph over documents: (doc_id, component_id = min doc_id
    of the component), one row per doc that appears in >= 1 edge.

    This is the flagship clustering SEMANTICS (pair graph -> connected
    components -> min-member canonical id) verified against a fully
    independent oracle: the DuckDB SQL recomputes the shingle sets, the
    Jaccard pairs AND the transitive closure (recursive CTE) from the
    raw text — no pinned constant anywhere (the VERDICT r4 ask: one
    in-window near-dup oracle that is computed, not literal). Threshold
    0.5 (vs the pair query's 0.8) makes the graph dense enough to have
    multi-edge components worth clustering. The component step is the
    same vectorized min-label pointer-doubling kernel the flagship uses
    (state/unionfind.py:_min_rank_components), applied to the bounded
    pair table driver-side (ngram_jaccard_pairs is already
    broadcast-capped; the scale path is the minhash flagship)."""
    edges = ngram_jaccard_pairs(sf_dir, threshold, shingle_size)
    et = pa.concat_tables(
        list(edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    ) if edges.count() else None
    if et is None or len(et) == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "component_id": pa.array([], type=pa.int64())})
    a = et["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = et["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(ids, a)
    cb = np.searchsorted(ids, b)
    labels = np.arange(len(ids), dtype=np.int64)
    for _ in range(200):
        before = labels.copy()
        mn = np.minimum(labels[ca], labels[cb])
        np.minimum.at(labels, ca, mn)
        np.minimum.at(labels, cb, mn)
        labels = np.minimum(labels, labels[labels])  # pointer doubling
        if np.array_equal(labels, before):
            break
    else:  # pragma: no cover - connectivity always converges
        raise RuntimeError("ngram_jaccard_components did not converge")
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "component_id": pa.array(ids[labels], type=pa.int64()),
    })


def substring_spans(sf_dir: str) -> ray.data.Dataset:
    """Suffix-array exact substring duplicate spans over the near-dup
    corpus (north rule; no reference counterpart). Sampled-shingle
    candidates -> per-pair suffix-array span extraction."""
    from ordinarydumpdeduplicator_ray.stages.spans import find_substring_spans

    return find_substring_spans(
        dup_corpus(sf_dir, near=True), _qcfg(), _nparts()
    )


def simhash_edges(sf_dir: str) -> ray.data.Dataset:
    """Verified near-dup edges discovered via SimHash Hamming-ball
    banding: Manku-style 6-block split keyed on every 3-block
    combination (C(6,3) = 20 tables, ~32-bit keys — catches hamming <= 3
    without the 16-bit key-space saturation of naive 4x16 banding;
    functions/simhash.py)."""
    return _flagship(sf_dir)["edges"].filter(expr="source == 'simhash'")


def near_dup_components_distributed(sf_dir: str) -> ray.data.Dataset:
    """Connected components via distributed min-label propagation over
    the flagship's edges — the scale path used automatically when the
    edge list outgrows the driver (DedupPipeline.max_driver_edges).
    Must agree with the driver-side union-find labels."""
    from ordinarydumpdeduplicator_ray.state.unionfind import label_propagation

    return label_propagation(_flagship(sf_dir)["edges"])


def all_dup_groups(sf_dir: str) -> ray.data.Dataset:
    """Union of the exact-group set and the near-dup group set, distinct
    by group identity with the near-dup (superset) entry winning — J5
    (DuplicatesProcessor.GetFilesToReport union semantics,
    DuplicatesProcessor.cs:322-335)."""
    out = _flagship(sf_dir)
    exact = out["groups_exact"].map_batches(
        lambda t: pa.table(
            {
                "canonical_url": t["canonical_url"],
                "n_copies": t["n_copies"],
                "n_bytes": t["n_bytes"],
                "kind": pa.array(["exact"] * len(t), type=pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    near = out["groups_near"].map_batches(
        lambda t: pa.table(
            {
                "canonical_url": t["canonical_url"],
                "n_copies": t["n_copies"],
                "n_bytes": t["n_bytes"],
                "kind": pa.array(["near"] * len(t), type=pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    # near wins on key collision: broadcast near's (small) key set and
    # anti-filter the exact groups — no shuffle, no per-group Python.
    near_keys = near.map_batches(
        lambda t: t.select(["canonical_url"]), batch_format="pyarrow"
    )
    exact_only = broadcast_anti_join(exact, near_keys, on="canonical_url")
    return near.union(exact_only)


def near_dup_ingest_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the streaming near-dup ingest verdicts."""
    return _row_digest_table(
        near_dup_ingest_verdicts(sf_dir), ["url", "is_dup", "dup_of"],
        "n_new_docs",
    )


def minhash_edges_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the flagship's verified MinHash edges — the
    core near-dup candidate path (north rule) finally gets a green
    driver row via the order/blocking-independent digest."""
    return _row_digest_table(
        minhash_edges(sf_dir),
        ["url_a", "url_b", "nb_a", "nb_b", "jaccard"],
        "n_edges",
    )


def simhash_edges_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the flagship's verified SimHash edges."""
    return _row_digest_table(
        simhash_edges(sf_dir),
        ["url_a", "url_b", "nb_a", "nb_b", "jaccard"],
        "n_edges",
    )


def near_dup_components_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the flagship union-find component labels
    (url -> component_id assignments, DataControllerSimple.cs:247-304
    group semantics at the near-dup extension)."""
    return _row_digest_table(
        near_dup_components(sf_dir),
        ["url", "component_id", "n_bytes"],
        "n_members",
    )


def near_dup_groups_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the flagship near-dup group report."""
    return _row_digest_table(
        near_dup_groups(sf_dir),
        ["group_key", "n_copies", "n_bytes", "canonical_url",
         "all_data_size", "dup_data_size"],
        "n_groups",
    )


def substring_spans_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the suffix-array exact substring spans."""
    return _row_digest_table(
        substring_spans(sf_dir),
        ["url_a", "url_b", "a_start", "a_end", "b_start", "b_end"],
        "n_spans",
    )


def all_dup_groups_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the exact ∪ near-dup group union (J5)."""
    return _row_digest_table(
        all_dup_groups(sf_dir),
        ["canonical_url", "n_copies", "n_bytes", "kind"],
        "n_groups",
    )


def bloom_new_docs(sf_dir: str, fpp: float = 0.01) -> ray.data.Dataset:
    """Streaming-ingest dedup (stages/bloom.py): a 'fresh crawl batch'
    (odd doc_ids plus a re-crawl of every doc_id % 6 == 0 row) against
    the 'existing corpus' (even doc_ids). EXACT output — (url,
    text_sha256) of the rows whose text the prior corpus lacks; the
    bloom bitmap only routes rows past the verify join, it never
    decides them. No reference counterpart (the reference re-hashes
    everything per scan, OrdinaryDumpDeduplicator.cs:107-156)."""
    from ordinarydumpdeduplicator_ray.stages.bloom import bloom_new_docs as impl

    prior = _docs_pages_subset(sf_dir, 2, 0)
    new_pages = _docs_pages_subset(sf_dir, 2, 1).union(
        _docs_pages_subset(sf_dir, 6, 0, suffix="-recrawl")
    )
    return impl(new_pages, prior, fpp=fpp)


_WINNOW_CACHE: dict = {}


def winnow_containment_pairs(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """Local-copy / containment detection (stages/winnowpairs.py) over
    the near-dup-injected corpus: winnowed fingerprints (SIGMOD'03) ->
    bucket explode -> candidate_pairs -> exact fp-set containment.
    Catches the contains-a-chunk-of case Jaccard dilutes. Rows-only
    (winnowing is not SQL-expressible); brute-force-oracled in pytest."""
    from ordinarydumpdeduplicator_ray.stages.winnowpairs import (
        winnow_containment_pairs as impl,
    )

    key = (sf_dir, threshold)
    cached = _WINNOW_CACHE.get(key)
    if cached is not None:
        return cached
    # session-adaptive pool size: a fixed concurrency=4 pool next to the
    # candidate-sort aggregators deadlocks a 4-CPU session
    cfg = _qcfg()
    out = impl(
        dup_corpus(sf_dir, near=True), threshold=threshold,
        config=cfg, num_partitions=_nparts(),
        concurrency=max(2, min(4, cfg.sig_concurrency // 2)),
    ).materialize()
    _WINNOW_CACHE[key] = out
    return out


def tiered_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents -> pages corpus exercising all three dedup tiers:
    every doc crawled clean; doc_id % 4 == 0 ALSO seen under a messy
    url variant (same text -> tier 1); doc_id % 3 == 0 duplicated
    under a '-copy' path (same text, distinct norm url -> tier 2);
    doc_id % 5 == 0 near-copied with trailing words dropped
    (-> tier 3)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text", "source"])

    def build(t: pa.Table) -> pa.Table:
        urls, texts = [], []
        for d, txt, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                             t["source"].to_pylist()):
            urls.append(f"https://{s}.example/{d:08d}?a=1&b=2")
            texts.append(txt)
            if d % 4 == 0:
                urls.append(
                    f"https://{s.upper()}.EXAMPLE/{d:08d}/?b=2&utm_source=x&a=1#top"
                )
                texts.append(txt)
            if d % 3 == 0:
                urls.append(f"https://{s}.example/{d:08d}-copy?a=1&b=2")
                texts.append(txt)
            if d % 5 == 0:
                words = (txt or "").split(" ")
                k = max(1, len(words) // 25)
                urls.append(f"https://{s}.example/{d:08d}-near?a=1&b=2")
                texts.append(" ".join(words[: len(words) - k]))
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "html": pa.nulls(len(urls), type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def tiered_dedup(sf_dir: str) -> ray.data.Dataset:
    """RefinedWeb-style tiered dedup (pipelines/tiered.py): URL
    canonicalization -> exact sha -> flagship near-dup engine, each
    tier on the previous tier's survivors; one verdict row per input
    row. Rows-only (tier 3 is the MinHash/SimHash engine); pytest
    carries the brute-force tier oracle."""
    from ordinarydumpdeduplicator_ray.pipelines.tiered import tiered_dedup as impl

    return impl(tiered_corpus(sf_dir))


def exact_substring_removal(sf_dir: str) -> ray.data.Dataset:
    """ExactSubstr REMOVAL (Lee et al. ACL'22) over the near-dup
    corpus: the substring_spans pipeline's duplicated token runs are
    actually CUT from the lexicographically-larger url of each pair
    (stages/spanremoval.py — loser-side targets, one-sort interval
    merge, char-exact cut). Returns the affected docs with removal
    stats and the sha256 of the cleaned text (hash-locking the cut
    bytes). Rows-only (suffix-array spans are not SQL-expressible);
    pytest carries the byte-exact oracle."""
    from ordinarydumpdeduplicator_ray.stages.spanremoval import (
        remove_duplicate_spans,
    )

    out = remove_duplicate_spans(dup_corpus(sf_dir, near=True), _qcfg(), _nparts())
    return _summarize_removal(out)


def _summarize_removal(out: ray.data.Dataset) -> ray.data.Dataset:
    """Affected-docs removal stats + sha256 of the cleaned text."""

    def summarize(t: pa.Table) -> pa.Table:
        import hashlib as _h

        keep = pc.greater(t["n_spans"], 0)
        t = t.filter(keep)
        sha = [
            _h.sha256((x or "").encode()).hexdigest() for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "n_spans": t["n_spans"],
                "n_removed_words": t["n_removed_words"],
                "n_chars_after": pc.utf8_length(t["text"]),
                "clean_sha": pa.array(sha, type=pa.string()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def near_dup_ingest_verdicts(sf_dir: str) -> ray.data.Dataset:
    """Streaming near-dup ingest (stages/neardupingest.py): the prior
    corpus (even doc_ids) persists its band-bucket + sketch index ONCE
    under /tmp (atomic-rename cache); the new snapshot (odd doc_ids,
    plus an exact re-crawl of every doc_id % 10 == 0 prior doc and a
    tail-trimmed NEAR copy of every doc_id % 8 == 0 prior doc) is
    probed against the index without re-reading prior text. Rows-only
    (minhash); pytest asserts the injected copies resolve to their
    prior originals."""
    import hashlib as _hashlib
    import shutil

    from ordinarydumpdeduplicator_ray.stages.neardupingest import (
        ingest_near_dup,
        persist_near_dup_index,
    )

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def prior_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 2 == 0))
        return pa.table({
            "url": pa.array(
                [f"testdata://prior/{d:08d}" for d in t["doc_id"].to_pylist()],
                type=pa.string()),
            "html": pa.nulls(len(t), type=pa.binary()),
            "text": t["text"],
        })

    def new_pages(t: pa.Table) -> pa.Table:
        urls, texts = [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if d % 2 == 1:
                urls.append(f"testdata://new/{d:08d}")
                texts.append(txt)
            else:
                if d % 10 == 0:
                    urls.append(f"testdata://new/{d:08d}-recrawl")
                    texts.append(txt)
                if d % 8 == 0:
                    words = (txt or "").split(" ")
                    cut = max(1, len(words) // 30)
                    urls.append(f"testdata://new/{d:08d}-near")
                    texts.append(" ".join(words[: len(words) - cut]))
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "html": pa.nulls(len(urls), type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
        })

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"ndindex|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp", "odd_ndindex_" + key)
    if not os.path.isdir(base):
        tmp = f"{base}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        persist_near_dup_index(
            docs.map_batches(prior_pages, batch_format="pyarrow"), tmp, _qcfg()
        )
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return ingest_near_dup(
        docs.map_batches(new_pages, batch_format="pyarrow"), base,
        _qcfg(), _nparts(),
    )


_CARRY_CACHE: dict[str, ray.data.Dataset] = {}


def near_dup_components_carry(sf_dir: str) -> ray.data.Dataset:
    """Incremental cluster update (state/carry.py): the prior snapshot
    (even doc_ids, ``testdata://prior/``) runs the flagship once and
    keeps its component labels; a new snapshot (odd doc_ids + exact
    re-crawls of %10==0 + near copies of %8==0 — the near_dup_ingest
    corpus) contributes ONLY its own edges: new-new near-dups from a
    flagship pass over the new pages alone, plus new->prior cross
    edges straight from the streaming ingest verdicts. The carry
    contracts prior components to their canonicals, unions the new
    edges, and remaps — union-find never re-reads the prior corpus.
    Rows-only (minhash); locked via components_carry_checksum, and
    pytest asserts carry == full-recompute semantics on synthetic
    edge sets."""
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
    from ordinarydumpdeduplicator_ray.state.carry import carry_components

    cached = _CARRY_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def prior_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 2 == 0))
        return pa.table({
            "url": pa.array(
                [f"testdata://prior/{d:08d}" for d in t["doc_id"].to_pylist()],
                type=pa.string()),
            "html": pa.nulls(len(t), type=pa.binary()),
            "text": t["text"],
        })

    def new_pages(t: pa.Table) -> pa.Table:
        urls, texts = [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if d % 2 == 1:
                urls.append(f"testdata://new/{d:08d}")
                texts.append(txt)
            else:
                if d % 10 == 0:
                    urls.append(f"testdata://new/{d:08d}-recrawl")
                    texts.append(txt)
                if d % 8 == 0:
                    words = (txt or "").split(" ")
                    cut = max(1, len(words) // 30)
                    urls.append(f"testdata://new/{d:08d}-near")
                    texts.append(" ".join(words[: len(words) - cut]))
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "html": pa.nulls(len(urls), type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
        })

    prior = DedupPipeline(_qcfg(), num_partitions=_nparts()).run(
        docs.map_batches(prior_pages, batch_format="pyarrow")
    )["components"].select_columns(["url", "component_id"])

    new_new = DedupPipeline(_qcfg(), num_partitions=_nparts()).run(
        docs.map_batches(new_pages, batch_format="pyarrow")
    )["edges"].select_columns(["url_a", "url_b"])

    cross = near_dup_ingest_verdicts(sf_dir).map_batches(
        lambda t: pa.table({
            "url_a": t.filter(t["is_dup"])["url"],
            "url_b": t.filter(t["is_dup"])["dup_of"],
        }),
        batch_format="pyarrow",
    )

    out = carry_components(prior, new_new.union(cross)).materialize()
    _CARRY_CACHE[sf_dir] = out
    return out


def components_carry_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the incremental components carry."""
    return _row_digest_table(
        near_dup_components_carry(sf_dir), ["url", "component_id"],
        "n_members",
    )

