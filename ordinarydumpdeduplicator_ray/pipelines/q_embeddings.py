"""Embedding operators: ANN (brute/LSH/IVF), semantic dedup, k-means, cluster keywords.

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

from ordinarydumpdeduplicator_ray.pipelines.q_text import _doc_token_lists
from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    Q_CONFIG,
    _nparts,
    _qcfg,
    _query_vec,
    _read_documents,
    _round4_half_away,
    _row_digest_table,
)


def knn_cosine_vec0(sf_dir: str, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k against the vec_id=0 query vector:
    per-batch top-k (vectorized matmul) + tiny driver-side merge — the
    scalable ANN baseline (no full sort)."""

    path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = _query_vec(sf_dir)
    qnorm = np.linalg.norm(qvec)

    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])

    def batch_topk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        mask = ids != 0
        ids, mat = ids[mask], mat[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        cos = (mat @ qvec) / (np.linalg.norm(mat, axis=1) * qnorm)
        cos = np.round(cos, 6)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cos_sim": pa.array(cos[order], type=pa.float64()),
            }
        )

    partials = ds.map_batches(batch_topk, batch_format="pyarrow").take_all()
    partials.sort(key=lambda r: (-r["cos_sim"], r["vec_id"]))
    top = partials[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], type=pa.int64()),
            "cos_sim": pa.array([r["cos_sim"] for r in top], type=pa.float64()),
        }
    )


def knn_cosine_ivf_persisted(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k against the PERSISTED IVF index (state/annindex.py): the
    index builds once under /tmp (mtime-keyed cache — the amortized
    lifecycle of the token and near-dup indexes) with the deterministic
    distributed k-means layout, and the query reads only probed cluster
    partitions. Probing ALL partitions here makes the result exactly
    the brute-force top-k (same per-row cosine kernel), so the query is
    SQL-oracled; the bounded-probe scale path is pytest-bounded
    (recall vs exact)."""
    import hashlib as _hashlib
    import shutil as _shutil

    from ordinarydumpdeduplicator_ray.state.annindex import (
        build_ivf_index,
        search_ivf_index,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"ivfidx|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp", "odd_ivf_" + key)
    if not os.path.isdir(base):
        tmp = f"{base}.tmp-{os.getpid()}"
        _shutil.rmtree(tmp, ignore_errors=True)
        build_ivf_index(
            read_parquet_clean(src, columns=["vec_id", "embedding"]),
            tmp, n_centroids=16, iters=4,
        )
        try:
            os.rename(tmp, base)
        except OSError:  # lost a concurrent-build race
            _shutil.rmtree(tmp, ignore_errors=True)

    qvec = _query_vec(sf_dir)
    return search_ivf_index(base, qvec, k=k, nprobe=None, exclude_id=0)


def _embeddings_with_dups(sf_dir: str) -> ray.data.Dataset:
    """embeddings + a scaled copy (x*2, cosine exactly 1.0) of every
    vec_id % 4 == 0 row under vec_id + 1_000_000 — the deterministic
    near-dup injection, identical in the SQL oracle."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def inject(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "embedding": pa.array([], type=pa.list_(pa.float64()))})
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        m = ids % 4 == 0
        out_ids = np.concatenate([ids, ids[m] + 1_000_000])
        out_mat = np.concatenate([mat, mat[m] * 2.0])
        dim = mat.shape[1]
        offsets = pa.array(np.arange(len(out_ids) + 1, dtype=np.int32) * dim)
        emb = pa.ListArray.from_arrays(
            offsets, pa.array(out_mat.reshape(-1), type=pa.float64())
        )
        return pa.table(
            {"vec_id": pa.array(out_ids, type=pa.int64()), "embedding": emb}
        )

    return ds.map_batches(inject, batch_format="pyarrow")


def semantic_dedup_verdicts(sf_dir: str, n_clusters: int = 16,
                            threshold: float = 0.99) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023) cluster-partitioned KEEP/DROP
    verdicts over the dup-injected embeddings: seeded sampled k-means ->
    broadcast centroid assignment -> ONE cluster groupby -> per-cluster
    greedy cosine dedup keeping the lowest vec_id (stages/semdedup.py).
    Every injected exact copy (cosine 1.0, same direction => same
    cluster) must drop with dup_of = its original. Rows-only (k-means is
    not SQL-expressible); invariants are pytest brute-forced."""
    from ordinarydumpdeduplicator_ray.stages.semdedup import semantic_dedup

    return semantic_dedup(
        _embeddings_with_dups(sf_dir),
        n_clusters=n_clusters,
        threshold=threshold,
        seed=Q_CONFIG.seed,
    )


def semantic_dedup_incremental_verdicts(
    sf_dir: str, n_clusters: int = 16, threshold: float = 0.99
) -> ray.data.Dataset:
    """Cross-snapshot SemDeDup (stages/semdedup.py
    semantic_dedup_incremental): prior snapshot = even vec_ids (treated
    as already-deduplicated), new snapshot = odd vec_ids plus an exact
    re-crawl copy (x2 scale, cosine 1.0) of every prior vec_id % 8 == 0
    row under vec_id + 2_000_000. Every injected copy must drop with
    dup_is_prior = True and dup_of = its prior original. Rows-only
    (k-means is not SQL-expressible); invariants pytest-brute-forced."""
    from ordinarydumpdeduplicator_ray.stages.semdedup import (
        semantic_dedup_incremental,
    )

    ds = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def _emb_table(ids: np.ndarray, mat: np.ndarray) -> pa.Table:
        # both sides rebuilt as float64 lists so the union is one schema
        dim = mat.shape[1] if len(mat) else 0
        offsets = pa.array(np.arange(len(ids) + 1, dtype=np.int32) * dim)
        emb = pa.ListArray.from_arrays(
            offsets, pa.array(mat.reshape(-1), type=pa.float64())
        )
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()), "embedding": emb}
        )

    def evens(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _emb_table(np.empty(0, dtype=np.int64), np.empty((0, 0)))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        m = ids % 2 == 0
        return _emb_table(ids[m], mat[m])

    def odds_plus_recrawls(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _emb_table(np.empty(0, dtype=np.int64), np.empty((0, 0)))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        odd = ids % 2 == 1
        rec = ids % 8 == 0
        out_ids = np.concatenate([ids[odd], ids[rec] + 2_000_000])
        out_mat = np.concatenate([mat[odd], mat[rec] * 2.0])
        return _emb_table(out_ids, out_mat)

    prior = ds.map_batches(evens, batch_format="pyarrow")
    new = ds.map_batches(odds_plus_recrawls, batch_format="pyarrow")
    return semantic_dedup_incremental(
        prior, new, n_clusters=n_clusters, threshold=threshold,
        seed=Q_CONFIG.seed,
    )


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.99) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b,
    round(cos, 6) >= threshold) over the dup-injected embeddings:
    banded sign-LSH bucket keys -> skew-capped sorted-run candidate
    pairs -> exact cosine re-rank via two hash joins
    (stages/embeddings.py). No driver-side materialization, no
    full-matrix broadcast; returns a streaming Dataset."""
    from ordinarydumpdeduplicator_ray.stages.embeddings import (
        embedding_near_dup_pairs as impl,
    )

    return impl(
        _embeddings_with_dups(sf_dir),
        threshold=threshold,
        seed=Q_CONFIG.seed,
        num_partitions=_nparts(),
        config=_qcfg(),
    )


def knn_cosine_lsh_vec0(sf_dir: str, k: int = 10, nbits: int = 16,
                        max_hamming: int = 6) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH: 16-bit signature per
    vector (seeded planes broadcast once), candidates = vectors whose
    code is within ``max_hamming`` bits of the query's code, exact cosine
    re-rank on candidates only. The scale path for similarity search —
    the candidate set is a small fraction of the corpus, and bucket codes
    shuffle as int64 keys."""
    import ray

    path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = _query_vec(sf_dir)
    dim = len(qvec)
    rng = np.random.default_rng(Q_CONFIG.seed)
    planes = rng.standard_normal((dim, nbits))
    qcode = int(np.packbits((qvec @ planes) > 0).view(">u2")[0]) if nbits == 16 else 0
    ref = ray.put((planes, qvec / np.linalg.norm(qvec), qcode))

    def lsh_scan(t: pa.Table) -> pa.Table:
        # ray.get on a plasma-resident tuple is a zero-copy handle for the
        # numpy members — per-batch resolution, not a per-batch ship
        planes_, qvec_, qcode_ = ray.get(ref)
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        mask = ids != 0
        ids, mat = ids[mask], mat[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        bits = (mat @ planes_) > 0
        codes = np.packbits(bits, axis=1).view(">u2").reshape(-1).astype(np.int64)
        # vectorized popcount of the xor vs the query code (16-bit codes)
        x = (codes ^ qcode_).astype(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            ham += (x & 1).astype(np.int64)
            x >>= 1
            if not x.any():
                break
        cand = ham <= max_hamming
        ids, mat = ids[cand], mat[cand]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        cos = np.round((mat @ qvec_) / np.linalg.norm(mat, axis=1), 6)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cos_sim": pa.array(cos[order], type=pa.float64()),
            }
        )

    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])
    # unconstrained tasks (like the exact and IVF variants) — the former
    # concurrency=2 actor pool starved a 32-CPU box (VERDICT r2 #4)
    partials = ds.map_batches(lsh_scan, batch_format="pyarrow",
                              batch_size=4096).take_all()
    partials.sort(key=lambda r: (-r["cos_sim"], r["vec_id"]))
    top = partials[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], type=pa.int64()),
            "cos_sim": pa.array([r["cos_sim"] for r in top], type=pa.float64()),
        }
    )


def knn_cosine_ivf_vec0(sf_dir: str, k: int = 10, n_centroids: int = 16,
                        nprobe: int = 4, kmeans_iters: int = 10,
                        sample_rows: int = 2048) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index — the second
    scale path for similarity search alongside the LSH variant:

    1. driver trains spherical k-means centroids on a bounded sample
       (``sample_rows`` rows — O(sample) driver memory regardless of
       corpus size; seeded, deterministic),
    2. the centroid matrix broadcasts once (``ray.put``),
    3. the scan stage assigns each batch row to its nearest centroid
       (one matmul), keeps only rows whose centroid is among the query's
       ``nprobe`` closest lists, and exact-cosine-reranks the survivors,
    4. per-batch top-k partials merge on the driver (k rows per batch).

    At 100 TB the probe filter drops ~(1 - nprobe/n_centroids) of every
    batch before the rerank matmul; nothing materializes beyond k-row
    partials. Recall vs the exact scan is pytest-bounded."""
    import ray

    path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = _query_vec(sf_dir)
    qvec = qvec / np.linalg.norm(qvec)

    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])

    # bounded sample -> spherical k-means on the driver
    sample = pa.concat_tables(
        list(ds.limit(sample_rows).iter_batches(batch_size=sample_rows,
                                                batch_format="pyarrow"))
    )
    from ordinarydumpdeduplicator_ray.stages.semdedup import spherical_kmeans

    cents = spherical_kmeans(
        list_to_matrix(sample["embedding"]), n_centroids, kmeans_iters,
        Q_CONFIG.seed,
    )
    probe = set(np.argsort(-(cents @ qvec))[:nprobe].tolist())
    ref = ray.put((cents, probe, qvec))

    def ivf_scan(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "cos_sim": pa.array([], type=pa.float64())})
        cents_, probe_, q = ray.get(ref)
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_to_matrix(t["embedding"])
        mask = ids != 0
        ids, mat = ids[mask], mat[mask]
        if len(ids) == 0:
            return empty
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = np.argmax(norm @ cents_.T, axis=1)
        cand = np.isin(assign, list(probe_))
        ids, norm = ids[cand], norm[cand]
        if len(ids) == 0:
            return empty
        cos = np.round(norm @ q, 6)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cos_sim": pa.array(cos[order], type=pa.float64()),
            }
        )

    partials = ds.map_batches(ivf_scan, batch_format="pyarrow",
                              batch_size=4096).take_all()
    partials.sort(key=lambda r: (-r["cos_sim"], r["vec_id"]))
    top = partials[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], type=pa.int64()),
            "cos_sim": pa.array([r["cos_sim"] for r in top], type=pa.float64()),
        }
    )


def semantic_dedup_incremental_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the cross-snapshot SemDeDup verdicts."""
    return _row_digest_table(
        semantic_dedup_incremental_verdicts(sf_dir),
        ["vec_id", "kept", "dup_of", "dup_is_prior"],
        "n_new_rows",
    )


_KMEANS_CACHE: dict = {}


def _kmeans_assignments(sf_dir: str) -> ray.data.Dataset:
    cached = _KMEANS_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        distributed_kmeans,
    )

    emb = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    _, assigns = distributed_kmeans(emb, k=8, iters=4)
    out = assigns.materialize()
    _KMEANS_CACHE[sf_dir] = out
    return out


def embedding_kmeans_stats(sf_dir: str) -> pa.Table:
    """Full-corpus distributed Lloyd k-means over the embeddings table
    (stages/kmeanslloyd.py): per-cluster size + mean cosine to the
    learned centroid. Every row votes in every update — one block pass
    per iteration, exact int64 micro-unit partials so the result is
    bit-identical under ANY blocking. Rows-only (iterative float
    clustering is not SQL-expressible); the blocking-independence and
    convergence properties are pytest-carried and the full assignment
    table is hash-locked via embedding_kmeans_checksum."""
    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        kmeans_cluster_stats,
    )

    return kmeans_cluster_stats(_kmeans_assignments(sf_dir))


def embedding_kmeans_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the full k-means assignment table."""
    return _row_digest_table(
        _kmeans_assignments(sf_dir), ["vec_id", "cluster", "cos"],
        "n_vectors",
    )


def cluster_keywords(sf_dir: str, top_k: int = 3) -> pa.Table:
    """Interpretation layer for the distributed k-means: the ``top_k``
    most DISTINCTIVE tokens per embedding cluster, ranked by lift
    (cluster tf share / corpus tf share). Cluster assignments
    (vec_id-aligned with doc_id) broadcast once; per-block
    (cluster, token) counts fold exactly like the vocabulary combiner;
    lift is a ratio of exact int counts (round4, half-away).
    Rows-only; locked via cluster_keywords_checksum."""
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    assigns = _kmeans_assignments(sf_dir)
    packed = pa.concat_tables(
        assigns.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    ref = ray.put((packed["vec_id"], packed["cluster"]))

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "cluster": pa.array([], type=pa.int32()),
                "token": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        ids, cls = _get_broadcast(ref)
        idx = pc.index_in(t["doc_id"], value_set=ids)
        # drop docs absent from the k-means assignments BEFORE the cast:
        # a null index would otherwise surface as NaN -> garbage int64
        # cluster ids downstream (ADVICE round 4)
        covered = pc.is_valid(idx)
        if not pc.all(covered).as_py():
            t = t.filter(covered)
            idx = idx.filter(covered)
            if len(t) == 0:
                return pa.table({
                    "cluster": pa.array([], type=pa.int32()),
                    "token": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                })
        cl_of = pc.take(cls, idx).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        flat, n_per_doc = _doc_token_lists(t)
        seg = np.repeat(cl_of.astype(np.int64), n_per_doc)
        pairs = pa.table({"cluster": pa.array(seg), "token": flat})
        order = pc.sort_indices(
            pairs, sort_keys=[("cluster", "ascending"), ("token", "ascending")]
        )
        s_c = pc.take(pairs["cluster"], order).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        s_t = pc.take(pairs["token"], order).combine_chunks()
        n = len(s_c)
        if n == 0:
            return pa.table({
                "cluster": pa.array([], type=pa.int32()),
                "token": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        c_change = np.concatenate([[True], s_c[1:] != s_c[:-1]])
        t_change = np.concatenate([[True], pc.not_equal(
            s_t.slice(1), s_t.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)])
        starts = np.flatnonzero(c_change | t_change)
        cnt = np.diff(np.concatenate([starts, [n]]))
        return pa.table({
            "cluster": pa.array(s_c[starts].astype(np.int32), type=pa.int32()),
            "token": s_t.take(pa.array(starts)),
            "n": pa.array(cnt, type=pa.int64()),
        })

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["cluster", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    # The (cluster x vocab) table is web-scale (10^8+ tokens): it never
    # reaches the driver. Corpus per-token totals come from a second
    # (distributed) groupby over agg; cluster totals are k rows; lift is
    # scored per block after a token-keyed shuffle join; each block then
    # emits only its top_k-per-cluster candidates, so the driver merge
    # sees O(blocks * k * top_k) rows — and stays EXACT: every global
    # top-k row is necessarily in its own block's top-k under the same
    # (lift desc, token asc) total order.
    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    corpus = agg.groupby("token").aggregate(Sum("n", alias_name="corpus_n"))
    ct_rows = agg.groupby("cluster").aggregate(
        Sum("n", alias_name="cluster_n")
    ).take_all()
    cluster_tot = {int(r["cluster"]): float(r["cluster_n"]) for r in ct_rows}
    total = float(sum(r["cluster_n"] for r in ct_rows))
    out_schema = pa.schema([
        ("cluster", pa.int32()), ("token", pa.string()),
        ("n", pa.int64()), ("lift", pa.float64()),
    ])
    if not cluster_tot:
        return out_schema.empty_table()

    def _top_per_cluster(t: pa.Table, k: int) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("cluster", "ascending"), ("lift", "descending"),
            ("token", "ascending"),
        ])
        s = t.take(order)
        cl = s["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate([[True], cl[1:] != cl[:-1]])
        rank = np.arange(len(cl)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(cl)), 0)
        )
        return s.filter(pa.array(rank < k))

    def score_and_cap(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        cl = t["cluster"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cn = t["corpus_n"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ctot = np.array([cluster_tot[int(c)] for c in cl], dtype=np.float64)
        lift = (n / ctot) / (cn / total)
        scored = pa.table({
            "cluster": pc.cast(t["cluster"], pa.int32()),
            "token": t["token"],
            "n": pc.cast(t["n"], pa.int64()),
            "lift": pa.array(lift, type=pa.float64()),
        })
        return _top_per_cluster(scored, top_k)

    cands = pa.concat_tables(
        inner_join(agg, corpus, on=("token",))
        .map_batches(score_and_cap, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    if len(cands) == 0:
        return out_schema.empty_table()
    best = _top_per_cluster(cands, top_k)
    return pa.table({
        "cluster": best["cluster"],
        "token": best["token"],
        "n": best["n"],
        "lift": pa.array(_round4_half_away(
            best["lift"].combine_chunks().to_numpy(zero_copy_only=False)
        ), type=pa.float64()),
    })


def cluster_keywords_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the cluster keywords table."""
    return _row_digest_table(
        ray.data.from_arrow(cluster_keywords(sf_dir)),
        ["cluster", "token", "n", "lift"], "n_rows",
    )

