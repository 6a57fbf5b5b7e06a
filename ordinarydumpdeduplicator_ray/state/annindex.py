"""Persisted IVF (inverted-file) ANN index over an embedding column.

The similarity-search analogue of the persisted token index
(``sources/tokenindex.py``) and the streaming near-dup index
(``stages/neardupingest.py``): cluster once, write the vectors as
Parquet PARTITIONED BY CLUSTER plus a small centroids file, then serve
queries by reading ONLY the probed cluster partitions — at 100 TB a
``nprobe``/``n_centroids`` fraction of the index leaves storage per
query, and the build cost amortizes over every query after the first.

Clustering is the distributed Lloyd k-means
(``stages/kmeanslloyd.py``): integer-quantized partials make the
assignment bit-identical under any blocking, so the index layout is
deterministic and rebuilds are byte-stable. No reference counterpart
(the reference has no vector surface); north-rule similarity-search
scale path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.functions.vectors import list_to_matrix


def build_ivf_index(
    emb: ray.data.Dataset,
    out_dir: str,
    n_centroids: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> dict:
    """Embeddings Dataset -> on-disk IVF index:

    - ``vectors/cluster=<c>/*.parquet`` — (vec_id, embedding) rows
      partitioned by nearest-centroid assignment
    - ``centroids.npy``-equivalent stored as JSON (k x dim unit rows —
      small by construction) + a manifest

    Returns the manifest dict."""
    import ray

    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        _quantized,
        distributed_kmeans,
    )
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    cents, _assigns = distributed_kmeans(
        emb, emb_col=emb_col, id_col=id_col, k=n_centroids, iters=iters
    )
    # Attach the cluster per batch from the broadcast FINAL centroids
    # with the identical quantized-argmax kernel the k-means assignment
    # pass uses (bit-identical labels) — a join would have to carry the
    # list<float> embedding as a non-key payload, which Ray's hash join
    # rejects; this is also one fewer shuffle.
    cents_ref = ray.put(cents)

    def attach(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([
                (id_col, pa.int64()), (emb_col, t.schema.field(emb_col).type),
                ("cluster", pa.int32()),
            ]).empty_table()
        c = _get_broadcast(cents_ref)
        q = _quantized(t, emb_col)
        assign = np.argmax(q @ c.T, axis=1)
        return pa.table({
            id_col: t[id_col],
            emb_col: t[emb_col],
            "cluster": pa.array(assign.astype(np.int32), type=pa.int32()),
        })

    os.makedirs(out_dir, exist_ok=True)
    vectors_dir = os.path.join(out_dir, "vectors")
    if os.path.isdir(vectors_dir):
        # rebuild: write_parquet APPENDS uniquely-named files into the
        # cluster partitions, so a pre-existing layout must go first or
        # searches silently read stale rows alongside the new build
        import shutil as _shutil

        _shutil.rmtree(vectors_dir)
    emb.map_batches(
        lambda t: t.select([id_col, emb_col]), batch_format="pyarrow"
    ).map_batches(attach, batch_format="pyarrow").write_parquet(
        vectors_dir, partition_cols=["cluster"]
    )
    manifest = {
        "n_centroids": int(len(cents)),
        "dim": int(cents.shape[1]) if len(cents) else 0,
        "id_col": id_col,
        "emb_col": emb_col,
        "centroids": [[float(x) for x in row] for row in cents],
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def search_ivf_index(
    idx_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int | None = None,
    exclude_id: int | None = None,
) -> pa.Table:
    """Top-``k`` by cosine against the persisted index, reading ONLY
    the ``nprobe`` cluster partitions nearest the query (``None`` =
    probe every partition — exhaustive over the partitioned layout,
    exactly the brute-force result). Per-block top-k partials + a
    k-row driver merge; cosine arithmetic is identical per row to the
    exact scan (same kernel steps), so full-probe results match it
    bit-for-bit."""
    with open(os.path.join(idx_dir, "manifest.json")) as f:
        man = json.load(f)
    cents = np.asarray(man["centroids"], dtype=np.float64)
    id_col, emb_col = man["id_col"], man["emb_col"]
    qnorm = np.linalg.norm(query_vec)
    if len(cents) == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "cos_sim": pa.array([], type=pa.float64())})
    sims = cents @ (query_vec / qnorm)
    order = np.argsort(-sims, kind="stable")
    probes = order if nprobe is None else order[: max(1, nprobe)]
    dirs = [
        os.path.join(idx_dir, "vectors", f"cluster={int(c)}")
        for c in probes
    ]
    files = [
        os.path.join(d, f)
        for d in dirs if os.path.isdir(d)
        for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    if not files:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "cos_sim": pa.array([], type=pa.float64())})
    ds = ray.data.read_parquet(files)

    def batch_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = list_to_matrix(t[emb_col])
        if exclude_id is not None:
            mask = ids != exclude_id
            ids, mat = ids[mask], mat[mask]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        cos = (mat @ query_vec) / (np.linalg.norm(mat, axis=1) * qnorm)
        cos = np.round(cos, 6)
        top = np.lexsort((ids, -cos))[:k]
        return pa.table({
            id_col: pa.array(ids[top], type=pa.int64()),
            "cos_sim": pa.array(cos[top], type=pa.float64()),
        })

    partials = ds.map_batches(batch_topk, batch_format="pyarrow").take_all()
    partials.sort(key=lambda r: (-r["cos_sim"], r[id_col]))
    top = partials[:k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in top], type=pa.int64()),
        "cos_sim": pa.array([r["cos_sim"] for r in top], type=pa.float64()),
    })
