"""Blocking/parallelism-invariance probe for the iterative operators.

Usage: python scripts/invariance_probe.py PAGES_DIR NUM_CPUS

Runs, at the given parallelism, over the identical on-disk corpus:
  - the flagship near-dup pipeline -> component-labels digest
  - PageRank over the flagship's edge table -> rank digest
  - carry_components (prior = components of the jaccard>=0.9 edge
    subset, delta = ALL edges; exercises the contract/rewrite seam)
    -> carried-labels digest
  - distributed Lloyd k-means over sha-derived embeddings -> assignment
    digest

and prints ONE JSON line of {op: [n_rows, checksum]}. Two invocations
at different ``NUM_CPUS`` (fresh processes, different block counts,
different actor-pool sizes) must print IDENTICAL digests — the
bit-equality evidence behind BASELINE.md's "iterative-op invariance at
scale" row and the slow pytest in tests/test_scale_invariance.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import warnings

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pages_dir, num_cpus = sys.argv[1], int(sys.argv[2])

    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.pipelines import queries as q
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
    from ordinarydumpdeduplicator_ray.sources.pages import read_pages
    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        distributed_kmeans,
    )
    from ordinarydumpdeduplicator_ray.state.carry import carry_components
    from ordinarydumpdeduplicator_ray.state.pagerank import pagerank
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges,
    )

    out: dict[str, list] = {}

    def digest(ds, cols, name):
        t = q._row_digest_table(ds, cols, name)
        row = t.to_pylist()[0]
        return [row[name], row["checksum"]]

    pages = read_pages(pages_dir).materialize()
    cfg = DedupConfig(sig_concurrency=num_cpus, batch_size=512)
    pipe = DedupPipeline(cfg, num_partitions=max(8, num_cpus // 2))
    res = pipe.run(pages)
    edges = res["edges"].materialize()

    out["components"] = digest(
        res["components"], ["url", "component_id", "n_bytes"], "n")
    # edges digested too: a downstream divergence (e.g. pagerank) can
    # then be localized to "edge multiset differed" vs "iteration
    # differed" — components alone cannot distinguish the two
    out["edges"] = digest(
        edges, ["url_a", "url_b", "nb_a", "nb_b", "source", "jaccard"], "n")

    # PageRank digest over rank nano-units (float ranks are themselves
    # integer-derived and blocking-independent, but digest the exact
    # int64 quantization to be explicit about what is locked)
    pr = pagerank(edges)
    ranks = np.rint(pr["rank"].to_numpy(zero_copy_only=False) * 1e9) \
        .astype(np.int64)
    out["pagerank"] = digest(
        ray.data.from_arrow(pa.table({
            "url": pr["url"], "rank_nano": pa.array(ranks, type=pa.int64()),
        })),
        ["url", "rank_nano"], "n")

    prior = ray.data.from_arrow(
        components_from_edges(edges.filter(expr="jaccard >= 0.9"))
    ).map_batches(
        lambda t: t.select(["url", "component_id"]), batch_format="pyarrow"
    )
    carried = carry_components(prior, edges)
    out["carry"] = digest(carried, ["url", "component_id"], "n")

    # sha-derived embeddings: deterministic per url, id = first 8 digest
    # bytes (masked non-negative so sort order is parallelism-free)
    def embed(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        ids = np.empty(len(urls), dtype=np.int64)
        mat = np.empty((len(urls), 8), dtype=np.float64)
        for i, u in enumerate(urls):
            d = hashlib.sha256(u.encode()).digest()
            ids[i] = int.from_bytes(d[:8], "little") & 0x7FFFFFFFFFFFFFFF
            v = np.frombuffer(d, dtype=np.uint8)[:8].astype(np.float64)
            mat[i] = v / 255.0 - 0.5
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float64())),
        })

    emb = pages.map_batches(embed, batch_format="pyarrow")
    _cents, assigns = distributed_kmeans(emb, k=16, iters=4)
    out["kmeans"] = digest(assigns, ["vec_id", "cluster"], "n")

    print(json.dumps(out, sort_keys=True))
    ray.shutdown()


if __name__ == "__main__":
    main()
