"""Per-substep profiling of the flagship's `edges` stage (candidate
generation + verification) at one parallelism level.

Usage: python scripts/profile_edges.py <pages_dir> <num_cpus>
Prints one JSON line of substep wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")


def main() -> None:
    pages_dir, num_cpus = sys.argv[1], int(sys.argv[2])
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.sources.pages import read_pages
    from ordinarydumpdeduplicator_ray.stages.signatures import compute_signatures
    from ordinarydumpdeduplicator_ray.stages.candidates import (
        _make_block_emitter,
        _reconcile_fragments,
        explode_minhash_bands,
        explode_sha_buckets,
        explode_simhash_blocks,
        candidate_pairs,
    )
    from ordinarydumpdeduplicator_ray.stages.verify import verify_pairs

    cfg = DedupConfig(sig_concurrency=max(2, num_cpus // 2), batch_size=512)
    nparts = max(8, num_cpus // 2)
    t: dict[str, float] = {}

    def clock(name):
        t0 = time.perf_counter()

        def done():
            t[name] = round(time.perf_counter() - t0, 2)

        return done

    d = clock("read")
    pages = read_pages(pages_dir).materialize()
    d()

    d = clock("signatures")
    sigs = compute_signatures(pages, cfg).materialize()
    d()

    d = clock("explode_union")
    bands = explode_minhash_bands(sigs, cfg)
    blocks = explode_simhash_blocks(sigs, cfg)
    shas = explode_sha_buckets(sigs)
    buckets = bands.union(blocks).union(shas).materialize()
    d()
    t["bucket_rows"] = buckets.count()

    d = clock("bucket_sort")
    sorted_rows = buckets.sort(["bucket", "url"]).materialize()
    d()

    d = clock("emit")
    emitted = sorted_rows.map_batches(
        _make_block_emitter(cfg.max_group_pairs), batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    d()

    import pyarrow.compute as pc

    d = clock("split_frags")
    pairs = emitted.map_batches(
        lambda tb: tb.filter(pc.is_valid(tb["url_a"])).select(["url_a", "url_b"]),
        batch_format="pyarrow",
    )
    frags = emitted.map_batches(
        lambda tb: tb.filter(pc.is_null(tb["url_a"])).select(
            ["fbucket", "f_first", "f_last", "f_n", "f_urls"]),
        batch_format="pyarrow",
    ).take_all()
    d()
    t["n_frags"] = len(frags)

    d = clock("reconcile_union_canon")
    import ray.data as rd
    import pyarrow as pa

    if frags:
        pairs = pairs.union(rd.from_arrow(_reconcile_fragments(frags, cfg.max_group_pairs)))

    def canon(tb: pa.Table) -> pa.Table:
        if len(tb) == 0:
            return pa.schema([("url_a", pa.string()), ("url_b", pa.string())]).empty_table()
        swap = pc.greater(tb["url_a"], tb["url_b"])
        a = pc.if_else(swap, tb["url_b"], tb["url_a"])
        b = pc.if_else(swap, tb["url_a"], tb["url_b"])
        return pa.table({"url_a": a, "url_b": b}).filter(pc.less(a, b))

    pairs = pairs.map_batches(canon, batch_format="pyarrow").materialize()
    d()
    t["raw_pairs"] = pairs.count()

    d = clock("pk_dedup_sort")
    import numpy as np
    import pandas.util as pdu

    def add_pair_key(tb: pa.Table) -> pa.Table:
        ha = pdu.hash_array(np.asarray(tb["url_a"].to_pylist(), dtype=object))
        hb = pdu.hash_array(np.asarray(tb["url_b"].to_pylist(), dtype=object))
        with np.errstate(over="ignore"):
            pk = (ha * np.uint64(0x9E3779B97F4A7C15)) ^ hb
        return tb.append_column("pk", pa.array(pk.view(np.int64), type=pa.int64()))

    def local_unique(tb: pa.Table) -> pa.Table:
        if len(tb) < 2:
            return tb.drop_columns(["pk"])
        a = np.asarray(tb["url_a"].to_pylist(), dtype=object)
        b = np.asarray(tb["url_b"].to_pylist(), dtype=object)
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return tb.filter(pa.array(keep)).drop_columns(["pk"])

    deduped = (
        pairs.map_batches(add_pair_key, batch_format="pyarrow")
        .sort("pk")
        .map_batches(local_unique, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    d()
    t["deduped_pairs"] = deduped.count()

    d = clock("verify_joins")
    edges = verify_pairs(deduped, sigs, cfg, nparts).materialize()
    d()
    t["edges"] = edges.count()
    t["num_cpus"] = num_cpus

    print(json.dumps(t))
    ray.shutdown()


if __name__ == "__main__":
    main()
