"""Per-substep profiling of the flagship's `edges` stage (candidate
generation + verification + margin recheck) at one parallelism level,
mirroring DedupPipeline.find_duplicates' current shape.

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
    from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
    from ordinarydumpdeduplicator_ray.sources.pages import read_pages
    from ordinarydumpdeduplicator_ray.stages.signatures import (
        assign_uids,
        compute_signatures,
    )
    from ordinarydumpdeduplicator_ray.stages.grouped import (
        exact_group_index,
        representative_signatures,
    )
    from ordinarydumpdeduplicator_ray.stages.candidates import (
        explode_minhash_bands,
        explode_sha_buckets,
        explode_simhash_blocks,
        candidate_pairs,
    )
    from ordinarydumpdeduplicator_ray.stages import verify as V

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

    d = clock("assign_uids")
    sigs, _salt = assign_uids(sigs, nparts)
    d()

    d = clock("exact_index")
    index = exact_group_index(
        sigs.filter(expr=f"status != '{STATUS_BROKEN}'"), sort_partitions=2 * nparts
    ).materialize()
    d()

    d = clock("explode_union")
    reps = representative_signatures(index, sigs)
    buckets = explode_minhash_bands(reps, cfg, member="uid").union(
        explode_simhash_blocks(reps, cfg, member="uid")
    ).union(explode_sha_buckets(sigs, member="uid")).materialize()
    d()
    t["bucket_rows"] = buckets.count()

    d = clock("candidate_pairs")
    pairs = candidate_pairs(buckets, cfg, nparts).materialize()
    d()
    t["pairs"] = pairs.count()

    # verify sub-steps (broadcast path, mirrors verify_pairs)
    d = clock("verify_collect_uids")
    pairs = pairs.materialize()
    pair_uids = V._collect_pair_uids(pairs, V._BROADCAST_VERIFY_URL_CAP)
    d()
    t["pair_uids"] = int(len(pair_uids)) if pair_uids is not None else -1

    if pair_uids is not None and len(pair_uids):
        import functools

        d = clock("verify_build_lookup")
        lookup_ref = V._build_sig_lookup(sigs, pair_uids, cfg)
        d()
        d = clock("verify_map")
        edges = pairs.map_batches(
            functools.partial(V._broadcast_verify_batch, config=cfg,
                              lookup_ref=lookup_ref, recheck=False),
            batch_format="pyarrow", batch_size=8192,
        ).materialize()
        d()
    else:
        d = clock("verify_joins")
        edges = V.verify_pairs(pairs, sigs, cfg, nparts).materialize()
        d()
    t["edges_raw"] = edges.count()

    # margin split + exact recheck (the part verify_pairs adds with
    # pages). Without pages, margin pairs carry source='minhash' with the
    # est in `jaccard` — reconstruct the pending set from the est band.
    thr_lo = cfg.jaccard_threshold - cfg.verify_margin
    thr_hi = cfg.jaccard_threshold + cfg.verify_margin
    d = clock("margin_split")
    pending = edges.filter(
        expr=f"source == 'minhash' and jaccard >= {thr_lo} and jaccard < {thr_hi}"
    ).materialize()
    d()
    t["pending"] = pending.count()
    if pending.count():
        d = clock("recheck")
        resolved = V.exact_jaccard_recheck(pending, pages, cfg, nparts).materialize()
        d()
        t["resolved"] = resolved.count()
    t["num_cpus"] = num_cpus

    print(json.dumps(t))
    ray.shutdown()


if __name__ == "__main__":
    main()
