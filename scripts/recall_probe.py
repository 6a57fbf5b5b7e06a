"""Ground-truth dup-pair recall of the flagship at corpus scale.

Usage: python scripts/recall_probe.py PAGES_DIR TRUTH_PARQUET NUM_CPUS

Runs the flagship over PAGES_DIR, then measures PAIRWISE recall within
every duplicate truth class (exact / near / hot) of the generator's
sidecar truth table: a truth pair counts as recovered iff both urls
carry the same component label. Prints one JSON line — the evidence
behind BASELINE.md's "north-rule recall at scale" row (bar: >= 0.99).

The compare is driver-side over two modest tables (component members —
O(dup docs) — and the truth sidecar); the corpus itself streams only
through the flagship.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import warnings

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pages_dir, truth_path, num_cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])

    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
    from ordinarydumpdeduplicator_ray.sources.pages import read_pages

    pages = read_pages(pages_dir).materialize()
    pipe = DedupPipeline(
        DedupConfig(sig_concurrency=num_cpus, batch_size=512),
        num_partitions=max(8, num_cpus // 2),
    )
    res = pipe.run(pages)
    comp = {r["url"]: r["component_id"] for r in res["components"].take_all()}

    truth = pq.read_table(truth_path)
    groups: dict[tuple, list[str]] = collections.defaultdict(list)
    for u, c, g in zip(truth["url"].to_pylist(),
                       truth["truth_class"].to_pylist(),
                       truth["truth_group"].to_pylist()):
        if c in ("exact", "near", "hot") and g is not None and g >= 0:
            groups[(c, g)].append(u)

    per_class: dict[str, list[int]] = collections.defaultdict(lambda: [0, 0])
    for (c, _g), urls in groups.items():
        n = len(urls)
        if n < 2:
            continue
        labels = collections.Counter(
            lab for lab in (comp.get(u) for u in urls) if lab is not None
        )
        per_class[c][0] += sum(k * (k - 1) // 2 for k in labels.values())
        per_class[c][1] += n * (n - 1) // 2

    out = {
        c: {"pairs_recovered": rec, "pairs_total": tot,
            "recall": round(rec / tot, 6) if tot else None}
        for c, (rec, tot) in sorted(per_class.items())
    }
    out["n_members"] = len(comp)
    out["n_truth_dup_groups"] = sum(1 for v in groups.values() if len(v) >= 2)
    print(json.dumps(out, sort_keys=True))
    ray.shutdown()


if __name__ == "__main__":
    main()
