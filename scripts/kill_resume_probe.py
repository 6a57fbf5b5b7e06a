"""Mid-shuffle kill/resume probe for the flagship pipeline.

North-rule criterion: "every stage checkpoints ... so a killed job
resumes mid-shuffle". This script is one LEG of the evidence; the
orchestration (kill + resume + control comparison) lives in
tests/test_kill_resume.py and the BASELINE.md row it produces.

Usage: python scripts/kill_resume_probe.py PAGES_DIR CPUS CKPT_DIR

Runs the flagship with the given checkpoint dir and prints ONE JSON
line: the order/blocking-independent components digest plus the
per-stage ``resumed`` flags — so the caller can assert (a) which stages
were skipped on resume and (b) that the resumed run's components are
bit-identical to an uninterrupted control run.
"""

from __future__ import annotations

import json
import os
import sys
import warnings

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pages_dir, num_cpus, ckpt_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.pipelines import queries as q
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

    cfg = DedupConfig(sig_concurrency=num_cpus, batch_size=512)
    pipe = DedupPipeline(cfg, checkpoint_dir=ckpt_dir,
                         num_partitions=max(8, num_cpus // 2))
    out = pipe.run(pages_dir)
    digest = q._row_digest_table(
        out["components"], ["url", "component_id"], "n"
    ).to_pylist()[0]
    print(json.dumps({
        "components": [digest["n"], digest["checksum"]],
        "resumed": {k: v.get("resumed") for k, v in pipe.metrics.items()
                    if "resumed" in v},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
