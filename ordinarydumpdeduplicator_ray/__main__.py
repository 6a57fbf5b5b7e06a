"""CLI entry point — the ``ray job submit`` launch surface.

The reference is driven from a WinForms GUI (``MainForm.cs``: pick a
folder, Rescan, Find duplicates, Move/Delete); a cluster engine is
driven from a job submission instead::

    ray job submit --working-dir . -- \
        python -m ordinarydumpdeduplicator_ray \
        --pages s3://bucket/pages/ --out s3://bucket/dedup-run-7/ \
        --checkpoint s3://bucket/dedup-run-7/ckpt

Runs the flagship pipeline (signatures -> exact groups -> candidate
pairs -> verified edges -> components -> near groups -> actions) and
writes every result table as partitioned Parquet under ``--out``
(one directory per table, many files per directory — a failed run
resumes from ``--checkpoint`` and skips finished stages). Prints one
JSON line of per-stage metrics to stdout, which ``ray job logs``
surfaces on the submitting machine.

This module owns the Ray session (guarded init — under ``ray job
submit`` the cluster connection already exists); the library itself
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import warnings


def _parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        prog="python -m ordinarydumpdeduplicator_ray",
        description="Ray-Data near-duplicate detection over a pages Parquet table",
    )
    ap.add_argument("--pages", required=True,
                    help="input pages dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--format", default="parquet",
                    choices=("parquet", "jsonl", "csv", "warc"),
                    help="input container (default parquet — the scale "
                         "format; jsonl/csv/warc parse per record)")
    ap.add_argument("--out", required=True,
                    help="output dir: one Parquet directory per result table")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir — reruns resume after the last complete stage")
    ap.add_argument("--num-partitions", type=int, default=0,
                    help="shuffle partitions (default: cluster CPUs // 2, min 8)")
    ap.add_argument("--jaccard-threshold", type=float, default=None)
    ap.add_argument("--num-perm", type=int, default=None)
    ap.add_argument("--shingle-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--isolate", action="store_true",
                    help="also write kept/ and quarantine/ tables (apply_actions)")
    ap.add_argument("--report", action="store_true",
                    help="also write the per-host duplicate rollup report")
    ap.add_argument("--stats", action="store_true",
                    help="print each written table's Ray Data execution "
                         "stats (operator walls, block sizes) to stderr")
    ap.add_argument("--tables", default="groups_exact,edges,components,groups_near,actions",
                    help="comma-separated result tables to write")
    return ap.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(sys.argv[1:] if argv is None else argv)
    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--address" in sys.argv else "local",
                 include_dashboard=False)

    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

    overrides = {
        k: getattr(args, k)
        for k in ("jaccard_threshold", "num_perm", "shingle_size", "seed")
        if getattr(args, k) is not None
    }
    cfg = DedupConfig(**overrides) if overrides else DedupConfig()
    nparts = args.num_partitions or max(8, int(ray.cluster_resources().get("CPU", 16)) // 2)

    if args.format == "jsonl":
        from ordinarydumpdeduplicator_ray.sources.jsonl import read_pages_jsonl

        pages_in = read_pages_jsonl(args.pages)
    elif args.format == "csv":
        from ordinarydumpdeduplicator_ray.sources.csv_pages import read_pages_csv

        pages_in = read_pages_csv(args.pages)
    elif args.format == "warc":
        from ordinarydumpdeduplicator_ray.sources.warc import read_pages_warc

        pages_in = read_pages_warc(args.pages)
    else:
        pages_in = args.pages  # Parquet path: column-pruned read inside run()

    t0 = time.perf_counter()
    pipe = DedupPipeline(cfg, checkpoint_dir=args.checkpoint, num_partitions=nparts)
    results = pipe.run(pages_in)

    wanted = [t.strip() for t in args.tables.split(",") if t.strip()]
    written = {}
    for name in wanted:
        ds = results.get(name)
        if ds is None:
            continue
        path = f"{args.out.rstrip('/')}/{name}"
        ds.write_parquet(path)
        written[name] = path
        if args.stats:
            print(f"--- stats: {name} ---\n{ds.stats()}", file=sys.stderr)
    if args.report:
        report = pipe.report_rollup()
        report.write_parquet(f"{args.out.rstrip('/')}/report")
        written["report"] = f"{args.out.rstrip('/')}/report"
    if args.isolate:
        kept, quarantined = pipe.apply_actions()
        kept.write_parquet(f"{args.out.rstrip('/')}/kept")
        quarantined.write_parquet(f"{args.out.rstrip('/')}/quarantine")
        written["kept"] = f"{args.out.rstrip('/')}/kept"
        written["quarantine"] = f"{args.out.rstrip('/')}/quarantine"

    print(json.dumps({
        "wall_sec": round(time.perf_counter() - t0, 3),
        "num_partitions": nparts,
        "stages": pipe.metrics,
        "written": written,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
