"""Ray-Data-native web-text deduplication engine.

A brand-new engine with the query semantics of
pavel-akhrameev/OrdinaryDumpDeduplicator (duplicate detection, grouping,
classification, isolation planning and reporting — see SURVEY.md) rebuilt
on ray.data.Dataset pipelines over zero-copy Arrow batches, extended to
near-duplicate detection (MinHash/LSH, SimHash, suffix-array substring
spans) with union-find clustering over Common-Crawl-style page tables.

Layout
------
- ``config``     — pipeline configuration (shingles, signatures, thresholds)
- ``schemas``    — fixed Arrow schemas for every logical table
- ``functions/`` — pure, deterministic kernels (hashing, minhash, simhash,
                   text extraction, suffix arrays, text statistics)
- ``sources/``   — parquet readers + the deterministic synthetic corpus
- ``stages/``    — Dataset → Dataset batch transforms (map_batches bodies,
                   actor-pool classes, groupby compositions)
- ``pipelines/`` — end-to-end orchestration (scan → signatures →
                   candidates → edges → components → groups → actions)
- ``state/``     — union-find reducer + checkpoint/lineage manifests

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, tests, bench.py).
"""

from ordinarydumpdeduplicator_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
