"""Shared helpers for the query catalog: config, corpus derivations, flagship cache, digest/checksum kernels.

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

Q_CONFIG = DedupConfig(sig_concurrency=4, batch_size=512)


def _nparts() -> int:
    """CPU-proportional shuffle partition count (pinning it flat makes
    added cores idle through every join/sort at higher parallelism)."""
    import ray

    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(4, cpus // 2)


def _qcfg() -> DedupConfig:
    """Session-adaptive config: the signature actor pool must leave CPUs
    for shuffle aggregators, or a small ray.init(num_cpus=4) session
    stalls waiting for resources."""
    import ray

    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return DedupConfig(
        sig_concurrency=max(2, min(8, cpus // 2)), batch_size=512
    )

# One flagship run serves near_dup_components / near_dup_groups /
# minhash_edges / substring spans: results are materialized Datasets
# pinned in the object store, so caching per corpus dir is safe and
# avoids re-running the whole pipeline per queries() entry.
_PIPELINE_CACHE: dict[str, dict] = {}


def _flagship(sf_dir: str) -> dict:
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

    out = _PIPELINE_CACHE.get(sf_dir)
    if out is None:
        pipe = DedupPipeline(_qcfg(), num_partitions=_nparts())
        out = pipe.run(dup_corpus(sf_dir, near=True))
        _PIPELINE_CACHE[sf_dir] = out
    return out


def _read_documents(sf_dir: str, columns=None) -> ray.data.Dataset:
    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Load ONE query embedding with parquet predicate pushdown — only
    row groups whose vec_id stats cover ``vec_id`` are read, never the
    whole table (matters when embeddings.parquet is TB-scale)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "==", vec_id)]
    )
    if len(t) == 0:
        raise ValueError(f"vec_id={vec_id} not found in {path}")
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def _doc_url(doc_id_arr: pa.ChunkedArray | pa.Array, suffix: str = "") -> pa.Array:
    padded = pc.utf8_lpad(pc.cast(doc_id_arr, pa.string()), width=8, padding="0")
    out = pc.binary_join_element_wise(
        pa.scalar("testdata://documents/"), padded, pa.scalar(suffix), ""
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def dup_corpus(
    sf_dir: str,
    near: bool = False,
    with_source_host: bool = False,
    deep_paths: bool = False,
) -> ray.data.Dataset:
    """documents -> pages-shaped corpus with injected duplicates:

    - every row, url ``testdata://documents/{doc_id:08d}`` (or
      ``https://{source}.example/{doc_id:08d}`` with ``with_source_host``,
      or ``https://{source}.example/s{doc_id%7}/d{doc_id%50}/{doc_id:08d}``
      with ``deep_paths`` — multi-segment paths for the hierarchical
      prefix rollup)
    - exact copy of every doc_id % 3 == 0 row under url suffix ``-copy``
    - with ``near``: near copy of every doc_id % 5 == 0 row with the last
      ``max(1, n_words // 25)`` words dropped, suffix ``-near``
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text", "source"])

    def build(t: pa.Table) -> pa.Table:
        urls, texts = [], []
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        srcs = t["source"].to_pylist()

        def url_for(i, d, s, suffix=""):
            if deep_paths:
                return f"https://{s}.example/s{d % 7}/d{d % 50}/{d:08d}{suffix}"
            if with_source_host:
                return f"https://{s}.example/{d:08d}{suffix}"
            return f"testdata://documents/{d:08d}{suffix}"

        for d, txt, s in zip(ids, txts, srcs):
            urls.append(url_for(None, d, s))
            texts.append(txt)
            if d % 3 == 0:
                urls.append(url_for(None, d, s, "-copy"))
                texts.append(txt)
            if near and d % 5 == 0:
                words = txt.split(" ")
                k = max(1, len(words) // 25)
                urls.append(url_for(None, d, s, "-near"))
                texts.append(" ".join(words[: len(words) - k]))
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "html": pa.nulls(len(urls), type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _extracted(pages: ray.data.Dataset) -> ray.data.Dataset:
    return pages.map_batches(extract_batch, batch_format="pyarrow")


_SNAP_PREV_US = 1735689600_000_000   # 2025-01-01T00:00:00Z
_SNAP_CUR_US = 1735776000_000_000    # 2025-01-02T00:00:00Z


def _snapshot_pages(sf_dir: str, which: str) -> ray.data.Dataset:
    """Deterministic crawl snapshots derived from documents:

    - ``prev``: doc_id % 11 != 0, original text, warc_ts 2025-01-01
    - ``cur``:  doc_id % 13 != 0, text + ' updated' when doc_id % 7 == 0,
      warc_ts 2025-01-02
    - ``next``: doc_id % 17 != 0, the cur text + ' rev2' when
      doc_id % 5 == 0, warc_ts 2025-01-03 (the third inspection for the
      N-snapshot FileState chain)

    So vs prev, cur has new urls (%11==0, %13!=0), removed urls
    (%13==0, %11!=0), modified (%7==0 in both) and unchanged rows —
    the same derivation expressed in SQL in the oracle."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    keep_mod, ts_us = {
        "prev": (11, _SNAP_PREV_US),
        "cur": (13, _SNAP_CUR_US),
        "next": (17, _SNAP_CUR_US + 86_400_000_000),
    }[which]
    edit = which in ("cur", "next")
    edit2 = which == "next"

    def build(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        texts = t["text"].to_pylist()
        mask = ids % keep_mod != 0
        urls, out_texts = [], []
        for d, txt, m in zip(ids, texts, mask):
            if not m:
                continue
            urls.append(f"testdata://documents/{d:08d}")
            txt2 = txt + " updated" if edit and d % 7 == 0 else txt
            if edit2 and d % 5 == 0:
                txt2 = txt2 + " rev2"
            out_texts.append(txt2)
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array([ts_us] * n, type=pa.timestamp("us")),
                "html": pa.nulls(n, type=pa.binary()),
                "text": pa.array(out_texts, type=pa.string()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


# --- hash-lock checksum digests (VERDICT r2 #5) -----------------------------
# The two remaining deterministic rows-only operators (doc_fingerprints,
# media_embeddings) are byte-level constructions DuckDB cannot express.
# These 1-row digests make them driver-checkable anyway: the Ray side
# reduces the operator's ACTUAL output to an order- and blocking-
# independent checksum (pytest asserts repartition invariance), and the
# oracle pins the stored constant computed once from the deterministic
# seed-42 testdata — any change in tokenizer / hash / fold / embedding
# semantics flips the checksum and fails the gate. Same pattern as the
# blocking-independent label checksum in state/unionfind.py.


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer over uint64 (vectorized, wrapping)."""
    with np.errstate(over="ignore"):
        x = x.copy()
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def _checksum_reduce(parts: list, n_name: str) -> pa.Table:
    """Sum the per-batch (n, h) partials mod 2^64 into the 1-row digest."""
    n = int(sum(p["n"] for p in parts))
    total = np.uint64(0)
    with np.errstate(over="ignore"):
        for p in parts:
            total += np.uint64(np.int64(p["h"]))
    return pa.table(
        {
            n_name: pa.array([n], type=pa.int64()),
            "checksum": pa.array([f"{int(total):016x}"], type=pa.string()),
        }
    )


def _row_digest_table(
    ds: ray.data.Dataset, cols: list[str], n_name: str
) -> pa.Table:
    """Generic order/blocking-independent 1-row digest of a verdict
    Dataset: checksum = sum mod 2^64 of mix64 over the row's column
    values (strings via md5-prefix, ints direct, bools as 0/1, nulls
    as a fixed sentinel) — the doc_fingerprint_checksum pattern
    generalized so any deterministic rows-only operator can be
    hash-locked in one line."""
    import hashlib as _hashlib

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64())})
        acc = np.zeros(len(t), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in cols:
                vals = t[c].to_pylist()
                col_h = np.empty(len(t), dtype=np.uint64)
                for i, v in enumerate(vals):
                    if v is None:
                        col_h[i] = np.uint64(0x9E3779B97F4A7C15)
                    elif isinstance(v, bool):
                        col_h[i] = np.uint64(int(v) + 1)
                    elif isinstance(v, int):
                        col_h[i] = np.uint64(v & 0xFFFFFFFFFFFFFFFF)
                    else:
                        col_h[i] = np.uint64(
                            int(_hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
                        )
                acc = _mix64(acc ^ _mix64(col_h))
            s = np.sum(acc, dtype=np.uint64)
        return pa.table({"n": pa.array([len(t)], type=pa.int64()),
                         "h": pa.array([np.int64(s)], type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _checksum_reduce(parts, n_name)


# --- bloom-gated streaming ingest dedup --------------------------------------

def _docs_pages_subset(
    sf_dir: str, mod: int, rem: int, suffix: str = ""
) -> ray.data.Dataset:
    """documents rows with doc_id % mod == rem as a (url, text) pages
    slice; urls follow the testdata:// convention plus ``suffix``."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = pa.array(ids % mod == rem)
        t = t.filter(keep)
        return pa.table(
            {"url": _doc_url(t["doc_id"], suffix), "text": t["text"]}
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _md5_sample_key(t: pa.Table) -> pa.Table:
    """Append ``sample_key`` = md5(str(doc_id)) hex. Shared by both
    sampling queries; must stay bit-identical to the DuckDB oracles'
    ``md5(CAST(doc_id AS VARCHAR))`` ordering."""
    import hashlib as _hashlib

    keys = [_hashlib.md5(str(d).encode()).hexdigest()
            for d in t["doc_id"].to_pylist()]
    return t.append_column("sample_key", pa.array(keys, type=pa.string()))


def _converted_documents(sf_dir: str, fmt: str) -> str:
    """documents.parquet converted ONCE to a sharded alternate format
    under /tmp (atomic-rename cache keyed by the source's mtime+size,
    the _multi_roots pattern) — the ingest-format fixture for the
    source parity queries. ``fmt``: 'jsonl' or 'csv'."""
    import hashlib as _hashlib
    import shutil

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"{fmt}|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp", f"odd_{fmt}_" + key)
    if not os.path.isdir(base):
        if fmt == "jsonl":
            from ordinarydumpdeduplicator_ray.sources.jsonl import (
                write_pages_jsonl as writer,
            )
        else:
            from ordinarydumpdeduplicator_ray.sources.csv_pages import (
                write_pages_csv as writer,
            )

        tmp = f"{base}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        writer(read_parquet_clean(src), tmp)
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
    return base


def _round4_half_away(x: np.ndarray) -> np.ndarray:
    """Round to 4 decimals with DuckDB's half-AWAY-from-zero tie rule
    (np.round is half-even: 1.90625 -> 1.9062 vs DuckDB 1.9063).
    Only exact binary-fraction ties diverge between the two rules, so
    this matters for ratios of small integers (mean counts), not for
    irrational scores (logs)."""
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def _segment_sums(vals: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Sum ``vals`` over consecutive segments of the given lengths.
    Safe for empty segments (np.add.reduceat would return the element
    AT an empty segment's bound, and raises on a bound == len)."""
    n_seg = len(seg_lens)
    if n_seg == 0:
        return np.zeros(0, dtype=np.float64)
    if len(vals) == 0:
        return np.zeros(n_seg, dtype=np.float64)
    cum = np.concatenate([[0.0], np.cumsum(vals, dtype=np.float64)])
    ends = np.cumsum(seg_lens.astype(np.int64))
    starts = ends - seg_lens
    return cum[ends] - cum[starts]

