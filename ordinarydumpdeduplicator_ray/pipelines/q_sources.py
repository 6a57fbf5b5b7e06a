"""Source/container round-trips: JSONL/CSV/WARC parity stats, token-index lifecycle queries.

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
    _SNAP_PREV_US,
    _converted_documents,
    _read_documents,
    _snapshot_pages,
)


def jsonl_corpus_stats(sf_dir: str) -> ray.data.Dataset:
    """Source-format parity: documents round-tripped through sharded
    JSONL (sources/jsonl.py) then aggregated per lang — identical
    values to the SQL oracle over the original Parquet proves the
    JSONL source/sink preserves every row and value."""
    from ordinarydumpdeduplicator_ray.sources.jsonl import read_pages_jsonl

    return _per_lang_roundtrip_stats(
        read_pages_jsonl(
            _converted_documents(sf_dir, "jsonl"),
            columns=["doc_id", "lang", "n_chars"],
        )
    )


def _per_lang_roundtrip_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("doc_id", alias_name="min_doc_id"),
        Max("doc_id", alias_name="max_doc_id"),
    )


def csv_corpus_stats(sf_dir: str) -> ray.data.Dataset:
    """Source-format parity for CSV (sources/csv_pages.py): documents
    round-tripped through sharded CSV then aggregated per lang —
    matching the Parquet originals value-for-value proves the CSV
    source/sink preserves rows and scalar types."""
    from ordinarydumpdeduplicator_ray.sources.csv_pages import read_pages_csv

    return _per_lang_roundtrip_stats(
        read_pages_csv(
            _converted_documents(sf_dir, "csv"),
            columns=["doc_id", "lang", "n_chars"],
        )
    )


def warc_corpus_stats(sf_dir: str) -> pa.Table:
    """Source-format parity for WARC (sources/warc.py — Common Crawl's
    native container): documents wrap as HTTP-response WARC records
    (mtime-keyed /tmp cache, atomic-rename publish), read back through
    ``read_pages_warc`` + the standard ``extract_batch`` kernel, and
    reduce to a 1-row aggregate. Matching COUNT/SUM(length(text))/
    MIN/MAX(doc_id) against the Parquet originals proves the container
    round-trip AND the html->text extraction are lossless for this
    corpus."""
    import hashlib as _hashlib
    import shutil as _shutil

    from ordinarydumpdeduplicator_ray.sources.warc import (
        read_pages_warc,
        write_pages_warc,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"warc|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp", "odd_warc_" + key)
    if not os.path.isdir(base):
        docs = _read_documents(sf_dir, columns=["doc_id", "text"])

        def to_pages(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_pylist()
            return pa.table({
                "url": pa.array(
                    [f"testdata://documents/{d:08d}" for d in ids],
                    type=pa.string()),
                "warc_ts": pa.array([_SNAP_PREV_US] * len(t),
                                    type=pa.timestamp("us")),
                "html": pa.array(
                    [(x or "").encode() for x in t["text"].to_pylist()],
                    type=pa.binary()),
            })

        tmp = f"{base}.tmp-{os.getpid()}"
        _shutil.rmtree(tmp, ignore_errors=True)
        write_pages_warc(
            docs.map_batches(to_pages, batch_format="pyarrow"), tmp
        )
        try:
            os.rename(tmp, base)
        except OSError:  # lost a concurrent-build race
            _shutil.rmtree(tmp, ignore_errors=True)

    pages = read_pages_warc(base)

    def partial(t: pa.Table) -> pa.Table:
        e = extract_batch(t)
        texts = e["text"].to_pylist()
        ids = [int(u.rsplit("/", 1)[1]) for u in e["url"].to_pylist()]
        return pa.table({
            "n": pa.array([len(e)], type=pa.int64()),
            "c": pa.array([sum(len(x or "") for x in texts)], type=pa.int64()),
            "lo": pa.array([min(ids) if ids else None], type=pa.int64()),
            "hi": pa.array([max(ids) if ids else None], type=pa.int64()),
        })

    parts = pages.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_docs": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
        "sum_chars": pa.array([sum(p["c"] for p in parts)], type=pa.int64()),
        "min_doc_id": pa.array(
            [min(p["lo"] for p in parts if p["lo"] is not None)],
            type=pa.int64()),
        "max_doc_id": pa.array(
            [max(p["hi"] for p in parts if p["hi"] is not None)],
            type=pa.int64()),
    })


_TOKEN_INDEX_CACHE: dict = {}
_TOKEN_INDEX_BUCKETS = 16


def _token_index_dir(sf_dir: str) -> str:
    """Build (once per corpus state) a bucket-partitioned inverted
    token index under /tmp: (token, doc_id, tf) rows written as
    Parquet partitioned by ``bucket = md5(token) % 16``, so a term
    lookup reads ONE partition directory — the partition-pruned-read
    pattern that makes point lookups O(index/buckets) instead of a
    corpus scan. At 100 TB the bucket count scales up and the same
    layout serves as a shuffle-free join side keyed by token bucket.
    Cache keyed by source mtime+size (the _converted_documents
    atomic-rename idiom)."""
    import hashlib as _hashlib
    import shutil

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"tokidx|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join("/tmp", f"odd_token_index_{key}")
    if os.path.isdir(out_dir):
        return out_dir
    cached = _TOKEN_INDEX_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        import hashlib as _h

        flat, n_per_doc = _doc_token_lists(t)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False), n_per_doc
        )
        if len(flat) == 0:
            return pa.table({
                "token": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
            })
        # per-block (doc, token) tf combiner via one Arrow sort
        pairs = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                          "token": flat})
        order = pc.sort_indices(
            pairs, sort_keys=[("doc_id", "ascending"), ("token", "ascending")]
        )
        s_id = pc.take(pairs["doc_id"], order).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        s_tok = pc.take(pairs["token"], order).combine_chunks()
        n = len(s_id)
        id_change = np.concatenate([[True], s_id[1:] != s_id[:-1]])
        tok_change = np.concatenate([[True], pc.not_equal(
            s_tok.slice(1), s_tok.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)])
        new_run = id_change | tok_change
        starts = np.flatnonzero(new_run)
        tf = np.diff(np.concatenate([starts, [n]]))
        tok_out = s_tok.take(pa.array(starts))
        id_out = s_id[starts]
        buckets = np.array(
            [int(_h.md5(x.encode()).hexdigest()[:8], 16) % _TOKEN_INDEX_BUCKETS
             for x in tok_out.to_pylist()], dtype=np.int64,
        )
        return pa.table({
            "token": tok_out,
            "doc_id": pa.array(id_out, type=pa.int64()),
            "tf": pa.array(tf, type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.int64()),
        })

    tmp_dir = out_dir + ".building"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    docs.map_batches(explode, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["bucket"]
    )
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)  # concurrent builder won
    _TOKEN_INDEX_CACHE[sf_dir] = out_dir
    return out_dir


def token_search(sf_dir: str, term: str = "join") -> ray.data.Dataset:
    """Point lookup against the bucket-partitioned inverted index:
    docs containing ``term`` with term frequency and char length —
    ONLY the term's bucket partition is read (1/16th of the index
    here; at scale, 1/buckets), then the (tiny) postings broadcast-join
    back to documents for the length column. SQL-oracled against a
    full-scan DuckDB equivalent."""
    import hashlib as _h

    idx_dir = _token_index_dir(sf_dir)
    bucket = int(_h.md5(term.encode()).hexdigest()[:8], 16) % _TOKEN_INDEX_BUCKETS
    part = os.path.join(idx_dir, f"bucket={bucket}")
    empty = pa.schema([
        ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("tf", pa.int64()),
    ])
    if not os.path.isdir(part):  # small corpora may not fill every bucket
        return ray.data.from_arrow(empty.empty_table())
    # compute-predicate match, not string interpolation into the filter
    # expression (arbitrary ``term`` strings are safe — ADVICE round 4)
    def _match(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["token"], term)).select(["doc_id", "tf"])

    postings = ray.data.read_parquet(part).map_batches(
        _match, batch_format="pyarrow"
    )
    docs = _read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = broadcast_inner_join(
        docs, postings, on="doc_id",
        empty_schema=pa.schema([
            ("doc_id", pa.int64()), ("n_chars", pa.int64()),
            ("tf", pa.int64()),
        ]),
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "tf", "n_chars"]),
        batch_format="pyarrow",
    )


def token_search_incremental(sf_dir: str, term: str = "join") -> ray.data.Dataset:
    """Index lifecycle end to end (sources/tokenindex.py): the prev
    snapshot builds the bucket-partitioned inverted index ONCE; the cur
    snapshot's NEW urls append their postings as delta files inside the
    live buckets (no rewrite of the existing index); a term lookup then
    reads the union from the term's single bucket partition. This is
    how a 100-TB ingest keeps its search index current without
    reindexing the corpus. SQL-oracled against a full scan of
    prev ∪ cur-new."""
    import hashlib as _hashlib

    from ordinarydumpdeduplicator_ray.sources.tokenindex import (
        append_token_index, build_token_index, lookup_postings,
    )
    from ordinarydumpdeduplicator_ray.stages.join import broadcast_anti_join

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = _hashlib.md5(
        f"tokidx2|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    idx_dir = os.path.join("/tmp", f"odd_token_index2_{key}")

    if not os.path.isdir(idx_dir):
        # Build base + delta into a private temp dir and publish with one
        # atomic rename: the mtime-keyed cache can never hold a
        # base-only index (crash between build and append previously
        # left it permanently stale), and a lost build race discards its
        # temp instead of double-appending the delta (ADVICE round 4).
        import shutil as _shutil
        import uuid as _uuid

        tmp_dir = f"{idx_dir}.build-{_uuid.uuid4().hex[:8]}"
        prev = _snapshot_pages(sf_dir, "prev").map_batches(
            lambda t: t.select(["url", "text"]), batch_format="pyarrow"
        )
        build_token_index(prev, tmp_dir, key_col="url")
        if os.path.isdir(tmp_dir):
            prev_urls = _snapshot_pages(sf_dir, "prev").map_batches(
                lambda t: t.select(["url"]), batch_format="pyarrow"
            )
            cur_new = broadcast_anti_join(
                _snapshot_pages(sf_dir, "cur").map_batches(
                    lambda t: t.select(["url", "text"]),
                    batch_format="pyarrow",
                ),
                prev_urls, on="url",
            )
            append_token_index(tmp_dir, cur_new, key_col="url")
            try:
                os.rename(tmp_dir, idx_dir)
            except OSError:  # concurrent builder won the publish race
                _shutil.rmtree(tmp_dir, ignore_errors=True)

    out = lookup_postings(idx_dir, term)
    return out.map_batches(
        lambda t: pa.table({"url": t["key"], "tf": t["tf"]}),
        batch_format="pyarrow",
    )

