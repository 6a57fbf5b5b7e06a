"""Corpus-wide exact line deduplication (CCNet / RefinedWeb-style
boilerplate removal): drop every line that occurs in >= 2 DISTINCT
documents anywhere in the corpus.

Web-pipeline motivation: navigation bars, cookie banners and footers
repeat across pages of a host; removing lines duplicated across
documents is a standard pre-training curation pass (CCNet does it on
hashed paragraphs). The reference dedups whole opaque blobs only
(OrdinaryDumpDeduplicator.cs:107-130 hashes entire files); this stage
is the sub-document analogue the round brief asks for.

Scale shape (same pattern as ``stages.decontaminate`` and the
singleton-bucket pre-filter in ``stages.candidates``):

1. One stateless ``map_batches`` explodes each document into the
   64-bit hashes of its DISTINCT lines (per-doc unique, so a line
   repeated inside one document does not fake a cross-doc duplicate)
   — an int64 ``bucket`` column, no strings leave the worker.
2. ``duplicate_bucket_keys`` finds hashes with >= 2 rows — exactly
   the lines present in >= 2 documents. The duplicated-line set is
   the *boilerplate* of the corpus: orders of magnitude smaller than
   the line count (it is bounded by distinct repeated lines, not by
   corpus size), so it broadcasts; past the documented cap the same
   filter runs as a hash-join per key range.
3. One stateless ``map_batches`` re-splits each document and keeps
   the lines whose hash misses the broadcast sorted array
   (``np.searchsorted`` membership, vectorized per document).

Line semantics are injected via ``mode``:

- ``"newline"`` — real webtext: split on ``\\n`` (exact bytes, no
  normalization); empty lines are never dedup candidates and are
  always kept.
- ``"token_window"`` — harness corpora whose texts are single-line
  token streams: a "line" is each consecutive window of ``window``
  whitespace tokens (last window may be short). Matches the DuckDB
  oracle's ``list_slice(split(text,' '), ...)`` construction.

Hash equality stands in for string equality (64-bit SipHash via
``pandas.util.hash_array``; collision odds ~n_lines^2 / 2^64 — the
same argument as ``stages.decontaminate``).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray

from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
from ordinarydumpdeduplicator_ray.stages.candidates import duplicate_bucket_keys
from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

#: above this many duplicated lines the broadcast array stops being a
#: "small side" (8 B/entry -> 1.6 GB at the cap); a corpus with more
#: boilerplate than this wants the join path instead.
BROADCAST_CAP = 200_000_000


def split_doc(text: str, mode: str, window: int) -> list[str]:
    """One document -> its list of lines under ``mode`` (order kept)."""
    if not text:
        return []
    if mode == "newline":
        return text.split("\n")
    if mode == "token_window":
        toks = text.split(" ")
        return [
            " ".join(toks[i : i + window]) for i in range(0, len(toks), window)
        ]
    raise ValueError(f"unknown line mode: {mode!r}")


def _hash_lines(lines: list[str]) -> np.ndarray:
    """Line strings -> int64 hashes (salt 0), vectorized over the list."""
    if not lines:
        return np.empty(0, dtype=np.int64)
    return url_uids(pa.array(lines, type=pa.string()))


def _doc_line_hash_batch(t: pa.Table, mode: str, window: int,
                         text_col: str) -> pa.Table:
    """Docs batch -> flat int64 ``bucket`` column of PER-DOC-DISTINCT
    non-empty line hashes (so >=2 rows of a hash <=> >=2 docs)."""
    out: list[np.ndarray] = []
    for txt in t[text_col].to_pylist():
        lines = [x for x in split_doc(txt, mode, window) if x]
        if lines:
            out.append(np.unique(_hash_lines(lines)))
    flat = (np.concatenate(out) if out
            else np.empty(0, dtype=np.int64))
    return pa.table({"bucket": pa.array(flat, type=pa.int64())})


def duplicated_line_keys(docs: ray.data.Dataset, *, mode: str = "newline",
                         window: int = 10, text_col: str = "text",
                         num_partitions: int = 8,
                         approx_rows: int | None = None):
    """Corpus -> ``ray.put`` ref of the SORTED int64 hash array of lines
    occurring in >= 2 distinct documents."""
    cells = docs.map_batches(
        functools.partial(_doc_line_hash_batch, mode=mode, window=window,
                          text_col=text_col),
        batch_format="pyarrow",
    )
    ref = duplicate_bucket_keys(cells, num_partitions, approx_rows=approx_rows)
    keys = _get_broadcast(ref)
    if len(keys) > BROADCAST_CAP:
        raise ValueError(
            f"duplicated-line set ({len(keys)}) exceeds the broadcast cap "
            f"({BROADCAST_CAP}); run the join-path variant instead"
        )
    return ref


def _strip_batch(t: pa.Table, dup_ref, mode: str, window: int,
                 id_col: str, text_col: str, joiner: str) -> pa.Table:
    dup_sorted: np.ndarray = _get_broadcast(dup_ref)
    texts = t[text_col].to_pylist()
    cleaned, n_lines, n_removed = [], [], []
    for txt in texts:
        lines = split_doc(txt, mode, window)
        if not lines:
            cleaned.append(txt)
            n_lines.append(0)
            n_removed.append(0)
            continue
        c, nl, nr = _strip_with_lookup(
            lines, _hash_lines(lines), dup_sorted, joiner)
        cleaned.append(c)
        n_lines.append(nl)
        n_removed.append(nr)
    return pa.table({
        id_col: t[id_col],
        "text_dedup": pa.array(cleaned, type=pa.string()),
        "n_lines": pa.array(n_lines, type=pa.int64()),
        "n_removed": pa.array(n_removed, type=pa.int64()),
    })


def remove_duplicated_lines(docs: ray.data.Dataset, dup_ref, *,
                            mode: str = "newline", window: int = 10,
                            id_col: str = "doc_id", text_col: str = "text",
                            ) -> ray.data.Dataset:
    """Docs -> (id, text_dedup, n_lines, n_removed): each document with
    its corpus-duplicated lines removed, remaining lines re-joined in
    order. One broadcast + one stateless map — streams at any size."""
    joiner = "\n" if mode == "newline" else " "
    return docs.map_batches(
        functools.partial(_strip_batch, dup_ref=dup_ref, mode=mode,
                          window=window, id_col=id_col, text_col=text_col,
                          joiner=joiner),
        batch_format="pyarrow",
    )


def _packed_dup_blobs(
    hits: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """hits (id, bucket) -> ONE row per id with its distinct duplicated
    hashes packed sorted into a binary blob (id, dup_blob) — the
    ``spanremoval._interval_blobs`` pattern (Acero joins reject list<>
    payloads; a binary column rides any join). Interior id runs pack
    vectorized per block of the ONE (id, bucket) sort; the <=2 edge
    runs per block (O(blocks) ids x O(lines/doc) rows) reconcile
    driver-side."""
    id_type = hits.schema().base_schema.field(id_col).type
    srt = hits.sort([id_col, "bucket"]).materialize()
    blob_schema = pa.schema(
        [(id_col, id_type), ("dup_blob", pa.binary()), ("edge", pa.bool_())]
    )

    def _pack_sorted(ids: np.ndarray, h: np.ndarray):
        if len(ids) == 0:
            return [], []
        run_change = np.concatenate([[True], ids[1:] != ids[:-1]])
        bounds = np.concatenate([np.flatnonzero(run_change), [len(ids)]])
        out_ids, blobs = [], []
        for k in range(len(bounds) - 1):
            seg = h[bounds[k]: bounds[k + 1]]
            # sorted within the run already; drop adjacent repeats
            seg = seg[np.concatenate([[True], seg[1:] != seg[:-1]])]
            out_ids.append(ids[bounds[k]])
            blobs.append(seg.astype("<i8").tobytes())
        return out_ids, blobs

    def collect(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return blob_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        interior = (ids != ids[0]) & (ids != ids[-1])
        iu, iblobs = _pack_sorted(ids[interior], h[interior])
        em = ~interior
        eu, eblobs = list(ids[em]), [
            np.array([x], dtype="<i8").tobytes() for x in h[em]
        ]
        return pa.table({
            id_col: pa.array(eu + iu, type=id_type),
            "dup_blob": pa.array(eblobs + iblobs, type=pa.binary()),
            "edge": pa.array([True] * len(eu) + [False] * len(iu),
                             type=pa.bool_()),
        })

    marked = srt.map_batches(
        collect, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = marked.filter(expr="edge == False").drop_columns(["edge"])
    edge_rows = marked.filter(expr="edge == True").take_all()
    if not edge_rows:
        return interior
    flat = sorted(
        (r[id_col], int(np.frombuffer(r["dup_blob"], dtype="<i8")[0]))
        for r in edge_rows
    )
    eu, eblobs = _pack_sorted(
        np.array([x[0] for x in flat], dtype=object),
        np.array([x[1] for x in flat], dtype=np.int64),
    )
    edge_tbl = pa.table({
        id_col: pa.array(eu, type=id_type),
        "dup_blob": pa.array(eblobs, type=pa.binary()),
    })
    return interior.union(ray.data.from_arrow(edge_tbl))


def _strip_with_lookup(lines: list[str], hashes: np.ndarray,
                       dup_sorted: np.ndarray, joiner: str):
    """Shared keep/strip kernel: drop non-empty lines whose hash is in
    the sorted dup array; returns (cleaned, n_lines, n_removed)."""
    keep = np.ones(len(lines), dtype=bool)
    nonempty = np.array([bool(x) for x in lines])
    if len(dup_sorted):
        idx = np.searchsorted(dup_sorted, hashes)
        idx[idx == len(dup_sorted)] = 0
        keep = ~(nonempty & (dup_sorted[idx] == hashes))
    cleaned = joiner.join(x for x, k in zip(lines, keep) if k)
    return cleaned, len(lines), int((~keep).sum())


def _line_dedup_join_route(
    docs: ray.data.Dataset, *, mode: str, window: int, id_col: str,
    text_col: str, num_partitions: int, host_scoped: bool,
) -> ray.data.Dataset:
    """Fully distributed strip with NO driver/broadcast dup set: explode
    (id, line-hash) cells, keep the rows whose hash occurs in >= 2 docs
    (``candidates.duplicated_hit_rows`` — one sort, border-exact), pack
    each doc's duplicated hashes into a blob, attach with ONE left-outer
    join, strip in-stream per row."""
    from ordinarydumpdeduplicator_ray.stages.candidates import (
        duplicated_hit_rows,
    )
    from ordinarydumpdeduplicator_ray.stages.join import left_outer_join

    joiner = "\n" if mode == "newline" else " "

    def cells_batch(t: pa.Table) -> pa.Table:
        out_ids, out_h = [], []
        ids = t[id_col].to_pylist()
        if host_scoped:
            host_h = url_uids(pa.array(
                [_host_of(u) for u in ids], type=pa.string()
            )).astype(np.uint64)
        for i, txt in enumerate(t[text_col].to_pylist()):
            lines = [x for x in split_doc(txt, mode, window) if x]
            if not lines:
                continue
            h = (_combined_hashes(lines, host_h[i]) if host_scoped
                 else _hash_lines(lines))
            h = np.unique(h)
            out_ids.extend([ids[i]] * len(h))
            out_h.append(h)
        id_type = t.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(out_ids, type=id_type),
            "bucket": pa.array(
                np.concatenate(out_h) if out_h
                else np.empty(0, dtype=np.int64),
                type=pa.int64()),
        })

    cells = docs.map_batches(cells_batch, batch_format="pyarrow")
    hits = duplicated_hit_rows(cells, num_partitions)
    blobs = _packed_dup_blobs(hits, id_col)
    narrow = docs.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    id_type = docs.schema().base_schema.field(id_col).type
    joined = left_outer_join(
        narrow, blobs, on=(id_col,),
        empty_schema=pa.schema([
            (id_col, id_type), (text_col, pa.string()),
            ("dup_blob", pa.binary()),
        ]),
    )

    def strip(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        if host_scoped:
            host_h = url_uids(pa.array(
                [_host_of(u) for u in ids], type=pa.string()
            )).astype(np.uint64)
        blobs_col = t["dup_blob"].to_pylist()
        cleaned, n_lines, n_removed = [], [], []
        for i, txt in enumerate(t[text_col].to_pylist()):
            lines = split_doc(txt, mode, window)
            blob = blobs_col[i]
            if not lines or not blob:
                cleaned.append(txt)
                n_lines.append(len(lines))
                n_removed.append(0)
                continue
            h = (_combined_hashes(lines, host_h[i]) if host_scoped
                 else _hash_lines(lines))
            dup_sorted = np.frombuffer(blob, dtype="<i8")
            c, nl, nr = _strip_with_lookup(lines, h, dup_sorted, joiner)
            cleaned.append(c)
            n_lines.append(nl)
            n_removed.append(nr)
        return pa.table({
            id_col: t[id_col],
            "text_dedup": pa.array(cleaned, type=pa.string()),
            "n_lines": pa.array(n_lines, type=pa.int64()),
            "n_removed": pa.array(n_removed, type=pa.int64()),
        })

    return joined.map_batches(strip, batch_format="pyarrow")


def line_dedup(docs: ray.data.Dataset, *, mode: str = "newline",
               window: int = 10, id_col: str = "doc_id",
               text_col: str = "text", num_partitions: int = 8,
               approx_rows: int | None = None,
               route: str = "auto") -> ray.data.Dataset:
    """Full pass: find corpus-duplicated lines, strip them per doc.

    Routes (parity-tested): ``broadcast`` ships the sorted dup-hash
    array via the object store (zero shuffle); ``join`` keeps the dup
    set distributed end-to-end (``_line_dedup_join_route``). ``auto``
    picks broadcast while ``approx_rows`` (the caller's cell-count
    estimate) bounds the dup set under the cap — dup keys <= cells/2 —
    and join beyond, so the broadcast side is never asked to
    materialize an above-cap array; ``route="broadcast"`` keeps the
    explicit cap raise as a guard."""
    if route == "auto":
        route = "broadcast" if (
            approx_rows is None or approx_rows <= 2 * BROADCAST_CAP
        ) else "join"
    if route == "join":
        return _line_dedup_join_route(
            docs, mode=mode, window=window, id_col=id_col,
            text_col=text_col, num_partitions=num_partitions,
            host_scoped=False,
        )
    if route != "broadcast":
        raise ValueError(f"line_dedup: unknown route {route!r}")
    dup_ref = duplicated_line_keys(
        docs, mode=mode, window=window, text_col=text_col,
        num_partitions=num_partitions, approx_rows=approx_rows,
    )
    return remove_duplicated_lines(
        docs, dup_ref, mode=mode, window=window,
        id_col=id_col, text_col=text_col,
    )


# ---------------------------------------------------------------------------
# host-scoped boilerplate removal
# ---------------------------------------------------------------------------

def _host_of(url: str) -> str:
    """https://host/path -> host (empty string when no authority)."""
    i = url.find("://")
    if i < 0:
        return ""
    rest = url[i + 3:]
    j = rest.find("/")
    return rest if j < 0 else rest[:j]


def _combined_hashes(lines: list[str], host_h: np.uint64) -> np.ndarray:
    """Per-line (host, line) combined int64 hashes: SplitMix64 of
    line_hash XOR mix(host_hash) — one key space per host, so the same
    nav bar on two different hosts never aliases."""
    from ordinarydumpdeduplicator_ray.functions.countmin import _mix64

    lh = _hash_lines(lines).astype(np.uint64)
    with np.errstate(over="ignore"):
        out = _mix64(lh ^ _mix64(np.array([host_h], dtype=np.uint64)))
    return out.view(np.int64)


def _page_hostline_hash_batch(t: pa.Table, mode: str, window: int) -> pa.Table:
    """Pages batch -> flat int64 bucket column of PER-PAGE-DISTINCT
    non-empty (host, line) combined hashes."""
    host_h = url_uids(pa.array(
        [_host_of(u) for u in t["url"].to_pylist()], type=pa.string()
    )).astype(np.uint64)
    out: list[np.ndarray] = []
    for hh, txt in zip(host_h, t["text"].to_pylist()):
        lines = [x for x in split_doc(txt, mode, window) if x]
        if lines:
            out.append(np.unique(_combined_hashes(lines, hh)))
    flat = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return pa.table({"bucket": pa.array(flat, type=pa.int64())})


def host_boilerplate_dedup(
    pages: ray.data.Dataset,
    *,
    mode: str = "newline",
    window: int = 10,
    num_partitions: int = 8,
    approx_rows: int | None = None,
    route: str = "auto",
) -> ray.data.Dataset:
    """CCNet-style HOST-scoped boilerplate removal: a line is dropped
    from a page iff it appears on >= 2 distinct pages of the SAME host
    (nav bars / footers / cookie banners repeat within a site; a
    sentence shared across two unrelated hosts is content, not
    boilerplate — the corpus-wide ``line_dedup`` would strip it, this
    stage keeps it). Same scale shape as line_dedup: one stateless
    explode into (host, line) combined hashes, one duplicate-key
    reduce, one broadcast + stateless strip pass — with the same
    ``route`` switch (join route keeps the dup set distributed when the
    cell estimate outgrows the broadcast cap)."""
    if route == "auto":
        route = "broadcast" if (
            approx_rows is None or approx_rows <= 2 * BROADCAST_CAP
        ) else "join"
    if route == "join":
        return _line_dedup_join_route(
            pages, mode=mode, window=window, id_col="url",
            text_col="text", num_partitions=num_partitions,
            host_scoped=True,
        )
    if route != "broadcast":
        raise ValueError(f"host_boilerplate_dedup: unknown route {route!r}")
    cells = pages.map_batches(
        functools.partial(_page_hostline_hash_batch, mode=mode, window=window),
        batch_format="pyarrow",
    )
    ref = duplicate_bucket_keys(cells, num_partitions, approx_rows=approx_rows)
    keys = _get_broadcast(ref)
    if len(keys) > BROADCAST_CAP:
        raise ValueError(
            f"boilerplate set ({len(keys)}) exceeds the broadcast cap "
            f"({BROADCAST_CAP}); run the join-path variant instead"
        )
    joiner = "\n" if mode == "newline" else " "

    def strip(t: pa.Table) -> pa.Table:
        dup_sorted: np.ndarray = _get_broadcast(ref)
        host_h = url_uids(pa.array(
            [_host_of(u) for u in t["url"].to_pylist()], type=pa.string()
        )).astype(np.uint64)
        cleaned, n_lines, n_removed = [], [], []
        for hh, txt in zip(host_h, t["text"].to_pylist()):
            lines = split_doc(txt, mode, window)
            if not lines:
                cleaned.append(txt)
                n_lines.append(0)
                n_removed.append(0)
                continue
            c, nl, nr = _strip_with_lookup(
                lines, _combined_hashes(lines, hh), dup_sorted, joiner)
            cleaned.append(c)
            n_lines.append(nl)
            n_removed.append(nr)
        return pa.table({
            "url": t["url"],
            "text_dedup": pa.array(cleaned, type=pa.string()),
            "n_lines": pa.array(n_lines, type=pa.int64()),
            "n_removed": pa.array(n_removed, type=pa.int64()),
        })

    return pages.map_batches(strip, batch_format="pyarrow")
