"""Exact-substring REMOVAL: cut duplicated token spans out of the text.

The spans stage (``stages/spans.py``) only *reports* duplicated runs;
this stage applies the ExactSubstr policy of Lee et al., "Deduplicating
Training Data Makes Language Models Better" (ACL 2022): every duplicated
substring occurrence is removed from the corpus except one. With
pairwise spans the kept occurrence is chosen deterministically — the
lexicographically smaller url keeps its text, the larger url loses the
span — so the output is independent of pair order, partitioning and
parallelism.

Scale shape:

1. ``removal_targets``: spans -> (url, tok_start, tok_end) of the LOSER
   side per span row — one vectorized map, no shuffle.
2. ``merge_intervals``: ONE sort by (url, tok_start); interior url runs
   are interval-merged vectorized per block, the <=2 edge runs per
   block are reconciled driver-side (O(blocks) rows — the
   ``stages/grouped.py`` sorted-run pattern).
3. ``apply_removals``: the merged interval table (proportional to
   DUPLICATED docs, not the corpus) is broadcast via ``ray.put`` below
   a cap and looked up inside ``map_batches``; unaffected docs stream
   through untouched. Above the cap it auto-switches to the JOIN
   route: intervals list-collect per url, one corpus-sized left-outer
   join attaches them as columns, and the cut runs in-stream — parity
   -tested against the broadcast route.

Spans are indexed in TOKEN space (the frozen ``functions.text.tokenize``
stream). Cutting maps token indices back to char offsets of the
ORIGINAL text via the same ``\\w+`` regex; a doc whose lowercased token
count disagrees with its original-cased token count (pathological
unicode case-folding) falls back to rebuilding the kept lowered tokens
joined by single spaces, flagged in ``normalized``.

No reference counterpart (the reference only knows whole-file equality,
``Common/FsUtils.cs:39-54``) — this is a north-rule training-data
operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ordinarydumpdeduplicator_ray.functions.text import _TOKEN_RE, tokenize
from ordinarydumpdeduplicator_ray.stages.join import left_outer_join

# above this many interval rows apply_removals auto-switches from the
# broadcast map to the corpus-join route (both implemented below)
_BROADCAST_CAP = 2_000_000


def removal_targets(spans: ray.data.Dataset) -> ray.data.Dataset:
    """spans (url_a, url_b, a_start, a_end, b_start, b_end) -> one
    (url, tok_start, tok_end) row per span, naming the occurrence to
    cut: the lexicographically LARGER url loses, the smaller keeps."""

    def pick(t: pa.Table) -> pa.Table:
        a_loses = pc.greater(t["url_a"], t["url_b"])
        return pa.table(
            {
                "url": pc.if_else(a_loses, t["url_a"], t["url_b"]),
                "tok_start": pc.if_else(a_loses, t["a_start"], t["b_start"]),
                "tok_end": pc.if_else(a_loses, t["a_end"], t["b_end"]),
            }
        )

    return spans.map_batches(pick, batch_format="pyarrow")


def _merge_sorted_runs(
    urls: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[list, list, list]:
    """Merge overlapping/adjacent [start, end) intervals per url.
    Input rows must be sorted by (url, start). Returns columns of the
    merged table. Vectorized: an interval opens a new merged group iff
    its start exceeds the running cummax of prior ends within its url
    run."""
    n = len(urls)
    if n == 0:
        return [], [], []
    run_change = np.concatenate([[True], urls[1:] != urls[:-1]])
    # segmented running max of ends (reset per url run): offset each run
    # by run_id * big so plain cummax never crosses a run border
    run_id = np.cumsum(run_change) - 1
    big = int(ends.max()) + 1
    shifted = ends + run_id * big
    seg_cummax = np.maximum.accumulate(shifted) - run_id * big
    prev_cummax = np.concatenate([[0], seg_cummax[:-1]])
    new_group = run_change | (starts > prev_cummax)
    out_urls = urls[new_group]
    out_starts = starts[new_group]
    # merged end = max end within each gid (segmented max via sort order:
    # ends within a gid are not sorted, use maximum.reduceat)
    bounds = np.flatnonzero(new_group)
    out_ends = np.maximum.reduceat(seg_cummax, bounds)
    return list(out_urls), [int(x) for x in out_starts], [int(x) for x in out_ends]


def merge_intervals(targets: ray.data.Dataset) -> ray.data.Dataset:
    """(url, tok_start, tok_end) -> merged disjoint intervals per url.
    ONE sort; interior runs merged vectorized per block; the first/last
    run of every block is reconciled driver-side (O(blocks) runs, each
    a handful of spans)."""
    srt = targets.sort(["url", "tok_start"]).materialize()

    def split_block(t: pa.Table) -> pa.Table:
        urls = t["url"].to_numpy(zero_copy_only=False)
        starts = t["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        ends = t["tok_end"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(urls)
        if n == 0:
            return pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "tok_start": pa.array([], type=pa.int64()),
                    "tok_end": pa.array([], type=pa.int64()),
                    "edge": pa.array([], type=pa.bool_()),
                }
            )
        interior = (urls != urls[0]) & (urls != urls[-1])
        iu, is_, ie = _merge_sorted_runs(urls[interior], starts[interior], ends[interior])
        ne = int((~interior).sum())
        return pa.table(
            {
                "url": pa.array(list(urls[~interior]) + iu, type=pa.string()),
                "tok_start": pa.array(
                    [int(x) for x in starts[~interior]] + is_, type=pa.int64()
                ),
                "tok_end": pa.array(
                    [int(x) for x in ends[~interior]] + ie, type=pa.int64()
                ),
                "edge": pa.array([True] * ne + [False] * len(iu), type=pa.bool_()),
            }
        )

    marked = srt.map_batches(split_block, batch_format="pyarrow", batch_size=None).materialize()
    interior = marked.filter(expr="edge == False").drop_columns(["edge"])
    # edge runs: O(blocks) urls x O(spans/doc) rows -> driver merge
    edge = marked.filter(expr="edge == True").drop_columns(["edge"]).sort(
        ["url", "tok_start"]
    )
    et = pa.Table.from_pylist(edge.take_all()) if edge.count() else None
    if et is not None and len(et):
        urls = et["url"].to_numpy(zero_copy_only=False)
        starts = et["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        ends = et["tok_end"].to_numpy(zero_copy_only=False).astype(np.int64)
        mu, ms, me = _merge_sorted_runs(urls, starts, ends)
        merged_edges = pa.table(
            {
                "url": pa.array(mu, type=pa.string()),
                "tok_start": pa.array(ms, type=pa.int64()),
                "tok_end": pa.array(me, type=pa.int64()),
            }
        )
        return interior.union(ray.data.from_arrow(merged_edges))
    return interior


def _cut_text(text: str, intervals: list[tuple[int, int]]) -> tuple[str, int, bool]:
    """Remove the token intervals (merged, disjoint, sorted) from text.
    Returns (cleaned, n_removed_words, normalized_fallback)."""
    matches = list(_TOKEN_RE.finditer(text))
    toks_lower = tokenize(text, True)
    removed = sum(e - s for s, e in intervals)
    if len(matches) != len(toks_lower):
        # pathological case-folding changed token boundaries: rebuild
        keep = np.ones(len(toks_lower), dtype=bool)
        for s, e in intervals:
            keep[s:e] = False
        return " ".join(t for t, k in zip(toks_lower, keep) if k), removed, True
    n = len(matches)
    pieces: list[str] = []
    pos = 0
    for s, e in intervals:
        s = max(0, min(s, n))
        e = max(s, min(e, n))
        if s >= n or e == s:
            continue
        # cut from the span's first token through the separator before
        # the next kept token; a tail cut swallows its leading separator
        cut_start = matches[s].start()
        if e < n:
            cut_end = matches[e].start()
        else:
            cut_end = len(text)
            if s > 0:
                cut_start = matches[s - 1].end()
        pieces.append(text[pos:cut_start])
        pos = cut_end
    pieces.append(text[pos:])
    return "".join(pieces), removed, False


def _interval_blobs(merged: ray.data.Dataset) -> ray.data.Dataset:
    """merged (url, tok_start, tok_end) -> ONE row per url with its
    sorted disjoint intervals packed into a single binary blob
    (url, spans: binary of little-endian int64 pairs s0 e0 s1 e1 ...).
    Packed because Acero joins reject list<> non-key payload columns
    — a binary column rides any join.

    Scale shape: ONE sort of the O(affected-docs) interval table;
    interior url runs of each block pack vectorized-per-run; only the
    <=2 edge runs per block are reconciled driver-side (O(blocks)
    rows) — the ``merge_intervals`` border pattern."""
    srt = merged.sort(["url", "tok_start"]).materialize()
    blob_schema = pa.schema(
        [("url", pa.string()), ("spans", pa.binary()), ("edge", pa.bool_())]
    )

    def _pack_sorted(
        urls: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> tuple[list, list[bytes]]:
        if len(urls) == 0:
            return [], []
        inter = np.empty(2 * len(urls), dtype="<i8")
        inter[0::2] = starts
        inter[1::2] = ends
        run_change = np.concatenate([[True], urls[1:] != urls[:-1]])
        bounds = np.concatenate([np.flatnonzero(run_change), [len(urls)]])
        blobs = [
            inter[2 * bounds[k]: 2 * bounds[k + 1]].tobytes()
            for k in range(len(bounds) - 1)
        ]
        return list(urls[bounds[:-1]]), blobs

    def collect_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return blob_schema.empty_table()
        urls = t["url"].to_numpy(zero_copy_only=False)
        starts = t["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        ends = t["tok_end"].to_numpy(zero_copy_only=False).astype(np.int64)
        interior = (urls != urls[0]) & (urls != urls[-1])
        iu, iblobs = _pack_sorted(urls[interior], starts[interior], ends[interior])
        em = ~interior
        # edge rows: one single-interval blob each, regrouped driver-side
        eu, eblobs = list(urls[em]), [
            np.array([s, e], dtype="<i8").tobytes()
            for s, e in zip(starts[em], ends[em])
        ]
        return pa.table(
            {
                "url": pa.array(eu + iu, type=pa.string()),
                "spans": pa.array(eblobs + iblobs, type=pa.binary()),
                "edge": pa.array(
                    [True] * len(eu) + [False] * len(iu), type=pa.bool_()
                ),
            }
        )

    marked = srt.map_batches(
        collect_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    interior = marked.filter(expr="edge == False").drop_columns(["edge"])
    edge_rows = marked.filter(expr="edge == True").take_all()
    if not edge_rows:
        return interior
    # explode the O(blocks) edge rows back to raw intervals, regroup
    flat = []
    for r in edge_rows:
        iv = np.frombuffer(r["spans"], dtype="<i8")
        flat.extend((r["url"], int(iv[k]), int(iv[k + 1]))
                    for k in range(0, len(iv), 2))
    flat.sort()
    eu, eblobs = _pack_sorted(
        np.array([x[0] for x in flat], dtype=object),
        np.array([x[1] for x in flat], dtype=np.int64),
        np.array([x[2] for x in flat], dtype=np.int64),
    )
    edge_tbl = pa.table(
        {
            "url": pa.array(eu, type=pa.string()),
            "spans": pa.array(eblobs, type=pa.binary()),
        }
    )
    return interior.union(ray.data.from_arrow(edge_tbl))


_CUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("n_removed_words", pa.int64()),
        ("n_spans", pa.int64()),
        ("normalized", pa.bool_()),
    ]
)


def _cut_rows(
    urls: pa.ChunkedArray | pa.Array,
    texts: list,
    intervals_of,
) -> pa.Table:
    """Shared cut loop: ``intervals_of(i)`` -> sorted disjoint
    [(s, e), ...] for row i, or None/[] for untouched rows."""
    out_text: list[str | None] = []
    n_removed: list[int] = []
    n_spans: list[int] = []
    normalized: list[bool] = []
    for i, txt in enumerate(texts):
        iv = intervals_of(i)
        if not iv or txt is None:
            out_text.append(txt)
            n_removed.append(0)
            n_spans.append(0)
            normalized.append(False)
            continue
        cleaned, rem, norm = _cut_text(txt, iv)
        out_text.append(cleaned)
        n_removed.append(rem)
        n_spans.append(len(iv))
        normalized.append(norm)
    return pa.table(
        {
            "url": urls,
            "text": pa.array(out_text, type=pa.string()),
            "n_removed_words": pa.array(n_removed, type=pa.int64()),
            "n_spans": pa.array(n_spans, type=pa.int64()),
            "normalized": pa.array(normalized, type=pa.bool_()),
        }
    )


def _cut_joined(t: pa.Table) -> pa.Table:
    """Batch map for the JOIN route: each row's packed interval blob
    arrives as a column (null for unaffected docs) — no
    driver/broadcast state at all."""
    blobs = t["spans"].to_pylist()

    def intervals_of(i):
        b = blobs[i]
        if not b:
            return None
        iv = np.frombuffer(b, dtype="<i8")
        return [(int(iv[k]), int(iv[k + 1])) for k in range(0, len(iv), 2)]

    return _cut_rows(t["url"], t["text"].to_pylist(), intervals_of)


class SpanCutter:
    """Actor-pool batch map: cut each affected doc's merged intervals.
    The interval map rides in the object store (one ``ray.put``), read
    once per actor in ``__init__`` — never re-shipped per batch."""

    def __init__(self, intervals_ref) -> None:
        self.intervals: dict[str, list[tuple[int, int]]] = ray.get(intervals_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        return _cut_rows(
            t["url"],
            t["text"].to_pylist(),
            lambda i: self.intervals.get(urls[i]),
        )


def apply_removals(
    extracted: ray.data.Dataset,
    merged: ray.data.Dataset,
    concurrency: int = 4,
    route: str = "auto",
) -> ray.data.Dataset:
    """extracted (url, text, ...) + merged intervals -> the corpus with
    every losing occurrence cut.

    Two parity-tested routes (tests/test_spanremoval.py):

    - ``broadcast`` (default under ``_BROADCAST_CAP`` interval rows):
      the per-url interval map rides the object store once
      (``ray.put``), looked up inside an actor-pool ``map_batches`` —
      zero shuffle, unaffected docs stream through untouched.
    - ``join`` (default above the cap): intervals pack per url into a
      binary blob (``_interval_blobs``, one sort of the O(affected)
      table), then ONE corpus-sized ``left_outer_join`` on url
      attaches it as a column and ``_cut_joined`` cuts in-stream — no
      O(affected) driver materialization anywhere, safe at any
      affected-doc count.

    ``route="auto"`` switches on ``merged.count()`` (row count upper-
    bounds the distinct-url count, so the broadcast side never
    materializes an above-cap table even to measure it)."""
    if route == "auto":
        # pin the interval table first: the count and the chosen
        # route's consumption would otherwise re-run merge_intervals'
        # whole lazy lineage twice
        merged = merged.materialize()
        route = "broadcast" if merged.count() <= _BROADCAST_CAP else "join"
    if route == "join":
        corpus = extracted.map_batches(
            lambda t: t.select(["url", "text"]), batch_format="pyarrow"
        )
        joined_schema = pa.schema(
            [
                ("url", pa.string()),
                ("text", pa.string()),
                ("spans", pa.binary()),
            ]
        )
        joined = left_outer_join(
            corpus, _interval_blobs(merged), on=("url",),
            empty_schema=joined_schema,
        )
        return joined.map_batches(
            _cut_joined, batch_format="pyarrow", batch_size=256
        )
    if route != "broadcast":
        raise ValueError(f"apply_removals: unknown route {route!r}")
    rows = merged.take_all()  # O(affected docs x spans/doc), auto-capped
    by_url: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append((r["tok_start"], r["tok_end"]))
    for v in by_url.values():
        v.sort()
    ref = ray.put(by_url)
    return extracted.map_batches(
        SpanCutter,
        fn_constructor_kwargs={"intervals_ref": ref},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def remove_duplicate_spans(
    pages: ray.data.Dataset,
    config=None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """pages -> corpus with duplicated substring spans removed, end to
    end (extract -> sampled-shingle candidates -> suffix-array spans ->
    loser-side merged intervals -> char-exact cut)."""
    from ordinarydumpdeduplicator_ray.config import DedupConfig
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch
    from ordinarydumpdeduplicator_ray.stages.spans import (
        compute_spans,
        span_candidate_pairs,
    )

    cfg = config or DedupConfig()
    extracted = pages.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size
    ).materialize()
    pairs = span_candidate_pairs(extracted, cfg, num_partitions)
    spans = compute_spans(pairs, extracted, cfg, num_partitions)
    merged = merge_intervals(removal_targets(spans))
    return apply_removals(extracted, merged, concurrency=cfg.sig_concurrency)
