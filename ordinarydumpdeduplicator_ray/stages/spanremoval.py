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
   through untouched. Above the cap callers should pre-filter the
   corpus by an inner join on url before cutting.

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

# above this many affected docs the broadcast map is refused; see
# apply_removals for the join route callers should take instead
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


class SpanCutter:
    """Actor-pool batch map: cut each affected doc's merged intervals.
    The interval map rides in the object store (one ``ray.put``), read
    once per actor in ``__init__`` — never re-shipped per batch."""

    def __init__(self, intervals_ref) -> None:
        self.intervals: dict[str, list[tuple[int, int]]] = ray.get(intervals_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        texts = t["text"].to_pylist()
        out_text: list[str | None] = []
        n_removed: list[int] = []
        n_spans: list[int] = []
        normalized: list[bool] = []
        for u, txt in zip(urls, texts):
            iv = self.intervals.get(u)
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
                "url": t["url"],
                "text": pa.array(out_text, type=pa.string()),
                "n_removed_words": pa.array(n_removed, type=pa.int64()),
                "n_spans": pa.array(n_spans, type=pa.int64()),
                "normalized": pa.array(normalized, type=pa.bool_()),
            }
        )


def apply_removals(
    extracted: ray.data.Dataset,
    merged: ray.data.Dataset,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """extracted (url, text, ...) + merged intervals -> the corpus with
    every losing occurrence cut. The interval table is proportional to
    the number of DUPLICATED docs; above ``_BROADCAST_CAP`` affected
    urls this raises rather than silently materializing — at that scale
    pre-filter the corpus with an inner join on url instead."""
    rows = merged.take_all()  # O(affected docs x spans/doc), capped below
    if len({r["url"] for r in rows}) > _BROADCAST_CAP:
        raise ValueError(
            f"apply_removals: >{_BROADCAST_CAP} affected urls; use the "
            "join route (inner_join corpus with the interval table)"
        )
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
