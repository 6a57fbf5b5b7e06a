"""Substring-duplicate spans: sampled-shingle candidate generation +
per-pair suffix-array span extraction.

North-rule operator (no reference counterpart — the reference only knows
whole-content equality). Two docs that share a long token run are found
by grouping on a *deterministic sample* of shingle hashes
(``hash % span_sample_mod == 0``): a run of R words contains R-w+1
shingles, so the probability at least one sampled shingle survives is
1-(1-1/m)^(R-w+1) (~0.998 for R=50, w=5, m=8). Sampled-bucket grouping
reuses the skew-aware ``candidate_pairs`` machinery (hot boilerplate
shingles get chain+star treatment). Verified spans come from the exact
suffix-array kernel (``functions.suffix``) over the pair's token
sequences.

Pairs with byte-identical text are skipped (their "span" is the whole
document — that is exact duplication, handled by the exact-dedup path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher, shingle_hashes
from ordinarydumpdeduplicator_ray.functions.suffix import common_spans
from ordinarydumpdeduplicator_ray.functions.text import tokenize
from ordinarydumpdeduplicator_ray.schemas import STATUS_OK
from ordinarydumpdeduplicator_ray.stages.candidates import candidate_pairs
from ordinarydumpdeduplicator_ray.stages.join import inner_join


class SampledShingleActor:
    """Emit (bucket, url) rows for the sampled shingles of each doc.
    Permutation-free — the shingle hash itself is the bucket key."""

    def __init__(self, config: DedupConfig | None = None) -> None:
        self.config = config or DedupConfig()
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        mod = np.uint64(cfg.span_sample_mod)
        buckets: list[np.ndarray] = []
        urls: list[str] = []
        reps: list[int] = []
        for url, text, status in zip(
            batch["url"].to_pylist(), batch["text"].to_pylist(), batch["status"].to_pylist()
        ):
            if status != STATUS_OK or not text:
                continue
            toks = tokenize(text, cfg.lowercase)
            if len(toks) < cfg.span_min_words:
                continue
            sh = shingle_hashes(self.hasher.hash_tokens(toks), cfg.shingle_size)
            sampled = sh[sh % mod == 0]
            if len(sampled):
                buckets.append(sampled)
                urls.append(url)
                reps.append(len(sampled))
        if not buckets:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string())})
        flat = np.concatenate(buckets).view(np.int64)
        return pa.table(
            {
                "bucket": pa.array(flat, type=pa.int64()),
                "url": pa.array(np.repeat(np.asarray(urls, dtype=object), reps),
                                type=pa.string()),
            }
        )


def span_candidate_pairs(
    extracted: ray.data.Dataset,
    config: DedupConfig | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """extracted pages (url, text, status) -> candidate (url_a, url_b)
    pairs that share at least one sampled shingle."""
    cfg = config or DedupConfig()
    buckets = extracted.map_batches(
        SampledShingleActor,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.sig_concurrency,
    ).materialize()
    return candidate_pairs(buckets, cfg, num_partitions)


class SpanActor:
    """Exact span extraction for one batch of candidate pairs with both
    texts attached."""

    def __init__(self, config: DedupConfig | None = None) -> None:
        self.config = config or DedupConfig()
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        out = {k: [] for k in ("url_a", "url_b", "a_start", "a_end", "b_start", "b_end", "n_words")}
        for ua, ub, ta, tb in zip(
            batch["url_a"].to_pylist(), batch["url_b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            if ta is None or tb is None or ta == tb:
                continue  # identical text = exact dup, not a span record
            ha = self.hasher.hash_tokens(tokenize(ta, cfg.lowercase))
            hb = self.hasher.hash_tokens(tokenize(tb, cfg.lowercase))
            for a_s, a_e, b_s, b_e, n in common_spans(ha, hb, cfg.span_min_words):
                out["url_a"].append(ua)
                out["url_b"].append(ub)
                out["a_start"].append(a_s)
                out["a_end"].append(a_e)
                out["b_start"].append(b_s)
                out["b_end"].append(b_e)
                out["n_words"].append(n)
        return pa.table(
            {
                "url_a": pa.array(out["url_a"], type=pa.string()),
                "url_b": pa.array(out["url_b"], type=pa.string()),
                "a_start": pa.array(out["a_start"], type=pa.int64()),
                "a_end": pa.array(out["a_end"], type=pa.int64()),
                "b_start": pa.array(out["b_start"], type=pa.int64()),
                "b_end": pa.array(out["b_end"], type=pa.int64()),
                "n_words": pa.array(out["n_words"], type=pa.int64()),
            }
        )


# above this many DISTINCT pair urls the text attach falls back to the
# two hash-shuffle joins; below it the corpus is streamed ONCE through
# a broadcast membership filter and the (small) pair-member text table
# is broadcast-joined onto the pairs — zero corpus shuffles. The url
# count alone does not bound the BYTES broadcast (texts are
# unbounded-width), so the member-text table's measured size gates the
# final route too.
_SPAN_ATTACH_URL_CAP = 2_000_000
_SPAN_ATTACH_BYTE_CAP = 2 << 30  # ~2 GiB of member texts


def _pair_urls(pairs: ray.data.Dataset) -> pa.Array:
    """Distinct urls across both pair columns via raw per-block tasks
    (no extra execution launch; the ``_recheck_broadcast`` pattern)."""
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    def block_urls(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        both = pa.chunked_array(
            [t["url_a"].combine_chunks(), t["url_b"].combine_chunks()]
        )
        return pc.unique(both)

    import pyarrow.compute as pc

    parts = [a for a in map_blocks(pairs, block_urls) if len(a)]
    if not parts:
        return pa.array([], type=pa.string())
    uniq = pc.unique(pa.chunked_array(parts))
    return uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq


def compute_spans(
    pairs: ray.data.Dataset,
    extracted: ray.data.Dataset,
    config: DedupConfig | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(url_a, url_b) pairs + extracted texts -> spans table.

    Text attach (the expensive part — pairs are O(duplicated docs),
    texts are corpus-sized): below ``_SPAN_ATTACH_URL_CAP`` distinct
    pair urls the url set is broadcast once, the corpus streams through
    ONE membership-filter pass emitting only pair-member (url, text)
    rows, and that small table broadcast-joins onto each pair side —
    no corpus shuffle. Above the cap: the original two hash-shuffle
    inner joins."""
    import pyarrow.compute as pc

    from ordinarydumpdeduplicator_ray.stages.join import broadcast_inner_join

    cfg = config or DedupConfig()
    texts = extracted.map_batches(
        lambda t: t.select(["url", "text"]), batch_format="pyarrow"
    )

    def proj(side: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({f"url_{side}": t["url"], f"text_{side}": t["text"]})
        return f

    base = [("url_a", pa.string()), ("url_b", pa.string())]
    schema_a = pa.schema(base + [("text_a", pa.string())])
    schema_ab = pa.schema(
        base + [("text_a", pa.string()), ("text_b", pa.string())]
    )

    pairs = pairs.materialize()
    urls = _pair_urls(pairs)
    use_broadcast = len(urls) <= _SPAN_ATTACH_URL_CAP
    texts_src = texts
    if use_broadcast:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        url_ref = ray.put(urls)

        def member_texts(t: pa.Table) -> pa.Table:
            lut = _get_broadcast(url_ref)
            idx = pc.index_in(t["url"], value_set=lut)
            return t.select(["url", "text"]).filter(pc.is_valid(idx))

        pair_texts = texts.map_batches(
            member_texts, batch_format="pyarrow"
        ).materialize()
        # byte gate: the url COUNT does not bound the broadcast BYTES
        # (member texts are unbounded-width); above the budget the
        # pre-filtered member table still feeds the join route — a
        # strictly smaller join side than the whole corpus
        if (pair_texts.size_bytes() or 0) > _SPAN_ATTACH_BYTE_CAP:
            use_broadcast = False
            texts_src = pair_texts
    if use_broadcast:
        with_a = broadcast_inner_join(
            pairs,
            pair_texts.map_batches(proj("a"), batch_format="pyarrow"),
            on="url_a", empty_schema=schema_a,
        )
        with_ab = broadcast_inner_join(
            with_a,
            pair_texts.map_batches(proj("b"), batch_format="pyarrow"),
            on="url_b", empty_schema=schema_ab,
        )
    else:
        with_a = inner_join(
            pairs, texts_src.map_batches(proj("a"), batch_format="pyarrow"),
            on=("url_a",), num_partitions=num_partitions,
            empty_schema=schema_a,
        )
        with_ab = inner_join(
            with_a, texts_src.map_batches(proj("b"), batch_format="pyarrow"),
            on=("url_b",), num_partitions=num_partitions,
            empty_schema=schema_ab,
        )
    return with_ab.map_batches(
        SpanActor,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=cfg.sig_concurrency,
    )


def find_substring_spans(
    pages: ray.data.Dataset,
    config: DedupConfig | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """pages -> spans, end to end (extract -> sampled-shingle candidates
    -> suffix-array spans)."""
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    cfg = config or DedupConfig()
    extracted = pages.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size
    ).materialize()
    pairs = span_candidate_pairs(extracted, cfg, num_partitions)
    return compute_spans(pairs, extracted, cfg, num_partitions)
