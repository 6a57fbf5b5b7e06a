"""Benchmark decontamination: flag documents sharing any token n-gram
with a benchmark/blocklist snippet set.

The standard training-corpus curation step (GPT-3 appendix-C style
n-gram overlap): the benchmark side is SMALL by nature (a fixed eval
suite), so it is collected once, hashed, and broadcast (``ray.put``)
to every worker — never shuffled — while the corpus side streams
through one stateless ``map_batches``. Membership is a vectorized
``searchsorted`` of each document's w-gram shingle hashes against the
sorted broadcast array; per-process caches (TokenHasher vocabulary,
last-fetched broadcast) amortize setup across task invocations.

Matching semantics: two token sequences match iff their whitespace
tokenizations are equal — exactly SQL substring containment of
``' ' || snippet || ' '`` in ``' ' || text || ' '`` (tokens cannot
contain the separator, so split/join round-trips), which is what the
DuckDB oracle checks. Hash equality stands in for sequence equality
(64-bit shingle hashes; collision odds ~n^2/2^64).

No reference counterpart (the reference dedups opaque blobs); this is
a first-class LLM-pipeline operator per the round brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher, shingle_hashes
from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

_HASHER = TokenHasher()  # per-process vocabulary cache (Zipfian tokens)


def _snippet_hash_batch(t: pa.Table, n: int, text_col: str) -> pa.Table:
    """Benchmark batch -> ONE packed row of w-gram hashes of each
    snippet's FIRST n tokens (snippets shorter than n tokens are
    skipped, mirroring the oracle's ``len(toks) >= n`` filter)."""
    hashes = []
    for txt in t[text_col].to_pylist():
        toks = txt.split(" ") if txt else []
        if len(toks) < n:
            continue
        th = _HASHER.hash_tokens(toks[:n])
        hashes.append(shingle_hashes(th, n)[0])
    return pa.table(
        {"packed": pa.array([np.asarray(hashes, dtype=np.uint64).tobytes()],
                            type=pa.binary())}
    )


def collect_benchmark_hashes(bench: ray.data.Dataset, n: int = 8,
                             text_col: str = "text",
                             max_snippets: int = 50_000_000) -> np.ndarray:
    """Benchmark Dataset -> sorted unique uint64 snippet-hash array on
    the driver (one packed binary row per block comes back — O(#blocks)
    driver rows, O(#snippets * 8 bytes) driver memory). Raises above
    ``max_snippets`` — a benchmark suite bigger than that isn't a
    broadcast small side any more."""
    import functools

    parts = bench.map_batches(
        functools.partial(_snippet_hash_batch, n=n, text_col=text_col),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    flat = np.concatenate(
        [np.frombuffer(r["packed"], dtype=np.uint64) for r in parts]
    )
    if len(flat) > max_snippets:
        raise ValueError(
            f"benchmark snippet set ({len(flat)}) exceeds the broadcast "
            f"cap ({max_snippets}); shard the benchmark or raise the cap"
        )
    return np.unique(flat)  # unique() also sorts


def _flag_batch(t: pa.Table, bench_ref, n: int, id_col: str,
                text_col: str) -> pa.Table:
    bench_sorted: np.ndarray = _get_broadcast(bench_ref)
    texts = t[text_col].to_pylist()
    contaminated = np.zeros(len(texts), dtype=bool)
    n_hits = np.zeros(len(texts), dtype=np.int64)
    if len(bench_sorted):
        for i, txt in enumerate(texts):
            toks = txt.split(" ") if txt else []
            if len(toks) < n:
                continue
            grams = shingle_hashes(_HASHER.hash_tokens(toks), n)
            idx = np.searchsorted(bench_sorted, grams)
            idx[idx == len(bench_sorted)] = 0
            matched = grams[bench_sorted[idx] == grams]
            if len(matched):
                contaminated[i] = True
                # distinct benchmark snippets present, not positions
                n_hits[i] = len(np.unique(matched))
    return pa.table(
        {
            id_col: t[id_col],
            "contaminated": pa.array(contaminated),
            "n_hits": pa.array(n_hits, type=pa.int64()),
        }
    )


def flag_contaminated(docs: ray.data.Dataset, bench_hashes: np.ndarray,
                      n: int = 8, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """docs -> (id_col, contaminated, n_hits) with ``n_hits`` = number
    of DISTINCT benchmark snippets whose n-gram occurs in the document.
    One broadcast + one stateless map — streams at any corpus size."""
    import functools

    ref = ray.put(np.ascontiguousarray(bench_hashes, dtype=np.uint64))
    return docs.map_batches(
        functools.partial(_flag_batch, bench_ref=ref, n=n, id_col=id_col,
                          text_col=text_col),
        batch_format="pyarrow",
    )
