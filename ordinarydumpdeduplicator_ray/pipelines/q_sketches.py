"""Sketch operators: HLL distinct estimates, Count-Min heavy hitters, approximate top-k.

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

from ordinarydumpdeduplicator_ray.pipelines.q_text import top_tokens
from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    _read_documents,
    dup_corpus,
)


def approx_top_tokens(sf_dir: str, k: int = 20, local_k: int = 64) -> pa.Table:
    """Self-contained sketch top-k (no exact pass): every block emits
    its local top-``local_k`` tokens (vectorized Arrow value_counts —
    a global heavy hitter is a local heavy hitter in enough blocks) as
    CANDIDATES plus a CMS counter grid; the driver unions the
    candidate sets (O(blocks x local_k) short rows), reads each
    candidate's estimate from the merged sketch, and keeps the top
    ``k`` by (est desc, token). At this scale the result equals the
    exact top-k (pytest-asserted vs top_tokens); at 100 TB it is the
    one-pass variant where the exact groupby's shuffle is the cost."""
    from ordinarydumpdeduplicator_ray.functions.countmin import (
        cms_merge,
        cms_new,
        cms_query,
        cms_update,
    )
    from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher

    docs = _read_documents(sf_dir, columns=["text"])
    shape = cms_new().shape

    def partial(t: pa.Table) -> pa.Table:
        sk = cms_new()
        cands: list[str] = []
        if len(t):
            toks = pc.list_flatten(
                pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\W+")
            )
            toks = toks.filter(pc.not_equal(toks, ""))
            h = TokenHasher().hash_tokens(toks.to_pylist())
            cms_update(sk, h)
            vc = pc.value_counts(toks)
            order = np.argsort(
                vc.field("counts").to_numpy(zero_copy_only=False)
            )[::-1][:local_k]
            cands = [vc.field("values")[int(i)].as_py() for i in order]
        return pa.table(
            {
                "sk": pa.array([sk.tobytes()], type=pa.binary()),
                "cands": pa.array([cands], type=pa.list_(pa.string())),
            }
        )

    parts = docs.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not parts:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "est_n": pa.array([], type=pa.int64())})
    sketch = cms_merge(
        [np.frombuffer(r["sk"], dtype=np.uint64).reshape(shape) for r in parts]
    )
    cands = sorted({c for r in parts for c in r["cands"]})
    est = cms_query(sketch, TokenHasher().hash_tokens(cands)).astype(np.int64)
    order = sorted(range(len(cands)), key=lambda i: (-int(est[i]), cands[i]))[:k]
    return pa.table(
        {
            "token": pa.array([cands[i] for i in order], type=pa.string()),
            "est_n": pa.array([int(est[i]) for i in order], type=pa.int64()),
        }
    )


def heavy_hitter_counts(sf_dir: str, k: int = 20) -> pa.Table:
    """Count-Min-sketch heavy-hitter estimates (functions/countmin.py)
    for the exact top-``k`` tokens: one streaming pass emits a fixed
    counter grid per BLOCK (batch_size=None), a 64-way worker-side
    merge stage bounds the driver pull to #blocks/64 rows, and the
    estimates (min over depth rows, never an underestimate) are
    compared against the exact distributed counts from ``top_tokens``.
    Output: (token, exact_n, est_n); hash-locked in the SQL oracle at
    sf0.01, overestimate-bound pytest elsewhere."""
    from ordinarydumpdeduplicator_ray.functions.countmin import (
        cms_merge,
        cms_new,
        cms_query,
        cms_update,
    )
    from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher

    exact = top_tokens(sf_dir, k)
    docs = _read_documents(sf_dir, columns=["text"])
    shape = cms_new().shape

    def partial(t: pa.Table) -> pa.Table:
        sk = cms_new()
        if len(t):
            toks = pc.list_flatten(
                pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\W+")
            )
            toks = toks.filter(pc.not_equal(toks, ""))
            h = TokenHasher().hash_tokens(toks.to_pylist())
            cms_update(sk, h)
        return pa.table({"sk": pa.array([sk.tobytes()], type=pa.binary())})

    def merge64(t: pa.Table) -> pa.Table:
        sk = cms_merge(
            [np.frombuffer(v, dtype=np.uint64).reshape(shape)
             for v in t["sk"].to_pylist()]
        )
        return pa.table({"sk": pa.array([sk.tobytes()], type=pa.binary())})

    parts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(merge64, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    sketch = cms_merge(
        [np.frombuffer(r["sk"], dtype=np.uint64).reshape(shape) for r in parts]
    ) if parts else cms_new()
    probe = exact["token"].to_pylist()
    est = cms_query(sketch, TokenHasher().hash_tokens(probe))
    return pa.table(
        {
            "token": exact["token"],
            "exact_n": exact["n"],
            "est_n": pa.array(est.astype(np.int64), type=pa.int64()),
        }
    )


def distinct_text_estimate(sf_dir: str, p: int = 14) -> pa.Table:
    """HyperLogLog distinct-text count over the near-dup-injected
    corpus (functions/hll.py): one streaming pass emits a 16 KiB
    register block per input block (no shuffle — the scale path where
    exact COUNT(DISTINCT) is an all-to-all), driver merges with an
    elementwise max. Partition/order-independent, so the estimate is
    hash-locked in the SQL oracle; pytest bounds the relative error
    against the exact count."""
    from ordinarydumpdeduplicator_ray.functions.hashing import sha_prefix_int64
    from ordinarydumpdeduplicator_ray.functions.hll import (
        hll_estimate,
        hll_merge,
        hll_new,
        hll_update,
    )
    from ordinarydumpdeduplicator_ray.stages.bloom import _sha_digests

    corpus = dup_corpus(sf_dir, near=True)

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_new(p)
        if len(t):
            shas = _sha_digests(t["text"].combine_chunks())
            h, ok = sha_prefix_int64(shas)
            hll_update(regs, h[ok].view(np.uint64), p)
        return pa.table(
            {
                "n": pa.array([len(t)], type=pa.int64()),
                "regs": pa.array([regs.tobytes()], type=pa.binary()),
            }
        )

    parts = corpus.map_batches(partial, batch_format="pyarrow").take_all()
    regs = hll_merge(
        [np.frombuffer(r["regs"], dtype=np.uint8) for r in parts]
    ) if parts else hll_new(p)
    n_rows = int(sum(r["n"] for r in parts))
    return pa.table(
        {
            "n_rows": pa.array([n_rows], type=pa.int64()),
            "distinct_estimate": pa.array(
                [int(round(hll_estimate(regs)))], type=pa.int64()
            ),
        }
    )


def lang_distinct_token_estimates(sf_dir: str, p: int = 12) -> ray.data.Dataset:
    """Per-language distinct-token estimates — the sketch composed with
    a groupby: each block emits one (lang, registers) row per language
    it saw (p=12 -> 4 KiB, ~1.6% err), and the per-lang merge is a
    groupby().map_groups over STRATA-cardinality groups (languages, not
    rows) folding registers with the commutative max — so the shuffle
    moves O(blocks x langs) sketch rows, never token rows. Locked as a
    literal oracle at sf0.01 (partition/order-independent)."""
    from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.functions.hll import (
        hll_estimate,
        hll_merge,
        hll_new,
        hll_update,
    )

    docs = _read_documents(sf_dir, columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs_out, regs_out = [], []
        if len(t):
            hasher = TokenHasher()
            by_lang: dict[str, list[np.ndarray]] = {}
            for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
                toks = tokenize(txt or "", True)
                if toks:
                    by_lang.setdefault(lang, []).append(
                        hasher.hash_tokens(toks)
                    )
            for lang, parts in by_lang.items():
                regs = hll_new(p)
                hll_update(regs, np.concatenate(parts), p)
                langs_out.append(lang)
                regs_out.append(regs.tobytes())
        return pa.table(
            {
                "lang": pa.array(langs_out, type=pa.string()),
                "regs": pa.array(regs_out, type=pa.binary()),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        regs = hll_merge(
            [np.frombuffer(v, dtype=np.uint8) for v in t["regs"].to_pylist()]
        )
        return pa.table(
            {
                "lang": pa.array([t["lang"][0].as_py()], type=pa.string()),
                "distinct_tokens_est": pa.array(
                    [int(round(hll_estimate(regs)))], type=pa.int64()
                ),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return parts.groupby("lang").map_groups(
        merge_group, batch_format="pyarrow"
    )

