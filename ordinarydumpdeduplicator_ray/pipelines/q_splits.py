"""Dataset splits and sampling: stratified/temperature/budget, leakage- and component-safe splits, sequence packing.

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

from ordinarydumpdeduplicator_ray.pipelines.q_reference import _meta_pages
from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    _flagship,
    _md5_sample_key,
    _read_documents,
    _row_digest_table,
    dup_corpus,
)


def stratified_sample(sf_dir: str, per_lang: int = 20) -> ray.data.Dataset:
    """Deterministic stratified sampling for training-data mixing: the
    ``per_lang`` docs with the smallest md5(doc_id) per language — a
    content-independent, reorder- and subset-stable quota sample (the
    same salted-hash-order trick as corpus_split, but per-stratum with
    an exact quota). One sort via cap_rows_per_key (stages/asof.py);
    SQL-oracled with row_number over the identical md5 ordering."""
    from ordinarydumpdeduplicator_ray.stages.asof import cap_rows_per_key

    docs = _read_documents(sf_dir, columns=["doc_id", "lang"])
    return cap_rows_per_key(
        docs.map_batches(_md5_sample_key, batch_format="pyarrow"),
        key="lang", order_col="sample_key", cap=per_lang,
    )


def lang_budget_sample(sf_dir: str, budget: int = 15000) -> ray.data.Dataset:
    """Per-language char-budget sampling for training mixes: take docs
    in md5(doc_id) order per lang while the running n_chars total stays
    within ``budget`` (stages/asof.py budget_rows_per_key — the
    weighted sibling of the per-domain cap). SQL-oracled with the
    identical window-SUM gate."""
    from ordinarydumpdeduplicator_ray.stages.asof import budget_rows_per_key

    docs = _read_documents(sf_dir, columns=["doc_id", "lang", "n_chars"])
    out = budget_rows_per_key(
        docs.map_batches(_md5_sample_key, batch_format="pyarrow"),
        key="lang", order_col="sample_key", weight_col="n_chars",
        budget=budget,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["sample_key"]), batch_format="pyarrow"
    )


def temperature_mixture_sample(sf_dir: str, scale: float = 4.0) -> ray.data.Dataset:
    """Temperature-flattened mixture resampling (the multilingual
    alpha=0.5 / DoReMi-adjacent recipe): per-language quota
    q_lang = ceil(sqrt(n_lang) * scale), so low-resource strata are
    UPsampled relative to their share and dominant strata capped — then
    the quota is filled deterministically with the smallest-md5(doc_id)
    docs per lang (reorder/subset-stable, same trick as
    stratified_sample). Lang counts are a strata-sized aggregate (one
    tiny groupby -> driver); row selection is ONE sort via
    cap_rows_per_key's per-key-cap dict. sqrt is IEEE-correctly-rounded
    on both numpy and DuckDB, so the quota arithmetic is bit-identical
    to the SQL oracle."""
    from ordinarydumpdeduplicator_ray.stages.asof import cap_rows_per_key

    docs = _read_documents(sf_dir, columns=["doc_id", "lang"])
    counts = docs.groupby("lang").aggregate(Count(alias_name="c")).take_all()
    quotas = {
        r["lang"]: int(np.ceil(np.sqrt(float(r["c"])) * scale)) for r in counts
    }
    out = cap_rows_per_key(
        docs.map_batches(_md5_sample_key, batch_format="pyarrow"),
        key="lang", order_col="sample_key", cap=quotas,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["sample_key"]), batch_format="pyarrow"
    )


def sequence_pack_assignments(sf_dir: str, chunk: int = 4096) -> ray.data.Dataset:
    """Concatenate-and-chunk sequence packing (how LLM training shards
    a corpus into fixed-length sequences): documents are laid out in
    doc_id order as one virtual char stream; each doc gets its starting
    offset (a GLOBAL prefix sum over n_chars — stages/asof.py
    global_running_sum, one sort + O(blocks) driver fold) and the id of
    the ``chunk``-sized training sequence its first char lands in. All
    integer arithmetic, bit-identical to the SQL window-SUM oracle."""
    from ordinarydumpdeduplicator_ray.stages.asof import global_running_sum

    docs = _read_documents(sf_dir, columns=["doc_id", "n_chars"])
    out = global_running_sum(docs, order_col="doc_id", weight_col="n_chars")

    def assign(t: pa.Table) -> pa.Table:
        off = t["start_off"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "seq_id", pa.array(off // chunk, type=pa.int64())
        )

    return out.map_batches(assign, batch_format="pyarrow")


def packed_sequences(sf_dir: str, chunk: int = 4096) -> ray.data.Dataset:
    """The writer half of sequence packing: whole documents
    concatenated into their assigned training sequence
    (stages/pack.py ordered_group_concat — interior seq runs join
    vectorized in-block, border fragments reconcile driver-side).
    Fully SQL-oracled: DuckDB reproduces it with string_agg over the
    identical window-SUM seq assignment."""
    from ordinarydumpdeduplicator_ray.stages.asof import global_running_sum
    from ordinarydumpdeduplicator_ray.stages.pack import ordered_group_concat

    docs = _read_documents(sf_dir, columns=["doc_id", "text", "n_chars"])
    out = global_running_sum(docs, order_col="doc_id", weight_col="n_chars")

    def assign(t: pa.Table) -> pa.Table:
        off = t["start_off"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "seq_id", pa.array(off // chunk, type=pa.int64())
        )

    with_seq = out.map_batches(assign, batch_format="pyarrow")
    return ordered_group_concat(
        with_seq, seq_col="seq_id", order_col="doc_id", text_col="text"
    )


def leakage_safe_split(sf_dir: str) -> ray.data.Dataset:
    """The FIX for what split_leakage_check detects: split assignment
    keyed on md5(sha256(text)) instead of md5(url), so every exact
    copy of the same content lands in the SAME split by construction —
    no eval-into-train leak from crawl duplicates, while keeping the
    reorder/subset-stability of the hash split. Pure stateless map
    (the sha is per-row; no dedup pass needed before splitting).
    SQL-oracled, including a 0-leak assertion mirrored in pytest."""
    import hashlib

    pages = _meta_pages(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(
                hashlib.sha256((x or "").encode()).hexdigest().encode()
            ).hexdigest()[:8], 16) % 100 for x in texts),
            dtype=np.int64, count=len(texts),
        )
        split = np.where(buckets < 90, "train",
                         np.where(buckets < 95, "val", "test"))
        return pa.table({
            "url": t["url"],
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return pages.map_batches(assign, batch_format="pyarrow")


def component_safe_split(sf_dir: str) -> ray.data.Dataset:
    """Split assignment that seals NEAR-dup leakage too: members of a
    flagship near-dup component split by md5(component canonical url)
    — the whole component lands together — while non-members fall back
    to the content-sha key of leakage_safe_split (exact copies still
    co-located). The component label map is O(dup docs), broadcast
    once; the corpus streams through one membership pass. Rows-only
    (components are not SQL-expressible); locked via
    component_safe_split_checksum."""
    import hashlib

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    comp = _flagship(sf_dir)["components"].materialize()
    packed = pa.concat_tables(
        comp.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks() if comp.count() else None
    ref = ray.put(
        (packed["url"], packed["component_id"]) if packed is not None else None
    )

    pages = dup_corpus(sf_dir, near=True)

    def assign(t: pa.Table) -> pa.Table:
        lk = _get_broadcast(ref)
        urls = t["url"].to_pylist()
        texts = t["text"].to_pylist()
        if lk is not None:
            idx = pc.index_in(t["url"], value_set=lk[0])
            comp_of = pc.take(lk[1], idx).to_pylist()  # null -> None
        else:
            comp_of = [None] * len(t)

        def bucket(key: str) -> int:
            return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 100

        buckets = np.fromiter(
            (bucket(c) if c is not None else bucket(
                hashlib.sha256((x or "").encode()).hexdigest()
            ) for c, x in zip(comp_of, texts)),
            dtype=np.int64, count=len(t),
        )
        split = np.where(buckets < 90, "train",
                         np.where(buckets < 95, "val", "test"))
        return pa.table({
            "url": t["url"],
            "in_component": pa.array([c is not None for c in comp_of],
                                     type=pa.bool_()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return pages.map_batches(assign, batch_format="pyarrow")


def component_safe_split_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the component-safe split assignment."""
    return _row_digest_table(
        component_safe_split(sf_dir), ["url", "in_component", "split"],
        "n_pages",
    )

