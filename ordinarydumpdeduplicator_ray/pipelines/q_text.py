"""Text curation: language ID, quality, fingerprints, decontamination, PII, perplexity, DSIR/SoftDeDup weights.

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
    _checksum_reduce,
    _mix64,
    _nparts,
    _qcfg,
    _read_documents,
    _round4_half_away,
    _row_digest_table,
    _segment_sums,
)


def token_stats_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Token counting (whitespace + BPE-ish) rolled up per lang."""
    from ordinarydumpdeduplicator_ray.functions.textstats import (
        count_bpe_tokens,
        count_ws_tokens,
    )

    docs = _read_documents(sf_dir, columns=["text", "lang"])

    def counts(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ws = [count_ws_tokens(x) for x in texts]
        bpe = [count_bpe_tokens(x) for x in texts]
        chars = [len(x) for x in texts]
        return pa.table(
            {
                "lang": t["lang"],
                "ws_tokens": pa.array(ws, type=pa.int64()),
                "bpe_tokens": pa.array(bpe, type=pa.int64()),
                "n_chars": pa.array(chars, type=pa.int64()),
            }
        )

    return (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("ws_tokens", alias_name="sum_ws_tokens"),
            Sum("bpe_tokens", alias_name="sum_bpe_tokens"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )


def lang_counts(sf_dir: str) -> ray.data.Dataset:
    return (
        _read_documents(sf_dir, columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def doc_length_buckets(sf_dir: str) -> ray.data.Dataset:
    docs = _read_documents(sf_dir, columns=["text"])

    def bucketize(t: pa.Table) -> pa.Table:
        nb = pc.cast(pc.binary_length(pc.cast(t["text"], pa.binary())), pa.int64())
        bucket = pc.cast(pc.floor(pc.divide(nb, pa.scalar(500, pa.int64()))), pa.int64())
        return pa.table({"bucket": bucket})

    return (
        docs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_docs"))
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID per document."""
    from ordinarydumpdeduplicator_ray.functions.textstats import detect_lang

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def detect(t: pa.Table) -> pa.Table:
        langs = [detect_lang(x) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "detected_lang": pa.array(langs, type=pa.string())}
        )

    return docs.map_batches(detect, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    from ordinarydumpdeduplicator_ray.functions.textstats import (
        quality_features,
        quality_score,
    )

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        rows = [quality_features(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array([r[0] for r in rows], type=pa.int64()),
                "n_tokens": pa.array([r[1] for r in rows], type=pa.int64()),
                "quality": pa.array([quality_score(*r) for r in rows], type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def _fingerprint_batch(t: pa.Table) -> pa.Table:
    """Task-map fingerprint kernel with per-process token-hash cache
    (same tasks-over-actors pattern as stages/signatures._signature_batch
    — an actor pool here produced Ray's 'Failed to hash the schemas'
    warning on every run and paid pool spin-up for a trivial stage)."""
    from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.functions.textstats import doc_fingerprint

    hasher = _FP_STATE.get("hasher")
    if hasher is None:
        hasher = _FP_STATE["hasher"] = TokenHasher()
    fps = []
    for x in t["text"].to_pylist():
        th = hasher.hash_tokens(tokenize(x))
        fps.append(f"{doc_fingerprint(th):016x}")
    return pa.table(
        {"doc_id": t["doc_id"], "fingerprint": pa.array(fps, type=pa.string())}
    )


_FP_STATE: dict = {}


def doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Order-sensitive rolling-hash document fingerprints (hex)."""
    docs = _read_documents(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(_fingerprint_batch, batch_format="pyarrow",
                            batch_size=512)


def decontaminate(sf_dir: str, n: int = 8) -> ray.data.Dataset:
    """Benchmark decontamination over documents: the blocklist is the
    first-``n``-token snippet of every doc_id % 17 == 0 document (the
    deterministic stand-in for a fixed eval suite); each document is
    flagged with whether any of its token ``n``-grams equals a blocklist
    snippet, plus the count of DISTINCT snippets found. Blocklist
    collected once and broadcast (``ray.put``); the corpus side is one
    stateless streaming map (stages/decontaminate.py)."""
    from ordinarydumpdeduplicator_ray.stages.decontaminate import (
        collect_benchmark_hashes,
        flag_contaminated,
    )

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 17 == 0))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    hashes = collect_benchmark_hashes(bench, n=n)
    return flag_contaminated(docs, hashes, n=n)


def top_tokens(sf_dir: str, k: int = 50) -> pa.Table:
    """Corpus vocabulary top-k: the ``k`` most frequent word tokens
    (lowercased ``\\w+`` runs) with deterministic (count desc, token)
    ordering. The per-batch combiner (Arrow ``split_pattern_regex`` +
    ``value_counts`` — fully vectorized, no Python token loop) shrinks
    the shuffle from O(total tokens) to O(distinct tokens per block)
    BEFORE the groupby; the global aggregate then handles only vocabulary
    rows (Zipfian -> tiny relative to the corpus)."""
    docs = _read_documents(sf_dir, columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\W+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table(
            {"token": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    agg = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = agg.sort(["n", "token"], descending=[True, False]).limit(k)
    tbl = pa.concat_tables(
        top.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    return tbl.select(["token", "n"])


def doc_length_stats(sf_dir: str) -> pa.Table:
    """Exact corpus length distribution: count + p50/p90/p99/max of the
    character length of ``text`` (percentile_disc semantics, matching
    the SQL oracle). Sorts ONLY the projected int64 length column and
    locates ranks from block metadata (stages/quantiles.py) — the
    shuffle is 8 bytes/row no matter how wide the documents are."""
    from ordinarydumpdeduplicator_ray.stages.quantiles import exact_percentiles

    docs = _read_documents(sf_dir, columns=["text"])
    lens = docs.map_batches(
        lambda t: pa.table(
            {"n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_docs = lens.count()
    ps = exact_percentiles(lens, "n_chars", [0.5, 0.9, 0.99, 1.0])
    return pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "p50_len": pa.array([ps[0.5]], type=pa.int64()),
            "p90_len": pa.array([ps[0.9]], type=pa.int64()),
            "p99_len": pa.array([ps[0.99]], type=pa.int64()),
            "max_len": pa.array([ps[1.0]], type=pa.int64()),
        }
    )


def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """End-to-end training-corpus curation over the dup-injected
    metadata corpus (_meta_pages): every page gets a verdict —

    1. ``lang``: page language not in the keep set {en, de, fr}
    2. ``quality``: quality score (functions/textstats rule, the same
       one quality_scores oracles) below 0.5
    3. ``contaminated``: text shares an 8-token n-gram with the
       benchmark blocklist (doc_id % 17 == 0 snippets — same blocklist
       as ``decontaminate``)
    4. ``duplicate``: exact-duplicate of a surviving page with a
       smaller url (canonical survives)
    5. ``kept``: everything else

    Precedence is the listed order; dedup runs only among pages that
    passed 1-3 (the realistic pipeline order — filters first, then
    dedup). Streaming: two stateless maps (quality/lang + broadcast
    contamination check), one groupby on the content hash of survivors,
    one broadcast lookup back — no full-corpus shuffle join."""
    import hashlib

    from ordinarydumpdeduplicator_ray.functions.textstats import (
        quality_features,
        quality_score,
    )
    from ordinarydumpdeduplicator_ray.stages.decontaminate import (
        collect_benchmark_hashes,
        flag_contaminated,
    )

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 17 == 0))

    bench_hashes = collect_benchmark_hashes(
        docs.map_batches(bench_filter, batch_format="pyarrow"), n=8
    )

    pages = _meta_pages(sf_dir)
    keep_langs = {"en", "de", "fr"}

    def verdict_pass1(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        quality = np.empty(len(texts), dtype=np.float64)
        for i, txt in enumerate(texts):
            quality[i] = quality_score(*quality_features(txt or ""))
        lang_ok = np.array([lg in keep_langs for lg in langs], dtype=bool)
        return pa.table(
            {
                "url": t["url"],
                "text": t["text"],
                "lang_ok": pa.array(lang_ok),
                "q_ok": pa.array(quality >= 0.5),
            }
        )

    base = pages.map_batches(verdict_pass1, batch_format="pyarrow")
    # contamination: reuse the broadcast stage on the same rows
    conta = flag_contaminated(
        base.map_batches(
            lambda t: pa.table({"url": t["url"], "text": t["text"]}),
            batch_format="pyarrow",
        ),
        bench_hashes, n=8, id_col="url", text_col="text",
    ).map_batches(
        lambda t: pa.table({"url": t["url"], "dirty": t["contaminated"]}),
        batch_format="pyarrow",
    )
    staged = broadcast_inner_join(
        base, conta, on="url",
        empty_schema=pa.schema([
            ("url", pa.string()), ("text", pa.string()),
            ("lang_ok", pa.bool_()), ("q_ok", pa.bool_()),
            ("dirty", pa.bool_()),
        ]),
    )

    def with_sha(t: pa.Table) -> pa.Table:
        shas = pa.array(
            [hashlib.sha256((x or "").encode()).digest()
             for x in t["text"].to_pylist()],
            type=pa.binary(),
        )
        return pa.table(
            {"url": t["url"], "lang_ok": t["lang_ok"], "q_ok": t["q_ok"],
             "dirty": t["dirty"], "sha": shas}
        )

    staged = staged.map_batches(with_sha, batch_format="pyarrow").materialize()
    survivors = staged.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(t["lang_ok"].combine_chunks(), t["q_ok"].combine_chunks()),
                pc.invert(t["dirty"].combine_chunks()),
            )
        ),
        batch_format="pyarrow",
    )
    canon = survivors.groupby("sha").aggregate(Min("url", alias_name="keeper"))

    from ordinarydumpdeduplicator_ray.stages.join import broadcast_left_join

    # LEFT lookup: a rejected page whose text has no surviving copy has
    # no canon row — it must still emit its (lang/quality/contaminated)
    # verdict, so unmatched rows pass through with keeper = null
    joined = broadcast_left_join(
        staged, canon, on="sha",
        empty_schema=pa.schema([
            ("url", pa.string()), ("lang_ok", pa.bool_()), ("q_ok", pa.bool_()),
            ("dirty", pa.bool_()), ("sha", pa.binary()), ("keeper", pa.string()),
        ]),
    )

    def verdict(t: pa.Table) -> pa.Table:
        lang_ok = t["lang_ok"].combine_chunks().to_numpy(zero_copy_only=False)
        q_ok = t["q_ok"].combine_chunks().to_numpy(zero_copy_only=False)
        dirty = t["dirty"].combine_chunks().to_numpy(zero_copy_only=False)
        urls = t["url"].to_pylist()
        keepers = t["keeper"].to_pylist()
        out = []
        for i, u in enumerate(urls):
            if not lang_ok[i]:
                out.append("lang")
            elif not q_ok[i]:
                out.append("quality")
            elif dirty[i]:
                out.append("contaminated")
            elif u != keepers[i]:
                out.append("duplicate")
            else:
                out.append("kept")
        return pa.table({"url": t["url"], "verdict": pa.array(out, type=pa.string())})

    return joined.map_batches(verdict, batch_format="pyarrow")


def corpus_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: md5(url) buckets
    90/5/5. A pure stateless map — the split is stable across runs,
    machines and orderings (the property that matters for training-data
    reproducibility), and any subset of the corpus gets the same
    assignment it would get in the full corpus. Same bucket arithmetic
    as the DuckDB oracle (first 8 hex digits of md5, mod 100)."""
    import hashlib

    pages = _meta_pages(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 100 for u in urls),
            dtype=np.int64, count=len(urls),
        )
        split = np.where(buckets < 90, "train", np.where(buckets < 95, "val", "test"))
        return pa.table(
            {"url": t["url"], "split": pa.array(split.tolist(), type=pa.string())}
        )

    return pages.map_batches(assign, batch_format="pyarrow")


def nfc_normalization_stats(sf_dir: str) -> ray.data.Dataset:
    """Unicode NFC normalization (the text-cleanup step before hashing
    a web corpus — visually identical strings must dedup together):
    docs with doc_id % 3 == 0 get a DECOMPOSED suffix ('e' + combining
    acute U+0301) injected, which NFC composes to the single codepoint;
    output is (doc_id, changed, nfc_sha). Byte-level parity with
    DuckDB's nfc_normalize proves the normalizer agrees with ICU."""
    import hashlib
    import unicodedata

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        changed, shas = [], []
        for d, txt in zip(ids, t["text"].to_pylist()):
            s = (txt or "") + ("e\u0301" if d % 3 == 0 else "")
            n = unicodedata.normalize("NFC", s)
            changed.append(n != s)
            shas.append(hashlib.sha256(n.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "changed": pa.array(changed, type=pa.bool_()),
                "nfc_sha": pa.array(shas, type=pa.string()),
            }
        )

    return docs.map_batches(norm, batch_format="pyarrow")


def split_leakage_check(sf_dir: str) -> ray.data.Dataset:
    """Train/val/test leakage audit: exact texts whose sha appears in
    MORE THAN ONE split of corpus_split's assignment — the dup-injected
    copies carry different urls, so the md5(url) buckets scatter them
    across splits and an exact-dedup-after-split pipeline would leak
    eval data into train. Two cheap shuffles over narrow rows: distinct
    (sha, split) pairs, then per-sha split counts."""
    import hashlib

    pages = _meta_pages(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 100 for u in urls),
            dtype=np.int64, count=len(urls),
        )
        split = np.where(buckets < 90, "train", np.where(buckets < 95, "val", "test"))
        shas = [hashlib.sha256((x or "").encode()).hexdigest()
                for x in t["text"].to_pylist()]
        return pa.table(
            {
                "text_sha": pa.array(shas, type=pa.string()),
                "split": pa.array(split.tolist(), type=pa.string()),
            }
        )

    pairs = pages.map_batches(assign, batch_format="pyarrow")
    distinct_pairs = pairs.groupby(["text_sha", "split"]).count()
    per_sha = distinct_pairs.groupby("text_sha").aggregate(
        Count(alias_name="n_splits")
    )
    return per_sha.filter(expr="n_splits > 1")


# --- round 2: corpus-wide line dedup / PII scrub / repetition stats --------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction over webtext: replace emails / IPv4s with typed
    placeholder tokens and count the hits — the standard pre-training
    privacy scrub. Whole operator is three vectorized RE2 kernels
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``) per
    batch; DuckDB's regex engine is RE2 too, so the oracle applies the
    byte-identical patterns. The harness corpus carries no PII, so a
    deterministic doc_id-derived email + IP is appended to each text
    first (same derivation in the SQL)."""
    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        # harness-only augmentation (the operator starts at `aug`)
        aug = pa.array(
            [
                f"{x} contact user{d}@mail{d % 7}.example or "
                f"10.{d % 256}.{(d * 7) % 256}.{d % 100} now"
                for d, x in zip(ids, texts)
            ],
            type=pa.string(),
        )
        n_emails = pc.count_substring_regex(aug, pattern=_EMAIL_RE)
        n_ipv4 = pc.count_substring_regex(aug, pattern=_IPV4_RE)
        clean = pc.replace_substring_regex(
            aug, pattern=_EMAIL_RE, replacement="<EMAIL>"
        )
        clean = pc.replace_substring_regex(
            clean, pattern=_IPV4_RE, replacement="<IP>"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_clean": clean,
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_ipv4": pc.cast(n_ipv4, pa.int64()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow")


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style within-document repetition signals: fraction of all
    tokens taken by the most frequent token, and of all 2-grams by the
    most frequent 2-gram (Rae et al. 2021 repetition filters). Stateless
    per-doc kernel; at 100 TB this is one streaming map."""
    from collections import Counter

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n_tokens, top_tok, top_bg = [], [], []
        for txt in t["text"].to_pylist():
            toks = txt.split(" ") if txt else []
            n = len(toks)
            n_tokens.append(n)
            top_tok.append(
                (max(Counter(toks).values()) / n) if n else 0.0
            )
            if n >= 2:
                bgs = Counter(zip(toks, toks[1:]))
                top_bg.append(max(bgs.values()) / (n - 1))
            else:
                top_bg.append(0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "top_token_fraction": pa.array(top_tok, type=pa.float64()),
                "top_bigram_fraction": pa.array(top_bg, type=pa.float64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def doc_fingerprint_checksum(sf_dir: str) -> pa.Table:
    """1-row digest of ``doc_fingerprints``: (n_docs, checksum) with
    checksum = sum mod 2^64 of mix64(fingerprint ^ mix64(doc_id)) over
    the operator's own output rows."""
    fps = doc_fingerprints(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64())})
        v = np.fromiter(
            (int(x, 16) for x in t["fingerprint"].to_pylist()),
            dtype=np.uint64, count=len(t),
        )
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            s = np.sum(_mix64(v ^ _mix64(ids)), dtype=np.uint64)
        return pa.table({"n": pa.array([len(t)], type=pa.int64()),
                         "h": pa.array([np.int64(s)], type=pa.int64())})

    parts = fps.map_batches(partial, batch_format="pyarrow").take_all()
    return _checksum_reduce(parts, "n_docs")


def classifier_labels(sf_dir: str) -> ray.data.Dataset:
    """Batched model inference (stages/classify.py): hashed-BoW linear
    classifier over documents — weights built once per actor, one GEMM
    per batch. Deterministic (hash-derived weights), so rows-only here
    and hash-locked via classifier_label_counts."""
    from ordinarydumpdeduplicator_ray.stages.classify import classify_documents

    docs = _read_documents(sf_dir, columns=["doc_id", "text"])
    return classify_documents(docs, concurrency=_qcfg().sig_concurrency)


def gopher_filter(
    sf_dir: str,
    min_tokens: int = 20,
    max_top_token: float = 0.20,
    max_top_bigram: float = 0.15,
) -> ray.data.Dataset:
    """Gopher-rules quality gate (Rae et al. 2021, composite form):
    per-doc KEEP/DROP verdict from the repetition signals — too-short
    docs drop first, then repetition (top-token / top-bigram mass over
    the thresholds). The fractions are small-integer ratios in IEEE
    doubles on both sides, so threshold comparisons agree bit-for-bit
    with the SQL oracle. Stateless streaming map on top of
    repetition_stats."""
    stats = repetition_stats(sf_dir)

    def verdict(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        tt = t["top_token_fraction"].to_numpy(zero_copy_only=False)
        tb = t["top_bigram_fraction"].to_numpy(zero_copy_only=False)
        too_short = n < min_tokens
        repet = (tt > max_top_token) | (tb > max_top_bigram)
        reason = np.where(
            too_short, "too_short", np.where(repet, "repetitious", "ok")
        )
        t = t.append_column("keep", pa.array(~(too_short | repet)))
        return t.append_column(
            "reason", pa.array(reason.astype(object), type=pa.string())
        )

    return stats.map_batches(verdict, batch_format="pyarrow")


def classifier_label_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-label doc counts of ``classifier_labels`` — the hash-locked
    SQL-oracled digest (literal VALUES at sf0.01): any drift in the
    tokenizer, the feature hash, the weight derivation or the argmax
    flips a count and fails the gate."""
    return (
        classifier_labels(sf_dir)
        .groupby("label")
        .aggregate(Count(alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# round 3c additions
# ---------------------------------------------------------------------------

_BLOCKLIST_DOMAINS = [
    "src3.example",       # whole source, depth 2 (blocks every subdomain)
    "src11.example",      # whole source, depth 2
    "s1.src0.example",    # one subdomain, depth 3
    "s4.src17.example",   # one subdomain, depth 3
    "src0.example",       # overlaps s1.src0.example: deepest match wins
]


def blocklist_filter(sf_dir: str) -> ray.data.Dataset:
    """UT1-style domain-blocklist verdicts over a subdomain-bearing url
    corpus (``https://s{doc_id%%7}.{source}.example/{doc_id:08d}``): a
    host is blocked when it equals a listed domain or is a subdomain of
    one; ``matched_domain`` is the most specific (deepest) listed match.
    The operator (stages/blocklist.py) broadcasts the depth-grouped list
    once and runs one vectorized suffix-extract + hash lookup per depth
    per batch. SQL-oracled (join on equality-or-LIKE suffix, longest
    domain wins)."""
    from ordinarydumpdeduplicator_ray.stages.blocklist import block_verdicts

    ds = _read_documents(sf_dir, columns=["doc_id", "source"])

    def build(t: pa.Table) -> pa.Table:
        urls = [
            f"https://s{d % 7}.{s}.example/{d:08d}"
            for d, s in zip(t["doc_id"].to_pylist(), t["source"].to_pylist())
        ]
        return pa.table({"url": pa.array(urls, type=pa.string())})

    pages = ds.map_batches(build, batch_format="pyarrow")
    return block_verdicts(pages, _BLOCKLIST_DOMAINS)


# ---------------------------------------------------------------------------
# round-3c: corpus-LM scoring, SoftDeDup reweighting, DSIR importance
# ---------------------------------------------------------------------------


def _doc_token_lists(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """Batch texts -> (flat filtered token array, tokens-per-doc counts).
    The frozen ``\\w+``-on-lowercase token definition shared with
    ``top_tokens`` and its DuckDB oracles; empty-string split artifacts
    are dropped WITHOUT breaking the per-doc offsets."""
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(t["text"], "")), r"\W+"
    ).combine_chunks()
    flat = pc.list_flatten(lists)
    offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    valid = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # tokens per doc AFTER dropping "" artifacts
    cum = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    n_per_doc = cum[offs[1:]] - cum[offs[:-1]]
    return flat.filter(pa.array(valid)), n_per_doc


def lm_doc_perplexity(sf_dir: str, top_v: int = 20) -> ray.data.Dataset:
    """CCNet-style LM quality signal (Wenzek et al., LREC 2020) with a
    corpus-trained unigram model: pass 1 aggregates global token counts
    (per-block ``value_counts`` combiner -> one vocabulary groupby);
    the ``top_v`` head of the vocabulary broadcasts once with its
    MLE probabilities, every tail token scores at the mean tail
    probability (tail_mass / (T * n_tail_distinct)) — the exact head
    is what a 100-TB run would ship to workers while the Zipfian tail
    collapses to one scalar. Pass 2 streams the corpus: per-doc
    mean negative log2-likelihood (``nll_bits``; perplexity =
    2**nll_bits), fully vectorized via index_in + reduceat. No
    reference counterpart (north-rule training-data operator)."""
    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _doc_token_lists(t)
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    vocab = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="c"))
        .materialize()
    )
    total_tokens = int(vocab.sum("c") or 0)
    n_distinct = vocab.count()
    head_batches = list(
        vocab.sort(["c", "token"], descending=[True, False])
        .limit(top_v)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    head = pa.concat_tables(head_batches).combine_chunks() if head_batches \
        else pa.table({"token": pa.array([], type=pa.string()),
                       "c": pa.array([], type=pa.int64())})
    head_mass = int(pc.sum(head["c"]).as_py() or 0)
    tail_distinct = n_distinct - len(head)
    tail_mass = total_tokens - head_mass
    if total_tokens == 0:
        p_oov = 1.0
    elif tail_distinct > 0 and tail_mass > 0:
        p_oov = tail_mass / (total_tokens * tail_distinct)
    else:
        # no tail: an unseen token would get the least-likely-head prob
        p_oov = 1.0 / total_tokens
    log_p = np.log2(
        head["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        / max(total_tokens, 1)
    )
    lp_oov = float(np.log2(p_oov))
    head_ref = ray.put((head["token"], log_p))

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    def score(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("nll_bits", pa.float64())]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        tokens, logp = _get_broadcast(head_ref)
        flat, n_per_doc = _doc_token_lists(t)
        idx = pc.index_in(flat, value_set=tokens).to_numpy(zero_copy_only=False)
        if idx.dtype.kind == "f":  # nulls -> NaN = OOV
            oov = np.isnan(idx)
            idxi = np.nan_to_num(idx, nan=0.0).astype(np.int64)
        else:
            oov = np.zeros(len(idx), dtype=bool)
            idxi = idx.astype(np.int64)
        lp = np.where(oov, lp_oov, logp[idxi] if len(logp) else lp_oov)
        sums = _segment_sums(lp, n_per_doc)
        with np.errstate(invalid="ignore", divide="ignore"):
            nll = np.where(n_per_doc > 0, -sums / np.maximum(n_per_doc, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_per_doc, type=pa.int64()),
                "nll_bits": pa.array(np.round(nll, 4), type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def _doc_trigrams(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """Batch texts -> (flat token-trigram strings, trigrams-per-doc).
    Trigram = three consecutive filtered tokens joined by one space,
    never crossing a document border; docs with < 3 tokens contribute
    none. Fully vectorized (three shifted Arrow slices + one
    binary_join_element_wise)."""
    flat, n_per_doc = _doc_token_lists(t)
    n = len(flat)
    n_tri_per_doc = np.maximum(n_per_doc - 2, 0)
    if n < 3:
        return pa.array([], type=pa.string()), n_tri_per_doc
    tri = pc.binary_join_element_wise(
        flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2), " "
    )
    # a trigram starting at flat position i is valid iff positions
    # i and i+2 fall in the same doc
    doc_of = np.repeat(np.arange(len(n_per_doc), dtype=np.int64), n_per_doc)
    keep = doc_of[: n - 2] == doc_of[2:]
    return tri.filter(pa.array(keep)), n_tri_per_doc


def soft_dedup_weights(sf_dir: str) -> ray.data.Dataset:
    """SoftDeDup-style reweighting (He et al., ACL 2024 "SoftDedup":
    downweight instead of remove): per-doc "commonness" = mean global
    corpus frequency of the doc's token trigrams, plus the count of
    trigrams duplicated across the corpus (freq >= 2). Pass 1: global
    trigram counts (per-block value_counts combiner -> one groupby).
    Pass 2: counts re-attach via broadcast below the join cap (shuffle
    join fallback above — the trigram vocabulary at 100 TB would route
    there), then a per-doc groupby-free vectorized segment mean.
    ``weight`` = 1/commonness is the sampling weight a trainer would
    consume. No reference counterpart (north-rule operator)."""
    docs = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        tri, _ = _doc_trigrams(t)
        vc = pc.value_counts(tri)
        return pa.table(
            {"sh": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Sum("n", alias_name="c"))
        .materialize()
    )
    from ordinarydumpdeduplicator_ray.stages.join import _BROADCAST_JOIN_CAP
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    if counts.count() <= _BROADCAST_JOIN_CAP:
        if counts.count():
            packed = pa.concat_tables(
                counts.iter_batches(batch_size=None, batch_format="pyarrow")
            ).combine_chunks()
            ref = ray.put(
                (packed["sh"], packed["c"].to_numpy(zero_copy_only=False))
            )
        else:  # all docs < 3 tokens: every count lookup misses
            ref = ray.put((pa.array([], type=pa.string()),
                           np.zeros(0, dtype=np.int64)))

        def score(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.schema(
                    [("doc_id", pa.int64()), ("n_trigrams", pa.int64()),
                     ("n_dup_trigrams", pa.int64()),
                     ("commonness", pa.float64()),
                     ("weight", pa.float64())]
                ).empty_table()
            sh_arr, c_vec = _get_broadcast(ref)
            tri, n_tri = _doc_trigrams(t)
            idx = pc.index_in(tri, value_set=sh_arr).to_numpy(
                zero_copy_only=False
            )
            idxi = np.nan_to_num(idx.astype(np.float64), nan=0.0).astype(np.int64) \
                if idx.dtype.kind == "f" else idx.astype(np.int64)
            c = c_vec[idxi].astype(np.float64) if len(c_vec) else np.zeros(0)
            sums = _segment_sums(c, n_tri)
            dup_sums = _segment_sums((c >= 2).astype(np.float64), n_tri)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean_c = np.where(n_tri > 0, sums / np.maximum(n_tri, 1), 0.0)
            weight = np.where(mean_c > 0, 1.0 / np.where(mean_c > 0, mean_c, 1.0), 1.0)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_trigrams": pa.array(n_tri, type=pa.int64()),
                    "n_dup_trigrams": pa.array(
                        dup_sums.astype(np.int64), type=pa.int64()
                    ),
                    "commonness": pa.array(_round4_half_away(mean_c), type=pa.float64()),
                    "weight": pa.array(_round4_half_away(weight), type=pa.float64()),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # shuffle route (trigram vocabulary above the broadcast cap):
    # explode (doc_id, sh), join on sh, groupby doc_id; zero-trigram
    # docs bypass the join and union in with zero rows so both routes
    # emit one row per input doc
    def explode(t: pa.Table) -> pa.Table:
        tri, n_tri = _doc_trigrams(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(np.repeat(ids, n_tri), type=pa.int64()),
             "sh": tri}
        )

    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    pairs = inner_join(
        docs.map_batches(explode, batch_format="pyarrow"), counts,
        on=("sh",), num_partitions=_nparts(),
        empty_schema=pa.schema(
            [("doc_id", pa.int64()), ("sh", pa.string()), ("c", pa.int64())]
        ),
    )

    def mark_dup(t: pa.Table) -> pa.Table:
        return t.append_column(
            "isdup", pc.cast(pc.greater_equal(t["c"], 2), pa.int64())
        )

    agg = pairs.map_batches(mark_dup, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(
            Count(alias_name="n_trigrams"), Sum("c", alias_name="c_sum"),
            Sum("isdup", alias_name="n_dup_trigrams"),
        )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_trigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean_c = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        weight = np.where(mean_c > 0, 1.0 / np.where(mean_c > 0, mean_c, 1.0), 1.0)
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_trigrams": t["n_trigrams"],
             "n_dup_trigrams": t["n_dup_trigrams"],
             "commonness": pa.array(_round4_half_away(mean_c), type=pa.float64()),
             "weight": pa.array(_round4_half_away(weight), type=pa.float64())}
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        _, n_tri = _doc_trigrams(t)
        z = t.filter(pa.array(n_tri == 0))
        k = len(z)
        return pa.table(
            {"doc_id": z["doc_id"],
             "n_trigrams": pa.array([0] * k, type=pa.int64()),
             "n_dup_trigrams": pa.array([0] * k, type=pa.int64()),
             "commonness": pa.array([0.0] * k, type=pa.float64()),
             "weight": pa.array([1.0] * k, type=pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow").union(
        docs.map_batches(zero_rows, batch_format="pyarrow")
    )


def dsir_weights(sf_dir: str, n_buckets: int = 4096) -> ray.data.Dataset:
    """DSIR importance weights (Xie et al., NeurIPS 2023 "Data Selection
    for Language Models via Importance Resampling"): hashed-bigram
    bag-of-words features; per-doc log importance ratio
    log p_target(doc) - log p_raw(doc) under add-one-smoothed
    multinomials over ``n_buckets`` hash buckets. Target distribution =
    the English slice of the corpus; raw = the whole corpus. Both
    bucket-count vectors are tiny fixed-size aggregates (per-block
    bincount partials summed driver-side) broadcast once; scoring is a
    stateless vectorized map. Rows-only (the frozen uint64 shingle hash
    is not SQL-expressible); hash-locked via dsir_weights_checksum."""
    from ordinarydumpdeduplicator_ray.functions.hashing import (
        TokenHasher, shingle_hashes,
    )
    from ordinarydumpdeduplicator_ray.functions.text import tokenize
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    docs = _read_documents(sf_dir, columns=["doc_id", "lang", "text"]) \
        .materialize()
    B = int(n_buckets)

    def _bigram_buckets(texts: list) -> list[np.ndarray]:
        h = TokenHasher()
        out = []
        for x in texts:
            toks = tokenize(x or "", True)
            if len(toks) < 2:
                out.append(np.zeros(0, dtype=np.int64))
                continue
            bg = shingle_hashes(h.hash_tokens(toks), 2)
            out.append((bg % np.uint64(B)).astype(np.int64))
        return out

    def block_counts(t: pa.Table) -> np.ndarray:
        """-> stacked [raw_counts(B), target_counts(B)] int64."""
        raw = np.zeros(B, dtype=np.int64)
        tgt = np.zeros(B, dtype=np.int64)
        langs = t["lang"].to_pylist() if "lang" in t.column_names else [None] * len(t)
        for lang, bks in zip(langs, _bigram_buckets(t["text"].to_pylist())):
            if len(bks) == 0:
                continue
            bc = np.bincount(bks, minlength=B)
            raw += bc
            if lang == "en":
                tgt += bc
        return np.stack([raw, tgt])

    parts = map_blocks(docs, block_counts)
    stacked = np.sum(np.stack(parts), axis=0) if parts else np.zeros((2, B), np.int64)
    raw_c, tgt_c = stacked[0], stacked[1]
    log_raw = np.log((raw_c + 1.0) / float(raw_c.sum() + B))
    log_tgt = np.log((tgt_c + 1.0) / float(tgt_c.sum() + B))
    ref = ray.put(log_tgt - log_raw)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                 ("log_ratio", pa.float64())]
            ).empty_table()
        delta = _get_broadcast(ref)
        ids, ns, lrs = [], [], []
        for did, bks in zip(
            t["doc_id"].to_pylist(), _bigram_buckets(t["text"].to_pylist())
        ):
            ids.append(did)
            ns.append(len(bks))
            lrs.append(float(delta[bks].sum()) if len(bks) else 0.0)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_bigrams": pa.array(ns, type=pa.int64()),
             "log_ratio": pa.array(np.round(lrs, 4), type=pa.float64())}
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_weights_checksum(sf_dir: str) -> pa.Table:
    """1-row hash-lock of the DSIR importance-weight table."""
    return _row_digest_table(
        dsir_weights(sf_dir), ["doc_id", "n_bigrams", "log_ratio"],
        "n_docs",
    )


def lang_length_stats(sf_dir: str) -> pa.Table:
    """Per-language exact length distribution: count + p50/p90/p99/max
    of character length, one row per lang — the stratified profile a
    curation run uses to set per-language length cutoffs. One
    (lang, len) 16-byte-row sort + block-metadata rank location
    (stages/quantiles.py grouped_exact_percentiles); O(langs x 4)
    block fetches regardless of corpus size."""
    from ordinarydumpdeduplicator_ray.stages.quantiles import (
        grouped_exact_percentiles,
    )

    docs = _read_documents(sf_dir, columns=["lang", "text"])

    def with_len(t: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": t["lang"],
             "len": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
        )

    tbl = grouped_exact_percentiles(
        docs.map_batches(with_len, batch_format="pyarrow"),
        key="lang", column="len", qs=[0.5, 0.9, 0.99],
    )
    return pa.table(
        {
            "lang": tbl["lang"],
            "n_docs": tbl["n"],
            "p50_len": pc.cast(tbl["q0.5"], pa.int64()),
            "p90_len": pc.cast(tbl["q0.9"], pa.int64()),
            "p99_len": pc.cast(tbl["q0.99"], pa.int64()),
            "max_len": pc.cast(tbl["max"], pa.int64()),
        }
    )

