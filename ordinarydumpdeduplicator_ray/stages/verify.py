"""Candidate-pair verification -> edges table.

Pairs are verified against the signatures they were generated from:

- minhash pairs: estimated Jaccard = agreeing-permutation fraction; with
  K=128 the estimate is ~4 sigma tight at +-0.1 around the 0.8 threshold,
  so estimates outside ``threshold +- verify_margin`` decide directly
  (error < 1e-4) while shared-substring pairs (J ~ 0.15) stay rejected by
  a wide margin. Estimates INSIDE the band are re-verified exactly on
  unique-shingle sets when the caller supplies the pages table
  (``exact_jaccard_recheck``) — the flagship pipeline always does.
- simhash pairs: exact Hamming distance <= ``simhash_max_hamming``.

Signature columns reach the pairs via two hash-shuffle joins against a
narrow projection of the signatures table (url -> packed minhash +
simhash) — the scalable alternative to carrying 1 KiB signatures through
every band-explode row (32x write amplification avoided).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.simhash import hamming_distance
from ordinarydumpdeduplicator_ray.stages.join import inner_join


def _attach(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    side: str,
    columns: dict[str, str],
    num_partitions: int | None,
    out_schema: pa.Schema,
) -> ray.data.Dataset:
    """Join ``columns`` of signatures onto pairs via ``url_{side}``.
    ``out_schema`` is the full joined schema, used when a side is empty."""
    key = f"url_{side}"

    def project(t: pa.Table) -> pa.Table:
        cols = {key: t["url"]}
        for src, dst in columns.items():
            cols[dst] = t[src]
        return pa.table(cols)

    proj = signatures.map_batches(project, batch_format="pyarrow")
    return inner_join(
        pairs, proj, on=(key,), num_partitions=num_partitions,
        empty_schema=out_schema,
    )


def verify_pairs(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
    pages: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Merged verification for candidates from BOTH bucket families
    (minhash bands + simhash blocks in one candidate pass): attach
    (minhash, simhash) per side in two joins instead of four, then emit
    an 'exact' edge when the full content hashes agree, a 'minhash' edge
    when the Jaccard estimate clears the threshold and a 'simhash' edge
    when the Hamming ball admits the pair. Fully
    vectorized — signature matrices are stacked per batch, no per-pair
    Python in the comparison.

    With ``pages``: estimates AT or ABOVE the threshold accept directly
    (the unbiased-estimator decision at face value — a sub-threshold
    pair needs an upward est excursion past thr to be falsely accepted,
    strictly tighter than the legacy thr - margin acceptance that
    worried ADVICE); estimates in the DOWNWARD tail
    ``[thr - margin, thr)`` are re-verified EXACTLY on their shingle
    sets (config.py contract), rescuing true pairs whose estimate dipped
    below the threshold (recall) without ever letting an est-below-thr
    pair through unchecked. Without ``pages``, acceptance falls back to
    est >= thr - margin (legacy, documented in config.py)."""
    thr = config.jaccard_threshold - config.verify_margin
    thr_hi = config.jaccard_threshold
    recheck = pages is not None
    max_h = config.simhash_max_hamming
    base = [("url_a", pa.string()), ("url_b", pa.string())]
    a_cols = [("mh_a", pa.binary()), ("sh_a", pa.uint64()), ("sha_a", pa.binary()),
              ("nb_a", pa.int64())]
    b_cols = [("mh_b", pa.binary()), ("sh_b", pa.uint64()), ("sha_b", pa.binary()),
              ("nb_b", pa.int64())]
    with_a = _attach(
        pairs, signatures, "a",
        {"minhash": "mh_a", "simhash": "sh_a", "text_sha256": "sha_a",
         "n_bytes": "nb_a"},
        num_partitions,
        pa.schema(base + a_cols),
    )
    with_ab = _attach(
        with_a, signatures, "b",
        {"minhash": "mh_b", "simhash": "sh_b", "text_sha256": "sha_b",
         "n_bytes": "nb_b"},
        num_partitions,
        pa.schema(base + a_cols + b_cols),
    )
    # edges carry each endpoint's n_bytes so the driver union-find can
    # emit size-annotated components and the near-group aggregation
    # needs NO join back to the signatures table
    empty = pa.schema(
        base + [("nb_a", pa.int64()), ("nb_b", pa.int64()),
                ("source", pa.string()), ("jaccard", pa.float64())]
    ).empty_table()

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        mh_a, mh_b = t["mh_a"].to_pylist(), t["mh_b"].to_pylist()
        k = config.num_perm
        zero = b"\x00" * (8 * k)
        a_mat = np.frombuffer(b"".join(x or zero for x in mh_a), dtype="<u8").reshape(-1, k)
        b_mat = np.frombuffer(b"".join(x or zero for x in mh_b), dtype="<u8").reshape(-1, k)
        mh_valid = np.array([x is not None for x in mh_a]) & np.array(
            [x is not None for x in mh_b]
        )
        est = (a_mat == b_mat).mean(axis=1)
        mh_keep = mh_valid & (est >= thr)

        sh_a_l, sh_b_l = t["sh_a"].to_pylist(), t["sh_b"].to_pylist()
        sh_valid = np.array([x is not None for x in sh_a_l]) & np.array(
            [x is not None for x in sh_b_l]
        )
        sh_a = np.array([x or 0 for x in sh_a_l], dtype=np.uint64)
        sh_b = np.array([x or 0 for x in sh_b_l], dtype=np.uint64)
        hd = hamming_distance(sh_a, sh_b)
        sh_keep = sh_valid & (hd <= max_h)

        sha_a, sha_b = t["sha_a"].to_pylist(), t["sha_b"].to_pylist()
        ex_keep = np.array(
            [x is not None and x == y for x, y in zip(sha_a, sha_b)]
        )

        if recheck:
            # est >= threshold -> accept at face value; downward tail
            # [thr - margin, thr) -> 'minhash_margin' rows for the exact
            # shingle re-check below (recall rescue). Exact-sha pairs
            # skip the re-check (est == 1 by identity).
            mh_sure = mh_keep & (est >= thr_hi)
            mh_band = mh_keep & ~mh_sure & ~ex_keep
        else:
            mh_sure = mh_keep
            mh_band = np.zeros(len(mh_keep), dtype=bool)

        urls = t.select(["url_a", "url_b", "nb_a", "nb_b"])
        out_ex = urls.take(np.nonzero(ex_keep)[0]) \
            .append_column("source", pa.array(["exact"] * int(ex_keep.sum()), type=pa.string())) \
            .append_column("jaccard", pa.array([1.0] * int(ex_keep.sum()), type=pa.float64()))
        out_mh = urls.take(np.nonzero(mh_sure)[0]) \
            .append_column("source", pa.array(["minhash"] * int(mh_sure.sum()), type=pa.string())) \
            .append_column("jaccard", pa.array(est[mh_sure], type=pa.float64()))
        out_band = urls.take(np.nonzero(mh_band)[0]) \
            .append_column("source", pa.array(["minhash_margin"] * int(mh_band.sum()), type=pa.string())) \
            .append_column("jaccard", pa.array(est[mh_band], type=pa.float64()))
        sim = 1.0 - hd[sh_keep].astype(np.float64) / 64.0
        out_sh = urls.take(np.nonzero(sh_keep)[0]) \
            .append_column("source", pa.array(["simhash"] * int(sh_keep.sum()), type=pa.string())) \
            .append_column("jaccard", pa.array(sim, type=pa.float64()))
        return pa.concat_tables([out_ex, out_mh, out_band, out_sh])

    edges = with_ab.map_batches(verify, batch_format="pyarrow")
    if not recheck:
        return edges
    edges = edges.materialize()
    pending = edges.filter(expr="source == 'minhash_margin'").materialize()
    accepted = edges.filter(expr="source != 'minhash_margin'")
    if pending.count() == 0:
        return accepted
    resolved = exact_jaccard_recheck(pending, pages, config, num_partitions)
    return accepted.union(resolved)


class _ShingleRecheck:
    """Actor: exact unique-shingle Jaccard for the margin-band pairs.
    Token-hash cache + config in ``__init__``; per batch, each distinct
    text is tokenized/shingled once (batch-local cache) and pair Jaccards
    come from sorted-array intersections.

    Texts arrive either as ``text_a``/``text_b`` columns (join path) or
    via ``texts_ref`` — a broadcast url->text dict in the object store,
    fetched once per actor (zero-copy plasma read)."""

    def __init__(self, config: DedupConfig, texts_ref=None) -> None:
        from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher

        self.config = config
        self.hasher = TokenHasher()
        self.texts = ray.get(texts_ref) if texts_ref is not None else None
        # shingle sets cached ACROSS batches (cluster members recur in
        # many pairs spread over batches); bounded to cap actor memory
        self._cache: dict[str, np.ndarray] = {}
        self._cache_cap = 200_000

    def _shingles(self, text: str | None, cache: dict) -> np.ndarray | None:
        from ordinarydumpdeduplicator_ray.functions.hashing import shingle_hashes
        from ordinarydumpdeduplicator_ray.functions.text import tokenize

        if text is None:
            return None
        s = cache.get(text)
        if s is None:
            toks = tokenize(text, self.config.lowercase)
            s = shingle_hashes(self.hasher.hash_tokens(toks), self.config.shingle_size) \
                if toks else np.empty(0, dtype=np.uint64)
            if len(cache) < self._cache_cap:
                cache[text] = s
        return s

    def __call__(self, t: pa.Table) -> pa.Table:
        thr = self.config.jaccard_threshold
        cache = self._cache
        keep = np.zeros(len(t), dtype=bool)
        jac = np.zeros(len(t), dtype=np.float64)
        if self.texts is not None:
            g = self.texts.get
            ta = [g(u) for u in t["url_a"].to_pylist()]
            tb = [g(u) for u in t["url_b"].to_pylist()]
        else:
            ta, tb = t["text_a"].to_pylist(), t["text_b"].to_pylist()
        for i, (x, y) in enumerate(zip(ta, tb)):
            a = self._shingles(x, cache)
            b = self._shingles(y, cache)
            if a is None or b is None or not len(a) or not len(b):
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            j = inter / union if union else 0.0
            jac[i] = j
            keep[i] = j >= thr
        cols = ["url_a", "url_b"] + [c for c in ("nb_a", "nb_b")
                                     if c in t.column_names]
        out = t.select(cols).filter(pa.array(keep))
        n = len(out)
        return out.append_column("source", pa.array(["minhash"] * n, type=pa.string())) \
                  .append_column("jaccard", pa.array(jac[keep], type=pa.float64()))


# above this, the broadcast path applies: the pending url set and its
# texts ride the object store instead of two full-corpus shuffle joins.
# 20M pairs x ~40B/url ~= 1.6 GB of driver set — beyond that, fall back
# to the join path (which never holds more than a partition anywhere).
_BROADCAST_PENDING_CAP = 20_000_000


def exact_jaccard_recheck(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Margin-band pairs -> 'minhash' edges kept iff the TRUE unique-
    shingle Jaccard >= threshold.

    Fast path (pending below ``_BROADCAST_PENDING_CAP``): collect the
    band's url set on the driver, filter-and-extract ONLY those pages'
    texts (map-only, no shuffle), broadcast the url->text dict via
    ``ray.put`` and verify in an actor pool — zero shuffles and no
    full-corpus re-extraction. The margin band is a narrow est window,
    so this covers every realistic run; beyond the cap, texts attach via
    two hash joins against the (fully re-extracted) pages instead."""
    if pending.count() <= _BROADCAST_PENDING_CAP:
        return _recheck_broadcast(pending, pages, config)
    return _recheck_join(pending, pages, config, num_partitions)


def _recheck_broadcast(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
) -> ray.data.Dataset:
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    urls: set = set()
    for b in pending.iter_batches(batch_format="pyarrow"):
        urls.update(b["url_a"].to_pylist())
        urls.update(b["url_b"].to_pylist())
    url_ref = ray.put(pa.array(sorted(urls), type=pa.string()))

    def filter_extract(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        wanted = ray.get(url_ref)  # zero-copy plasma read, cached per worker
        t = t.filter(pc.is_in(t["url"], value_set=wanted))
        if len(t) == 0:
            return pa.schema([("url", pa.string()), ("text", pa.string())]).empty_table()
        e = extract_batch(t)
        return pa.table({"url": e["url"], "text": e["text"]})

    texts: dict = {}
    for b in pages.map_batches(filter_extract, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        texts.update(zip(b["url"].to_pylist(), b["text"].to_pylist()))
    texts_ref = ray.put(texts)
    return pending.map_batches(
        _ShingleRecheck,
        fn_constructor_kwargs={"config": config, "texts_ref": texts_ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=config.sig_concurrency if isinstance(config.sig_concurrency, int) else 4,
    )


def _recheck_join(
    pending: ray.data.Dataset,
    pages: ray.data.Dataset,
    config: DedupConfig,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

    def url_text(t: pa.Table) -> pa.Table:
        e = extract_batch(t)
        return pa.table({"url": e["url"], "text": e["text"]})

    # materialize the extracted texts ONCE — both side joins reuse the
    # same blocks (two independent lazy lineages would re-extract the
    # whole corpus twice inside the join materializations)
    texts = pages.map_batches(url_text, batch_format="pyarrow").materialize()
    base = [("url_a", pa.string()), ("url_b", pa.string()),
            ("nb_a", pa.int64()), ("nb_b", pa.int64()),
            ("source", pa.string()), ("jaccard", pa.float64())]
    with_a = inner_join(
        pending,
        texts.map_batches(
            lambda t: pa.table({"url_a": t["url"], "text_a": t["text"]}),
            batch_format="pyarrow",
        ),
        on=("url_a",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(base + [("text_a", pa.string())]),
    )
    with_ab = inner_join(
        with_a,
        texts.map_batches(
            lambda t: pa.table({"url_b": t["url"], "text_b": t["text"]}),
            batch_format="pyarrow",
        ),
        on=("url_b",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(base + [("text_a", pa.string()), ("text_b", pa.string())]),
    )
    return with_ab.map_batches(
        _ShingleRecheck,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=config.sig_concurrency if isinstance(config.sig_concurrency, int) else 4,
    )
