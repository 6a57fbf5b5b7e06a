"""Scan stage: extract/validate + content hashing + similarity signatures.

Reference lifecycle step this reproduces: ``DoInspectionInternal``'s
attribute pass + hash pass (``OrdinaryDumpDeduplicator.cs:78-105,107-156``)
— per-file stat + SHA-1 with per-row error tolerance (bad row -> status,
never an exception; ``OrdinaryDumpDeduplicator.cs:114-127``) — extended
with the north rule's MinHash + SimHash sketches.

Two stages:

- ``extract_batch``     — stateless task: html->text extraction (fixed
                          deterministic rule), status derivation, raw +
                          text SHA-256, byte/size columns.
- ``SignatureActor``    — actor pool: holds the seeded permutation matrix
                          and the token-hash cache (state built once per
                          actor, SURVEY.md §2.3); emits minhash/simhash.

Content identity: ``text_sha256`` (sha256 of extracted-text utf-8) is the
exact-dup group key — the BlobInfo (size, digest) analogue
(``Common/BlobInfo.cs:143-164``). Sentinel semantics: empty text hashes to
the well-known empty-input digest and groups only with other empties
(EmptyBlobInfo, ``Common/BlobInfo.cs:44-51``); broken rows (no text, no
html) carry null digests and are excluded from all grouping
(BrokenBlobInfo, ``Common/BlobInfo.cs:52-55``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import (
    TokenHasher,
    sha256_digest,
    shingle_hashes,
)
from ordinarydumpdeduplicator_ray.functions.minhash import make_permutations, minhash_flat
from ordinarydumpdeduplicator_ray.functions.simhash import simhash_flat
from ordinarydumpdeduplicator_ray.functions.text import extract_text, tokenize
from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN, STATUS_EMPTY, STATUS_OK


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html, text) -> (url, text, status, content_sha256,
    text_sha256, n_bytes).

    Per-row, never raises: rows with neither text nor html become
    ``status=broken`` with null hashes (the job never fails on bad rows —
    reference walk/hash error tolerance, ``Common/FsUtils.cs:77-109``).
    """
    urls = batch["url"]
    htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(batch)
    texts = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(batch)

    out_text: list[str | None] = []
    status: list[str] = []
    content_sha: list[bytes | None] = []
    text_sha: list[bytes | None] = []
    n_bytes: list[int] = []
    for html, text in zip(htmls, texts):
        if text is None and html is not None:
            text = extract_text(html)
        if text is None:
            out_text.append(None)
            status.append(STATUS_BROKEN)
            content_sha.append(None)
            text_sha.append(None)
            n_bytes.append(-1)  # reference BrokenBlobInfo size = -1
            continue
        tb = text.encode("utf-8")
        raw = html if html is not None else tb
        out_text.append(text)
        status.append(STATUS_EMPTY if not text else STATUS_OK)
        content_sha.append(sha256_digest(raw))
        text_sha.append(sha256_digest(tb))
        n_bytes.append(len(tb))

    out = pa.table(
        {
            "url": urls,
            "text": pa.array(out_text, type=pa.string()),
            "status": pa.array(status, type=pa.string()),
            "content_sha256": pa.array(content_sha, type=pa.binary()),
            "text_sha256": pa.array(text_sha, type=pa.binary()),
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
        }
    )
    # crawl timestamp passthrough (the reference's file dates,
    # FileSystemProvider.cs:21-25) — lets the incremental scan trust
    # (url, warc_ts) equality and skip extraction for unchanged rows.
    # The flagship's read prunes to PIPELINE_COLUMNS, so its signature
    # schema is unchanged unless the caller opts warc_ts in.
    if "warc_ts" in batch.column_names:
        out = out.append_column("warc_ts", batch["warc_ts"])
    return out


class SignatureActor:
    """Actor-pool stage: MinHash + SimHash signatures over word shingles.

    State built once per actor (``__init__``): the seeded (a, b)
    permutation matrix and the Zipf-friendly token-hash cache. Per batch
    (``__call__``): tokenize -> shingle-hash (vectorized multiply-xor) ->
    flatten -> one ``minimum.reduceat`` minhash pass + one simhash pass.
    Input must carry (url, text, status, ...); output appends
    (n_tokens, minhash, simhash) and drops ``text``.
    """

    def __init__(self, config: DedupConfig | None = None) -> None:
        self.config = config or DedupConfig()
        self.perm_a, self.perm_b = make_permutations(self.config.num_perm, self.config.seed)
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        texts = batch["text"].to_pylist()
        status = batch["status"].to_pylist()

        shingle_arrays: list[np.ndarray] = []
        n_tokens = np.zeros(len(texts), dtype=np.int64)
        for i, (t, st) in enumerate(zip(texts, status)):
            if st != STATUS_OK or not t:
                shingle_arrays.append(np.empty(0, dtype=np.uint64))
                continue
            toks = tokenize(t, cfg.lowercase)
            n_tokens[i] = len(toks)
            th = self.hasher.hash_tokens(toks)
            shingle_arrays.append(shingle_hashes(th, cfg.shingle_size))

        lengths = np.array([len(s) for s in shingle_arrays], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        flat = (
            np.concatenate(shingle_arrays)
            if shingle_arrays
            else np.empty(0, dtype=np.uint64)
        )

        sigs = minhash_flat(flat, offsets, self.perm_a, self.perm_b)
        sims = simhash_flat(flat, offsets)

        has_sig = lengths > 0
        sig_bytes = np.ascontiguousarray(sigs.astype("<u8"))
        minhash_col = pa.array(
            [sig_bytes[i].tobytes() if has_sig[i] else None for i in range(len(texts))],
            type=pa.binary(),
        )
        simhash_col = pa.array(
            [int(sims[i]) if has_sig[i] else None for i in range(len(texts))],
            type=pa.uint64(),
        )
        out = batch.drop_columns(["text"])
        out = out.append_column("n_tokens", pa.array(n_tokens, type=pa.int64()))
        out = out.append_column("minhash", minhash_col)
        out = out.append_column("simhash", simhash_col)
        return out


# one SignatureActor per worker process, keyed by the semantic fields
# that shape its state: signature maps run as TASKS on prestarted
# workers (a fresh actor pool pays python + ray import per actor,
# ~10s of spin-up), while the permutation matrix and the Zipf-friendly
# token-hash cache still build once per process and persist across
# batches — the same state reuse the actor pool gave, without the
# spin-up or the fixed pool width.
_SIG_STATE: dict = {}


def _signature_batch(batch: pa.Table, config: DedupConfig, keep_text: bool) -> pa.Table:
    key = (config.num_perm, config.seed, config.shingle_size,
           config.lowercase, keep_text)
    inst = _SIG_STATE.get(key)
    if inst is None:
        cls = SignatureActorKeepText if keep_text else SignatureActor
        inst = cls(config)
        _SIG_STATE.clear()
        _SIG_STATE[key] = inst
    out = inst(batch)
    # salt-0 uid derived IN the signature pass: assign_uids then only
    # runs its collision check against the already-materialized stage
    # output instead of mapping + re-materializing the full ~1 KiB/row
    # table a second time (collision -> re-salt path re-derives)
    return _add_uid_batch(out, salt=0)


def compute_signatures(
    pages, config: DedupConfig | None = None, keep_text: bool = False
):
    """pages Dataset -> signatures Dataset (extract + signature kernels
    as fused stateless task maps; per-process kernel state via
    ``_signature_batch``)."""
    import functools

    cfg = config or DedupConfig()
    ds = pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
    return ds.map_batches(
        functools.partial(_signature_batch, config=cfg, keep_text=keep_text),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def _add_uid_batch(batch: pa.Table, salt: int) -> pa.Table:
    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids

    return batch.append_column(
        "uid", pa.array(url_uids(batch["url"], salt), type=pa.int64())
    )


def add_uid(signatures, salt: int = 0):
    """Append the int64 ``uid`` column (salted SipHash of url) — the
    compact member id the hot candidate path sorts/ships instead of url
    strings (stages/candidates.py module docstring). Lazy map; derive it
    on top of the materialized signatures stage."""
    import functools

    return signatures.map_batches(
        functools.partial(_add_uid_batch, salt=salt), batch_format="pyarrow"
    )


def assign_uids(signatures, num_partitions: int = 16, max_salt: int = 4):
    """signatures -> (signatures+uid, salt) with uid verified globally
    unique for THIS corpus: a distributed single-column int64 sort
    (``duplicate_bucket_keys``) detects any colliding uid exactly; on a
    collision (p ~ n^2/2^64 — astronomically rare below ~1e8 docs) the
    salt bumps and uids re-derive. Beyond ~1e9 docs, move to 128-bit
    uids (two int64 columns) instead of per-run re-salting — documented
    scale path, not needed in this sandbox.

    Raises if ``max_salt`` salts all collide — which in practice means
    the input carries DUPLICATE urls (same url hashes equal under every
    salt); urls are the corpus primary key (reference: file path
    identity, ``Common/FileState.cs``)."""
    import pyarrow as _pa

    from ordinarydumpdeduplicator_ray.stages.candidates import duplicate_bucket_keys

    import ray as _ray

    # count is block metadata when signatures is materialized (the
    # flagship path) — lets duplicate_bucket_keys pick its driver fast
    # path for small corpora instead of a distributed sort
    try:
        n_rows = signatures.count()
    except Exception:
        n_rows = None

    schema = signatures.schema()
    has_uid = schema is not None and "uid" in (schema.names or [])
    for salt in range(max_salt):
        # materialize ONCE per salt attempt: the uid'd table is consumed
        # by every downstream stage (exact index, three explodes, the
        # verify lookup) — leaving it lazy re-runs the uid map over the
        # full ~1 KiB/row signature payload per consumer, measured ~20 s
        # per pass at 1.9M docs. When the signature stage already derived
        # the salt-0 uid (_signature_batch), salt 0 is a zero-copy no-op.
        if salt == 0 and has_uid:
            with_uid = signatures
        else:
            with_uid = add_uid(
                signatures.drop_columns(["uid"]) if has_uid else signatures,
                salt,
            ).materialize()
        dups = _ray.get(
            duplicate_bucket_keys(
                with_uid, num_partitions, approx_rows=n_rows, col="uid"
            )
        )
        if len(dups) == 0:
            return with_uid, salt
    raise RuntimeError(
        "uid collision at every salt — the pages input almost certainly "
        "contains duplicate urls; urls must be unique (corpus primary key)"
    )


class SignatureActorKeepText(SignatureActor):
    """Signature stage variant that keeps the extracted text column
    (needed when spans / exact pair verification run downstream)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        text_col = batch["text"]
        out = super().__call__(batch)
        return out.append_column("text", text_col)
