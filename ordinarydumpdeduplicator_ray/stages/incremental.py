"""Incremental re-crawl signatures: reuse the prior run's sketch rows.

The reference re-inspects a data location against its persisted entity
store and creates a new FileState only for files whose size/dates
changed — unchanged files keep their FileState chain and their BlobInfo
is never re-hashed (``DataControllerSimple.cs:190-213``, chain semantics
``Common/FileState.cs:67-70``). Re-expressed Ray-Data-first for a
re-crawled corpus:

1. Extract + sha256 the CURRENT snapshot (cheap relative to the MinHash
   / SimHash kernels — one sha pass vs 128-permutation shingle
   sketches).
2. Hash-join the narrow (url, text_sha256, content_sha256) key table
   against the prior run's signatures on url; rows whose extracted-text
   sha is unchanged REUSE the prior (n_tokens, minhash, simhash,
   n_bytes, status) — the sketch bytes ship once through the join
   instead of being recomputed. The text identity is the extracted-text
   sha (the BlobInfo analogue), so a page whose html boilerplate changed
   but whose text didn't still reuses its sketches; the current run's
   ``content_sha256`` is kept so the output is bit-identical to a full
   recompute.
3. Everything else (new urls, changed texts) goes through the full
   signature kernel; urls present only in the prior run drop (the
   reference's Removed scope — dedup runs on the latest snapshot,
   ``DataControllerSimple.cs:250-258``).

Scale note: below ``_INCR_BROADCAST_CAP`` distinct urls per side the
reuse is MAP-ONLY — the narrow (url, sha[, content_sha]) key tables
broadcast once via ``ray.put`` and each side filters its own rows in
place, so the ~1 KiB/row sketch bytes never enter a shuffle (the same
sketches-never-shuffle rule as ``representative_signatures``; a
measured sketch-shuffle variant was SLOWER than full recompute at 960k
docs / 32 CPUs because these kernels are fast). Above the cap the
hash-join fallback shuffles the sketch payload once — still cheaper
than recompute when docs are long or the kernel config is heavy. At
100 TB the prior signatures are the previous run's ``signatures``
stage checkpoint (partitioned Parquet) — no page payload is ever
re-read for unchanged urls.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.stages.join import broadcast_anti_join, inner_join
from ordinarydumpdeduplicator_ray.stages.signatures import (
    _signature_batch,
    extract_batch,
)

# output column order of the full signature stage (extract minus text,
# plus the sketch columns) — both branches project to exactly this
SIG_COLUMNS = [
    "url", "status", "content_sha256", "text_sha256", "n_bytes",
    "n_tokens", "minhash", "simhash",
]


# per-side distinct-url cap for the map-only broadcast reuse: the
# broadcast key tables are ~120 B/row (url + two shas), so the cap is a
# ~1 GiB plasma object — beyond it the shuffle-join fallback takes over
_INCR_BROADCAST_CAP = 8_000_000


def _sig_cols(has_ts: bool) -> list[str]:
    """Exact column ORDER of ``compute_signatures`` output: warc_ts (if
    present) rides after n_bytes (appended by extract_batch), the salt-0
    ``uid`` comes last (appended by _signature_batch) — the incremental
    output is bit-identical to a full recompute INCLUDING schema, so
    downstream ``assign_uids`` takes its zero-copy salt-0 fast path
    instead of re-mapping the ~1 KiB/row table (ADVICE r2)."""
    return (
        SIG_COLUMNS[:5]
        + (["warc_ts"] if has_ts else [])
        + SIG_COLUMNS[5:]
        + ["uid"]
    )


def _sig_schema(has_ts: bool, ts_type: pa.DataType | None = None) -> pa.Schema:
    fields = [
        ("url", pa.string()),
        ("status", pa.string()),
        ("content_sha256", pa.binary()),
        ("text_sha256", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
    if has_ts:
        fields.append(("warc_ts", ts_type or pa.timestamp("us")))
    fields += [
        ("n_tokens", pa.int64()),
        ("minhash", pa.binary()),
        ("simhash", pa.uint64()),
        ("uid", pa.int64()),
    ]
    return pa.schema(fields)



def _url_index(tbl: pa.Table) -> dict:
    """Broadcastable url index over a key table: sorted int64 SipHash
    uids + the row permutation mapping sorted position -> table row.
    Per-batch matching is then one vectorized ``np.searchsorted`` plus
    an exact url string confirm on the candidates — O(batch log n) per
    batch instead of ``pc.index_in``'s O(n) value-set hash rebuild per
    batch (measured: the rebuild made a 3-pass ts+sha reuse SLOWER than
    recompute at 960k urls)."""
    import numpy as np

    uids = tbl["__uid"].combine_chunks().to_numpy(zero_copy_only=False)
    tbl = tbl.drop_columns(["__uid"])
    order = np.argsort(uids, kind="stable")
    return {"tbl": tbl, "uids": uids[order], "order": order}


def _match_urls(t: pa.Table, idx: dict) -> tuple:
    """(candidate mask over t's rows, matched lut rows aligned with the
    kept rows). Exact: uid collisions are rejected by the url string
    compare, so the mask admits only true url matches. Equal-uid RUNS in
    the index are scanned in full (searchsorted left/right) — probing
    only the leftmost run row would declare a url absent when two index
    urls collide on SipHash64, silently double-emitting or dropping it
    from the incremental output (ADVICE r2, medium)."""
    import numpy as np

    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids

    lut, uids, order = idx["tbl"], idx["uids"], idx["order"]
    if len(lut) == 0 or len(t) == 0:
        return np.zeros(len(t), dtype=bool), lut.slice(0, 0)
    u = url_uids(t["url"])
    lo = np.searchsorted(uids, u, side="left")
    hi = np.searchsorted(uids, u, side="right")
    present = hi > lo
    rows = np.where(present, order[np.minimum(lo, len(uids) - 1)], 0)
    taken = lut.take(pa.array(rows))
    same_url = pc.fill_null(pc.equal(t["url"], taken["url"]), False) \
        .to_numpy(zero_copy_only=False)
    mask = present & same_url
    # rare path: probe urls whose uid run has >1 index rows and whose
    # leftmost row wasn't the url — compare every row in the run
    pending = np.flatnonzero(present & ~mask & (hi - lo > 1))
    if len(pending):
        lut_urls = lut["url"]
        probe_urls = t["url"]
        changed = False
        for i in pending:
            want = probe_urls[int(i)].as_py()
            for p in range(int(lo[i]) + 1, int(hi[i])):
                r = int(order[p])
                if lut_urls[r].as_py() == want:
                    rows[i] = r
                    mask[i] = True
                    changed = True
                    break
        if changed:
            taken = lut.take(pa.array(rows))
    return mask, taken.filter(pa.array(mask))


def incremental_signatures(
    pages: ray.data.Dataset,
    prior: ray.data.Dataset,
    config: DedupConfig | None = None,
    num_partitions: int | None = None,
    trust_ts: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(current pages, prior run's signatures) -> (current signatures,
    stats). Output rows are bit-identical to ``compute_signatures`` on
    the current snapshot alone; only the work differs — sketches are
    recomputed solely for urls whose extracted text changed or is new.
    Urls must be unique per side (a crawl snapshot / a prior run's
    signature table).

    ``trust_ts``: when both sides carry ``warc_ts``, rows whose
    (url, warc_ts) matches the prior run are reused WITHOUT being
    extracted or hashed — the reference's metadata gate (file size/dates
    decide "unchanged" without reading content,
    ``FileSystemProvider.cs:21-25``, ``DataControllerSimple.cs:190-208``).
    This skips the page read-side work entirely for the unchanged bulk
    of a re-crawl; it is exact only under the crawl's guarantee that an
    unchanged timestamp implies unchanged content.

    Stats: ``{"n_reused": int, "n_recomputed": int[, "n_reused_ts":
    int]}`` — ``n_reused`` counts sha-verified reuse."""
    import ray

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    cfg = config or DedupConfig()
    prior = prior.materialize()
    reused_ts = None
    n_reused_ts = 0
    ts_gate_skipped: str | None = None
    if trust_ts:
        p_names = (pages.schema().names or [])
        pr_names = (prior.schema().names or [])
        if "warc_ts" not in p_names or "warc_ts" not in pr_names:
            ts_gate_skipped = "warc_ts missing on one side"
        else:
            pages = pages.materialize()
            if (
                pages.count() > _INCR_BROADCAST_CAP
                or prior.count() > _INCR_BROADCAST_CAP
            ):
                # no join-based ts gate: above the cap the sha path's
                # shuffle join already ships the payload once, and a ts
                # pre-join would add a second corpus-wide shuffle for a
                # gate whose win is skipping the page READ — surfaced in
                # stats so the caller sees the gate did not run
                ts_gate_skipped = "side exceeds broadcast cap"
        if ts_gate_skipped is None:
            cur_ts_ref = ray.put(
                _url_index(_keys_table(pages, ["url", "warc_ts"]))
            )
            prior_ts_ref = ray.put(
                _url_index(_keys_table(prior, ["url", "warc_ts"]))
            )
            ts_type = pages.schema().types[p_names.index("warc_ts")]
            out_cols = _sig_cols(True)

            def _ts_mask(t: pa.Table, ref):
                import numpy as np

                mask, taken = _match_urls(t, _get_broadcast(ref))
                if not mask.any():
                    return mask
                same = pc.and_kleene(
                    pc.is_valid(t.filter(pa.array(mask))["warc_ts"]),
                    pc.equal(
                        t.filter(pa.array(mask))["warc_ts"],
                        taken["warc_ts"],
                    ),
                )
                same_np = pc.fill_null(same, False).to_numpy(
                    zero_copy_only=False
                )
                out = np.zeros(len(t), dtype=bool)
                out[np.flatnonzero(mask)] = same_np
                return out

            def emit_ts_reused(t: pa.Table) -> pa.Table:
                from ordinarydumpdeduplicator_ray.stages.signatures import (
                    _add_uid_batch,
                )

                keep = t.filter(pa.array(_ts_mask(t, cur_ts_ref)))
                if len(keep) == 0:
                    return _sig_schema(True, ts_type).empty_table()
                # salt-0 uid re-derived (not taken from the prior table,
                # whose uid may carry a bumped salt) — output identical
                # to a fresh compute_signatures pass
                return _add_uid_batch(keep.select(out_cols[:-1]), salt=0)

            def drop_ts_matched(t: pa.Table) -> pa.Table:
                import numpy as np

                return t.filter(pa.array(~_ts_mask(t, prior_ts_ref)))

            reused_ts = prior.map_batches(
                emit_ts_reused, batch_format="pyarrow"
            ).materialize()
            n_reused_ts = reused_ts.count()
            pages = pages.map_batches(
                drop_ts_matched, batch_format="pyarrow"
            )
    cur = pages.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size
    ).materialize()
    if (
        cur.count() <= _INCR_BROADCAST_CAP
        and prior.count() <= _INCR_BROADCAST_CAP
    ):
        signatures, info = _incremental_broadcast(cur, prior, cfg)
    else:
        signatures, info = _incremental_join(cur, prior, cfg, num_partitions)
    if trust_ts and reused_ts is None:
        # the gate was requested but could not run — record that loudly
        # instead of silently omitting the key (ADVICE r2, low)
        info["n_reused_ts"] = 0
        info["ts_gate"] = f"skipped: {ts_gate_skipped}"
    if reused_ts is not None:
        info["n_reused_ts"] = n_reused_ts
        if n_reused_ts:
            # lazy union of MATERIALIZED parts: re-executes nothing and
            # skips a ~GiB object-store copy of the sketch blocks
            signatures = (
                reused_ts
                if info["n_reused"] + info["n_recomputed"] == 0
                else signatures.union(reused_ts)
            )
    return signatures, info


def _keys_table(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    """Narrow key-column table of a MATERIALIZED dataset plus a
    ``__uid`` int64 column (SipHash of url), assembled via per-block
    projection tasks — the uid hashing runs in the parallel tasks, not
    on the driver (hashing ~1M object urls driver-side measured ~2 s
    per index build)."""
    from ordinarydumpdeduplicator_ray.functions.hashing import url_uids
    from ordinarydumpdeduplicator_ray.stages.blockops import map_blocks

    def project(t: pa.Table) -> pa.Table:
        t = t.select(columns)
        return t.append_column(
            "__uid", pa.array(url_uids(t["url"]), type=pa.int64())
        )

    parts = [t for t in map_blocks(ds, project) if len(t)]
    if not parts:
        schema = ds.schema()
        fields = [
            pa.field(c, schema.types[schema.names.index(c)]) for c in columns
        ] + [pa.field("__uid", pa.int64())]
        return pa.schema(fields).empty_table()
    return pa.concat_tables(parts).combine_chunks()


def _incremental_broadcast(
    cur: ray.data.Dataset, prior: ray.data.Dataset, cfg: DedupConfig
) -> tuple[ray.data.Dataset, dict]:
    """Map-only reuse: broadcast the current snapshot's narrow keys to
    the prior side (which emits its reusable sketch rows in place —
    sketches never shuffle) and the prior keys to the current side
    (which recomputes only unmatched rows)."""
    import functools

    import ray

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    schema = cur.schema()
    has_ts = "warc_ts" in (schema.names or [])
    ts_type = (
        schema.types[schema.names.index("warc_ts")] if has_ts else None
    )
    key_cols = ["url", "text_sha256", "content_sha256"] + (
        ["warc_ts"] if has_ts else []
    )
    cur_ref = ray.put(_url_index(_keys_table(cur, key_cols)))
    prior_ref = ray.put(
        _url_index(_keys_table(prior, ["url", "text_sha256"]))
    )

    def _sha_mask(t: pa.Table, ref):
        import numpy as np

        mask, taken = _match_urls(t, _get_broadcast(ref))
        if not mask.any():
            return mask, taken
        cand = t.filter(pa.array(mask))
        same = pc.and_kleene(
            pc.is_valid(cand["text_sha256"]),
            pc.equal(cand["text_sha256"], taken["text_sha256"]),
        )
        same_np = pc.fill_null(same, False).to_numpy(zero_copy_only=False)
        out = np.zeros(len(t), dtype=bool)
        out[np.flatnonzero(mask)] = same_np
        return out, taken.filter(pa.array(same_np))

    def emit_reused(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.signatures import _add_uid_batch

        keep_mask, sha_cur = _sha_mask(t, cur_ref)
        if not keep_mask.any():
            return _sig_schema(has_ts, ts_type).empty_table()
        keep = t.filter(pa.array(keep_mask))
        cols = {
            "url": keep["url"],
            "status": keep["status"],
            "content_sha256": sha_cur["content_sha256"],
            "text_sha256": keep["text_sha256"],
            "n_bytes": keep["n_bytes"],
        }
        if has_ts:
            # the CURRENT crawl's timestamp, not the prior one — output
            # must be bit-identical to a full recompute of cur
            cols["warc_ts"] = sha_cur["warc_ts"]
        cols.update(
            {
                "n_tokens": keep["n_tokens"],
                "minhash": keep["minhash"],
                "simhash": keep["simhash"],
            }
        )
        return _add_uid_batch(pa.table(cols), salt=0)

    def filter_changed(t: pa.Table) -> pa.Table:
        import numpy as np

        reused_mask, _ = _sha_mask(t, prior_ref)
        return t.filter(pa.array(~reused_mask))

    reused = prior.map_batches(
        emit_reused, batch_format="pyarrow"
    ).materialize()
    n_reused = reused.count()
    recomputed = (
        cur.map_batches(filter_changed, batch_format="pyarrow")
        .map_batches(
            functools.partial(_signature_batch, config=cfg, keep_text=False),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        .map_batches(
            lambda t: t.select(_sig_cols(has_ts))
            if len(t)
            else _sig_schema(has_ts, ts_type).empty_table(),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_recomputed = recomputed.count()
    if n_reused == 0:
        signatures = recomputed
    elif n_recomputed == 0:
        signatures = reused
    else:
        signatures = reused.union(recomputed)
    return signatures, {"n_reused": n_reused, "n_recomputed": n_recomputed}


def _incremental_join(
    cur: ray.data.Dataset,
    prior: ray.data.Dataset,
    cfg: DedupConfig,
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Shuffle-join fallback beyond the broadcast cap: ships the prior
    sketch payload through one hash join on url."""
    import functools

    schema = cur.schema()
    has_ts = "warc_ts" in (schema.names or [])
    ts_type = (
        schema.types[schema.names.index("warc_ts")] if has_ts else None
    )
    key_cols = ["url", "text_sha256", "content_sha256"] + (
        ["warc_ts"] if has_ts else []
    )

    def cur_keys(t: pa.Table) -> pa.Table:
        return t.select(key_cols)

    def prior_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "sha_prev": t["text_sha256"],
                "status_prev": t["status"],
                "n_bytes_prev": t["n_bytes"],
                "n_tokens_prev": t["n_tokens"],
                "minhash_prev": t["minhash"],
                "simhash_prev": t["simhash"],
            }
        )

    joined = inner_join(
        cur.map_batches(cur_keys, batch_format="pyarrow"),
        prior.map_batches(prior_payload, batch_format="pyarrow"),
        on=("url",),
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [
                ("url", pa.string()),
                ("text_sha256", pa.binary()),
                ("content_sha256", pa.binary()),
            ]
            + ([("warc_ts", ts_type)] if has_ts else [])
            + [
                ("sha_prev", pa.binary()),
                ("status_prev", pa.string()),
                ("n_bytes_prev", pa.int64()),
                ("n_tokens_prev", pa.int64()),
                ("minhash_prev", pa.binary()),
                ("simhash_prev", pa.uint64()),
            ]
        ),
    )

    def finish_reused(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.signatures import _add_uid_batch

        # unchanged extracted text only: sha equality is the BlobInfo
        # comparison; null shas (broken rows) never compare equal and
        # fall through to recompute
        both = pc.and_kleene(
            pc.is_valid(t["text_sha256"]),
            pc.equal(t["text_sha256"], t["sha_prev"]),
        )
        keep = t.filter(pc.fill_null(both, False))
        cols = {
            "url": keep["url"],
            "status": keep["status_prev"],
            "content_sha256": keep["content_sha256"],
            "text_sha256": keep["text_sha256"],
            "n_bytes": keep["n_bytes_prev"],
        }
        if has_ts:
            cols["warc_ts"] = keep["warc_ts"]
        cols.update(
            {
                "n_tokens": keep["n_tokens_prev"],
                "minhash": keep["minhash_prev"],
                "simhash": keep["simhash_prev"],
            }
        )
        return _add_uid_batch(pa.table(cols), salt=0)

    reused = joined.map_batches(
        finish_reused, batch_format="pyarrow"
    ).materialize()
    n_reused = reused.count()

    changed = broadcast_anti_join(
        cur,
        reused.map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"
        ),
        on="url",
    )
    import functools

    recomputed = changed.map_batches(
        functools.partial(_signature_batch, config=cfg, keep_text=False),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    ).map_batches(
        lambda t: t.select(_sig_cols(has_ts))
        if len(t)
        else _sig_schema(has_ts, ts_type).empty_table(),
        batch_format="pyarrow",
    ).materialize()
    n_recomputed = recomputed.count()

    if n_reused == 0:
        signatures = recomputed
    elif n_recomputed == 0:
        signatures = reused
    else:
        signatures = reused.union(recomputed)
    return signatures, {"n_reused": n_reused, "n_recomputed": n_recomputed}
