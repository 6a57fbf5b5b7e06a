"""Tiered web-corpus dedup — the RefinedWeb/CCNet recipe composed from
this engine's own stages, cheapest tier first:

  tier 1  URL canonicalization   (functions/urlnorm.py, stateless map)
  tier 2  exact content sha256   (hash-partition + canonical min-url)
  tier 3  fuzzy near-dup         (the flagship MinHash/SimHash ->
                                  verify -> union-find engine, run on
                                  the tier-1/2 survivors only)

Every input row gets exactly one verdict: ``kept`` (tier 0) or the
tier that removed it (``url_dup`` 1, ``exact_dup`` 2, ``near_dup`` 3).
Each tier sees only the previous tier's survivors, so the expensive
sketch machinery runs on the residue after the cheap exact passes —
on web crawls the bulk of duplication is exact/URL-level, which is
what makes the tiering the standard production shape at 100 TB.

Canonical selection is min-url everywhere (the reference's
keep-the-first rule, ``DuplicatesProcessor.cs:89-93``); tier-3
canonicals are the component ids from ``stages/actions.py:22``.

No reference counterpart for the composition itself — the reference
runs one exact pass; the tiers reuse its verbs stage-for-stage.
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig

VERDICTS = pa.schema(
    [
        ("url", pa.string()),
        ("verdict", pa.string()),   # kept | url_dup | exact_dup | near_dup
        ("tier", pa.int64()),       # 0 | 1 | 2 | 3
    ]
)


def _min_by_key(rows: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """(key, url) -> (key, canonical_url=min url) via Ray groupby."""
    from ray.data.aggregate import Min

    return rows.groupby(key).aggregate(Min("url", alias_name="canonical_url"))


def _verdict_table(urls: pa.Array, verdict: str, tier: int) -> pa.Table:
    return pa.table(
        {
            "url": urls,
            "verdict": pa.array([verdict] * len(urls), type=pa.string()),
            "tier": pa.array([tier] * len(urls), type=pa.int64()),
        }
    )


def tiered_dedup(
    pages: ray.data.Dataset,
    config: DedupConfig | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(url, html, text) corpus -> VERDICTS table, one row per input
    row. Tiers run sequentially on survivors; each tier's removal
    join uses the broadcast family with its shuffle fallback."""
    from ordinarydumpdeduplicator_ray.functions.urlnorm import normalize_url
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
    from ordinarydumpdeduplicator_ray.stages.join import broadcast_left_join

    cfg = config or DedupConfig()

    # ---- tier 1: URL canonicalization --------------------------------
    def norm(t: pa.Table) -> pa.Table:
        return t.append_column(
            "norm_url",
            pa.array([normalize_url(u) for u in t["url"].to_pylist()],
                     type=pa.string()),
        )

    normed = pages.map_batches(norm, batch_format="pyarrow").materialize()
    canon1 = _min_by_key(normed.select_columns(["norm_url", "url"]), "norm_url")
    tagged1 = broadcast_left_join(normed, canon1, on="norm_url")

    url_dups = tagged1.map_batches(
        lambda t: _verdict_table(
            t.filter(pc.not_equal(t["url"], t["canonical_url"]))["url"]
            .combine_chunks(), "url_dup", 1),
        batch_format="pyarrow",
    )
    surv1 = tagged1.map_batches(
        lambda t: t.filter(pc.equal(t["url"], t["canonical_url"]))
                   .drop_columns(["norm_url", "canonical_url"]),
        batch_format="pyarrow",
    )

    # ---- tier 2: exact content sha ------------------------------------
    def sha(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.bloom import _sha_digests

        hexes = [d.hex() for d in _sha_digests(t["text"].combine_chunks()).to_pylist()]
        return t.append_column(
            "text_sha256", pa.array(hexes, type=pa.string())
        )

    shad = surv1.map_batches(sha, batch_format="pyarrow").materialize()
    canon2 = _min_by_key(shad.select_columns(["text_sha256", "url"]), "text_sha256")
    tagged2 = broadcast_left_join(shad, canon2, on="text_sha256")

    exact_dups = tagged2.map_batches(
        lambda t: _verdict_table(
            t.filter(pc.not_equal(t["url"], t["canonical_url"]))["url"]
            .combine_chunks(), "exact_dup", 2),
        batch_format="pyarrow",
    )
    surv2 = tagged2.map_batches(
        lambda t: t.filter(pc.equal(t["url"], t["canonical_url"]))
                   .drop_columns(["text_sha256", "canonical_url"]),
        batch_format="pyarrow",
    ).materialize()

    # ---- tier 3: flagship near-dup engine on the residue ---------------
    pipe = DedupPipeline(cfg, num_partitions=num_partitions)
    out = pipe.run(surv2)
    actions = out["actions"]
    near_dups = actions.map_batches(
        lambda t: _verdict_table(
            t.filter(pc.equal(t["action"], "isolate"))["url"].combine_chunks(),
            "near_dup", 3),
        batch_format="pyarrow",
    ).materialize()

    from ordinarydumpdeduplicator_ray.stages.join import broadcast_anti_join

    kept_rows = broadcast_anti_join(
        surv2.select_columns(["url"]), near_dups.select_columns(["url"]),
        on="url",
    ).map_batches(
        lambda t: _verdict_table(t["url"].combine_chunks(), "kept", 0),
        batch_format="pyarrow",
    )
    return kept_rows.union(url_dups).union(exact_dups).union(near_dups)
