"""The flagship pipeline: pages -> signatures -> candidates -> edges ->
components -> groups -> actions (+ rollup report).

Facade mirrors the reference's public API verbs
(``OrdinaryDumpDeduplicator.cs:37-72``): AddDataLocation ->
``register_input``, DoInspection -> ``run_scan``, GetDuplicatesFound ->
``find_duplicates``, MoveDuplicatesToSpecialFolder -> ``plan_isolation``
(+ ``apply_actions``), DeleteDuplicates -> ``plan_deletion``.

Execution shape (SURVEY.md §3.2): every per-row stage is a
``map_batches`` over Arrow batches; the wide steps are groupby / join
shuffles keyed on content hash, LSH band bucket, SimHash block bucket and
component id; union-find is the one driver-side reducer (see
``state.unionfind``). With a ``checkpoint_dir`` each stage persists to
Parquet with a lineage manifest and a rerun resumes after the last
complete stage.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.sources.pages import read_pages
from ordinarydumpdeduplicator_ray.stages.actions import apply_actions, plan_deletion, plan_isolation
from ordinarydumpdeduplicator_ray.stages.candidates import (
    candidate_pairs,
    explode_band_and_block_buckets,
    explode_sha_buckets,
)
from ordinarydumpdeduplicator_ray.stages.groups import (
    component_groups,
    finalize_exact_groups,
)
from ordinarydumpdeduplicator_ray.stages.grouped import (
    exact_group_index,
    representative_signatures,
)
from ordinarydumpdeduplicator_ray.schemas import STATUS_BROKEN
from ordinarydumpdeduplicator_ray.stages.rollup import host_dup_rollup
from ordinarydumpdeduplicator_ray.stages.signatures import assign_uids, compute_signatures
from ordinarydumpdeduplicator_ray.stages.verify import verify_pairs
from ordinarydumpdeduplicator_ray.state import checkpoint as ckpt
from ordinarydumpdeduplicator_ray.state.unionfind import components_from_edges, label_propagation

# driver union-find handles edge lists up to this size; label
# propagation takes over beyond it (shared with the threshold sweep)
MAX_DRIVER_EDGES = 50_000_000


class DedupPipeline:
    """Orchestrates the full near-duplicate detection run."""

    def __init__(
        self,
        config: DedupConfig | None = None,
        checkpoint_dir: str | None = None,
        num_partitions: int = 16,
    ) -> None:
        self.config = config or DedupConfig()
        self.checkpoint_dir = checkpoint_dir
        self.num_partitions = num_partitions
        # edges-count threshold for driver-side union-find vs
        # distributed label propagation (both produce identical labels —
        # tests/test_operators.py::TestLabelPropagation)
        self.max_driver_edges = MAX_DRIVER_EDGES
        self._input: str | ray.data.Dataset | None = None
        self._fingerprint: str | None = None
        self._prior_sigs: ray.data.Dataset | None = None
        self.results: dict[str, ray.data.Dataset] = {}
        # per-stage run metrics (rows out, wall sec, resumed?) — the
        # CountFilesAndSize analogue (OrdinaryDumpDeduplicator.cs:208-222)
        self.metrics: dict[str, dict] = {}

    # --- reference verb: AddDataLocation --------------------------------
    def register_input(self, pages: str | ray.data.Dataset) -> "DedupPipeline":
        self._input = pages
        self._fingerprint = ckpt.input_fingerprint(pages)
        return self

    def _pages(self) -> ray.data.Dataset:
        if self._input is None:
            raise ValueError("call register_input() first")
        if isinstance(self._input, str):
            return read_pages(self._input)
        return self._input

    def _stage(self, name: str, build) -> ray.data.Dataset:
        """Checkpoint-or-materialize boundary: with a checkpoint_dir the
        stage persists to Parquet + manifest (and is skipped on resume);
        without one, the result is pinned in the object store so branches
        don't recompute lineage."""
        import time as _time

        t0 = _time.perf_counter()
        resumed = False
        if self.checkpoint_dir:
            ch = self.config.config_hash()
            if ckpt.stage_is_complete(self.checkpoint_dir, name, ch, self._fingerprint):
                ds = ckpt.read_stage(self.checkpoint_dir, name)
                resumed = True
            else:
                ds = ckpt.write_stage(
                    build(), self.checkpoint_dir, name, ch, self._fingerprint
                )
        else:
            ds = build().materialize()
        self.metrics[name] = {
            "rows": ds.count(),
            "wall_sec": round(_time.perf_counter() - t0, 3),
            "resumed": resumed,
        }
        self.results[name] = ds
        return ds

    def register_prior_signatures(
        self, prior: "str | ray.data.Dataset"
    ) -> "DedupPipeline":
        """Signatures of the PREVIOUS run (a Dataset, or the parquet dir
        of the previous run's ``signatures`` stage checkpoint):
        ``run_scan`` then reuses the prior sketch rows for urls whose
        extracted text is unchanged and recomputes only new/changed
        pages (the reference's re-inspection semantics,
        ``DataControllerSimple.cs:190-213`` — see
        ``stages/incremental.py``)."""
        if isinstance(prior, str):
            prior = ray.data.read_parquet(prior)
        self._prior_sigs = prior
        return self

    # --- reference verb: DoInspection ------------------------------------
    def run_scan(self) -> ray.data.Dataset:
        """pages -> signatures (extract + sha256 + minhash + simhash).

        With a checkpoint_dir and a path input, the scan checkpoints PER
        INPUT SHARD (state/checkpoint.write_scan_sharded): a killed job
        resumes mid-stage, re-hashing only the shards whose output is
        missing — stage-granularity resume alone would re-run the whole
        (longest) stage. With prior signatures registered, the scan is
        INCREMENTAL instead: unchanged urls reuse the prior sketches."""
        if self._prior_sigs is not None:
            from ordinarydumpdeduplicator_ray.stages.incremental import (
                incremental_signatures,
            )

            def build() -> ray.data.Dataset:
                sigs, info = incremental_signatures(
                    self._pages(), self._prior_sigs, self.config,
                    self.num_partitions,
                )
                self.metrics["signatures_reuse"] = info
                return sigs

            return self._stage("signatures", build)
        if self.checkpoint_dir and isinstance(self._input, str):
            import time as _time

            name = "signatures"
            ch = self.config.config_hash()
            t0 = _time.perf_counter()
            if ckpt.stage_is_complete(self.checkpoint_dir, name, ch, self._fingerprint):
                ds, resumed = ckpt.read_stage(self.checkpoint_dir, name), True
            else:
                ds = ckpt.write_scan_sharded(
                    self._input, self.checkpoint_dir, name,
                    self.config, ch, self._fingerprint,
                )
                resumed = False
            self.metrics[name] = {
                "rows": ds.count(),
                "wall_sec": round(_time.perf_counter() - t0, 3),
                "resumed": resumed,
            }
            self.results[name] = ds
            return ds
        return self._stage(
            "signatures", lambda: compute_signatures(self._pages(), self.config)
        )

    # --- reference verb: GetDuplicatesFound -------------------------------
    def find_duplicates(self) -> dict[str, ray.data.Dataset]:
        cfg, np_ = self.config, self.num_partitions
        sigs = self.results.get("signatures") or self.run_scan()
        # int64 uids (collision-checked per run) replace url strings in
        # every hot shuffle below: the exact-index sort key payload, the
        # bucket explodes, the candidate sort and the pair table all move
        # 8-byte ints; urls resurface on the verified edges.
        sigs_uid, _salt = assign_uids(sigs, np_)

        # ONE light sort of (sha, url, n_bytes, uid) yields both the
        # exact-group aggregates AND the canonical (min-url) member per
        # distinct text (stages/grouped.py): only those representatives
        # enter LSH band / SimHash block explosion, so exact copies (the
        # dominant duplication mode on web crawls) never multiply through
        # the 50+ similarity bucket families — they reach their component
        # through the content-sha family alone. The ~1 KiB sketches never
        # enter the sort; representatives are recovered map-only via the
        # broadcast canonical-uid filter.
        index = self._stage(
            "exact_index",
            lambda: exact_group_index(
                sigs_uid.filter(expr=f"status != '{STATUS_BROKEN}'"),
                sort_partitions=2 * np_,
            ),
        )
        groups_exact = self._stage(
            "groups_exact", lambda: finalize_exact_groups(index)
        )

        def build_edges() -> ray.data.Dataset:
            # ONE candidate pass over the union of all three bucket
            # families — content-sha (exact, all members), minhash bands
            # and simhash Manku tables (representatives only). Family key
            # spaces are 64-bit mixed hashes; a cross-family collision
            # only merges two candidate buckets and every candidate is
            # verified, so correctness is unaffected. The merged verifier
            # attaches (sha, minhash, simhash) per side in two joins and
            # emits exact / minhash / simhash edges from one pass.
            # the bucket union stays LAZY into candidate_pairs: with
            # config.singleton_prefilter off (default — see config.py
            # for the measured tradeoff) the sort is its only consumer,
            # so the explodes fuse into the sort execution with no
            # materialize barrier; the sorted-run emitter skips
            # singleton buckets natively.
            reps = representative_signatures(index, sigs_uid)
            # band + simhash-table families in ONE fused pass over the
            # reps lineage (a lazy union would re-run the rep filter and
            # sketch-column decode per family — a full extra pass over
            # ~1 KiB/row of sketch bytes); bucket values bit-identical
            # to the unfused explodes
            bb = explode_band_and_block_buckets(reps, cfg, member="uid")
            shas = explode_sha_buckets(sigs_uid, member="uid")
            buckets = bb.union(shas)
            pairs = candidate_pairs(
                buckets, cfg, np_, member_field=("uid", pa.int64())
            )
            # pages passed through => margin-band pairs are re-verified
            # EXACTLY on shingle sets (config.py contract)
            return verify_pairs(pairs, sigs_uid, cfg, pages=self._pages())

        edges = self._stage("edges", build_edges)

        def build_components() -> ray.data.Dataset:
            # driver-side weighted union-find while the (deduplicated)
            # edge list fits comfortably on the driver; the distributed
            # min-label-propagation path takes over beyond that — at
            # 10^12 docs the edges table is itself huge, but each
            # iteration is a vectorized join+groupby with no driver
            # state (state/unionfind.py).
            if edges.count() <= self.max_driver_edges:
                return ray.data.from_arrow(components_from_edges(edges))
            return label_propagation(edges)

        components = self._stage("components", build_components)
        groups_near = self._stage(
            "groups_near", lambda: component_groups(components, sigs)
        )
        return {
            "signatures": sigs,
            "groups_exact": groups_exact,
            "edges": edges,
            "components": components,
            "groups_near": groups_near,
        }

    # --- reference verb: MoveDuplicatesToSpecialFolder --------------------
    def plan_isolation(self) -> ray.data.Dataset:
        components = self.results.get("components")
        if components is None:
            self.find_duplicates()
            components = self.results["components"]
        return self._stage("actions", lambda: plan_isolation(components))

    # --- reference verb: DeleteDuplicates ---------------------------------
    def plan_deletion(self, delete_urls: ray.data.Dataset) -> ray.data.Dataset:
        actions = self.results.get("actions") or self.plan_isolation()
        return plan_deletion(actions, delete_urls)

    def apply_actions(self) -> tuple[ray.data.Dataset, ray.data.Dataset]:
        actions = self.results.get("actions") or self.plan_isolation()
        return apply_actions(self._pages(), actions)

    def report_rollup(self) -> ray.data.Dataset:
        actions = self.results.get("actions") or self.plan_isolation()
        return host_dup_rollup(actions, self.results["signatures"])

    # --- one-call convenience ---------------------------------------------
    def run(self, pages: str | ray.data.Dataset) -> dict[str, ray.data.Dataset]:
        self.register_input(pages)
        self.run_scan()
        out = self.find_duplicates()
        out["actions"] = self.plan_isolation()
        return out
