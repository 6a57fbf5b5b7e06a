"""SemDeDup (stages/semdedup.py): injected-dup end-to-end assertion,
brute-force within-cluster invariants, blocking-independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

THRESHOLD = 0.99


def _verdict_rows(ds):
    t = pa.concat_tables(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    return t.sort_by("vec_id")


@pytest.fixture(scope="module")
def synth_embeddings():
    """(table, ids, matrix): 300 seeded unit-ish vectors in dim 12 plus
    40 planted near-copies (tiny perpendicular jitter, cosine > 0.999)
    of the first 40 rows under ids 10_000+i."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(300, 12))
    ids = np.arange(300, dtype=np.int64)
    near = base[:40] * 3.0 + rng.normal(size=(40, 12)) * 1e-4
    mat = np.concatenate([base, near])
    all_ids = np.concatenate([ids, np.arange(40, dtype=np.int64) + 10_000])
    dim = mat.shape[1]
    offsets = pa.array(np.arange(len(all_ids) + 1, dtype=np.int32) * dim)
    emb = pa.ListArray.from_arrays(offsets, pa.array(mat.reshape(-1), type=pa.float64()))
    tbl = pa.table({"vec_id": pa.array(all_ids, type=pa.int64()), "embedding": emb})
    return tbl, all_ids, mat


class TestSemanticDedup:
    def test_verdict_invariants_brute_force(self, ray_session, synth_embeddings):
        """Within every cluster of the OUTPUT: kept rows are pairwise
        below threshold; every dropped row has a kept same-cluster row
        at/above threshold and dup_of points at a kept row with a lower
        id. One verdict per input row."""
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.semdedup import semantic_dedup

        tbl, all_ids, mat = synth_embeddings
        out = _verdict_rows(
            semantic_dedup(ray.data.from_arrow(tbl), n_clusters=8,
                           threshold=THRESHOLD, seed=3)
        )
        assert out.num_rows == len(all_ids)
        assert sorted(out["vec_id"].to_pylist()) == sorted(all_ids.tolist())

        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        by_id = {int(i): norm[k] for k, i in enumerate(all_ids)}
        vid = out["vec_id"].to_pylist()
        clu = out["cluster"].to_pylist()
        kept = out["kept"].to_pylist()
        dup = out["dup_of"].to_pylist()
        kept_by_cluster: dict[int, list[int]] = {}
        kept_set = set()
        for v, c, k in zip(vid, clu, kept):
            if k:
                kept_by_cluster.setdefault(c, []).append(v)
                kept_set.add(v)
        for c, members in kept_by_cluster.items():
            m = np.stack([by_id[v] for v in members])
            sims = np.round(m @ m.T, 6)
            np.fill_diagonal(sims, -2.0)
            assert sims.max(initial=-2.0) < THRESHOLD, f"kept pair >= threshold in cluster {c}"
        for v, c, k, d in zip(vid, clu, kept, dup):
            if k:
                assert d is None
                continue
            assert d in kept_set and d < v
            assert np.round(float(by_id[v] @ by_id[d]), 6) >= THRESHOLD

    def test_planted_near_copies_drop(self, ray_session, synth_embeddings):
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.semdedup import semantic_dedup

        tbl, _, _ = synth_embeddings
        out = _verdict_rows(
            semantic_dedup(ray.data.from_arrow(tbl), n_clusters=8,
                           threshold=THRESHOLD, seed=3)
        )
        kept = dict(zip(out["vec_id"].to_pylist(), out["kept"].to_pylist()))
        # a planted copy (cos > 0.999 with its base, same direction =>
        # same cluster) can never survive: its base has a lower id
        dropped = [i for i in range(10_000, 10_040) if not kept[i]]
        assert len(dropped) == 40

    def test_blocking_independent(self, ray_session, synth_embeddings):
        """Identical verdicts whether the input arrives as 2 or 7 blocks
        (sample covers the whole table; assignment is per-row)."""
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.semdedup import semantic_dedup

        tbl, _, _ = synth_embeddings
        outs = []
        for nblocks in (2, 7):
            ds = ray.data.from_arrow(tbl).repartition(nblocks)
            out = _verdict_rows(
                semantic_dedup(ds, n_clusters=8, threshold=THRESHOLD, seed=3)
            )
            outs.append(list(zip(out["vec_id"].to_pylist(),
                                 out["cluster"].to_pylist(),
                                 out["kept"].to_pylist(),
                                 out["dup_of"].to_pylist())))
        assert outs[0] == outs[1]

    def test_query_injected_exact_copies_drop(self, ray_session):
        """End-to-end query surface at sf0.001: every injected exact
        copy (vec_id + 1_000_000, scaled x2 => cosine exactly 1.0)
        drops; if its original was kept, dup_of is the original."""
        from ordinarydumpdeduplicator_ray.pipelines.queries import (
            semantic_dedup_verdicts,
        )

        out = _verdict_rows(semantic_dedup_verdicts("/root/testdata/sf0.001"))
        vid = out["vec_id"].to_pylist()
        kept = dict(zip(vid, out["kept"].to_pylist()))
        dup = dict(zip(vid, out["dup_of"].to_pylist()))
        copies = [v for v in vid if v >= 1_000_000]
        assert copies, "dup injection produced no copies"
        for v in copies:
            assert not kept[v]
            if kept[v - 1_000_000]:
                assert dup[v] == v - 1_000_000


class TestSemanticDedupIncremental:
    def _split(self, synth_embeddings):
        """prior = first 150 base rows (anchors), new = the rest of the
        base rows + the 40 near-copies of rows 0..39 (which are PRIOR
        rows, so the copies must drop as dup_is_prior)."""
        import ray.data

        tbl, all_ids, _ = synth_embeddings
        ids = np.asarray(all_ids)
        prior_mask = ids < 150
        prior = ray.data.from_arrow(tbl.filter(pa.array(prior_mask)))
        new = ray.data.from_arrow(tbl.filter(pa.array(~prior_mask)))
        return prior, new, ids

    def test_prior_copies_drop_as_prior(self, ray_session, synth_embeddings):
        from ordinarydumpdeduplicator_ray.stages.semdedup import (
            semantic_dedup_incremental,
        )

        prior, new, ids = self._split(synth_embeddings)
        out = _verdict_rows(
            semantic_dedup_incremental(
                prior, new, n_clusters=8, threshold=THRESHOLD, seed=3
            )
        )
        vid = out["vec_id"].to_pylist()
        # exactly one verdict per NEW row, prior rows never emitted
        assert sorted(vid) == sorted(int(v) for v in ids[ids >= 150])
        kept = dict(zip(vid, out["kept"].to_pylist()))
        dup = dict(zip(vid, out["dup_of"].to_pylist()))
        prior_flag = dict(zip(vid, out["dup_is_prior"].to_pylist()))
        for v in vid:
            if v >= 10_000:  # near-copy of prior row v - 10_000
                assert not kept[v]
                assert prior_flag[v]
                assert dup[v] == v - 10_000
            elif not kept[v]:
                # any other drop must reference a prior anchor or an
                # earlier kept new row
                if prior_flag[v]:
                    assert dup[v] < 150
                else:
                    assert dup[v] in kept and kept[dup[v]]

    def test_blocking_independent(self, ray_session, synth_embeddings):
        from ordinarydumpdeduplicator_ray.stages.semdedup import (
            semantic_dedup_incremental,
        )

        prior, new, _ = self._split(synth_embeddings)
        outs = []
        for nblocks in (2, 7):
            out = _verdict_rows(
                semantic_dedup_incremental(
                    prior.repartition(nblocks), new.repartition(nblocks),
                    n_clusters=8, threshold=THRESHOLD, seed=3,
                )
            )
            outs.append(list(zip(out["vec_id"].to_pylist(),
                                 out["kept"].to_pylist(),
                                 out["dup_of"].to_pylist(),
                                 out["dup_is_prior"].to_pylist())))
        assert outs[0] == outs[1]

    def test_empty_prior_falls_back(self, ray_session, synth_embeddings):
        """With an empty prior the stage degrades to plain within-new
        dedup (centroids from the new sample, no anchors)."""
        import ray.data
        from ordinarydumpdeduplicator_ray.stages.semdedup import (
            semantic_dedup_incremental,
        )

        tbl, all_ids, _ = synth_embeddings
        empty = ray.data.from_arrow(tbl.slice(0, 0))
        new = ray.data.from_arrow(tbl)
        out = _verdict_rows(
            semantic_dedup_incremental(
                empty, new, n_clusters=8, threshold=THRESHOLD, seed=3
            )
        )
        assert len(out) == len(all_ids)
        assert not any(out["dup_is_prior"].to_pylist())

    def test_query_recrawl_copies_drop(self, ray_session):
        """sf0.001 query surface: every injected re-crawl copy
        (vec_id + 2_000_000 of a prior even id) drops with
        dup_is_prior = True and dup_of = its prior original."""
        from ordinarydumpdeduplicator_ray.pipelines.queries import (
            semantic_dedup_incremental_verdicts,
        )

        out = _verdict_rows(
            semantic_dedup_incremental_verdicts("/root/testdata/sf0.001")
        )
        vid = out["vec_id"].to_pylist()
        kept = dict(zip(vid, out["kept"].to_pylist()))
        dup = dict(zip(vid, out["dup_of"].to_pylist()))
        prior_flag = dict(zip(vid, out["dup_is_prior"].to_pylist()))
        copies = [v for v in vid if v >= 2_000_000]
        assert copies, "re-crawl injection produced no copies"
        for v in copies:
            assert not kept[v]
            assert prior_flag[v]
            assert dup[v] == v - 2_000_000
