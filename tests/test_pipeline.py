"""End-to-end pipeline conformance vs brute-force oracles
(SURVEY.md §5, FIXTURES.md F4 invariants)."""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pytest

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline

from tests import oracle


CFG = DedupConfig(sig_concurrency=2, batch_size=256)


@pytest.fixture(scope="module")
def tiny_run(ray_session, tiny_corpus):
    """One full pipeline run over the tiny corpus, shared by this module."""
    import ray.data

    pages, truth = tiny_corpus
    pipe = DedupPipeline(CFG, num_partitions=4)
    out = pipe.run(ray.data.from_arrow(pages))
    out["actions"] = pipe.plan_isolation()
    return pages, truth, out


def _groups_from_components(rows) -> dict[str, set[str]]:
    comp = defaultdict(set)
    for r in rows:
        comp[r["component_id"]].add(r["url"])
    return comp


class TestExactGroups:
    def test_matches_oracle_exactly(self, tiny_run):
        pages, truth, out = tiny_run
        got = {
            r["group_key"]: r
            for r in out["groups_exact"].take_all()
        }
        want = oracle.exact_groups_oracle(pages)
        assert set(got) == set(want)
        for key, urls in want.items():
            assert got[key]["n_copies"] == len(urls)
            assert got[key]["canonical_url"] == min(urls)
            # SameContentFilesInfo.cs:34-68 arithmetic
            assert got[key]["all_data_size"] == got[key]["n_bytes"] * len(urls)
            assert got[key]["dup_data_size"] == got[key]["n_bytes"] * (len(urls) - 1)

    def test_empty_rows_form_their_own_group(self, tiny_run):
        pages, truth, out = tiny_run
        import hashlib

        empty_key = hashlib.sha256(b"").hexdigest()
        n_empty = sum(
            1 for c, t in zip(truth["truth_class"].to_pylist(), pages["text"].to_pylist())
            if c == "empty"
        )
        got = {r["group_key"]: r for r in out["groups_exact"].take_all()}
        if n_empty > 1:
            assert got[empty_key]["n_copies"] == n_empty

    def test_broken_rows_never_grouped(self, tiny_run):
        pages, truth, out = tiny_run
        broken_urls = {
            u for u, c in zip(truth["url"].to_pylist(), truth["truth_class"].to_pylist())
            if c == "broken"
        }
        assert broken_urls, "fixture must contain broken rows"
        for r in out["components"].take_all():
            assert r["url"] not in broken_urls
        for r in out["actions"].take_all():
            assert r["url"] not in broken_urls


class TestClusters:
    def test_components_match_oracle(self, tiny_run):
        """Cluster assignments == oracle connected components over
        (exact pairs ∪ true-Jaccard pairs). FIXTURES.md F4.2."""
        pages, truth, out = tiny_run
        exact = oracle.exact_groups_oracle(pages)
        exact_pairs = set()
        for urls in exact.values():
            for i in range(len(urls)):
                for j in range(i + 1, len(urls)):
                    exact_pairs.add((urls[i], urls[j]))
        near_pairs = oracle.true_dup_pairs(pages, CFG)
        want = oracle.connected_components_oracle(exact_pairs | near_pairs)
        got = {r["url"]: r["component_id"] for r in out["components"].take_all()}
        assert got == want

    def test_substring_pairs_not_merged(self, tiny_run):
        pages, truth, out = tiny_run
        sub_groups = defaultdict(list)
        for u, c, g in zip(
            truth["url"].to_pylist(),
            truth["truth_class"].to_pylist(),
            truth["truth_group"].to_pylist(),
        ):
            if c == "substring":
                sub_groups[g].append(u)
        assert sub_groups, "fixture must contain substring pairs"
        comp = {r["url"]: r["component_id"] for r in out["components"].take_all()}
        for g, urls in sub_groups.items():
            a, b = urls
            # the two docs share only a 60-word run (J << 0.8): they must
            # not land in the same component
            if a in comp and b in comp:
                assert comp[a] != comp[b]


class TestRecall:
    def test_dup_pair_recall(self, ray_session, small_corpus):
        """>= 0.99 recall vs brute-force Jaccard pairs (north rule),
        confined to truth partitions to keep the oracle O(sum g^2)."""
        import ray.data

        pages, truth = small_corpus
        partitions = defaultdict(set)
        for u, g in zip(truth["url"].to_pylist(), truth["truth_group"].to_pylist()):
            if g >= 0:
                partitions[g].add(u)
        want = oracle.true_dup_pairs(pages, CFG, list(partitions.values()))
        assert len(want) > 50, "fixture must contain enough true pairs"

        pipe = DedupPipeline(CFG, num_partitions=4)
        out = pipe.run(ray.data.from_arrow(pages))
        comp = _groups_from_components(out["components"].take_all())
        got_pairs = set()
        for members in comp.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    got_pairs.add((ms[i], ms[j]))
        # component-transitive pairs cover every detected dup pair
        recall = len(want & got_pairs) / len(want)
        assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(want)} true pairs)"


class TestInvariance:
    def test_shuffle_and_partition_invariance(self, ray_session, tiny_corpus, tiny_run):
        """FIXTURES.md F4.4: identical groups/components regardless of
        input row order and block layout."""
        import ray.data

        pages, truth, out = tiny_run
        idx = list(range(pages.num_rows))[::-1]
        shuffled = pages.take(idx)
        pipe = DedupPipeline(CFG, num_partitions=3)
        out2 = pipe.run(ray.data.from_arrow(shuffled).repartition(7))
        c1 = sorted((r["url"], r["component_id"]) for r in out["components"].take_all())
        c2 = sorted((r["url"], r["component_id"]) for r in out2["components"].take_all())
        assert c1 == c2
        g1 = sorted((r["group_key"], r["n_copies"]) for r in out["groups_exact"].take_all())
        g2 = sorted((r["group_key"], r["n_copies"]) for r in out2["groups_exact"].take_all())
        assert g1 == g2

    def test_extraction_rows_join_their_exact_group(self, tiny_run):
        """Extraction rows (text=null, html set) hash identically to their
        text siblings — the per-row byte-identical extraction invariant
        observed end-to-end."""
        pages, truth, out = tiny_run
        cls = dict(zip(truth["url"].to_pylist(), truth["truth_class"].to_pylist()))
        tg = dict(zip(truth["url"].to_pylist(), truth["truth_group"].to_pylist()))
        # group truth 'exact' urls by truth_group; every member must share
        # one engine group regardless of text/html representation
        by_g = defaultdict(list)
        for u, c in cls.items():
            if c in ("exact", "hot"):
                by_g[tg[u]].append(u)
        comp = {r["url"]: r["component_id"] for r in out["components"].take_all()}
        for g, urls in by_g.items():
            ids = {comp.get(u) for u in urls}
            assert len(ids) == 1 and None not in ids, f"exact truth group {g} split: {ids}"


class TestActions:
    def test_actions_partition(self, tiny_run):
        pages, truth, out = tiny_run
        acts = out["actions"].take_all()
        comp = {r["url"]: r["component_id"] for r in out["components"].take_all()}
        assert {r["url"] for r in acts} == set(comp)
        for r in acts:
            want = "keep" if r["url"] == comp[r["url"]] else "isolate"
            assert r["action"] == want
            assert r["group_key"] == comp[r["url"]]


class TestReportRollup:
    def test_rollup_totals_match_actions(self, tiny_run):
        """report_rollup (the reference's DuplicateReport facade verb)
        over a completed run: per-host n_dup_pages must sum to the
        non-keep action rows, and dup_bytes must be positive wherever
        pages were isolated."""
        pages, truth, out = tiny_run

        pipe = DedupPipeline(CFG, num_partitions=4)
        pipe.results = dict(out)
        report = pipe.report_rollup().take_all()

        n_isolated = sum(
            1 for r in out["actions"].take_all() if r["action"] != "keep"
        )
        assert sum(r["n_dup_pages"] for r in report) == n_isolated
        assert all(r["dup_bytes"] >= 0 for r in report)
        # report ordering contract: descending dup_bytes
        vals = [r["dup_bytes"] for r in report]
        assert vals == sorted(vals, reverse=True)
