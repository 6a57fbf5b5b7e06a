"""Substring-span extraction at scale (VERDICT r2 #8): a seeded
100k-doc corpus with (a) planted pairwise 30-word shared runs whose
span recall must clear 0.9, and (b) a hot shared-boilerplate run in
2,000 docs whose candidate volume must stay LINEAR in the member count
(the skew-capped star+chain emission), not quadratic — per-pair
suffix-array cost is then O(pairs emitted), bounded.

The probabilistic bound for (a): a planted run of R=30 words at
shingle w=5 / sample mod m=8 contains R-w+1=26 shingles; the pair is
a candidate unless NO shingle samples, p_miss = (1-1/m)^26 ~= 0.031,
so E[recall] ~= 0.969 and P(recall < 0.9 over 400 pairs) < 1e-8."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


N_DOCS = 100_000
N_PLANTED = 400
N_BOILER = 2_000
RUN_WORDS = 30


@pytest.fixture(scope="module")
def span_corpus():
    """(pages Arrow table, planted url pairs). Deterministic, seed 7.

    Background docs are 24 random words from a 50k vocab (practically
    no accidental 30-word shared runs). Planted pairs i get a unique
    30-word run inserted into two docs at different offsets. Boiler
    docs all contain the SAME 30-word run — one hot sampled-shingle
    bucket family with 2,000 members."""
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(50_000)], dtype=object)

    def words(n):
        return rng.choice(vocab, size=n)

    urls, texts = [], []
    planted = []
    boiler_run = " ".join(words(RUN_WORDS))
    n_background = N_DOCS - 2 * N_PLANTED - N_BOILER
    for i in range(n_background):
        urls.append(f"bg{i:06d}")
        texts.append(" ".join(words(24)))
    for i in range(N_PLANTED):
        run = " ".join(words(RUN_WORDS))
        ua, ub = f"pa{i:04d}", f"pb{i:04d}"
        # run embedded at different offsets, distinct surroundings
        texts.append(" ".join(words(7)) + " " + run + " " + " ".join(words(5)))
        urls.append(ua)
        texts.append(" ".join(words(3)) + " " + run + " " + " ".join(words(9)))
        urls.append(ub)
        planted.append((ua, ub))
    for i in range(N_BOILER):
        urls.append(f"bo{i:05d}")
        texts.append(
            " ".join(words(4)) + " " + boiler_run + " " + " ".join(words(4))
        )
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "html": pa.nulls(len(urls), type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return pages, planted


class TestSpansAtScale:
    def test_recall_and_linear_candidates(self, ray_session, span_corpus):
        import ray.data
        from ordinarydumpdeduplicator_ray.config import DedupConfig
        from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch
        from ordinarydumpdeduplicator_ray.stages.spans import (
            compute_spans,
            span_candidate_pairs,
        )

        pages, planted = span_corpus
        # sig_concurrency strictly below the 4-CPU session budget: the
        # actor pool + the candidate shuffle's aggregator actors must
        # coexist (a pool of 4 at num_cpus=4 starves the shuffle)
        cfg = DedupConfig(sig_concurrency=2)
        pages_ds = ray.data.from_arrow(pages).repartition(16)
        extracted = pages_ds.map_batches(
            extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size
        ).materialize()

        pairs = span_candidate_pairs(extracted, cfg, num_partitions=8)
        pairs = pairs.materialize()
        n_pairs = pairs.count()

        # --- O(pairs) bound: the boiler bucket must emit LINEARLY ----
        # 2,000 members sharing one 30-word run would be ~2.0M pairs
        # all-pairs; the skew-capped emitter keeps star+chain per hot
        # bucket. Planted pairs contribute ~400. Bound the total at
        # 60x boiler members (26 shingles x ~1/8 sampled x star+chain
        # x border fragments) — two orders below quadratic.
        assert n_pairs <= 60 * N_BOILER, (
            f"{n_pairs} candidate pairs — hot boilerplate bucket "
            "exploded quadratically"
        )

        # boiler-to-boiler candidates must still CONNECT the hot set
        # (spans need a path, not all pairs): count distinct boiler
        # urls touched
        boiler_urls = set()
        planted_hits = set()
        planted_set = set(planted)
        for row in pairs.iter_rows():
            a, b = row["url_a"], row["url_b"]
            if a.startswith("bo"):
                boiler_urls.add(a)
            if b.startswith("bo"):
                boiler_urls.add(b)
            key = (a, b) if (a, b) in planted_set else (b, a)
            if key in planted_set:
                planted_hits.add(key)
        assert len(boiler_urls) >= 0.9 * N_BOILER

        # --- candidate recall on planted pairs ------------------------
        cand_recall = len(planted_hits) / N_PLANTED
        assert cand_recall >= 0.9, f"candidate recall {cand_recall:.3f}"

        # --- exact span extraction on the planted candidates ----------
        spans = compute_spans(pairs, extracted, cfg, num_partitions=8)
        got = {}
        for row in spans.iter_rows():
            a, b = row["url_a"], row["url_b"]
            key = (a, b) if (a, b) in planted_set else (b, a)
            if key in planted_set and row["n_words"] >= RUN_WORDS:
                got[key] = row["n_words"]
        recall = len(got) / N_PLANTED
        assert recall >= 0.9, f"span recall {recall:.3f}"
        # spans are exact: a planted pair's maximal common run is the
        # 30-word insert (background words are from a 50k vocab — a
        # longer accidental extension is ~impossible)
        assert all(RUN_WORDS <= n <= RUN_WORDS + 2 for n in got.values())
