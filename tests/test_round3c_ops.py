"""Round-3c operators: domain blocklist, balanced shards, components
carry, dedup recall eval."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_block_verdicts_semantics(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.blocklist import block_verdicts

    urls = [
        "https://tracker.example/x",            # exact depth-2 match
        "https://ads.tracker.example/y",        # subdomain of depth-2
        "https://ads.sub.tracker.example/z",    # deep subdomain of depth-2
        "https://BAD.Tracker.EXAMPLE/case",     # case-folded host
        "https://other.example/ok",             # no match
        "https://cdn.safe.example/a",           # depth-3 exact
        "https://x.cdn.safe.example/b",         # subdomain of depth-3
        "https://safe.example/c",               # parent of a listed depth-3:
                                                # NOT blocked (no upward match)
        "https://notracker.example/d",          # suffix of label, not of
                                                # domain: NOT blocked
        "no-scheme-at-all",                     # unparseable: NOT blocked
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    out = block_verdicts(
        ds, ["tracker.example", "cdn.safe.example"]
    ).take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url["https://tracker.example/x"]["matched_domain"] == "tracker.example"
    assert by_url["https://ads.tracker.example/y"]["blocked"]
    assert by_url["https://ads.sub.tracker.example/z"]["blocked"]
    assert by_url["https://BAD.Tracker.EXAMPLE/case"]["blocked"]
    assert not by_url["https://other.example/ok"]["blocked"]
    assert by_url["https://cdn.safe.example/a"]["matched_domain"] == "cdn.safe.example"
    assert by_url["https://x.cdn.safe.example/b"]["blocked"]
    assert not by_url["https://safe.example/c"]["blocked"]
    assert not by_url["https://notracker.example/d"]["blocked"]
    assert not by_url["no-scheme-at-all"]["blocked"]
    assert by_url["no-scheme-at-all"]["matched_domain"] is None


def test_block_verdicts_deepest_match_wins(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.blocklist import block_verdicts

    ds = ray.data.from_arrow(
        pa.table({"url": pa.array([
            "https://a.b.example/1",   # matches both b.example and a.b.example
            "https://c.b.example/2",   # matches only b.example
        ])})
    )
    out = {r["url"]: r for r in block_verdicts(
        ds, ["b.example", "a.b.example"]
    ).take_all()}
    assert out["https://a.b.example/1"]["matched_domain"] == "a.b.example"
    assert out["https://c.b.example/2"]["matched_domain"] == "b.example"


def test_blocklist_filter_query(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rows = q.blocklist_filter("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    blocked = [r for r in rows if r["blocked"]]
    # src3 + src11 wholly blocked (25 docs each), src0 wholly blocked
    # (25: 3 via the deeper s1.src0.example, 22 via src0.example),
    # s4.src17.example picks the src17 docs with doc_id % 7 == 4
    assert len(blocked) == 78
    assert all(r["matched_domain"] for r in blocked)
    deep = [r for r in blocked if r["matched_domain"] == "s1.src0.example"]
    assert deep and all(r["host"] == "s1.src0.example" for r in deep)
    assert all(not r["blocked"] or "." in r["host"] for r in rows)


# ---------------------------------------------------------------------------
# incremental connected-components carry
# ---------------------------------------------------------------------------


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "url_a": pa.array([a for a, _ in pairs], type=pa.string()),
        "url_b": pa.array([b for _, b in pairs], type=pa.string()),
    }))


def _labels_dict(ds):
    return {r["url"]: r["component_id"] for r in ds.take_all()}


_E1 = [  # prior edges: components {a,b,c}, {d,e}, {f,g,h,i}, singleton j0-j1
    ("u-a", "u-b"), ("u-b", "u-c"),
    ("u-d", "u-e"),
    ("u-f", "u-g"), ("u-g", "u-h"), ("u-h", "u-i"),
    ("u-j0", "u-j1"),
]

_E2 = [  # new edges: fresh-fresh, fresh-prior (non-canonical member!),
    # and a prior-prior bridge that MERGES {a,b,c} with {d,e}
    ("n-x", "n-y"),
    ("n-z", "u-h"),          # attaches via a NON-canonical prior member
    ("u-c", "u-e"),          # merges two prior components
    ("n-w", "n-x"),
]


def test_carry_components_conformance(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.state.carry import carry_components
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges,
    )

    prior = ray.data.from_arrow(components_from_edges(_edges_ds(_E1)))
    carried = _labels_dict(carry_components(prior, _edges_ds(_E2)))
    full = {
        r["url"]: r["component_id"]
        for r in components_from_edges(_edges_ds(_E1 + _E2)).to_pylist()
    }
    assert carried == full  # same url set AND identical min-url labels
    # spot semantics: the bridge merged {a..c} and {d,e} under min url
    assert carried["u-e"] == "u-a"
    # fresh chain n-w/n-x/n-y its own component, n-z joined f..i — and
    # the fresh url is the new lexicographic min of that component
    assert carried["n-y"] == carried["n-w"]
    assert carried["n-z"] == "n-z"
    assert carried["u-f"] == "n-z" and carried["u-i"] == "n-z"


def test_carry_components_labelprop_parity(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.state.carry import carry_components
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges,
    )

    prior = ray.data.from_arrow(components_from_edges(_edges_ds(_E1)))
    a = _labels_dict(carry_components(prior, _edges_ds(_E2)))
    b = _labels_dict(
        carry_components(prior, _edges_ds(_E2), max_driver_edges=0)
    )
    assert a == b


def test_carry_components_edge_cases(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.state.carry import carry_components
    from ordinarydumpdeduplicator_ray.state.unionfind import (
        components_from_edges,
    )

    prior = ray.data.from_arrow(components_from_edges(_edges_ds(_E1)))
    # no new edges -> prior unchanged
    empty = _edges_ds([])
    assert _labels_dict(carry_components(prior, empty)) == _labels_dict(prior)
    # empty prior -> plain components of the new edges
    no_prior = ray.data.from_arrow(pa.table({
        "url": pa.array([], type=pa.string()),
        "component_id": pa.array([], type=pa.string()),
    }))
    got = _labels_dict(carry_components(no_prior, _edges_ds(_E2)))
    want = {
        r["url"]: r["component_id"]
        for r in components_from_edges(_edges_ds(_E2)).to_pylist()
    }
    assert got == want
    # edges entirely INSIDE one prior component -> labels unchanged
    inside = _edges_ds([("u-a", "u-c"), ("u-f", "u-i")])
    assert _labels_dict(carry_components(prior, inside)) == _labels_dict(prior)


def test_near_dup_components_carry_query(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    labels = {
        r["url"]: r["component_id"]
        for r in q.near_dup_components_carry("/root/testdata/sf0.001").take_all()
    }
    assert len(labels) == 244
    # every exact re-crawl landed in its prior original's component
    joined = 0
    for url, lab in labels.items():
        if url.endswith("-recrawl"):
            prior_url = "testdata://prior/" + url.split("/")[-1].split("-")[0]
            assert prior_url in labels, url
            assert labels[prior_url] == lab, (url, lab, labels[prior_url])
            joined += 1
    assert joined >= 20  # %10==0 even doc_ids at sf0.001
    # labels are canonical members of their own component
    for url, lab in labels.items():
        assert lab in labels and labels[lab] == lab


def test_lm_perplexity_brute_force(ray_session, tmp_path):
    """lm_doc_perplexity vs a driver-side brute-force unigram LM on a
    tiny synthetic corpus — head/tail split, OOV mass, nll arithmetic."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import lm_doc_perplexity

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a completely different zebra sentence here",
        "",            # zero tokens
        "the the the",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(texts), type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    top_v = 4
    out = {r["doc_id"]: r for r in
           lm_doc_perplexity(str(tmp_path), top_v=top_v).take_all()}

    # brute force
    import re
    tok = lambda s: re.findall(r"\w+", s.lower())
    from collections import Counter
    c = Counter()
    for t in texts:
        c.update(tok(t))
    total = sum(c.values())
    head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    head_d = dict(head)
    tail_mass = total - sum(head_d.values())
    tail_distinct = len(c) - len(head_d)
    p_oov = tail_mass / (total * tail_distinct)
    for i, t in enumerate(texts):
        toks = tok(t)
        assert out[i]["n_tokens"] == len(toks)
        if not toks:
            assert out[i]["nll_bits"] == 0.0
            continue
        ll = sum(
            math.log2(head_d[w] / total) if w in head_d else math.log2(p_oov)
            for w in toks
        )
        assert abs(out[i]["nll_bits"] - round(-ll / len(toks), 4)) <= 1e-4


def test_soft_dedup_routes_agree(ray_session, tmp_path, monkeypatch):
    """Broadcast and shuffle-join routes of soft_dedup_weights emit
    identical rows (the above-cap fallback is exercised by forcing the
    cap to 0 via the join module constant)."""
    import pyarrow.parquet as pq

    import ordinarydumpdeduplicator_ray.pipelines.queries as qmod
    from ordinarydumpdeduplicator_ray.pipelines.queries import soft_dedup_weights

    texts = [
        "alpha beta gamma delta alpha beta gamma",
        "alpha beta gamma delta epsilon",
        "zeta eta theta",
        "xy",           # < 3 tokens -> zero trigrams
        "alpha beta gamma delta alpha beta gamma",  # exact dup of doc 0
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(texts), type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    def rows(ds):
        return sorted(
            (tuple(r.values()) for r in ds.take_all()),
        )

    fast = rows(soft_dedup_weights(str(tmp_path)))

    import ordinarydumpdeduplicator_ray.stages.join as join_mod
    monkeypatch.setattr(join_mod, "_BROADCAST_JOIN_CAP", 0)
    slow = rows(soft_dedup_weights(str(tmp_path)))
    assert fast == slow
    assert len(fast) == len(texts)
    by_id = {r[0]: r for r in fast}
    assert by_id[3][1] == 0 and by_id[3][4] == 1.0   # zero trigrams
    # the exact-dup pair's trigrams all appear >= 2 times
    assert by_id[0][2] == by_id[0][1]


def test_dsir_weights_semantics(ray_session, tmp_path):
    """English docs must score a higher target/raw log-ratio than the
    non-English slice when the target is the 'en' subset; zero-bigram
    docs get 0.0; output is deterministic."""
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import dsir_weights

    texts = ["the quick brown fox jumps", "le renard brun rapide saute",
             "the lazy dog sleeps", "x"]
    langs = ["en", "fr", "en", "en"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(["s"] * len(texts), type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = {r["doc_id"]: r for r in dsir_weights(str(tmp_path)).take_all()}
    assert out[3]["n_bigrams"] == 0 and out[3]["log_ratio"] == 0.0
    # per-bigram mean ratio: en docs should beat the fr doc
    en_mean = (out[0]["log_ratio"] / out[0]["n_bigrams"]
               + out[2]["log_ratio"] / out[2]["n_bigrams"]) / 2
    fr_mean = out[1]["log_ratio"] / out[1]["n_bigrams"]
    assert en_mean > fr_mean

    again = {r["doc_id"]: r for r in dsir_weights(str(tmp_path)).take_all()}
    assert again == out


def _toy_embeddings(n=120, d=8, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    # three separated blobs + noise
    centers = rng.normal(size=(3, d)) * 4
    rows = centers[np.arange(n) % 3] + rng.normal(size=(n, d)) * 0.3
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32())),
    })


def test_distributed_kmeans_blocking_independent(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        distributed_kmeans,
    )

    tbl = _toy_embeddings()
    outs = []
    for nblocks in (1, 3, 17):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        cents, assigns = distributed_kmeans(ds, k=3, iters=5)
        rows = sorted(
            (r["vec_id"], r["cluster"], r["cos"]) for r in assigns.take_all()
        )
        outs.append((cents.tobytes(), rows))
    assert outs[0] == outs[1] == outs[2]


def test_distributed_kmeans_recovers_blobs(ray_session):
    import numpy as np
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        distributed_kmeans, kmeans_cluster_stats,
    )

    tbl = _toy_embeddings()
    cents, assigns = distributed_kmeans(ray.data.from_arrow(tbl), k=3, iters=8)
    rows = {r["vec_id"]: r["cluster"] for r in assigns.take_all()}
    # ground truth: vec_id % 3 — clusters must be a pure relabeling
    seen = {}
    pure = 0
    for vid, cl in rows.items():
        truth = vid % 3
        seen.setdefault(truth, {}).setdefault(cl, 0)
        seen[truth][cl] += 1
    for truth, dist in seen.items():
        pure += max(dist.values())
    assert pure / len(rows) >= 0.95   # separated blobs: near-perfect
    stats = kmeans_cluster_stats(assigns)
    assert sum(stats["n"].to_pylist()) == len(rows)
    assert all(v > 0.8 for v in stats["mean_cos"].to_pylist())


def test_distributed_kmeans_empty_and_fewer_than_k(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.kmeanslloyd import (
        distributed_kmeans,
    )

    empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    })
    cents, assigns = distributed_kmeans(ray.data.from_arrow(empty), k=4, iters=2)
    assert assigns.count() == 0

    tiny = _toy_embeddings(n=2)
    cents, assigns = distributed_kmeans(ray.data.from_arrow(tiny), k=8, iters=2)
    assert len(cents) == 2 and assigns.count() == 2


def test_lang_length_stats_matches_bruteforce(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import lang_length_stats

    texts, langs = [], []
    for i in range(57):
        texts.append("x" * (i * 7 % 53 + 1))
        langs.append(["en", "de", "fr"][i % 3])
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts), "lang": pa.array(langs),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["lang"]: r for r in lang_length_stats(str(tmp_path)).to_pylist()}
    for lang in ("en", "de", "fr"):
        lens = sorted(len(t) for t, lg in zip(texts, langs) if lg == lang)
        assert out[lang]["n_docs"] == len(lens)
        for q, col in [(0.5, "p50_len"), (0.9, "p90_len"), (0.99, "p99_len")]:
            assert out[lang][col] == lens[max(1, math.ceil(q * len(lens))) - 1]
        assert out[lang]["max_len"] == lens[-1]


def test_threshold_sweep_monotone(ray_session):
    """Raising the Jaccard threshold can only shrink the duplicate
    graph: components, members and reclaimable bytes all non-increasing;
    threshold 1.0 keeps at least the exact-dup edges."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        dedup_threshold_sweep,
    )

    t = dedup_threshold_sweep("/root/testdata/sf0.001").to_pydict()
    for col in ("n_members", "reclaim_bytes"):
        vals = t[col]
        assert all(a >= b for a, b in zip(vals, vals[1:])), (col, vals)
    assert t["n_components"][-1] > 0          # exact dups survive 1.0
    assert t["n_members"][0] >= t["n_members"][-1]


def test_host_profile_zero_dup_host(ray_session, tmp_path):
    """A corpus with no duplicated content yields dup_rate 0 per host."""
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import host_profile

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 4, 5], type=pa.int64()),  # no %3==0: no -copy rows
        "text": pa.array(["aaa", "bbb", "ccc", "ddd"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s1", "s1", "s2", "s2"]),
        "n_chars": pa.array([3, 3, 3, 3], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["host"]: r for r in host_profile(str(tmp_path)).take_all()}
    assert set(out) == {"s1.example", "s2.example"}
    for r in out.values():
        assert r["n_pages"] == 2 and r["n_dup_pages"] == 0
        assert r["dup_rate"] == 0.0 and r["mean_len"] == 3.0


def test_novelty_scores_routes_and_semantics(ray_session, tmp_path, monkeypatch):
    """Unchanged docs score 0 novelty; a fully-new doc scores 1.0; the
    broadcast and anti-join routes agree."""
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import novelty_scores

    # doc_ids chosen so snapshots overlap: %11 and %13 keep most rows
    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "one two three four five six",
        3: "shared words stay shared here always",
        7: "seven words change under the update rule",  # %7==0 -> edited in cur
        5: "completely different text lives here now",
    }
    tbl = pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values())),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(v) for v in texts.values()], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    fast = rows(novelty_scores(str(tmp_path)))
    import ordinarydumpdeduplicator_ray.stages.join as join_mod
    monkeypatch.setattr(join_mod, "_BROADCAST_JOIN_CAP", 0)
    slow = rows(novelty_scores(str(tmp_path)))
    assert fast == slow

    by_url = {r[0]: r for r in fast}
    unchanged = "testdata://documents/00000001"
    assert by_url[unchanged][3] == 0.0           # novelty
    edited = "testdata://documents/00000007"
    assert by_url[edited][3] > 0.0               # ' updated' suffix is new


def test_dedup_method_matrix_exact_flags(ray_session):
    """Exact flags must equal the brute-force sha-dup set of the
    injected corpus; near methods must cover the -near planted copies."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        dedup_method_matrix,
    )

    rows = dedup_method_matrix("/root/testdata/sf0.001").take_all()
    by_url = {r["url"]: r for r in rows}
    for r in rows:
        u = r["url"]
        if u.endswith("-copy"):
            assert r["by_exact"], u
            assert by_url[u[:-5]]["by_exact"], u
        if u.endswith("-near"):
            assert r["by_minhash"] or r["by_simhash"] or r["by_winnow"], u
    n_flagged = sum(1 for r in rows if r["n_methods"] > 0)
    assert n_flagged >= sum(1 for r in rows if r["url"].endswith(("-copy", "-near")))


def test_intra_dup_rate_planted_repetition(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import intra_dup_stats

    texts = [
        "a b c a b c a b c a b c",   # one trigram window repeating
        "one two three four five",   # all distinct
        "xy",                        # < 3 tokens
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": pa.array(texts), "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in intra_dup_stats(str(tmp_path)).take_all()}
    # doc 0: 10 trigram windows over the cycle a b c -> only 3 distinct
    assert out[0]["n_trigrams"] == 10 and out[0]["n_distinct"] == 3
    assert out[1]["n_distinct"] == out[1]["n_trigrams"] == 3
    assert out[1]["intra_dup_rate"] == 0.0
    assert out[2]["n_trigrams"] == 0 and out[2]["intra_dup_rate"] == 0.0


def test_task_failure_retry_preserves_results(ray_session, tmp_path):
    """Kill the first attempt of one signature task mid-pipeline: Ray's
    task retry must re-run it and the flagship output must be
    bit-identical to an undisturbed run — the worker-crash story a
    256-node deployment depends on."""
    import os

    import ray.data

    from ordinarydumpdeduplicator_ray.sources.synth import generate_pages
    from ordinarydumpdeduplicator_ray.pipelines.dedup import DedupPipeline
    from ordinarydumpdeduplicator_ray.config import DedupConfig

    pages, _ = generate_pages(200, seed=7)

    marker = str(tmp_path / "failed_once")

    def chaos(t: pa.Table) -> pa.Table:
        # first task attempt anywhere in the cluster trips the marker
        # and HARD-KILLS its worker process (a user exception would not
        # be retried; a process death is a system failure and is);
        # every retry (and every other task) passes through
        if not os.path.exists(marker):
            try:
                with open(marker, "x") as f:
                    f.write("x")
            except FileExistsError:
                return t
            os._exit(1)  # simulated worker crash
        return t

    def run(with_chaos: bool):
        ds = ray.data.from_arrow(pages)
        if with_chaos:
            ds = ds.map_batches(chaos, batch_format="pyarrow", batch_size=64)
        out = DedupPipeline(
            DedupConfig(sig_concurrency=2), num_partitions=4
        ).run(ds)
        comp = sorted(
            (r["url"], r["component_id"]) for r in out["components"].take_all()
        )
        exact = sorted(
            tuple(sorted(r.items())) for r in out["groups_exact"].take_all()
        )
        return comp, exact

    clean = run(False)
    disturbed = run(True)
    assert os.path.exists(marker), "chaos task never ran"
    assert clean == disturbed


def test_token_search_prunes_to_one_bucket(ray_session, tmp_path):
    """Index build writes 16 bucket partitions; a lookup touches only
    the term's bucket and returns exact tf counts."""
    import os

    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        _TOKEN_INDEX_BUCKETS, _token_index_dir, token_search,
    )

    texts = ["alpha beta alpha", "beta gamma", "alpha alpha alpha", "delta"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts), "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    idx = _token_index_dir(str(tmp_path))
    parts = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert parts and len(parts) <= _TOKEN_INDEX_BUCKETS

    out = {r["doc_id"]: r for r in
           token_search(str(tmp_path), term="alpha").take_all()}
    assert set(out) == {0, 2}
    assert out[0]["tf"] == 2 and out[2]["tf"] == 3

    assert token_search(str(tmp_path), term="zzz_absent").count() == 0


def test_corpus_rollup_sets_subtotals(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        corpus_rollup_sets,
    )

    tbl = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(["x"] * 6),
        "lang": pa.array(["en", "en", "en", "de", "de", "fr"]),
        "source": pa.array(["a", "a", "b", "a", "a", "b"]),
        "n_chars": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    rows = corpus_rollup_sets(str(tmp_path)).take_all()
    by = {(r["grouping_level"], r["lang"], r["source"]): r for r in rows}
    assert by[("lang_source", "en", "a")]["n_docs"] == 2
    assert by[("lang_source", "en", "a")]["sum_chars"] == 30
    assert by[("lang", "en", None)]["n_docs"] == 3
    assert by[("lang", "de", None)]["sum_chars"] == 90
    assert by[("all", None, None)]["n_docs"] == 6
    assert by[("all", None, None)]["mean_chars"] == 35.0
    assert len(rows) == 4 + 3 + 1


def test_pagerank_blocking_independent_and_sane(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.state.pagerank import pagerank

    # star around 'hub' + a disjoint pair: hub must outrank everything
    pairs = [("hub", f"leaf{i}") for i in range(8)] + [("p1", "p2")]
    def edges(nblocks):
        t = pa.table({
            "url_a": pa.array([a for a, _ in pairs]),
            "url_b": pa.array([b for _, b in pairs]),
        })
        return ray.data.from_arrow(t).repartition(nblocks)

    outs = []
    for nb in (1, 3, 7):
        tbl = pagerank(edges(nb))
        outs.append(sorted(zip(tbl["url"].to_pylist(),
                               tbl["rank"].to_pylist())))
    assert outs[0] == outs[1] == outs[2]
    ranks = dict(outs[0])
    assert ranks["hub"] > max(v for k, v in ranks.items() if k != "hub")
    assert abs(sum(ranks.values()) - 1.0) < 0.01

    empty = pagerank(ray.data.from_arrow(pa.table({
        "url_a": pa.array([], type=pa.string()),
        "url_b": pa.array([], type=pa.string()),
    })))
    assert len(empty) == 0


def test_compact_parquet_dir(ray_session, tmp_path):
    """40 tiny shards -> few target-sized files; rows and content
    preserved exactly (order-insensitive digest)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.compact import (
        compact_parquet_dir,
    )

    src = tmp_path / "shards"
    src.mkdir()
    rows = []
    for i in range(40):
        t = pa.table({
            "k": pa.array([i * 10 + j for j in range(10)], type=pa.int64()),
            "v": pa.array([f"row{i}-{j}" for j in range(10)]),
        })
        rows.extend(zip(t["k"].to_pylist(), t["v"].to_pylist()))
        pq.write_table(t, src / f"part-{i:04d}.parquet")

    out = tmp_path / "compacted"
    stats = compact_parquet_dir(str(src), str(out), target_mb=256)
    assert stats["n_files_before"] == 40
    assert stats["n_files_after"] < 40
    assert stats["n_rows"] == 400

    got = sorted(
        (r["k"], r["v"])
        for r in ray.data.read_parquet(str(out)).take_all()
    )
    assert got == sorted(rows)
    # crashed-run residue is cleaned by the atomic-rename protocol
    assert not os.path.exists(str(out) + ".compacting")


def test_token_index_append_and_compact(ray_session, tmp_path):
    """Append adds postings without touching existing files; lookup
    sees the union; compaction of a fragmented bucket preserves it."""
    import os

    import ray.data

    from ordinarydumpdeduplicator_ray.sources.compact import (
        compact_parquet_dir,
    )
    from ordinarydumpdeduplicator_ray.sources.tokenindex import (
        append_token_index, build_token_index, lookup_postings,
        token_bucket,
    )

    def docs(rows):
        return ray.data.from_arrow(pa.table({
            "url": pa.array([u for u, _ in rows]),
            "text": pa.array([t for _, t in rows]),
        }))

    idx = str(tmp_path / "idx")
    build_token_index(docs([("u1", "apple banana apple"),
                            ("u2", "banana cherry")]), idx, key_col="url")

    bucket_dir = os.path.join(idx, f"bucket={token_bucket('apple')}")
    before = set(os.listdir(bucket_dir))

    n = append_token_index(
        idx, docs([("u3", "apple apple apple"), ("u4", "durian")]),
        key_col="url",
    )
    assert n == 2  # (u3, apple) and (u4, durian) postings
    after = set(os.listdir(bucket_dir))
    assert before <= after and len(after) > len(before)  # delta files added

    got = {r["key"]: r["tf"]
           for r in lookup_postings(idx, "apple").take_all()}
    assert got == {"u1": 2, "u3": 3}

    # compact the fragmented bucket in place (write to sibling, swap)
    stats = compact_parquet_dir(bucket_dir, bucket_dir + ".c", target_mb=64)
    os.rename(bucket_dir, bucket_dir + ".old")
    os.rename(bucket_dir + ".c", bucket_dir)
    got2 = {r["key"]: r["tf"]
            for r in lookup_postings(idx, "apple").take_all()}
    assert got2 == got
    assert stats["n_files_after"] <= stats["n_files_before"]


def test_leakage_safe_split_no_leaks(ray_session):
    """Under the content-keyed split, no sha can span two splits; the
    url-keyed split on the same corpus DOES leak (sanity contrast)."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        corpus_split, leakage_safe_split, _meta_pages,
    )

    sf = "/root/testdata/sf0.001"
    texts = {r["url"]: r["text"]
             for r in _meta_pages(sf).take_all()}

    def leaks(ds):
        by_sha = {}
        for r in ds.take_all():
            import hashlib
            sha = hashlib.sha256((texts[r["url"]] or "").encode()).hexdigest()
            by_sha.setdefault(sha, set()).add(r["split"])
        return sum(1 for v in by_sha.values() if len(v) > 1)

    assert leaks(leakage_safe_split(sf)) == 0
    assert leaks(corpus_split(sf)) > 0   # the url-keyed split leaks


def test_component_safe_split_seals_near_dups(ray_session):
    """Every flagship component's members land in ONE split; the
    content-keyed split cannot guarantee that for near (non-exact)
    dups."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        _flagship, component_safe_split,
    )

    sf = "/root/testdata/sf0.001"
    comp = {r["url"]: r["component_id"]
            for r in _flagship(sf)["components"].take_all()}
    split = {r["url"]: r["split"]
             for r in component_safe_split(sf).take_all()}
    by_comp = {}
    for url, cid in comp.items():
        by_comp.setdefault(cid, set()).add(split[url])
    assert all(len(v) == 1 for v in by_comp.values())
    # flags agree with membership
    flagged = {r["url"]: r["in_component"]
               for r in component_safe_split(sf).take_all()}
    assert all(flagged[u] for u in comp)


def test_lookup_postings_quote_safe(ray_session, tmp_path):
    """ADVICE round 4: lookup terms are matched with a compute
    predicate, so a term containing a quote neither crashes nor
    changes the filter's meaning."""
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.tokenindex import (
        build_token_index, lookup_postings,
    )

    idx = str(tmp_path / "idx")
    build_token_index(
        ray.data.from_arrow(pa.table({
            "url": pa.array(["u1"]), "text": pa.array(["apple banana"]),
        })),
        idx, key_col="url",
    )
    # malicious / odd terms: must return empty, never raise
    for term in ["it's", "x' OR '1'=='1", "don''t"]:
        assert lookup_postings(idx, term).count() == 0
    assert lookup_postings(idx, "apple").count() == 1


def test_grouped_percentiles_ignore_null_values(ray_session):
    """ADVICE round 4: value-nulls are excluded (SQL percentile_disc
    semantics) and per-group counts shrink accordingly."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.quantiles import (
        exact_percentiles, grouped_exact_percentiles,
    )

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 3 + [None]),
        "v": pa.array([10, None, 30, 20, None, 5, 15, 7], type=pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = grouped_exact_percentiles(ds, "k", "v", [0.5]).to_pylist()
    rows = {r["k"]: r for r in out}
    # group a: valid values [10, 20, 30] -> n=3, p50=20, max=30
    assert rows["a"]["n"] == 3 and rows["a"]["q0.5"] == 20
    assert rows["a"]["max"] == 30
    # group b: valid values [5, 15] -> n=2, p50=5, max=15
    assert rows["b"]["n"] == 2 and rows["b"]["q0.5"] == 5
    assert rows["b"]["max"] == 15
    assert None not in rows  # null keys still excluded

    glob = exact_percentiles(ds, "v", [0.5, 1.0])
    # global valid values sorted: [5, 7, 10, 15, 20, 30] -> p50=10
    assert glob[0.5] == 10 and glob[1.0] == 30


def test_file_state_chain_semantics(ray_session):
    """N-snapshot chain: new/unchanged/modified transitions, removed
    synthesis after gaps and at end-of-presence, reappearance as new —
    verified against a brute-force per-url chain walk; run twice at
    different block counts to exercise the border-run reconciliation."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.snapshot import file_state_chain

    # url -> list of (snap_id, text); absence = removed
    timeline = {
        "u-always": [(0, "a"), (1, "a"), (2, "b")],       # unchanged, modified
        "u-gone": [(0, "x")],                              # removed at 1
        "u-gap": [(0, "g"), (2, "g2")],                    # removed at 1, new at 2
        "u-late": [(2, "z")],                              # new at 2
        "u-mid": [(1, "m"), (2, "m")],                     # new, unchanged
    }

    def snap(i, blocks):
        rows = [(u, t) for u, evs in timeline.items()
                for s, t in evs if s == i]
        tbl = pa.table({
            "url": pa.array([u for u, _ in rows]),
            "text": pa.array([t for _, t in rows]),
        })
        return ray.data.from_arrow(tbl).repartition(blocks)

    import hashlib
    sha = lambda t: hashlib.sha256(t.encode()).hexdigest()

    expect = set()
    n_snaps = 3
    for u, evs in timeline.items():
        evs = sorted(evs)
        prev_s, prev_h = None, None
        for s, t in evs:
            h = sha(t)
            if prev_s is None or s > prev_s + 1:
                if prev_s is not None:
                    expect.add((u, prev_s + 1, "removed", None, prev_h))
                expect.add((u, s, "new", h, None))
            else:
                st = "unchanged" if h == prev_h else "modified"
                expect.add((u, s, st, h, prev_h))
            prev_s, prev_h = s, h
        if prev_s < n_snaps - 1:
            expect.add((u, prev_s + 1, "removed", None, prev_h))

    for blocks in (1, 4):
        out = file_state_chain([snap(i, blocks) for i in range(3)])
        got = {(r["url"], r["snap_id"], r["status"], r["sha"], r["sha_prev"])
               for r in out.take_all()}
        assert got == expect, f"blocks={blocks}"


def test_near_dup_recall_meets_north_rule(ray_session):
    """The flagship recovers >=0.99 of the injected truth pairs — the
    north rule's recall bar measured by the operator itself."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import near_dup_recall

    rows = {r["kind"]: r for r in
            near_dup_recall("/root/testdata/sf0.001").to_pylist()}
    assert set(rows) == {"exact", "near"}
    for r in rows.values():
        assert r["n_pairs"] > 0
        assert r["recall"] >= 0.99
    assert rows["exact"]["recall"] == 1.0  # sha-exact pairs never miss


def test_near_dup_actions_by_quality(ray_session):
    """Quality-keeper actions: exactly one keep per component, the
    keeper has the component's max quality (ties min url), isolates
    point at the keeper."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        near_dup_actions_by_quality, near_dup_components,
    )

    sf = "/root/testdata/sf0.001"
    rows = near_dup_actions_by_quality(sf).take_all()
    assert rows
    comp_n = near_dup_components(sf).count()
    assert len(rows) == comp_n  # one verdict per component member
    by_g = {}
    for r in rows:
        by_g.setdefault(r["group_key"], []).append(r)
    for g, members in by_g.items():
        keeps = [r for r in members if r["action"] == "keep"]
        assert len(keeps) == 1
        k = keeps[0]
        best_q = max(r["quality"] for r in members)
        assert k["quality"] == best_q
        ties = sorted(r["url"] for r in members if r["quality"] == best_q)
        assert k["url"] == ties[0]  # min-url tie break
        assert k["url"] == g


def test_warc_roundtrip(ray_session, tmp_path):
    """WARC write -> read preserves url/ts/payload; non-response
    records are skipped; truncation raises (never silently drops)."""
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.warc import (
        BadWarcRecord,
        build_warc_bytes,
        parse_warc_bytes,
        read_pages_warc,
        write_pages_warc,
    )

    rows = [
        ("https://a.example/1", 1_735_689_600_000_000, b"<html>hi one</html>"),
        ("https://a.example/2", 1_735_689_601_000_000,
         b"body with \r\n\r\n separator inside"),
    ]
    blob = build_warc_bytes(rows)
    # splice a warcinfo record in front: must be skipped
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"info\r\n\r\n")
    parsed = parse_warc_bytes(info + blob)
    assert [(u, t, b) for u, t, b in parsed] == rows  # payload exact

    with pytest.raises(BadWarcRecord):
        parse_warc_bytes(blob[:-20])  # truncated body

    out = str(tmp_path / "warc")
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], type=pa.binary()),
    }))
    assert write_pages_warc(ds, out) == 2
    got = sorted(read_pages_warc(out).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in got] == [r[0] for r in rows]
    assert [r["html"] for r in got] == [r[2] for r in rows]
    assert all(r["text"] is None for r in got)
    # warc_ts round-trips at second precision as true UTC (timegm on
    # write, timegm on parse — no local-timezone reinterpretation)
    import calendar as _cal
    got_us = [_cal.timegm(r["warc_ts"].timetuple()) * 1_000_000
              for r in got]
    assert got_us == [(r[1] // 1_000_000) * 1_000_000 for r in rows]


def test_host_boilerplate_scoping(ray_session):
    """A line repeated on two pages of the SAME host is boilerplate
    (removed); the same line on pages of two DIFFERENT hosts is
    content (kept) — the distinction vs corpus-wide line_dedup."""
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.linededup import (
        host_boilerplate_dedup,
    )

    nav = "home products about contact"
    pages = pa.table({
        "url": pa.array([
            "https://a.example/1", "https://a.example/2",
            "https://b.example/1",
        ]),
        "text": pa.array([
            nav + "\nunique alpha text",
            nav + "\nunique beta text",
            nav + "\nunique gamma text",
        ]),
    })
    out = {r["url"]: r for r in host_boilerplate_dedup(
        ray.data.from_arrow(pages), mode="newline", num_partitions=2,
    ).take_all()}
    # host a: nav on 2 pages -> removed from both
    assert out["https://a.example/1"]["text_dedup"] == "unique alpha text"
    assert out["https://a.example/2"]["text_dedup"] == "unique beta text"
    assert out["https://a.example/1"]["n_removed"] == 1
    # host b: nav appears on ONE page of b only -> kept
    assert out["https://b.example/1"]["text_dedup"] == nav + "\nunique gamma text"
    assert out["https://b.example/1"]["n_removed"] == 0


def test_persisted_ivf_index(ray_session, tmp_path):
    """Persisted IVF lifecycle: full-probe search equals the exact
    brute-force top-k bit-for-bit; bounded-probe search reads fewer
    partitions and still recovers most of the true top-k; the index
    layout is deterministic (rebuild -> identical manifest)."""
    from ordinarydumpdeduplicator_ray.pipelines.queries import (
        _query_vec, knn_cosine_vec0,
    )
    from ordinarydumpdeduplicator_ray.sources.pages import read_parquet_clean
    from ordinarydumpdeduplicator_ray.state.annindex import (
        build_ivf_index,
        search_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    emb = read_parquet_clean(sf + "/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    man = build_ivf_index(emb, idx, n_centroids=8, iters=3)
    assert man["n_centroids"] >= 1

    q = _query_vec(sf)
    exact = knn_cosine_vec0(sf).to_pylist()
    full = search_ivf_index(idx, q, k=10, nprobe=None, exclude_id=0).to_pylist()
    assert full == exact  # full probe == brute force, bit-for-bit

    probed = search_ivf_index(idx, q, k=10, nprobe=2, exclude_id=0).to_pylist()
    hit = len({r["vec_id"] for r in probed} & {r["vec_id"] for r in exact})
    assert hit >= 5  # bounded probe still recovers most of the top-k

    man2 = build_ivf_index(emb, str(tmp_path / "ivf2"), n_centroids=8, iters=3)
    assert man2 == man  # deterministic rebuild


def test_pagerank_distributed_route_parity(ray_session):
    """The partitioned-rank-vector route (above-cap fallback) must be
    BIT-identical to the broadcast route — same integer recurrence,
    commutative int64 partials — on a graph with a hub, a chain, a
    triangle and parallel edges, across several edge blockings."""
    import ray.data

    from ordinarydumpdeduplicator_ray.state.pagerank import pagerank

    pairs = (
        [("hub", f"leaf{i}") for i in range(6)]
        + [(f"c{i}", f"c{i+1}") for i in range(5)]
        + [("t0", "t1"), ("t1", "t2"), ("t2", "t0")]
        + [("p1", "p2"), ("p1", "p2")]  # parallel edge: degree counts it
    )
    t = pa.table({
        "url_a": pa.array([a for a, _ in pairs]),
        "url_b": pa.array([b for _, b in pairs]),
    })

    def snap(route, nblocks):
        tbl = pagerank(
            ray.data.from_arrow(t).repartition(nblocks), iters=7, route=route
        )
        return sorted(zip(tbl["url"].to_pylist(), tbl["rank"].to_pylist()))

    want = snap("broadcast", 3)
    assert snap("distributed", 1) == want
    assert snap("distributed", 5) == want

    # above the cap the Table-returning wrapper must REFUSE the
    # O(nodes) driver pull and name the partitioned consumer path
    import ordinarydumpdeduplicator_ray.state.pagerank as pr

    orig_cap = pr._MAX_BROADCAST_NODES
    pr._MAX_BROADCAST_NODES = 1
    try:
        with pytest.raises(ValueError, match="pagerank_distributed"):
            snap("auto", 3)
    finally:
        pr._MAX_BROADCAST_NODES = orig_cap

    # empty edges: schema-correct empty result on the distributed route
    from ordinarydumpdeduplicator_ray.state.pagerank import (
        pagerank_distributed,
    )

    empty = pagerank_distributed(ray.data.from_arrow(pa.table({
        "url_a": pa.array([], type=pa.string()),
        "url_b": pa.array([], type=pa.string()),
    })))
    assert empty.count() == 0
    assert empty.schema().base_schema.names == ["url", "rank"]


def test_dup_graph_hubs_distributed_topk_parity(ray_session):
    """Above the pagerank broadcast cap, dup_graph_hubs must switch to
    the per-block top-k over the partitioned rank Dataset and return
    the exact same rows as the driver path."""
    import ordinarydumpdeduplicator_ray.state.pagerank as pr
    from ordinarydumpdeduplicator_ray.pipelines.queries import dup_graph_hubs

    sf = "/root/testdata/sf0.001"
    want = dup_graph_hubs(sf).to_pylist()
    orig = pr._MAX_BROADCAST_NODES
    pr._MAX_BROADCAST_NODES = 1
    try:
        got = dup_graph_hubs(sf).to_pylist()
    finally:
        pr._MAX_BROADCAST_NODES = orig
    assert got == want
    assert len(want) > 0


def test_build_token_index_rebuild_replaces_stale(ray_session, tmp_path):
    """Rebuilding over an existing index must serve the NEW corpus —
    the pre-fix 'concurrent builder won' branch silently kept the
    stale index on every rebuild."""
    import ray.data
    from ordinarydumpdeduplicator_ray.sources.tokenindex import (
        build_token_index,
        lookup_postings,
    )

    def docs(rows):
        return ray.data.from_arrow(pa.table({
            "url": pa.array([u for u, _ in rows], type=pa.string()),
            "text": pa.array([t for _, t in rows], type=pa.string()),
        }))

    idx = str(tmp_path / "idx")
    build_token_index(docs([("u1", "alpha beta")]), idx, key_col="url")
    assert lookup_postings(idx, "alpha").count() == 1
    build_token_index(docs([("u2", "gamma delta")]), idx, key_col="url")
    assert lookup_postings(idx, "gamma").count() == 1
    assert lookup_postings(idx, "alpha").count() == 0


def test_append_token_index_empty_delta_noop(ray_session, tmp_path):
    import ray.data
    from ordinarydumpdeduplicator_ray.sources.tokenindex import (
        append_token_index,
        build_token_index,
        lookup_postings,
    )

    idx = str(tmp_path / "idx")
    build_token_index(ray.data.from_arrow(pa.table({
        "url": pa.array(["u1"], type=pa.string()),
        "text": pa.array(["alpha"], type=pa.string()),
    })), idx, key_col="url")
    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string()),
    }))
    assert append_token_index(idx, empty, key_col="url") == 0
    assert lookup_postings(idx, "alpha").count() == 1


def test_winnow_duplicate_url_rows(ray_session):
    """Exact re-crawl rows (same url, same text) must collapse, not
    crash with a bogus SipHash-collision error; same url with
    DIFFERENT texts raises the ambiguity error."""
    import ray.data
    from ordinarydumpdeduplicator_ray.stages.winnowpairs import (
        winnow_containment_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    tbl = pa.table({
        "url": pa.array(["u1", "u1", "u2"], type=pa.string()),
        "text": pa.array([base, base, base + " extra tail"], type=pa.string()),
    })
    out = winnow_containment_pairs(
        ray.data.from_arrow(tbl), threshold=0.3, num_partitions=2,
        concurrency=1,
    ).take_all()
    assert {(r["url_a"], r["url_b"]) for r in out} == {("u1", "u2")}
    assert len(out) == 1  # the duplicate row did not double the pair

    bad = pa.table({
        "url": pa.array(["u1", "u1", "u2"], type=pa.string()),
        "text": pa.array([base, "entirely different words here",
                          base], type=pa.string()),
    })
    with pytest.raises(ValueError, match="DIFFERENT texts"):
        winnow_containment_pairs(
            ray.data.from_arrow(bad), threshold=0.3, num_partitions=2,
            concurrency=1,
        ).take_all()


def test_semantic_dedup_empty_input(ray_session):
    import ray.data
    from ordinarydumpdeduplicator_ray.stages.semdedup import semantic_dedup

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64())),
    }))
    assert semantic_dedup(empty).count() == 0


def test_average_hash_tiny_images_content_dependent():
    import numpy as np
    from ordinarydumpdeduplicator_ray.functions.imagecodec import average_hash

    rnd1 = (np.arange(48).reshape(4, 4, 3) * 17 % 256).astype(np.uint8)
    rnd2 = (np.arange(48).reshape(4, 4, 3) * 31 % 256).astype(np.uint8)
    assert average_hash(rnd1) != average_hash(rnd2)  # pre-fix: both 0
    assert average_hash(rnd1) == average_hash(rnd1)


def test_warc_ts_fractional_seconds():
    from ordinarydumpdeduplicator_ray.sources.warc import _parse_warc_ts

    assert _parse_warc_ts("2024-05-01T12:00:00Z") == 1714564800000000
    assert _parse_warc_ts("2024-05-01T12:00:00.123Z") == 1714564800123000
    assert _parse_warc_ts("2024-05-01T12:00:00.123456789Z") == 1714564800123456
    assert _parse_warc_ts("not a date") is None


def test_disc_rank_matches_duckdb_percentile_disc():
    """The float-exactness fix: smallest k with k/n >= q compared in
    doubles (cume_dist semantics) — ceil(q*n) alone returns rank 56 for
    q=0.55, n=100 where SQL returns 55."""
    import duckdb

    from ordinarydumpdeduplicator_ray.stages.quantiles import _disc_rank

    con = duckdb.connect()
    for n in (10, 100, 997):
        for q in (0.01, 0.07, 0.14, 0.28, 0.5, 0.55, 0.56, 0.75, 0.95, 1.0):
            want = con.execute(
                f"SELECT percentile_disc({q}) WITHIN GROUP (ORDER BY x) "
                f"FROM (SELECT unnest(range(1,{n+1})) x)"
            ).fetchone()[0]
            assert _disc_rank(q, n) == want, (q, n)


def test_prefix_explode_slash_free_batch(ray_session):
    """Urls with no '/' anywhere must not crash the prefix explode."""
    from ordinarydumpdeduplicator_ray.stages.rollup import (
        explode_url_prefix_levels,
    )

    rows, levels, prefixes = explode_url_prefix_levels(
        pa.array(["mailto:x", "urn:y"], type=pa.string())
    )
    assert list(rows) == [0, 1]
    assert list(levels) == [1, 1]
    assert prefixes.to_pylist() == ["mailto:x", "urn:y"]


def test_ivf_index_rebuild_no_stale_vectors(ray_session, tmp_path):
    """Rebuilding an IVF index into the same dir must not leave the
    previous build's partition files behind."""
    import numpy as np
    import ray.data

    from ordinarydumpdeduplicator_ray.state.annindex import (
        build_ivf_index,
        search_ivf_index,
    )

    def emb(ids):
        rng = np.random.default_rng(5)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, rng.standard_normal(8))) for _ in ids],
                type=pa.list_(pa.float64()),
            ),
        }))

    idx = str(tmp_path / "ivf")
    build_ivf_index(emb(list(range(50))), idx, n_centroids=4)
    build_ivf_index(emb(list(range(100, 120))), idx, n_centroids=4)
    rng = np.random.default_rng(5)
    hits = search_ivf_index(idx, rng.standard_normal(8), k=20, nprobe=4)
    got_ids = {r["vec_id"] for r in hits.to_pylist()}
    assert got_ids and all(i >= 100 for i in got_ids), got_ids
