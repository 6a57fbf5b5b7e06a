"""HyperLogLog sketch (functions/hll.py): accuracy bound, merge
associativity/partition-independence, and the locked query digest."""

from __future__ import annotations

import numpy as np

from ordinarydumpdeduplicator_ray.functions.hll import (
    hll_estimate,
    hll_merge,
    hll_new,
    hll_update,
)


def _hash64(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_hll_accuracy_bound():
    """p=14 standard error is ~0.8%; assert 3 sigma over several
    cardinalities and seeds."""
    for n in (1_000, 50_000, 500_000):
        for seed in (1, 2, 3):
            h = _hash64(n, seed)
            regs = hll_new()
            hll_update(regs, h)
            est = hll_estimate(regs)
            assert abs(est - n) / n < 0.025, (n, seed, est)


def test_hll_duplicates_do_not_inflate():
    h = _hash64(10_000, 7)
    regs1 = hll_new()
    hll_update(regs1, h)
    regs2 = hll_new()
    hll_update(regs2, np.tile(h, 5))  # every value 5x
    assert hll_estimate(regs1) == hll_estimate(regs2)


def test_hll_merge_equals_single_pass():
    """Registers from any partitioning merge to the single-pass
    registers bit-for-bit (commutative max)."""
    h = _hash64(100_000, 11)
    single = hll_new()
    hll_update(single, h)
    rng = np.random.default_rng(13)
    order = rng.permutation(len(h))
    parts = []
    for chunk in np.array_split(h[order], 17):
        r = hll_new()
        hll_update(r, chunk)
        parts.append(r)
    merged = hll_merge(parts)
    assert np.array_equal(merged, single)


def test_hll_small_range_linear_counting():
    h = _hash64(30, 19)
    regs = hll_new()
    hll_update(regs, h)
    assert abs(hll_estimate(regs) - 30) < 2


def test_lang_distinct_token_estimates(ray_session, tmp_path):
    """Per-group HLL: estimates within 3 sigma of exact per-lang
    distinct-token counts on a synthetic corpus with a REAL vocabulary
    spread, and identical across partitionings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    rng = np.random.default_rng(29)
    rows_lang, rows_text = [], []
    vocab_size = {"aa": 400, "bb": 4000}
    for lang, v in vocab_size.items():
        for _ in range(200):
            toks = rng.integers(0, v, size=40)
            rows_lang.append(lang)
            rows_text.append(" ".join(f"{lang}tok{t}" for t in toks))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows_lang)), type=pa.int64()),
            "lang": pa.array(rows_lang, type=pa.string()),
            "text": pa.array(rows_text, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = {
        r["lang"]: r["distinct_tokens_est"]
        for r in q.lang_distinct_token_estimates(str(tmp_path)).take_all()
    }
    exact = {
        lang: len({t for l2, txt in zip(rows_lang, rows_text) if l2 == lang
                   for t in txt.split(" ")})
        for lang in vocab_size
    }
    for lang in vocab_size:
        assert abs(got[lang] - exact[lang]) / exact[lang] < 0.05, (
            lang, got[lang], exact[lang]
        )
    got2 = {
        r["lang"]: r["distinct_tokens_est"]
        for r in q.lang_distinct_token_estimates(str(tmp_path)).take_all()
    }
    assert got == got2


def test_lang_distinct_token_estimates_locked(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    got = sorted(
        (r["lang"], r["distinct_tokens_est"])
        for r in q.lang_distinct_token_estimates("/root/testdata/sf0.01").take_all()
    )
    assert got == [("de", 31), ("en", 31), ("es", 31), ("fr", 31), ("zh", 31)]


def test_distinct_text_estimate_locked(ray_session):
    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    t = q.distinct_text_estimate("/root/testdata/sf0.01").to_pydict()
    assert t == {"n_rows": [767], "distinct_estimate": [595]}
    # sf0.001: error vs exact distinct stays under 3 sigma (~2.5%)
    t2 = q.distinct_text_estimate("/root/testdata/sf0.001").to_pydict()
    exact = (
        q.dup_corpus("/root/testdata/sf0.001", near=True)
        .groupby("text")
        .count()
        .count()
    )
    est = t2["distinct_estimate"][0]
    assert abs(est - exact) / exact < 0.025
