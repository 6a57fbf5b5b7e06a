"""Tiered dedup (pipelines/tiered.py) — brute-force tier oracle and
composition invariants."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ordinarydumpdeduplicator_ray.functions.urlnorm import normalize_url
from ordinarydumpdeduplicator_ray.pipelines.tiered import tiered_dedup


def _pages(rows):
    urls = [u for u, _ in rows]
    texts = [t for _, t in rows]
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, type=pa.string()),
        "html": pa.nulls(len(urls), type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
    }))


def _brute_tiers(rows, near_groups):
    """Pure-python tier oracle. ``near_groups``: list of url sets the
    near engine must merge (constructed far above the Jaccard margin so
    LSH recall is exact)."""
    verdicts = {}
    # tier 1
    by_norm = {}
    for u, _ in rows:
        by_norm.setdefault(normalize_url(u), []).append(u)
    surv = set()
    for g in by_norm.values():
        canon = min(g)
        surv.add(canon)
        for u in g:
            if u != canon:
                verdicts[u] = ("url_dup", 1)
    # tier 2
    by_sha = {}
    texts = dict(rows)
    for u in surv:
        sha = hashlib.sha256((texts[u] or "").encode()).hexdigest()
        by_sha.setdefault(sha, []).append(u)
    surv2 = set()
    for g in by_sha.values():
        canon = min(g)
        surv2.add(canon)
        for u in g:
            if u != canon:
                verdicts[u] = ("exact_dup", 2)
    # tier 3
    for grp in near_groups:
        members = sorted(grp & surv2)
        for u in members[1:]:
            verdicts[u] = ("near_dup", 3)
    for u, _ in rows:
        verdicts.setdefault(u, ("kept", 0))
    return verdicts


def test_tiered_dedup_vs_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    base_texts = {}
    for i in range(25):
        txt = " ".join(rng.choice(vocab, size=100))
        base_texts[i] = txt
        rows.append((f"https://ex.org/{i:04d}?a=1&b=2", txt))
    # tier-1 victims: messy url variants of docs 0,4,8 (same text)
    for i in (0, 4, 8):
        rows.append((f"https://EX.ORG/{i:04d}/?b=2&a=1&utm_x=1#f", base_texts[i]))
    # tier-2 victims: exact copies under distinct paths for docs 1,5
    for i in (1, 5):
        rows.append((f"https://ex.org/{i:04d}-copy?a=1&b=2", base_texts[i]))
    # tier-3 victims: drop 2 of 100 tokens from docs 2,6 (Jaccard >> 0.9)
    near_groups = []
    for i in (2, 6):
        words = base_texts[i].split(" ")
        u = f"https://ex.org/{i:04d}-near?a=1&b=2"
        rows.append((u, " ".join(words[:-2])))
        near_groups.append({f"https://ex.org/{i:04d}?a=1&b=2", u})

    got = {r["url"]: (r["verdict"], r["tier"])
           for r in tiered_dedup(_pages(rows)).take_all()}
    expect = _brute_tiers(rows, near_groups)
    assert got == expect
    # composition invariants
    assert len(got) == len(rows)
    assert sum(1 for v, _ in got.values() if v == "url_dup") == 3
    assert sum(1 for v, _ in got.values() if v == "exact_dup") == 2
    assert sum(1 for v, _ in got.values() if v == "near_dup") == 2


def test_tiered_precedence_url_beats_exact(ray_session):
    """A messy variant is BOTH a url dup and an exact dup — tier 1 must
    claim it, and the exact tier must then keep the base (no double
    removal, no missing row)."""
    txt = " ".join(f"w{i}" for i in range(60))
    rows = [
        ("https://a.org/x?p=1", txt),
        ("https://A.ORG/x/?p=1&utm_s=1", txt),   # url variant of the above
        ("https://a.org/y?p=1", txt),            # exact copy, different url
    ]
    got = {r["url"]: (r["verdict"], r["tier"])
           for r in tiered_dedup(_pages(rows)).take_all()}
    # canonical of the norm group is the min raw url: uppercase sorts first
    assert got["https://A.ORG/x/?p=1&utm_s=1"] == ("kept", 0) or \
        got["https://a.org/x?p=1"] == ("kept", 0)
    assert sorted(v for v, _ in got.values()) == ["exact_dup", "kept", "url_dup"]


def test_tiered_empty_and_null_text(ray_session):
    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], type=pa.string()),
        "html": pa.array([], type=pa.binary()),
        "text": pa.array([], type=pa.string()),
    }))
    assert tiered_dedup(empty).take_all() == []
    one = ray.data.from_arrow(pa.table({
        "url": pa.array(["u://x"]),
        "html": pa.array([None], type=pa.binary()),
        "text": pa.array([None], type=pa.string()),
    }))
    assert tiered_dedup(one).take_all() == [
        {"url": "u://x", "verdict": "kept", "tier": 0}
    ]
