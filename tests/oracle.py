"""Brute-force oracles (SURVEY.md §5.2): plain-Python/numpy reference
implementations the pipeline must match. Same tokenizer/shingle config as
the engine — the oracle answers "what are the true duplicate groups",
not "what does some other algorithm think"."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.hashing import TokenHasher, shingle_hashes
from ordinarydumpdeduplicator_ray.functions.text import extract_text, tokenize


def extract_rows(pages) -> list[tuple[str, str | None]]:
    """pages Arrow table -> [(url, extracted_text_or_None)] using the
    engine's own frozen extraction rule."""
    out = []
    for url, html, text in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), pages["text"].to_pylist()
    ):
        if text is None and html is not None:
            text = extract_text(html)
        out.append((url, text))
    return out


def exact_groups_oracle(pages) -> dict[str, list[str]]:
    """sha256(text) hex -> sorted urls, only groups with >1 member,
    broken rows (no text) excluded."""
    groups: dict[str, list[str]] = defaultdict(list)
    for url, text in extract_rows(pages):
        if text is None:
            continue
        groups[hashlib.sha256(text.encode()).hexdigest()].append(url)
    return {k: sorted(v) for k, v in groups.items() if len(v) > 1}


def shingle_sets(pages, config: DedupConfig) -> dict[str, np.ndarray]:
    th = TokenHasher()
    out = {}
    for url, text in extract_rows(pages):
        if not text:
            continue
        toks = tokenize(text, config.lowercase)
        if not toks:
            continue
        out[url] = shingle_hashes(th.hash_tokens(toks), config.shingle_size)
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def true_dup_pairs(
    pages, config: DedupConfig, restrict_to: list[set[str]] | None = None
) -> set[tuple[str, str]]:
    """All (url_a < url_b) pairs with true shingle Jaccard >= threshold.
    ``restrict_to``: optional url partitions to confine the O(n^2) scan
    (e.g. truth groups) — pairs across partitions are checked as absent
    separately by cluster-equality tests."""
    ss = shingle_sets(pages, config)
    pairs: set[tuple[str, str]] = set()
    if restrict_to is None:
        urls = sorted(ss)
        groupings = [set(urls)]
    else:
        groupings = restrict_to
    for grp in groupings:
        urls = sorted(u for u in grp if u in ss)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                if jaccard(ss[urls[i]], ss[urls[j]]) >= config.jaccard_threshold:
                    pairs.add((urls[i], urls[j]))
    return pairs


def connected_components_oracle(pairs: set[tuple[str, str]]) -> dict[str, str]:
    """url -> min-url component id over the given edges."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp: dict[str, list[str]] = defaultdict(list)
    for u in parent:
        comp[find(u)].append(u)
    out = {}
    for members in comp.values():
        m = min(members)
        for u in members:
            out[u] = m
    return out
