"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1/F2).

Seeded generator producing the ``pages`` input table (BASELINE.json
``input_hint`` schema) with known row classes injected at fixed rates,
plus the ``pages_truth`` sidecar used only by tests/benchmarks. No
external data; same (n_rows, seed) -> byte-identical tables.

Row classes (FIXTURES.md F1): unique, exact-dup clusters (2-6 copies),
near-dup clusters (2-5 copies, ~1.5% word edits -> shingle Jaccard ~0.86),
shared-substring pairs (60-word common run, overall Jaccard << threshold),
empty, broken (text & html both null), one hot-key giant exact cluster
(~5% of rows), and extraction rows (text null, html present — text must
be recovered by the fixed extraction rule).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CLASS_UNIQUE = "unique"
CLASS_EXACT = "exact"
CLASS_NEAR = "near"
CLASS_SUBSTRING = "substring"
CLASS_EMPTY = "empty"
CLASS_BROKEN = "broken"
CLASS_HOT = "hot"

_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds


def render_html(text: str) -> bytes:
    """Wrap text in deterministic boilerplate HTML such that
    ``functions.text.extract_text(render_html(t)) == t`` for the
    generator's space-joined word texts."""
    return (
        "<html><head><title></title><style>body{margin:0}</style></head>"
        f"<body><div class=\"main\"><p>{text}</p></div>"
        "<script>var x = 1 < 2;</script></body></html>"
    ).encode("utf-8")


def _make_vocab(rng: np.random.Generator, size: int = 6000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lengths = rng.integers(3, 10, size=size)
    words = ["".join(rng.choice(letters, size=ln)) for ln in lengths]
    return np.array(words, dtype=object)


class _Gen:
    def __init__(self, n_rows: int, seed: int) -> None:
        self.rng = np.random.default_rng(seed)
        self.vocab = _make_vocab(self.rng)
        self.n_rows = n_rows
        self.rows: list[tuple[str | None, bytes | None, str, int]] = []
        self.next_group = 0

    def _text(self, n_words: int) -> str:
        idx = self.rng.integers(0, len(self.vocab), size=n_words)
        return " ".join(self.vocab[idx])

    def _maybe_html(self, text: str, p: float = 0.5) -> bytes | None:
        return render_html(text) if self.rng.random() < p else None

    def _gid(self) -> int:
        self.next_group += 1
        return self.next_group - 1

    def _edit(self, words: list[str], n_edits: int) -> list[str]:
        out = list(words)
        for _ in range(n_edits):
            op = self.rng.integers(0, 3)
            pos = int(self.rng.integers(0, len(out)))
            w = str(self.vocab[int(self.rng.integers(0, len(self.vocab)))])
            if op == 0:
                out[pos] = w
            elif op == 1 and len(out) > 10:
                del out[pos]
            else:
                out.insert(pos, w)
        return out

    def build(self) -> None:
        n = self.n_rows
        rng = self.rng
        # --- hot-key giant exact cluster (~5%) ---------------------------
        n_hot = int(n * 0.05) if n >= 100 else (3 if n >= 40 else 0)
        if n_hot:
            g = self._gid()
            hot_text = self._text(150)
            for _ in range(n_hot):
                self.rows.append((hot_text, self._maybe_html(hot_text, 0.3), CLASS_HOT, g))
        # --- exact-dup clusters (~10%), some copies extraction-only ------
        exact_budget = int(n * 0.10)
        while exact_budget > 0:
            size = int(rng.integers(2, 7))
            g = self._gid()
            text = self._text(int(rng.integers(60, 300)))
            for _ in range(size):
                if rng.random() < 0.3:
                    self.rows.append((None, render_html(text), CLASS_EXACT, g))
                else:
                    self.rows.append((text, self._maybe_html(text), CLASS_EXACT, g))
            exact_budget -= size
        # --- near-dup clusters (~15%) ------------------------------------
        near_budget = int(n * 0.15)
        while near_budget > 0:
            size = int(rng.integers(2, 6))
            g = self._gid()
            base = self._text(int(rng.integers(120, 300))).split(" ")
            self.rows.append((" ".join(base), self._maybe_html(" ".join(base)), CLASS_NEAR, g))
            for _ in range(size - 1):
                edited = self._edit(base, max(1, int(len(base) * 0.015)))
                t = " ".join(edited)
                self.rows.append((t, self._maybe_html(t), CLASS_NEAR, g))
            near_budget -= size
        # --- shared-substring pairs (~4%) --------------------------------
        pair_budget = int(n * 0.04)
        while pair_budget > 1:
            g = self._gid()
            run = self._text(60).split(" ")
            for _ in range(2):
                body = self._text(int(rng.integers(150, 250))).split(" ")
                pos = int(rng.integers(0, len(body)))
                t = " ".join(body[:pos] + run + body[pos:])
                self.rows.append((t, self._maybe_html(t), CLASS_SUBSTRING, g))
            pair_budget -= 2
        # --- empty (~2%) — one shared exact group (EmptyBlobInfo analogue)
        n_empty = max(2, int(n * 0.02)) if n >= 40 else 0
        if n_empty:
            g = self._gid()
            for _ in range(n_empty):
                self.rows.append(("", None, CLASS_EMPTY, g))
        # --- broken (~2%) -------------------------------------------------
        n_broken = max(2, int(n * 0.02)) if n >= 40 else 0
        for _ in range(n_broken):
            self.rows.append((None, None, CLASS_BROKEN, -1))
        # --- extraction-only unique rows (~5%) ---------------------------
        n_extract = int(n * 0.05)
        for _ in range(n_extract):
            self.rows.append((None, render_html(self._text(int(rng.integers(60, 200)))), CLASS_UNIQUE, -1))
        # --- unique filler ------------------------------------------------
        while len(self.rows) < n:
            t = self._text(int(rng.integers(40, 250)))
            self.rows.append((t, self._maybe_html(t), CLASS_UNIQUE, -1))
        self.rows = self.rows[:n]


def generate_pages(n_rows: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Build (pages, pages_truth) Arrow tables. Deterministic in
    (n_rows, seed), independent of platform."""
    g = _Gen(n_rows, seed)
    g.build()
    rng = g.rng
    n = len(g.rows)
    # deterministic shuffle so classes are interleaved across blocks
    perm = rng.permutation(n)
    rows = [g.rows[i] for i in perm]

    # Zipfian host assignment (hot hosts) for prefix rollups
    n_hosts = max(4, n // 200)
    w = 1.0 / np.arange(1, n_hosts + 1) ** 1.2
    hosts = rng.choice(n_hosts, size=n, p=w / w.sum())

    urls = [f"https://host{h}.example/p/{i:08d}" for i, h in enumerate(hosts)]
    ts = pa.array(
        (_EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000), type=pa.timestamp("us")
    )
    langs = [("en", "de", "ru")[i % 3] for i in range(n)]
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array([r[1] for r in rows], type=pa.binary()),
            "text": pa.array([r[0] for r in rows], type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "truth_class": pa.array([r[2] for r in rows], type=pa.string()),
            "truth_group": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )
    return pages, truth


def write_pages_corpus(out_dir: str, n_rows: int, seed: int = 42, shards: int = 8) -> str:
    """Write pages.parquet (sharded) + pages_truth.parquet under
    ``out_dir``; skips regeneration when already present with the same
    row count. Returns the pages directory path."""
    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "pages_truth.parquet")
    marker = os.path.join(out_dir, f".complete-{n_rows}-{seed}")
    if os.path.exists(marker):
        return pages_dir
    os.makedirs(pages_dir, exist_ok=True)
    pages, truth = generate_pages(n_rows, seed)
    per = (pages.num_rows + shards - 1) // shards
    for s in range(shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{s:04d}.parquet"))
    pq.write_table(truth, truth_path)
    with open(marker, "w") as f:
        f.write("ok")
    return pages_dir
