"""Pipeline configuration.

The reference engine has no tunables at all (sequential scan, one fixed
SHA-1 grouping — ``OrdinaryDumpDeduplicator/OrdinaryDumpDeduplicator.cs:107-156``).
The new engine exposes the signature / LSH / shuffle parameters the north
rule requires, with defaults chosen so that dup-pair recall at
Jaccard >= ``jaccard_threshold`` is >= 0.99 (LSH s-curve: with
``num_perm=128`` split into 32 bands x 4 rows, P[candidate | s=0.8]
= 1-(1-0.8^4)^32 ~ 1 - 5e-8).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


@dataclass(frozen=True)
class DedupConfig:
    # --- tokenization / shingling -------------------------------------
    shingle_size: int = 5          # words per shingle
    lowercase: bool = True         # tokenizer folds case before hashing

    # --- MinHash -------------------------------------------------------
    num_perm: int = 128            # K hash permutations
    lsh_bands: int = 32            # b bands
    lsh_rows: int = 4              # r rows per band (b*r == num_perm)
    seed: int = 42                 # seeds the permutation matrix

    # --- SimHash ---------------------------------------------------------
    simhash_bits: int = 64
    simhash_blocks: int = 6        # Manku-style banding: 6 blocks, tables
    simhash_clean_blocks: int = 3  # keyed on every 3-block combination
                                   # (C(6,3)=20 tables, ~32-bit keys) ->
                                   # catches hamming <= blocks - clean = 3
                                   # without the 16-bit key-space
                                   # saturation that makes naive 4x16
                                   # banding quadratic in corpus size
    simhash_max_hamming: int = 3   # all pairs with hamming distance <= 3

    # --- verification / clustering --------------------------------------
    jaccard_threshold: float = 0.8     # duplicate definition (oracle + verify)
    verify_margin: float = 0.1         # downward recall-rescue band width
    # minhash decision (stages/verify.py, flagship passes pages):
    #   est >= threshold          -> accept (unbiased estimator at face
    #                                value; never admits an est-below-thr
    #                                pair unchecked)
    #   thr - margin <= est < thr -> re-verified EXACTLY on shingle sets
    #                                (texts join back per side) — rescues
    #                                true pairs whose 128-perm estimate
    #                                dipped below the threshold (recall)
    #   est < thr - margin        -> reject (> ~3 sigma below threshold)
    # Without pages (bare verify_pairs call), acceptance falls back to
    # est >= thr - margin, documented there.

    # --- substring spans (suffix array) ----------------------------------
    span_min_words: int = 30           # minimal common run length, in words
    span_sample_mod: int = 8           # sample shingles with hash % mod == 0
                                       # as span-candidate keys (P[catch a
                                       # 50-word run] ~ 1-(7/8)^46 > 0.997)

    # --- skew / shuffle handling ----------------------------------------
    max_group_pairs: int = 64      # within a candidate bucket of n <= this,
                                   # emit all C(n,2) pairs; above it, emit
                                   # star-to-canonical + sorted-chain pairs
                                   # (O(n), keeps connectivity for true
                                   # clusters, bounds hot-key blowup).
                                   # Hot buckets are additionally split at
                                   # sorted-block borders (range partition
                                   # as the salt) — see stages/candidates.py

    # --- execution -------------------------------------------------------
    batch_size: int = 512          # rows per signature batch — small enough
                                   # that the (shingles x num_perm) minhash
                                   # working set stays cache-resident (512 was
                                   # measured ~2x faster than 1024 per doc)
    sig_concurrency: int | tuple = 8  # actor-pool size for signature stage
    singleton_prefilter: bool = False  # pre-drop singleton buckets with a
                                   # key-only sort before the (bucket,
                                   # member) sort. OFF by default: at
                                   # sandbox scale the extra all-to-all
                                   # launch + barrier costs more than the
                                   # 16 B/row it saves from the main sort
                                   # (measured 21 s vs 13 s at 21M bucket
                                   # rows / 32 CPUs, identical pairs); at
                                   # true multi-node 100-TB scale network
                                   # bytes dominate and the 3-5x shuffle
                                   # shrink wins — flip it on there.

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.simhash_blocks - self.simhash_clean_blocks < self.simhash_max_hamming:
            raise ValueError(
                "simhash banding guarantee needs blocks - clean >= max_hamming"
            )

    # execution-only knobs: tuning them must NOT invalidate checkpoints
    # (queries derive sig_concurrency from the session CPU count, so
    # hashing them would make resumes machine-dependent)
    _EXEC_FIELDS = ("batch_size", "sig_concurrency", "singleton_prefilter")

    def config_hash(self) -> str:
        """Stable fingerprint of every SEMANTIC parameter — stamped into
        checkpoint lineage manifests so a resume never mixes configs.
        Execution-only fields (batch size, actor-pool size) are excluded:
        they change scheduling, never results."""
        payload = {k: v for k, v in asdict(self).items()
                   if k not in self._EXEC_FIELDS}
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
