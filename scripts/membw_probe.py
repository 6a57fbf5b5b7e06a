"""Aggregate memory-bandwidth probe: N worker processes each stream a
large numpy array (read+write copy, STREAM-triad-like) for a fixed
interval; reports aggregate GB/s at each requested process count.

Evidence for the scaling analysis in BASELINE.md: on one shared-memory
node the 32-process aggregate bandwidth barely exceeds the 8-process
aggregate, which bounds the speedup of any bandwidth-bound stage
(explodes, sorts, shuffles) regardless of core count. A real 4N-node
cluster multiplies this resource by 4; a single sandbox node cannot.

Usage: python scripts/membw_probe.py [procs ...]   (default: 1 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARRAY_MB = 256          # far beyond L3 -> DRAM-resident
DURATION_S = 3.0


def _worker(q: mp.Queue) -> None:
    n = ARRAY_MB * (1 << 20) // 8
    a = np.random.default_rng(0).random(n)
    b = np.empty_like(a)
    np.copyto(b, a)   # warm-up: fault both arrays in before timing
    t0 = time.perf_counter()
    moved = 0
    while time.perf_counter() - t0 < DURATION_S:
        np.copyto(b, a)          # 1 read + 1 write per element
        b *= 1.000001            # extra read+write pass
        moved += 4 * a.nbytes    # bytes touched per loop
    q.put(moved / (time.perf_counter() - t0))


def measure(procs: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    out = {}
    for c in counts:
        out[f"gbps_{c}proc"] = round(measure(c), 1)
    if "gbps_8proc" in out and "gbps_32proc" in out:
        out["bw_scaling_8_to_32"] = round(out["gbps_32proc"] / out["gbps_8proc"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
