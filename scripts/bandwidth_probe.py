#!/usr/bin/env python
"""Memory-bandwidth envelope probe for the scaling protocol.

Measures aggregate throughput of a bandwidth-bound numpy kernel (the
build's dominant primitive mix: sort + take of int64 arrays) across P
pinned processes, P in {1, 2, 4, 8, 16}. On a machine whose DRAM
saturates, aggregate throughput stops growing with P while a pure-CPU
kernel keeps scaling — the gap tells you which core counts are inside
the single-box bandwidth envelope (where an N-vs-4N comparison reflects
the JOB's scalability, as on a multi-node cluster where every node
brings its own memory channels).

Usage: python scripts/bandwidth_probe.py [--size 20000000] [--reps 4]
Prints one JSON line per P.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(core: int, size: int, reps: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    rng = np.random.RandomState(core + 1)
    a = rng.randint(0, 1 << 40, size=size).astype(np.int64)
    np.sort(a, kind="stable")  # warm (page faults, JIT-ish paths)
    t0 = time.time()
    for _ in range(reps):
        b = np.sort(a, kind="stable")
        c = b[::2].copy()
        del b, c
    q.put(reps * size / (time.time() - t0))


def measure(p: int, size: int, reps: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(i, size, reps, q)) for i in range(p)
    ]
    for pr in procs:
        pr.start()
    total = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    return total


def main() -> int:
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 20_000_000
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 4
    base = None
    for p in (1, 2, 4, 8, 16):
        thr = measure(p, size, reps)
        base = base or thr
        print(json.dumps({
            "procs": p,
            "elems_per_sec": int(thr),
            "scaling_vs_1": round(thr / base, 2),
            "per_core_ratio": round(thr / base / p, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
