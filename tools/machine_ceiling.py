#!/usr/bin/env python
"""Measure this host's OWN parallel-scaling ceiling, independent of Ray.

Two microbenchmarks across 1/2/4/8 processes:
- cpu  : cache-resident pure-Python loop (scheduler/core availability)
- mem  : large numpy sorts + shifts (memory-bandwidth-bound, the profile of
         tokenize/shuffle/decode stages)

Rationale: on a single box, every "node" shares one memory bus, so
bandwidth-bound pipeline stages cannot scale past the mem ceiling no matter
how well the engine parallelizes. On a real N-vs-4N NODE cluster each node
brings its own memory bus. Compare bench.py --scaling efficiencies against
these ceilings to separate engine overhead from hardware limits.

Prints one JSON line: per-level throughput + implied max 2->8 efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _burn_cpu(q):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        for _ in range(10000):
            x += 1
    q.put(x)


def _burn_mem(q):
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 40, size=2_000_000).astype(np.uint64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        b = np.sort(a.copy())
        _ = (b >> np.uint64(7)) & np.uint64(0x7F)
        n += 1
    q.put(n)


def measure(target) -> dict[int, float]:
    out = {}
    for n in (1, 2, 4, 8):
        q = mp.Queue()
        ps = [mp.Process(target=target, args=(q,)) for _ in range(n)]
        for p in ps:
            p.start()
        tot = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        out[n] = tot / 2.0
    return out


def main() -> None:
    cpu = measure(_burn_cpu)
    mem = measure(_burn_mem)
    result = {
        "cpu_throughput": {str(k): round(v, 1) for k, v in cpu.items()},
        "mem_throughput": {str(k): round(v, 1) for k, v in mem.items()},
        "cpu_eff_2_to_8": round((cpu[8] / cpu[2]) / 4.0, 3),
        "mem_eff_2_to_8": round((mem[8] / mem[2]) / 4.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
