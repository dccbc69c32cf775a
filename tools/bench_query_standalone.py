"""Standalone warm-pool query-QPS measurement against an EXISTING index —
the steal-window A/B harness behind BASELINE.md's query-serving numbers.

Unlike the full bench, nothing else runs in the session (no build
writeback, no co-running pipelines), so the per-block QPS is pure serving
throughput; the calibration probe timestamps the window quality. Round-4
measurements with this harness (same code, same index, minutes apart):

    8 actors:  52-69 QPS   (calib 1.15-1.19)
    16 actors: 106-164 QPS (calib 0.99-1.03)

Usage: PYTHONPATH=/root/repo python tools/bench_query_standalone.py \
           [index_dir] [num_actors]
(defaults: /tmp/bench_index_32, 16)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    idx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_index_32"
    n_actors = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    sys.path.insert(0, "/root/repo")
    from bench import _calibrate, make_queries

    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import QueryService

    queries = make_queries(48)
    out = {"index": idx, "num_actors": n_actors, "calib_start": _calibrate()}
    t0 = time.time()
    svc = QueryService(
        idx, ModelParams(model="bm25", top_k=100), num_actors=n_actors
    )
    out["pool_startup_sec"] = round(time.time() - t0, 3)
    svc.warm(queries)
    for b in range(4):
        block = []
        for _ in range(3):
            t0 = time.time()
            svc.search_batch(queries)
            block.append(time.time() - t0)
        block.sort()
        out[f"qps_block{b}"] = round(len(queries) / block[1], 1)
    out["calib_end"] = _calibrate()
    svc.shutdown()
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
