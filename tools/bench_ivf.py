"""IVF pruning micro-bench: shows that ivf_search scans ~nprobe/n_cells of
what brute force scans (rows read from storage AND (query,row) pairs
scored), with comparable-or-better wall time and pytest-grade recall.

Usage: PYTHONPATH=/root/repo python tools/bench_ivf.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray import ann

    n_queries, k, n_cells, nprobe = 10, 10, 16, 4
    index_dir = "/tmp/bench_ivf_index"
    shutil.rmtree(index_dir, ignore_errors=True)

    t0 = time.time()
    brute = ann.brute_topk(sf_dir, n_queries=n_queries, k=k)
    t_brute = time.time() - t0

    t0 = time.time()
    ann.ivf_build(sf_dir, index_dir, n_cells=n_cells)
    t_build = time.time() - t0

    q_ids, q_mat = ann._query_matrix(sf_dir, n_queries)
    t0 = time.time()
    ivf = ann.ivf_search(index_dir, q_ids, q_mat, k=k, nprobe=nprobe)
    t_search = time.time() - t0

    stats = ann.ivf_scan_stats(index_dir, q_mat, nprobe=nprobe)

    bset = set(zip(brute["query_id"].to_pylist(), brute["neighbor_id"].to_pylist()))
    iset = set(zip(ivf["query_id"].to_pylist(), ivf["neighbor_id"].to_pylist()))
    recall = len(bset & iset) / max(1, len(bset))

    out = {
        "sf_dir": sf_dir,
        "brute_sec": round(t_brute, 3),
        "ivf_build_sec": round(t_build, 3),
        "ivf_search_sec": round(t_search, 3),
        "recall_vs_brute": round(recall, 3),
        "pairs_scored_ratio": round(
            stats["pairs_scored"] / max(1, stats["pairs_brute"]), 4
        ),
        "expected_ratio": round(nprobe / n_cells, 4),
        **stats,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
