"""Scale micro-bench for binary-quantization ANN (bq.py): brute float
cosine vs the 1-bit Hamming-shortlist + SQ8-rescore path on a replicated
embedding corpus (default 100x sf0.1 = 200k x 64-dim vectors), plus the
recall of the BQ pipeline against exact cosine top-k.

The honest framing: at 64 dims a float64 scan is one BLAS matmul and
already fast — BQ's win is the 512x-smaller scan FOOTPRINT (one uint64
word per vector), which is what matters when the corpus doesn't fit the
page cache; wall-clock on a cache-resident corpus mostly shows the
fixed per-batch overheads. Both numbers and the recall are printed.

Usage: PYTHONPATH=/root/repo python tools/bench_bq.py [sf_dir] [factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray import ann, bq

    # replicate the corpus factor x with distinct vec_ids
    src = pq.read_table(f"{sf_dir}/embeddings.parquet")
    n = src.num_rows
    root = "/tmp/bench_bq"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    emb = src.column("embedding")
    lab = src.column("label")
    parts = []
    for r in range(factor):
        ids = pa.array(
            (src.column("vec_id").to_numpy() + r * n), pa.int64()
        )
        parts.append(
            pa.table({"vec_id": ids, "embedding": emb, "label": lab})
        )
    pq.write_table(
        pa.concat_tables(parts), f"{root}/embeddings.parquet",
        row_group_size=65536,
    )

    t0 = time.time()
    exact = ann.brute_topk(root, n_queries=10, k=10)
    t_brute = time.time() - t0

    t0 = time.time()
    got = bq.bq_topk(root, n_queries=10, k=10, shortlist=50)
    t_bq = time.time() - t0

    # recall@10 of the BQ pipeline vs exact cosine
    def sets(t: pa.Table):
        out: dict = {}
        for q, v in zip(
            t.column("query_id").to_pylist(),
            t.column("neighbor_id").to_pylist(),
        ):
            out.setdefault(q, set()).add(v)
        return out

    es, gs = sets(exact), sets(got)
    recall = sum(
        len(es[q] & gs.get(q, set())) / len(es[q]) for q in es
    ) / len(es)

    print(
        json.dumps(
            {
                "metric": "bq_vs_brute",
                "n_vectors": n * factor,
                "brute_sec": round(t_brute, 3),
                "bq_sec": round(t_bq, 3),
                "bq_recall_at_10": round(recall, 3),
                "bytes_per_vector_coarse": 8,
                "bytes_per_vector_float64": 64 * 8,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
