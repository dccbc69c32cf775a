"""Scale micro-bench for the round-5 vector operators: full-corpus
exact-integer k-means (kmeans.py) and the IVF mutation lifecycle
(ivf_add / ivf_delete / ivf_expunge / ivf_merge_segments) on a
replicated embedding corpus (default 100x sf0.1 = 200k x 64-dim
vectors). Shows the partial-sum Lloyd fold, the frozen-centroid segment
append, and the compaction rewrites at two orders of magnitude above
gate scale, with integer-exactness asserted where cheap.

Usage: PYTHONPATH=/root/repo python tools/bench_vector.py [sf_dir] [factor]
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
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray import ann
    from searchengine_ray.kmeans import kmeans_assign, kmeans_fit

    # --- replicate the embeddings corpus with re-keyed vec_ids ----------
    src = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n_base = src.num_rows
    work = "/tmp/bench_vector"
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(f"{work}/corpus")
    writer = pq.ParquetWriter(
        f"{work}/corpus/embeddings.parquet", src.schema
    )
    ids = src.column("vec_id").to_numpy()
    for rep in range(factor):
        writer.write_table(
            src.set_column(
                0, "vec_id", pa.array(ids + rep * n_base, pa.int64())
            )
        )
    writer.close()
    total = n_base * factor
    corpus = f"{work}/corpus"

    out: dict = {"metric": "vector_ops_bench", "n_vectors": total,
                 "factor": factor, "sf_dir": sf_dir}

    # --- k-means: fit (iters shuffle-free passes) + assignment pass -----
    t0 = time.time()
    cents = kmeans_fit(corpus, k=8, iters=2)
    fit_sec = time.time() - t0
    # kmeans_assign refits internally: time the full fit+label path
    t0 = time.time()
    labeled = kmeans_assign(corpus, k=8, iters=2)
    n_out = labeled.count()
    assign_sec = time.time() - t0
    assert n_out == total
    out["kmeans_fit_sec"] = round(fit_sec, 3)
    out["kmeans_fit_vecs_per_sec_per_pass"] = round(total * 2 / fit_sec, 1)
    out["kmeans_assign_total_sec"] = round(assign_sec, 3)
    assert cents.dtype == np.int64

    # --- IVF lifecycle at scale ------------------------------------------
    split = total // 2
    half = f"{work}/half"
    os.makedirs(half)
    # stage the first half (gate-plumbing copy, same as ivf_incremental)
    head = pq.read_table(
        f"{corpus}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", split)],
    )
    pq.write_table(head, f"{half}/embeddings.parquet")
    idx = f"{work}/idx"

    t0 = time.time()
    ann.ivf_build(half, idx, n_cells=16)
    out["ivf_build_half_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    ann.ivf_add(idx, corpus, min_vec_id=split, segment="tail")
    out["ivf_add_half_sec"] = round(time.time() - t0, 3)

    q_ids, q_mat = ann._query_matrix(corpus, 8)
    t0 = time.time()
    r1 = ann.ivf_search(idx, q_ids, q_mat, k=10, nprobe=4)
    out["ivf_search_sec"] = round(time.time() - t0, 3)
    assert r1.num_rows == 80

    dead = np.arange(0, total, 7, dtype=np.int64)
    t0 = time.time()
    ann.ivf_delete(idx, dead)
    out["ivf_delete_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    dropped = ann.ivf_expunge(idx)
    out["ivf_expunge_sec"] = round(time.time() - t0, 3)
    assert dropped == len(dead)
    t0 = time.time()
    merged = ann.ivf_merge_segments(idx)
    out["ivf_merge_sec"] = round(time.time() - t0, 3)
    out["ivf_segments_merged"] = merged
    t0 = time.time()
    r2 = ann.ivf_search(idx, q_ids, q_mat, k=10, nprobe=4)
    out["ivf_search_after_merge_sec"] = round(time.time() - t0, 3)
    assert r2.num_rows == 80

    shutil.rmtree(work)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
