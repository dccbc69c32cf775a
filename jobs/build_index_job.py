#!/usr/bin/env python
"""Cluster job entry point: build (or resume) the inverted index, then
optionally serve a query file — the unit of work you submit with
``ray job submit`` on a real cluster:

    ray job submit --working-dir /path/to/repo -- \\
        python jobs/build_index_job.py \\
        --corpus /data/sf0.1 --index /data/index \\
        --partitions 64 --queries queries.txt --trec-out run.trec

On the cluster the job connects to the running Ray instance
(``ray.init(address="auto")``); standalone it starts a local session. The
build is resumable: re-submitting the same job after a failure skips
partitions already recorded in the index manifest (per-partition lineage +
metrics live in ``<index>/manifest.json``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="dir with documents.parquet")
    ap.add_argument("--index", required=True, help="output index dir")
    ap.add_argument("--partitions", type=int, default=1, help="resume granularity")
    ap.add_argument("--bucket-size", type=int, default=1 << 16)
    ap.add_argument("--merge-partitions", type=int, default=64)
    ap.add_argument("--stemmer", default="none", help="analyzer profile (none|porter)")
    ap.add_argument("--queries", help="optional qid:query file to run after build")
    ap.add_argument("--trec-out", help="trec output path (with --queries)")
    ap.add_argument("--model", default="bm25")
    ap.add_argument("--top-k", type=int, default=100)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster ray job submit provides the address; standalone local
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams

    cfg = BuildConfig(
        num_partitions=args.partitions,
        doc_bucket_size=args.bucket_size,
        merge_partitions=args.merge_partitions,
        stemmer=args.stemmer,
    )
    build_index(args.corpus, args.index, cfg)
    with open(os.path.join(args.index, "manifest.json")) as f:
        manifest = json.load(f)
    done = sum(
        1 for p in manifest["partitions"].values() if p.get("status") == "done"
    )
    print(
        json.dumps(
            {
                "index": args.index,
                "partitions_done": done,
                "complete": manifest["complete"],
            }
        )
    )

    if args.queries:
        from searchengine_ray.engine import (
            read_queries_file,
            run_queries,
            write_trec,
        )

        queries = read_queries_file(args.queries)
        res = run_queries(
            args.index,
            queries,
            ModelParams(model=args.model, top_k=args.top_k),
            concurrency=8,
        )
        out = args.trec_out or os.path.join(args.index, "run.trec")
        write_trec(res, out, all_qids=[q for q, _ in queries])
        print(json.dumps({"trec_out": out, "rows": res.num_rows}))

    ray.shutdown()


if __name__ == "__main__":
    main()
