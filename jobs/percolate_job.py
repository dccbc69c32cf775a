#!/usr/bin/env python
"""Cluster job entry point: route/tag a document stream against a registry
of stored queries (the percolation unit of work — alerting, saved
searches, rule-based corpus routing), optionally scored with a serving
index's statistics:

    ray job submit --working-dir /path/to/repo -- \\
        python jobs/percolate_job.py \\
        --corpus /data/sf0.1 --queries /path/rules.json --out /data/routed \\
        [--index /data/index]   # adds BM25 scores with this index's stats

``rules.json`` is ``[[query_id, query_string], ...]`` in the engine's
structured query language (#AND/#OR/#NEAR/#WINDOW/#SYN/#ANDNOT/...).
Output is partitioned parquet of (doc_id, query_id[, score]) match pairs.

Scale shape: stored queries (and, with ``--index``, their model-sized
global statistics) broadcast once per actor; matching is one shuffle-free
actor-pool ``map_batches`` over the stream; output is match-pair-scale.
Matching is doc-local, so re-submitting after a failure reproduces the
identical pair set (idempotent overwrite of the output directory).

Standalone it starts a local Ray session; on a cluster it connects to the
running instance via RAY_ADDRESS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="dir with documents.parquet")
    ap.add_argument("--queries", required=True,
                    help="json file: [[query_id, query_string], ...]")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--index", default=None,
                    help="serving index dir: emit BM25 scores with its stats")
    ap.add_argument("--stemmer", default=None,
                    help="analyzer stemmer profile for membership "
                         "percolation (default: none; with --index the "
                         "index's recorded profile is used)")
    args = ap.parse_args()

    with open(args.queries) as f:
        queries = [tuple(q) for q in json.load(f)]

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr, include_dashboard=False, logging_level="ERROR")

    from searchengine_ray.percolate import percolate, percolate_scored

    t0 = time.time()
    if args.index:
        ds = percolate_scored(args.corpus, args.index, queries)
    else:
        ds = percolate(args.corpus, queries,
                       stemmer_name=args.stemmer or "none")
    matches_dir = os.path.join(args.out, "matches")
    # write_parquet APPENDS uniquely-named files: a retry over a
    # partially-written destination would duplicate pairs, so the
    # idempotence contract is a fresh overwrite of OUR OWN output subdir
    import shutil

    if os.path.isdir(matches_dir):
        shutil.rmtree(matches_dir)
    ds.write_parquet(matches_dir)
    print(json.dumps({
        "matches_dir": os.path.join(args.out, "matches"),
        "n_queries": len(queries),
        "scored": bool(args.index),
        "wall_sec": round(time.time() - t0, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
