#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR, one JSON line.

Plain run:       python bench.py            (num_cpus = $RAY_GRAFT_CPUS or 32)
Scaling run:     python bench.py --scaling  (fresh processes at 8 and 32 CPUs,
                                             reports both + scaling efficiency)

Headline components:
- index_build   : corpus (documents replicated to bench scale) -> tokenize ->
                  groupby((field,term,bucket)) posting merge -> write index
- bm25_queries  : flat + structured query set through the actor pool (QPS)
- dedup_minhash : MinHash-LSH near-dup over documents
- ann_topk      : brute cosine top-k over embeddings
- rel_pricing   : TPC-H-Q1-shaped aggregate over lineitem (sf-scaled table)
- events_tumbling: windowed aggregate over events
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_FACTOR = int(os.environ.get("GRAFT_BENCH_FACTOR", "40"))
N_BASE_DOCS = 500

QUERY_SHAPES = [
    "dup {a}",
    "#near/1( {a} {b} )",
    "#window/8( {a} {b} )",
    "#syn( {a} {b} )",
    "#sum( #near/1( {a} {b} ) {c} )",
    "#wsum( 0.4 {a} 0.6 {b} )",
]
TERMS = [
    "spark", "join", "hash", "merge", "sort", "scan", "table", "stream",
    "filter", "group", "query", "vector", "batch", "key", "row", "column",
]


def make_queries(n: int = 48) -> list[tuple[str, str]]:
    out = []
    for i in range(n):
        shape = QUERY_SHAPES[i % len(QUERY_SHAPES)]
        a = TERMS[i % len(TERMS)]
        b = TERMS[(i * 3 + 1) % len(TERMS)]
        c = TERMS[(i * 5 + 2) % len(TERMS)]
        out.append((str(i + 1), shape.format(a=a, b=b, c=c)))
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray import ann, dedup, relational, windows
    from searchengine_ray.benchcorpus import replicated_corpus_factory
    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the page cache so we measure compute+shuffle, not first disk read
    for t in ("documents", "lineitem", "events", "embeddings"):
        ray.data.read_parquet(f"{SF_DIR}/{t}.parquet").count()

    # --- index build ---
    idx_dir = f"/tmp/bench_index_{NCPU}"
    if os.path.exists(idx_dir):
        shutil.rmtree(idx_dir)
    factory = replicated_corpus_factory(SF_DIR, BENCH_FACTOR)
    n_docs = factory.n_docs
    t0 = time.time()
    build_index(factory, idx_dir, BuildConfig(), n_docs=n_docs)
    timings["index_build"] = round(time.time() - t0, 3)
    extras["build_docs_per_sec"] = round(n_docs / timings["index_build"], 1)

    # --- queries: long-lived serving pool; report warm steady-state QPS ---
    from searchengine_ray.engine import QueryService

    queries = make_queries(48)
    t0 = time.time()
    svc = QueryService(
        idx_dir, ModelParams(model="bm25", top_k=100), num_actors=min(8, NCPU)
    )
    extras["query_pool_startup_sec"] = round(time.time() - t0, 3)
    svc.search_batch(queries[:8])  # warm the iop caches
    t0 = time.time()
    res = svc.search_batch(queries)
    timings["bm25_queries"] = round(time.time() - t0, 3)
    extras["query_qps"] = round(len(queries) / timings["bm25_queries"], 2)
    assert res.num_rows > 0
    svc.shutdown()

    # --- dedup ---
    t0 = time.time()
    dedup.minhash_lsh_pairs(SF_DIR)
    timings["dedup_minhash"] = round(time.time() - t0, 3)

    # --- ann ---
    t0 = time.time()
    ann.brute_topk(SF_DIR, n_queries=10, k=10)
    timings["ann_topk"] = round(time.time() - t0, 3)

    # --- relational / windows (sf-scaled tables) ---
    t0 = time.time()
    relational.pricing_summary(SF_DIR).to_pandas()
    timings["rel_pricing"] = round(time.time() - t0, 3)

    t0 = time.time()
    windows.tumbling_counts(SF_DIR).to_pandas()
    timings["events_tumbling"] = round(time.time() - t0, 3)

    ray.shutdown()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "e2e_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NCPU,
        **extras,
    }


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "build_docs_per_sec_8": lo.get("build_docs_per_sec"),
                "build_docs_per_sec_32": hi.get("build_docs_per_sec"),
                "query_qps_8": lo.get("query_qps"),
                "query_qps_32": hi.get("query_qps"),
                "scaling_efficiency": round(eff, 3),
                "queries_8": lo["queries"],
                "queries_32": hi["queries"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
