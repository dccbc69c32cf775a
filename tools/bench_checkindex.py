"""Measure checkindex.check_index throughput at bench scale.

Builds (or reuses) the same replicated-corpus index bench.py builds
(GRAFT_SF_DIR x GRAFT_BENCH_FACTOR docs), then times the full
decode-and-verify pass and prints one JSON line with docs/s and
postings-bytes/s — the number that says what a weekly integrity sweep
of a 100 TB index would cost.

Usage: PYTHONPATH=/root/repo python tools/bench_checkindex.py
"""

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FACTOR = int(os.environ.get("GRAFT_BENCH_FACTOR", "40"))


def main() -> None:
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

    from searchengine_ray.benchcorpus import replicated_corpus_factory
    from searchengine_ray.build import build_index
    from searchengine_ray.checkindex import check_index
    from searchengine_ray.config import BuildConfig

    idx_dir = f"/tmp/bench_index_{NCPU}"
    manifest = os.path.join(idx_dir, "manifest.json")
    built = False
    if not os.path.exists(manifest):
        factory = replicated_corpus_factory(SF_DIR, FACTOR)
        t0 = time.time()
        build_index(factory, idx_dir, BuildConfig(), n_docs=factory.n_docs)
        built = True
        build_sec = round(time.time() - t0, 3)
    else:
        build_sec = None

    post_bytes = 0
    for base, _d, files in os.walk(os.path.join(idx_dir, "postings")):
        post_bytes += sum(
            os.path.getsize(os.path.join(base, f))
            for f in files
            if f.endswith(".parquet")
        )

    t0 = time.time()
    out = check_index(idx_dir)
    check_sec = time.time() - t0
    n_docs = int(out.column("n_docs")[0].as_py())
    ok = (
        all(out.column("lexicon_ok").to_pylist())
        and all(out.column("stats_ok").to_pylist())
    )
    print(json.dumps({
        "metric": "checkindex_docs_per_sec",
        "value": round(n_docs / check_sec, 1),
        "unit": "docs/sec",
        "check_sec": round(check_sec, 3),
        "n_docs": n_docs,
        "postings_mb": round(post_bytes / 1e6, 1),
        "postings_mb_per_sec": round(post_bytes / 1e6 / check_sec, 1),
        "fields_ok": ok,
        "built_here": built,
        "build_sec": build_sec,
        "num_cpus": NCPU,
    }))
    ray.shutdown()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
