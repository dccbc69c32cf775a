"""Dump per-stage Ray Data execution stats for the index-build pipeline —
evidence that task counts scale with input (the multi-node scaling claim in
BASELINE.md) and a profiling entry point for stage-level tuning.

Usage:
    PYTHONPATH=/root/repo python tools/build_stats.py [sf_dir] [factor]

Prints one JSON line: per-operator task counts + wall time + output rows
for the fused tokenize->shuffle->encode pipeline, at two input sizes so the
task-count scaling is visible in one run.
"""

from __future__ import annotations

import json
import re
import sys
import time


def one_build(sf_dir: str, factor: int, ncpu: int) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from searchengine_ray.benchcorpus import replicated_corpus_factory
    from searchengine_ray.build import EncodeMergePartition, TokenizeFields
    from searchengine_ray.config import BuildConfig

    cfg = BuildConfig()
    factory = replicated_corpus_factory(sf_dir, factor)

    tokenizer = TokenizeFields(cfg.fields, cfg.doc_bucket_size, cfg.merge_partitions)
    t0 = time.time()
    ds = (
        factory()
        .map_batches(tokenizer, batch_format="pyarrow",
                     batch_size=cfg.tokenize_batch_size)
        .groupby("kh")
        .map_groups(EncodeMergePartition(cfg.skip_block_docs),
                    batch_format="pyarrow")
    )
    m = ds.materialize()
    wall = time.time() - t0
    n_rows = m.count()
    ops = [
        {"op": name, "tasks": int(tasks)}
        for name, tasks in re.findall(
            r"(?:Operator \d+|Suboperator \d+) (\S+?):? (\d+) tasks executed",
            m.stats(),
        )
    ]
    ray.shutdown()
    return {
        "docs": factory.n_docs,
        "postings_rows": n_rows,
        "wall_sec": round(wall, 2),
        "operators": ops,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    small = one_build(sf_dir, factor, ncpu=8)
    large = one_build(sf_dir, factor * 4, ncpu=8)
    print(json.dumps({"small": small, "large": large}))


if __name__ == "__main__":
    main()
