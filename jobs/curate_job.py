#!/usr/bin/env python
"""Cluster job entry point: run the composed curation pipeline (quality ∧
exact-dedup canonical ∧ train-side ∧ decontaminated) over a documents
table and write the survivors as partitioned parquet — the curation unit
of work you submit with ``ray job submit`` on a real cluster:

    ray job submit --working-dir /path/to/repo -- \\
        python jobs/curate_job.py \\
        --corpus /data/sf0.1 --out /data/curated \\
        [--min-tokens 20] [--lm-scores] [--bpe-counts] \\
        [--temperature-sample] [--oversample] [--quality-scores]

On the cluster the job connects to the running Ray instance
(``ray.init(address="auto")``); standalone it starts a local session.
Every per-doc decision in the pipeline is a pure function of
(doc_id, seed) or of the doc's own bytes, so re-submitting after a
failure reproduces identical survivor sets — idempotent output, safe to
re-run over a partially-written destination (the write is a fresh
overwrite of the output directory).

``--lm-scores`` / ``--bpe-counts`` additionally write the CCNet-style
bigram-LM NLL scores and real-BPE token counts beside the survivors, the
columns a downstream mixing/packing step consumes;
``--temperature-sample`` / ``--oversample`` write the XLM-R alpha=1/2
kept set and the repeat-factor copy table, and ``--quality-scores``
trains the logistic quality classifier (full-corpus up to 4096 docs,
deterministically hash-thinned above) and writes per-doc probabilities.
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
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--lm-scores", action="store_true",
                    help="also write cur_lm_perplexity scores")
    ap.add_argument("--bpe-counts", action="store_true",
                    help="also write text_bpe_tokens counts")
    ap.add_argument("--temperature-sample", action="store_true",
                    help="also write the XLM-R alpha=1/2 temperature "
                         "sample (kept doc ids)")
    ap.add_argument("--oversample", action="store_true",
                    help="also write repeat-factor oversample copies "
                         "(doc_id, lang, copy_idx)")
    ap.add_argument("--quality-scores", action="store_true",
                    help="also train + write the logistic quality "
                         "classifier scores")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(address=addr, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from searchengine_ray.curation import curation_pipeline, lm_perplexity

    def _fresh(subdir: str) -> str:
        # write_parquet APPENDS uniquely-named files; the idempotence
        # contract is a fresh overwrite of our own output subdirs, so a
        # retry over a partially-written destination can't duplicate rows
        import shutil

        path = os.path.join(args.out, subdir)
        if os.path.isdir(path):
            shutil.rmtree(path)
        return path

    t0 = time.time()
    kept = curation_pipeline(args.corpus, min_tokens=args.min_tokens)
    kept.write_parquet(_fresh("survivors"))
    report = {"survivors_sec": round(time.time() - t0, 3)}

    if args.lm_scores:
        t0 = time.time()
        lm_perplexity(args.corpus).write_parquet(_fresh("lm_scores"))
        report["lm_scores_sec"] = round(time.time() - t0, 3)
    if args.bpe_counts:
        from searchengine_ray.bpe import bpe_token_counts

        t0 = time.time()
        bpe_token_counts(args.corpus).write_parquet(_fresh("bpe_counts"))
        report["bpe_counts_sec"] = round(time.time() - t0, 3)
    if args.temperature_sample:
        from searchengine_ray.curation import temperature_sample

        t0 = time.time()
        temperature_sample(args.corpus).write_parquet(
            _fresh("temperature_sample")
        )
        report["temperature_sample_sec"] = round(time.time() - t0, 3)
    if args.oversample:
        from searchengine_ray.curation import oversample_boost

        t0 = time.time()
        oversample_boost(args.corpus).write_parquet(_fresh("oversample"))
        report["oversample_sec"] = round(time.time() - t0, 3)
    if args.quality_scores:
        from searchengine_ray.qualityclf import (
            quality_scores, train_quality_classifier,
        )

        t0 = time.time()
        b, w = train_quality_classifier(args.corpus)
        quality_scores(args.corpus, b, w).write_parquet(
            _fresh("quality_scores")
        )
        report["quality_scores_sec"] = round(time.time() - t0, 3)

    n = ray.data.read_parquet(os.path.join(args.out, "survivors")).count()
    report["survivors"] = n
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
