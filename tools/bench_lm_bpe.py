#!/usr/bin/env python
"""Micro-bench: the two r4-late curation/tokenization operators at sf0.1.

- cur_lm_perplexity: bigram-LM scoring — model build (counting shuffle +
  driver quantization) vs corpus scoring scan timed separately via a
  model-reuse second run.
- text_bpe_tokens: BPE train + apply.

Prints one JSON line. Usage:
    PYTHONPATH=/root/repo python tools/bench_lm_bpe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.bpe import bpe_token_counts
    from searchengine_ray.curation import lm_perplexity

    n_docs = ray.data.read_parquet(f"{sf}/documents.parquet").count()

    out = {"sf_dir": sf, "n_docs": n_docs}
    t0 = time.time()
    r = lm_perplexity(sf)
    cnt = r.count()
    out["lm_perplexity_sec"] = round(time.time() - t0, 3)
    out["lm_rows"] = cnt

    t0 = time.time()
    r = bpe_token_counts(sf)
    cnt = r.count()
    out["bpe_tokens_sec"] = round(time.time() - t0, 3)
    out["bpe_rows"] = cnt
    out["lm_docs_per_sec"] = round(n_docs / out["lm_perplexity_sec"], 1)
    out["bpe_docs_per_sec"] = round(n_docs / out["bpe_tokens_sec"], 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
